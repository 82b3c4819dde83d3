"""Multimodal (image) column operators.

Images travel as opaque ``binary`` columns with typed metadata
(``images(image_id, bytes, w, h, fmt, caption, phash)`` — the
input_hint payload schema). Decode / feature-extract / resize run as
Arrow-batched ``mapInPandas`` stages; the codecs are the pure-numpy
ones from ``functions.codecs_np`` (this container has no PIL/cv2, so
unlike a typical stub these decoders actually run — a real deployment
would swap in turbo-jpeg et al. behind the same batch signature).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import codecs_np as C

DECODE_SCHEMA = (
    "image_id string, w int, h int, fmt string, mean_r double, mean_g double, "
    "mean_b double, phash bigint, phash_rederived bigint, psnr_vs_reencode double"
)


def decode_features(images: DataFrame, n_tasks: int = 32) -> DataFrame:
    """Decode every image, emit channel means + re-derived phash + a
    re-encode PSNR self-check. One Arrow batch in, one out."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = C.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                means = img.reshape(-1, 3).mean(axis=0)
                re_rt = C.decode(C.encode(img, r.fmt), r.fmt, int(r.w), int(r.h))
                p = C.psnr(img, re_rt)
                rows.append(
                    {
                        "image_id": r.image_id,
                        "w": int(r.w),
                        "h": int(r.h),
                        "fmt": r.fmt,
                        "mean_r": float(means[0]),
                        "mean_g": float(means[1]),
                        "mean_b": float(means[2]),
                        "phash": int(r.phash),
                        "phash_rederived": C.phash64(img),
                        "psnr_vs_reencode": float(min(p, 1e9)),
                    }
                )
            yield pd.DataFrame(rows)

    return images.repartition(n_tasks).mapInPandas(run, schema=DECODE_SCHEMA)


RESIZE_SCHEMA = "image_id string, w int, h int, thumb binary"


def thumbnails(images: DataFrame, size: int = 16, n_tasks: int = 32) -> DataFrame:
    """Area-resize every image to size×size, re-encode lossless."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                img = C.decode(bytes(r.bytes), r.fmt, int(r.w), int(r.h))
                chans = [C._resize_area(img[:, :, c].astype(np.float64), size) for c in range(3)]
                thumb = np.clip(np.round(np.stack(chans, axis=-1)), 0, 255).astype(np.uint8)
                rows.append(
                    {"image_id": r.image_id, "w": size, "h": size, "thumb": C.encode_rgb8(thumb)}
                )
            yield pd.DataFrame(rows)

    return images.repartition(n_tasks).mapInPandas(run, schema=RESIZE_SCHEMA)


def phash_near_dupes(images: DataFrame, max_hamming: int = 6) -> DataFrame:
    """Near-duplicate images by perceptual-hash Hamming distance,
    blocked on the top-16 phash bits so the self-join never goes
    quadratic (same-block pairs only)."""
    from pyspark.sql import functions as F

    blocked = images.select(
        "image_id", "phash", F.expr("phash >> 48").alias("block")
    )
    a, b = blocked.alias("a"), blocked.alias("b")
    return (
        a.join(
            b,
            (F.col("a.block") == F.col("b.block"))
            & (F.col("a.image_id") < F.col("b.image_id")),
        )
        .withColumn("hamming", F.bit_count(F.expr("a.phash ^ b.phash")))
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("a.image_id").alias("image_a"),
            F.col("b.image_id").alias("image_b"),
            "hamming",
        )
    )
