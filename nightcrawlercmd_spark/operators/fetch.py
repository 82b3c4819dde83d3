"""Vectorized fetch stage (SURVEY.md O6) and page schema.

The reference fetches with a single-threaded ``http.DefaultClient.Do``
loop (mainHttpScan.go:178-204, mainCrawler.go:81). The engine fetches a
whole micro-batch per round with ``mapInPandas``: the dequeued frontier
rows are repartitioned by ``(host_hash, salt)`` so each task holds a
slice of hosts (politeness already enforced by the dequeue budget) and
a hot host's rows spread over ``n_salts`` tasks.

With ``decode_images=True`` the stage also fetches + decodes each 200
page's referenced image payload inline (north_star: "fetch and decode
image payloads via vectorized pandas/Arrow UDFs") and emits the decoded
metadata + perceptual hash columns.

This sandbox is offline, so the fetch body is the deterministic
synthetic responder from ``sources.corpus`` — a pure function of the
URL. A real deployment swaps ``fetch_one`` for an HTTP client (and the
image bytes for the actual response body); the Spark plumbing (schema,
partitioning, batch shape) is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..functions import codecs_np as C
from ..functions.html import extract_hrefs
from ..functions.linkfilter import filter_hrefs
from ..functions.urlnorm import resolve
from ..sources.corpus import WorldConfig, fetch_one, gen_image, priority_of

PAGE_SCHEMA = (
    "canon_url string, url_hash bigint, host string, host_hash bigint, "
    "salt int, depth int, priority double, "
    "status_code int, location string, content_type string, body binary, "
    "image_id string, caption string, resp_ms int, error string, "
    "img_w int, img_h int, img_fmt string, img_phash bigint, "
    "children array<struct<canon_url: string, priority: double>>"
)

_PASSTHRU = ["canon_url", "url_hash", "host", "host_hash", "salt", "depth", "priority"]
_FETCHED = ["status_code", "location", "content_type", "body", "image_id",
            "caption", "resp_ms", "error"]


def fetch_stage(
    dequeued: DataFrame,
    world: WorldConfig,
    n_tasks: int,
    decode_images: bool = False,
    follow: list[str] | None = None,
    dont_follow: list[str] | None = None,
    strict_filters: bool = False,
) -> DataFrame:
    """dequeued frontier rows → fetched pages (one row per URL).

    Fetch, payload decode, link extraction, base-resolution,
    canonicalization and child-priority all happen HERE, in one Arrow
    round-trip — the rest of the round (dedupe, filters, merge) is pure
    JVM. The page body crosses the Python boundary exactly once.
    """

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = [fetch_one(world, u) for u in pdf["canon_url"]]
            out = pdf[_PASSTHRU].reset_index(drop=True)
            rdf = pd.DataFrame(res).reset_index(drop=True)
            for col in _FETCHED:
                out[col] = rdf[col]
            img_cols: dict[str, list] = {"img_w": [], "img_h": [], "img_fmt": [], "img_phash": []}
            children: list[list[tuple[str, float]]] = []
            for r, depth in zip(res, pdf["depth"]):
                if decode_images and r["image_id"] is not None:
                    # 'fetch' the referenced payload (deterministic bytes),
                    # then decode + hash — the per-page media work a real
                    # crawler pays. encode = wire bytes, decode = ingest.
                    img, w, h, fmt = gen_image(world, r["image_id"])
                    decoded = C.decode(C.encode(img, fmt), fmt, w, h)
                    img_cols["img_w"].append(w)
                    img_cols["img_h"].append(h)
                    img_cols["img_fmt"].append(fmt)
                    img_cols["img_phash"].append(C.phash64(decoded))
                else:
                    for k in img_cols:
                        img_cols[k].append(None)
                # link extraction + canonicalization (SURVEY.md O30/O18)
                if r["status_code"] == 200:
                    # follow/dont-follow on the RAW href, pre-resolution
                    # (reference mainCrawler.go:175-196, O20/O40)
                    hrefs = filter_hrefs(
                        extract_hrefs(r["body"]), follow, dont_follow, strict_filters
                    )
                elif 300 <= r["status_code"] <= 307 and r["location"]:
                    hrefs = [r["location"]]  # redirect enqueue, O76 (never filtered)
                else:
                    hrefs = []
                cd = int(depth) + 1
                kids = []
                for href in hrefs:
                    child = resolve(r["canon_url"], href)
                    if child is not None:
                        kids.append((child, priority_of(child, cd)))
                children.append(kids)
            for k, v in img_cols.items():
                out[k] = pd.Series(v, dtype=object)
            out["children"] = pd.Series(children, dtype=object)
            yield out

    return dequeued.repartition(n_tasks, "host_hash", "salt").mapInPandas(
        fetch_batches, schema=PAGE_SCHEMA
    )
