"""Video frame-sampling + audio feature extraction: byte-exact frame
recovery against the independent per-frame generator, timestamp math,
and deterministic audio features with physical invariants."""

import numpy as np

from nightcrawlercmd_spark.operators.multimodal import audio_features, sample_frames
from nightcrawlercmd_spark.sources.corpus import (
    WorldConfig,
    audios_pdf,
    gen_video_frame,
    videos_pdf,
)

WORLD = WorldConfig(tag="t-av")


def test_sample_frames_byte_exact(spark):
    pdf = videos_pdf(WORLD, 12)
    videos = spark.createDataFrame(pdf)
    got = sample_frames(videos, every_k=4, n_tasks=4).collect()
    meta = {r.video_id: (int(r.w), int(r.h), int(r.n_frames), int(r.fps)) for r in pdf.itertuples(index=False)}
    # row count: ceil(n_frames / 4) per video
    want_rows = sum(-(-nf // 4) for (_, _, nf, _) in meta.values())
    assert len(got) == want_rows
    for row in got:
        w, h, nf, fps = meta[row["video_id"]]
        assert row["frame_idx"] % 4 == 0 and row["frame_idx"] < nf
        assert row["t_ms"] == int(row["frame_idx"] * 1000 / fps)
        # byte-exact against the independently recomputed frame
        want = gen_video_frame(WORLD, row["video_id"], row["frame_idx"], w, h)
        assert bytes(row["frame"]) == want.tobytes()
        assert row["phash"] is not None


def test_audio_features_deterministic_and_physical(spark):
    pdf = audios_pdf(WORLD, 20)
    audio = spark.createDataFrame(pdf)
    got = {r["audio_id"]: r for r in audio_features(audio, n_tasks=4).collect()}
    assert len(got) == 20
    for r in pdf.itertuples(index=False):
        row = got[r.audio_id]
        pcm = np.frombuffer(bytes(r.bytes), dtype="<i2").astype(np.float64) / 32768.0
        assert row["n_samples"] == len(pcm)
        assert row["duration_ms"] == int(len(pcm) * 1000 / int(r.sr))
        assert abs(row["rms"] - float(np.sqrt(np.mean(pcm**2)))) < 1e-12
        # physical invariants: a two-sine signal has 0 < rms <= peak <= 1
        assert 0.0 < row["rms"] <= row["peak"] <= 1.0
        # zcr of a 100-3000 Hz mix at 8-16 kHz lands well inside (0, 1)
        assert 0.0 < row["zcr"] < 0.9
    # determinism: a second run is identical
    again = {r["audio_id"]: r for r in audio_features(audio, n_tasks=4).collect()}
    assert got == again


def test_corrupt_metadata_degrades_per_row(spark):
    """Null/negative metadata must skip that row, never kill the task:
    stride<=0 alone let a (-16,-16) pair through to reshape, and
    int(None) raised before any guard."""
    import pandas as pd

    good = videos_pdf(WORLD, 2)
    bad = pd.DataFrame(
        [
            {"video_id": "neg", "bytes": b"\x00" * 768, "w": -16, "h": -16,
             "n_frames": 1, "fps": 10},
            {"video_id": "nullmeta", "bytes": b"\x00" * 768, "w": None,
             "h": 16, "n_frames": 1, "fps": 10},
            {"video_id": "nullblob", "bytes": None, "w": 16, "h": 16,
             "n_frames": 1, "fps": 10},
        ]
    )
    videos = spark.createDataFrame(
        pd.concat([good, bad], ignore_index=True),
        "video_id string, bytes binary, w int, h int, n_frames int, fps int",
    )
    rows = sample_frames(videos, every_k=4, n_tasks=2).collect()
    assert {r["video_id"] for r in rows} == set(good["video_id"])

    agood = audios_pdf(WORLD, 2)
    abad = pd.DataFrame(
        [
            {"audio_id": "nullsr", "bytes": b"\x01\x02\x03\x04", "sr": None},
            {"audio_id": "nullblob", "bytes": None, "sr": 8000},
        ]
    )
    audio = spark.createDataFrame(
        pd.concat([agood, abad], ignore_index=True),
        "audio_id string, bytes binary, sr int",
    )
    feats = {r["audio_id"]: r for r in audio_features(audio, n_tasks=2).collect()}
    assert set(feats) == set(agood["audio_id"]) | {"nullsr", "nullblob"}
    assert feats["nullsr"]["duration_ms"] == 0  # sr missing → duration 0
    assert feats["nullblob"]["n_samples"] == 0  # blob missing → empty clip
