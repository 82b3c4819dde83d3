"""Inline image fetch+decode during crawl rounds (north_star: 'fetch
and decode image payloads via vectorized pandas/Arrow UDFs')."""

from nightcrawlercmd_spark.sources.corpus import (
    WorldConfig,
    all_page_urls,
    images_pdf,
)
from nightcrawlercmd_spark.streaming.engine import CrawlEngine, EngineConfig

WORLD = WorldConfig(n_hosts=3, base_pages=8, hot_factor=2, tag="t-img")


def test_decoded_payload_matches_payload_table(spark, tmp_path):
    eng = CrawlEngine(
        spark,
        EngineConfig(
            state_dir=str(tmp_path / "s"),
            world=WORLD,
            max_rounds=3,
            max_pages=40,
            fetch_tasks=4,
            decode_images=True,
        ),
    )
    eng.run()
    fetched = (
        eng.pages()
        .filter("status_code = 200")
        .select("image_id", "img_w", "img_h", "img_fmt", "img_phash")
        .toPandas()
    )
    assert len(fetched) > 0
    truth = images_pdf(WORLD, all_page_urls(WORLD)).set_index("image_id")
    for r in fetched.itertuples(index=False):
        t = truth.loc[r.image_id]
        assert (r.img_w, r.img_h, r.img_fmt) == (t["w"], t["h"], t["fmt"])
        # decoded-phash vs payload-table phash: identical for lossless,
        # near-identical for the lossy codec (the hard invariant is
        # pixel PSNR>=40dB, covered in test_engine_oracle)
        ham = bin((int(r.img_phash) ^ int(t["phash"])) & (2**64 - 1)).count("1")
        if r.img_fmt == "dctq":
            assert ham <= 10, (r.image_id, ham)
        else:
            assert ham == 0, (r.image_id, ham)


def test_corrupt_image_degrades_per_row(spark):
    """Corrupt bytes/metadata degrade to a null-feature row (same
    contract as sample_frames/audio_features) — one bad upload used to
    raise inside the mapInPandas batch and fail the whole task."""
    import pandas as pd

    from nightcrawlercmd_spark.operators.multimodal import (
        decode_features,
        thumbnails,
    )
    from nightcrawlercmd_spark.sources.corpus import (
        WorldConfig,
        all_page_urls,
        images_pdf,
    )

    world = WorldConfig(n_hosts=2, base_pages=4, hot_factor=2, tag="t-corrupt")
    good = images_pdf(world, all_page_urls(world))
    bad = pd.DataFrame(
        [
            {"image_id": "truncated", "bytes": b"\x01\x02", "w": 16, "h": 16,
             "fmt": "rgb8", "caption": "x", "phash": 0},
            {"image_id": "badfmt", "bytes": b"\x00" * 768, "w": 16, "h": 16,
             "fmt": "nope", "caption": "x", "phash": 0},
            {"image_id": "nullbytes", "bytes": None, "w": 16, "h": 16,
             "fmt": "png", "caption": "x", "phash": 0},
        ]
    )
    images = spark.createDataFrame(
        pd.concat([good, bad], ignore_index=True),
        "image_id string, bytes binary, w int, h int, fmt string, "
        "caption string, phash bigint",
    )
    feats = {r["image_id"]: r for r in decode_features(images, n_tasks=2).collect()}
    assert set(feats) == set(good["image_id"]) | {"truncated", "badfmt", "nullbytes"}
    for bad_id in ("truncated", "badfmt", "nullbytes"):
        assert feats[bad_id]["phash_rederived"] is None
    for good_id in good["image_id"]:
        assert feats[good_id]["phash_rederived"] == feats[good_id]["phash"] or \
            feats[good_id]["psnr_vs_reencode"] >= 40.0
    thumbs = {r["image_id"]: r for r in thumbnails(images, size=16, n_tasks=2).collect()}
    assert thumbs["truncated"]["thumb"] is None
    assert all(len(bytes(thumbs[g]["thumb"])) == 768 for g in good["image_id"])


def test_fetch_decode_guard_degrades_corrupt_payload():
    """Review r4: the fetch stage's payload decode must degrade a
    corrupt blob (truncated / bad stream / unknown fmt) to null img
    columns instead of raising inside mapInPandas — same per-row
    contract as multimodal.decode_features."""
    from nightcrawlercmd_spark.functions import codecs_np as C
    from nightcrawlercmd_spark.operators.fetch import _decode_phash
    from nightcrawlercmd_spark.sources.corpus import WorldConfig, gen_image

    world = WorldConfig(n_hosts=2, base_pages=4, hot_factor=2, tag="t-guard")
    img, w, h, fmt = gen_image(world, "http://h0.t-guard.test/p/0")
    good = _decode_phash(C.encode(img, fmt), w, h, fmt)
    assert isinstance(good, int)
    assert _decode_phash(b"\x01\x02", w, h, "rgb8") is None      # truncated
    assert _decode_phash(b"\x00" * (w * h * 3), w, h, "nope") is None  # bad fmt
    assert _decode_phash(b"junk", w, h, "png") is None           # bad stream
