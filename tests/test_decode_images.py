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
