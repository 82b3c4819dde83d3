"""O13 static HTTP server + real-fetch integration: a crawl driven
through REAL sockets (virtual-hosted HTTP GETs, keep-alive, redirects
not followed) reproduces the sequential oracle's crawl ordering + seen
set exactly, and the image payloads decode identically."""

import numpy as np
import pytest

from nightcrawlercmd_spark.functions import codecs_np as C
from nightcrawlercmd_spark.operators.fetch import HttpFetcher
from nightcrawlercmd_spark.sources.corpus import WorldConfig, fetch_one, gen_image
from nightcrawlercmd_spark.sources.httpserver import WorldHTTPServer
from nightcrawlercmd_spark.streaming.engine import CrawlEngine, EngineConfig
from nightcrawlercmd_spark.streaming.simulator import simulate

WORLD = WorldConfig(n_hosts=4, base_pages=8, hot_factor=3, tag="t-http")


@pytest.fixture(scope="module")
def server():
    srv = WorldHTTPServer(WORLD).start()
    yield srv
    srv.stop()


def test_fetcher_matches_synthetic_responder(server):
    """Row-for-row: HTTP responses equal the pure-function responder
    (status, location, body, image identity); resp_ms is wall-clock."""
    fetcher = HttpFetcher(server.endpoint)
    urls = [
        f"http://host00.{WORLD.tag}.test/p/{j}" for j in range(8)
    ] + [f"http://host01.{WORLD.tag}.test/p/0", f"http://host01.{WORLD.tag}.test/nope"]
    for u in urls:
        want = fetch_one(WORLD, u)
        got = fetcher.fetch(u)
        assert got["status_code"] == want["status_code"], u
        assert got["location"] == want["location"], u
        assert bytes(got["body"]) == bytes(want["body"]), u
        assert got["image_id"] == want["image_id"], u
        assert got["caption"] == want["caption"], u


def test_image_payload_roundtrip(server):
    fetcher = HttpFetcher(server.endpoint)
    page = fetch_one(WORLD, f"http://host00.{WORLD.tag}.test/p/0")
    blob, w, h, fmt = fetcher.fetch_image(page["image_id"])
    ref_img, rw, rh, rfmt = gen_image(WORLD, page["image_id"])
    assert (w, h, fmt) == (rw, rh, rfmt)
    dec = C.decode(blob, fmt, w, h)
    if fmt == "dctq":
        assert C.psnr(ref_img, dec) >= 40.0
    else:
        assert np.array_equal(ref_img, dec)


def test_real_http_crawl_matches_oracle(spark, tmp_path_factory, server):
    cfg = EngineConfig(
        state_dir=str(tmp_path_factory.mktemp("crawl_http")),
        world=WORLD,
        max_rounds=5,
        max_pages=60,
        fetch_tasks=4,
        decode_images=True,
        http_endpoint=server.endpoint,
        expected_urls=1 << 12,
    )
    eng = CrawlEngine(spark, cfg)
    eng.run()
    sim = simulate(WORLD, max_rounds=5, max_pages=60)
    got = [
        (r["round"], r["seq"], r["canon_url"], r["status_code"])
        for r in eng.crawl_log().collect()
    ]
    assert got == sim.log
    got_seen = {
        r["canon_url"]: (r["first_round"], r["depth"]) for r in eng.seen().collect()
    }
    assert got_seen == sim.seen
    # payload columns made it through the real-HTTP path
    pages = eng.pages().filter("status_code = 200")
    assert pages.filter("img_phash IS NULL").count() == 0


def test_img_route_parity_and_dns_fail(server):
    """The /img payload route and the DNS-fail translation must agree
    row-for-row between the real-socket fetcher and fetch_one: an
    unconditional server-side /img intercept used to answer 200 where
    the synthetic responder said 404/DNS-fail, breaking load_resources
    parity (and 502 hid the resolver error for out-of-world hosts)."""
    fetcher = HttpFetcher(server.endpoint)
    page = fetch_one(WORLD, f"http://host00.{WORLD.tag}.test/p/0")
    cases = [
        # valid image id on a known host → 200 payload both ways
        f"http://host00.{WORLD.tag}.test/img/{page['image_id']}.png",
        # made-up id on a known host → 404 both ways
        f"http://host00.{WORLD.tag}.test/img/img-0000000000000000.png",
        # /img on an unknown host → synthetic DNS failure both ways
        f"http://nosuch.{WORLD.tag}.test/img/{page['image_id']}.png",
        # plain page on an unknown host → DNS failure both ways
        f"http://nosuch.{WORLD.tag}.test/p/0",
    ]
    for u in cases:
        want = fetch_one(WORLD, u)
        got = fetcher.fetch(u)
        assert got["status_code"] == want["status_code"], u
        assert got["error"] == want["error"], u
        assert bytes(got["body"] or b"") == bytes(want["body"] or b""), u
