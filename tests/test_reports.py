"""Report suite over a crawled pages table (reference §3.2: one scan,
six sinks) — properties checked against independent pandas recompute."""

import pandas as pd
import pytest

from nightcrawlercmd_spark.functions.html import extract_forms, extract_hrefs, html_to_text
from nightcrawlercmd_spark.plans.reports import run_report_suite, wordlist_pipeline
from nightcrawlercmd_spark.sources.corpus import WorldConfig
from nightcrawlercmd_spark.streaming.engine import CrawlEngine, EngineConfig

WORLD = WorldConfig(n_hosts=4, base_pages=10, hot_factor=3, tag="t-rep")


@pytest.fixture(scope="module")
def pages(spark, tmp_path_factory):
    state = str(tmp_path_factory.mktemp("rep_state"))
    eng = CrawlEngine(
        spark,
        EngineConfig(state_dir=state, world=WORLD, max_rounds=5, max_pages=80, fetch_tasks=4),
    )
    eng.run()
    return eng.pages().cache()


@pytest.fixture(scope="module")
def suite(pages, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("rep_csv"))
    return run_report_suite(pages, out_dir=out), out


def test_crawledurls_covers_every_fetch(pages, suite):
    reports, _ = suite
    assert reports["crawledurls"].count() == pages.count()


def test_wordlist_matches_pandas_recompute(pages, suite):
    reports, _ = suite
    got = {
        (r["word"], r["cnt"], r["first_url"])
        for r in reports["wordlist"].collect()
    }
    pdf = pages.filter("status_code = 200").select("canon_url", "body").toPandas()
    import re

    wre = re.compile(r"[a-zA-Z][a-z]{3,}")
    acc: dict[str, list] = {}
    for r in pdf.itertuples(index=False):
        for w in wre.findall(html_to_text(bytes(r.body)))[:2000]:
            w = w.lower()
            if w not in acc:
                acc[w] = [0, r.canon_url]
            acc[w][0] += 1
            acc[w][1] = min(acc[w][1], r.canon_url)
    want = {(w, c, u) for w, (c, u) in acc.items()}
    assert got == want


def test_formtags_double_explode(pages, suite):
    reports, _ = suite
    rows = reports["formtags"].collect()
    assert rows, "corpus should contain forms on ~1/3 of pages"
    pdf = pages.filter("status_code = 200").select("body").toPandas()
    n_inputs = sum(
        max(len(f["inputs"]), 1)
        for b in pdf["body"]
        for f in extract_forms(bytes(b))
    )
    assert len(rows) == n_inputs
    assert all(r["action"] == "/search" and r["method"] == "GET" for r in rows)


def test_allurls_is_global_distinct(pages, suite):
    reports, _ = suite
    got = {r["url"] for r in reports["allurls"].collect()}
    pdf = pages.filter("status_code = 200").select("body").toPandas()
    want = {
        h for b in pdf["body"] for h in extract_hrefs(bytes(b)) if h.strip()
    }
    assert got == want


def test_invalidtags_empty_on_known_corpus(suite):
    reports, _ = suite
    # the synthetic corpus only emits allowlisted tags
    assert reports["invalidtags"].count() == 0


def test_csv_sinks_written(suite):
    import glob

    _, out = suite
    for name in ("crawledurls", "querykeys", "invalidtags", "wordlist", "formtags", "allurls"):
        files = glob.glob(f"{out}/{name}/*.csv")
        assert files, name


def test_wordlist_pipeline_sorted_distinct(pages):
    toks = [r["token"] for r in wordlist_pipeline(pages).collect()]
    assert toks == sorted(set(toks)) and toks
