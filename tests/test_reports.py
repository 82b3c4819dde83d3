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


def test_username_mutator_golden(spark):
    """Reference usernameMutator variant set (mainWordlist.go:125-152):
    4 separator joins always; first-initial + dropped-word forms for
    every position when the line has ≥2 words; per-line de-dup."""
    from pyspark.sql import functions as F

    from nightcrawlercmd_spark.operators.textops import username_mutations

    df = spark.createDataFrame(
        [("john paul smith",), ("john smith",), ("admin",), ("",)], "line string"
    )
    got = {
        r["line"]: sorted(r["m"])
        for r in df.select(
            "line", username_mutations(F.col("line")).alias("m")
        ).collect()
    }
    assert got["john paul smith"] == sorted(
        {
            "johnpaulsmith", "john_paul_smith", "john.paul.smith",
            "john-paul-smith",
            "jpaulsmith", "paulsmith",     # i=0: abbreviate / drop
            "johnpsmith", "johnsmith",     # i=1
            "johnpauls", "johnpaul",       # i=2
        }
    )
    assert got["john smith"] == sorted(
        {"johnsmith", "john_smith", "john.smith", "john-smith",
         "jsmith", "smith", "johns", "john"}
    )
    assert got["admin"] == ["admin"]  # single word: no abbreviations
    assert got[""] == [""]            # the reference's empty-map entry


def test_wordlist_pipeline_username_mutator(pages):
    """Wiring: permute sits between extraction and the final distinct
    (mainWordlist.go:78). Single-word tokens mutate to themselves, so
    the word-extractor pipeline is invariant under the mutator."""
    base = [r["token"] for r in wordlist_pipeline(pages, ("word",)).collect()]
    mut = [
        r["token"]
        for r in wordlist_pipeline(pages, ("word",), mutator="username").collect()
    ]
    assert base == mut and len(base) > 0
    with pytest.raises(ValueError):
        wordlist_pipeline(pages, ("word",), mutator="nope").collect()


def test_binary_pages_excluded_from_wordlist_text(spark):
    """ADVICE r3: a binary payload replacement-decoded to mojibake
    must not seed wordlist tokens, while its raw-body URLs/IPs still
    reach the texturls/ips reports (mainReport.go:113-117 runs those
    before the mime check)."""
    from nightcrawlercmd_spark.plans.reports import page_reports

    rows = [
        (
            "http://a.test/img.png",
            b"\x89PNG\xff\xfe junkword http://hidden.test/x 10.0.0.7 \x00\xff",
            "image/png",
            200, 3, None, None,
        ),
        (
            "http://a.test/readme.txt",
            b"plainword http://plain.test/y",
            "text/plain",
            200, 3, None, None,
        ),
    ]
    pages = spark.createDataFrame(
        rows,
        "canon_url string, body binary, content_type string, "
        "status_code int, resp_ms int, location string, error string",
    )
    feats = {r["canon_url"]: r for r in page_reports(pages).collect()}
    png = feats["http://a.test/img.png"]
    txt = feats["http://a.test/readme.txt"]
    assert png["text"] == ""  # binary body never tokenized
    assert "http://hidden.test/x" in png["text_urls"]  # raw extraction stays
    assert "10.0.0.7" in png["text_ips"]
    assert "plainword" in txt["text"]  # text/* keeps flowing
    toks = set(
        r["token"] for r in wordlist_pipeline(pages, ("word",)).collect()
    )
    assert "plainword" in toks and "junkword" not in toks


def test_validate_html_golden():
    """O31: configurable ruleset validation with per-finding line
    numbers (reference htmlcheck + UpdateErrorLines shape)."""
    from nightcrawlercmd_spark.functions.htmlcheck import validate_html

    page = (
        "<html>\n"
        "<body>\n"
        '<marquee scroll="1">old</marquee>\n'
        '<a href="/x" blink="y">ok tag, bad attr</a>\n'
        '<img src="/i.png" alt="fine" data-test="allowed" aria-label="allowed">\n'
        "</body></html>"
    )
    got = validate_html(page)
    assert {
        "line": 3, "tag": "marquee", "attr": "", "reason": "unknown-tag"
    } in got
    assert {
        "line": 4, "tag": "a", "attr": "blink", "reason": "unknown-attr"
    } in got
    # data-* / aria-* / allowed attrs produce no findings
    assert all(f["tag"] != "img" for f in got)
    assert len(got) == 2


def test_validate_html_custom_ruleset(tmp_path):
    """The ruleset is a config file, not code (reference -tags flag)."""
    import json

    from nightcrawlercmd_spark.functions.htmlcheck import validate_html

    path = tmp_path / "rules.json"
    path.write_text(json.dumps({
        "global_attributes": [],
        "tags": {"html": [], "body": [], "marquee": ["scroll"]},
    }))
    page = '<html><body><marquee scroll="1">ok now</marquee>\n<p>bad now</p>'
    got = validate_html(page, str(path))
    assert got == [{"line": 2, "tag": "p", "attr": "", "reason": "unknown-tag"}]


def test_extract_tokens_modes(spark):
    """O28: email (umlaut-aware), quoted-string, and URL extractors
    match the reference regex behavior (mainWordlist.go:18-22)."""
    from pyspark.sql import functions as F

    from nightcrawlercmd_spark.operators.textops import extract_tokens

    text = (
        'Mail Jörg.Müller@bücher-shop.de or x@y.zz see "the config" '
        "and 'single quoted' plus http://abs.test/a/b and rel/path/item5"
    )
    df = spark.createDataFrame([(text,)], "t string")

    def toks(mode):
        return df.select(F.explode(extract_tokens(F.col("t"), mode)).alias("x")).collect()

    emails = [r["x"] for r in toks("email")]
    assert emails == ["Jörg.Müller@bücher-shop.de"]  # x@y.zz local part < 3 chars
    strings = sorted(r["x"] for r in toks("string"))
    assert strings == ["single quoted", "the config"]
    urls = [r["x"] for r in toks("url")]
    assert any("abs.test" in u for u in urls)  # url_abs shape
    assert any(u.startswith("rel/") or "/path/" in u for u in urls)  # url_rel shape
    assert [r["x"] for r in toks("none")] == [text]  # newline split


def test_link_scannable_is_binary_deny_list():
    """Link scanning gates on a binary DENY list, not a text/html
    allow list (review r4): goquery link-scans any 200 body, so a
    server omitting Content-Type — or serving application/xhtml+xml —
    must still have its links extracted; only known-binary payload
    types (load_resources image fetches) skip the regex pass."""
    from nightcrawlercmd_spark.functions.html import link_scannable

    for ct in (None, "", "text/html", "text/html; charset=utf-8",
               "application/xhtml+xml", "text/plain", "application/json",
               "Weird/Unknown"):
        assert link_scannable(ct), ct
    for ct in ("image/png", "IMAGE/JPEG", "video/mp4", "audio/ogg",
               "font/woff2", "application/octet-stream",
               "application/pdf; name=x"):
        assert not link_scannable(ct), ct


def test_tag_with_file_reference_semantics(spark):
    """`-show-file-name` (mainWordlist.go:44,165-172): words are keyed
    `lower(trim(word)) [file]` BEFORE the dedupe — the same word from
    two files yields two entries — and the final wordlist pass
    lowercases the whole tagged entry, file part included."""
    from pyspark.sql import functions as F

    from nightcrawlercmd_spark.operators.textops import tag_with_file, words

    df = spark.createDataFrame(
        [("Alpha beta", "Notes.TXT"), ("alpha gamma", "b.txt")],
        "text string, file string",
    )
    got = sorted(
        r["entry"]
        for r in df.select(F.explode(words(F.col("text"))).alias("w"), "file")
        .select(
            F.lower(F.trim(tag_with_file(F.col("w"), F.col("file")))).alias("entry")
        )
        .distinct()
        .collect()
    )
    assert got == [
        "alpha [b.txt]",
        "alpha [notes.txt]",  # same word, two files → two entries
        "beta [notes.txt]",
        "gamma [b.txt]",
    ]


def test_create_wordlist_composed_semantics(spark):
    """createWordList end-to-end (mainWordlist.go:62-103): the mutator
    runs on the TAGGED keys (file tag torn into \\w+ runs and joined
    into username variants), only mutator output survives, and
    templates substitute the FIRST <word> occurrence only."""
    from nightcrawlercmd_spark.operators.textops import create_wordlist

    docs = spark.createDataFrame(
        [("Alpha beta", "f1")], "text string, source string"
    )
    got = [
        r["entry"]
        for r in create_wordlist(
            docs,
            extractor="word",
            file_col="source",
            mutator="username",
            templates=["<word>", "x<word>y<word>"],
        ).collect()
    ]
    # variants of 'alpha [f1]' ∪ 'beta [f1]' (8 each, 'f1' shared) = 15
    assert len(got) == 30 and got == sorted(got) and len(set(got)) == 30
    assert "alpha" in got          # dropped-word abbrev re-emits the word
    assert "alpha_f1" in got       # the file tag joins into the variant
    assert "af1" in got and "f1" in got
    assert "xalphaf1y<word>" in got  # first <word> only; second literal
    assert not any(e != e.lower() for e in got)


def test_unquoted_attribute_values():
    """Legal unquoted href/src/attr values (<a href=/about>) extract
    like quoted ones (goquery parses both); the quoted form still
    survives an embedded other-quote char."""
    from nightcrawlercmd_spark.functions.html import extract_srcs

    body = (
        b'<a href=/about>x</a> <a href="/q?x=o\'brien">y</a>'
        b"<img src=logo.png> <form action=/post method=POST>"
        b'<input name=u type=text></form>'
    )
    assert extract_hrefs(body) == ["/about", "/q?x=o'brien"]
    assert extract_srcs(body) == ["logo.png"]
    forms = extract_forms(body)
    assert forms[0]["action"] == "/post" and forms[0]["method"] == "POST"
    assert forms[0]["inputs"] == ["u"]


def test_unclosed_rawtext_blocks_masked():
    """A page truncated mid-<script>/<style> must not leak its raw
    source into the text column or produce bogus unknown-tag findings
    ('if (a < b && c > d)' scans as '< b && c >')."""
    from nightcrawlercmd_spark.functions.htmlcheck import validate_html

    truncated = b"<html><p>hello world</p><script>var secret = 1; if (a < b"
    assert "secret" not in html_to_text(truncated)
    assert "hello world" in html_to_text(truncated)
    assert validate_html(
        "<html>\n<body>\n<script>\nif (a < b && c > d) {}\n"
    ) == []
    # line numbers stay correct for findings AFTER a closed block
    got = validate_html("<html>\n<script>\nx\n</script>\n<marquee>old\n")
    assert got == [
        {"line": 5, "tag": "marquee", "attr": "", "reason": "unknown-tag"}
    ]


def test_wordlist_pipeline_requires_extractors(pages):
    with pytest.raises(ValueError):
        wordlist_pipeline(pages, ())


def test_validate_html_closing_tags():
    """An unknown tag appearing only in closing form (</bogus>) is a
    finding too — the reference's tokenizer-level validator sees EndTag
    tokens; closing forms of known tags stay silent."""
    from nightcrawlercmd_spark.functions.htmlcheck import validate_html

    got = validate_html("<html>\n</bogus>\n</html>")
    assert got == [{"line": 2, "tag": "bogus", "attr": "", "reason": "unknown-tag"}]
    assert validate_html("<html><body></body></html>") == []
