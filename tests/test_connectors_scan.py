"""DNS/portscan/bucketscan connector analogs + httpscan matrix + fuzzer."""

import duckdb
import pandas as pd

from nightcrawlercmd_spark.operators import fuzzing
from nightcrawlercmd_spark.plans.httpscan import probe_matrix, render_html, run_scan
from nightcrawlercmd_spark.sources.connectors import (
    bucket_scan,
    simulate_dns_sweep,
    simulate_port_scan,
)


def test_fuzzer_matches_duckdb_oracle(spark):
    got = {
        (r["id"], r["fuzz_url"]) for r in fuzzing.generate(spark, 200).collect()
    }
    want = set(
        duckdb.connect().execute(fuzzing.oracle_sql(200)).fetchall()
    )
    assert got == want and len(got) == 200


def test_fuzzer_deterministic(spark):
    a = sorted(r["fuzz_url"] for r in fuzzing.generate(spark, 50).collect())
    b = sorted(r["fuzz_url"] for r in fuzzing.generate(spark, 50).collect())
    assert a == b


def test_dns_sweep_resume_and_classification(spark):
    words = spark.createDataFrame(
        pd.DataFrame({"word": ["www", "mail", "dev", "api", "", "www"]}), "word string"
    )
    # history carries the reference's absolute-FQDN form with the
    # trailing dot (mainDNS.go:112) — the build must match it or the
    # resume anti-join silently no-ops
    history = spark.createDataFrame(
        pd.DataFrame({"name": ["mail.ex.test."]}), "name string"
    )
    out = simulate_dns_sweep(spark, words, "ex.test", history).collect()
    names = {r["name"] for r in out}
    assert "mail.ex.test." not in names  # resume anti-join (O46)
    assert names <= {"www.ex.test.", "dev.ex.test.", "api.ex.test."}
    for r in out:
        assert r["found"] == (r["entry"] is not None)  # explode_outer


def test_dns_sweep_record_types(spark):
    """-typeName / -typeNumber (VERDICT r3 item 6, mainDNS.go:33-55):
    name and number modes agree, the responder keys on the type (an
    AAAA sweep differs from an A sweep), answers are type-shaped, and
    an unknown name raises like the reference's log.Fatal."""
    import pytest

    words = spark.createDataFrame(
        pd.DataFrame({"word": [f"w{i}" for i in range(40)]}), "word string"
    )
    by_name = simulate_dns_sweep(spark, words, "ex.test", dns_type="AAAA").collect()
    by_nr = simulate_dns_sweep(spark, words, "ex.test", dns_type=28).collect()
    assert sorted(map(tuple, by_name)) == sorted(map(tuple, by_nr))
    assert all(r["type_number"] == 28 for r in by_name)
    assert all(r["entry"].startswith("2001:db8::") for r in by_name if r["entry"])
    a = simulate_dns_sweep(spark, words, "ex.test", dns_type="A").collect()
    assert {r["name"] for r in a if r["found"]} != {
        r["name"] for r in by_name if r["found"]
    }
    mx = simulate_dns_sweep(spark, words, "ex.test", dns_type="MX").collect()
    assert all(r["entry"].startswith("rr15-") for r in mx if r["entry"])
    with pytest.raises(ValueError):
        simulate_dns_sweep(spark, words, "ex.test", dns_type="BOGUS")


def test_port_scan_range(spark):
    rows = simulate_port_scan(spark, "h.test", 1, 256).collect()
    assert len(rows) == 256
    assert all((r["open"] and r["error"] is None) or (not r["open"]) for r in rows)
    # deterministic across runs
    again = simulate_port_scan(spark, "h.test", 1, 256).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_bucket_scan_classification(spark):
    words = spark.createDataFrame(pd.DataFrame({"word": ["acme", "data", "x"]}), "word string")
    providers = spark.createDataFrame(
        pd.DataFrame(
            [
                {"name": "p1", "url_template": "https://{w}.p1.test", "not_found_code": 404, "denied_code": 403},
                {"name": "p2", "url_template": "https://p2.test/{w}", "not_found_code": 400, "denied_code": 401},
            ]
        ),
        "name string, url_template string, not_found_code int, denied_code int",
    )
    rows = bucket_scan(spark, words, providers).collect()
    assert len(rows) == 6  # 3 words × 2 providers (O54 cross join)
    # O47: provider suffix filter applied BEFORE the cross join
    # (reference -filter, mainBucketScan.go:100-103)
    filt = bucket_scan(spark, words, providers, provider_filter="p1.test").collect()
    assert len(filt) == 3 and all(r["name"] == "p1" for r in filt)
    none = bucket_scan(spark, words, providers, provider_filter="nomatch").collect()
    assert none == []
    for r in rows:
        assert "{w}" not in r["url"] and r["word"] in r["url"]  # O34 substitution
        want = {404: "not found", 403: "access denied", 400: "not found", 401: "access denied"}.get(
            r["status_code"], "found"
        )
        assert r["result"] == want


def test_httpscan_matrix_and_scan(spark):
    urls = spark.createDataFrame(
        pd.DataFrame({"url": ["http://t.test/a/b?x=1&y=2", "http://t.test/solo"]}),
        "url string",
    )
    m = probe_matrix(spark, urls, scan_headers=True).collect()
    kinds = {(r["kind"]) for r in m}
    assert kinds == {"param", "header", "segment"}
    # -scanheader is a CLI opt-in (mainHttpScan.go:69,132): the default
    # matrix must not contain the header branch at all
    assert not any(
        r["kind"] == "header" for r in probe_matrix(spark, urls).collect()
    )
    # params: only url1 — 2 UNIQUE keys × ALL 5 vectors (the reference
    # iterates url.Values map keys; no Section gate)
    assert sum(1 for r in m if r["kind"] == "param") == 10
    # headers: 2 urls × 2 headers × ALL 5 vectors
    assert sum(1 for r in m if r["kind"] == "header") == 20
    # segments: a,b + solo → 3 segments × the 4 vectors NOT excluded by
    # the gate (skip only section non-empty AND lacking 'urlsegment' —
    # mainHttpScan.go:151-153 — so NULL-section vectors qualify; only
    # the header-only vector is skipped)
    assert sum(1 for r in m if r["kind"] == "segment") == 12

    # reference quirks: a repeated key probes ONCE (url.Values map) and
    # an empty query ('?') probes nothing
    dup = spark.createDataFrame(
        pd.DataFrame({"url": ["http://t.test/p?a=1&a=2", "http://t.test/q?"]}),
        "url string",
    )
    dm = probe_matrix(spark, dup).collect()
    ptargets = [(r["url"], r["target"]) for r in dm if r["kind"] == "param"]
    assert ptargets.count(("http://t.test/p?a=1&a=2", "a")) == 5  # one key × 5 vectors
    assert not any(u.endswith("q?") for u, _ in ptargets)  # empty query → none
    res = run_scan(spark, urls, scan_headers=True).collect()
    assert len(res) == len(m)
    html = render_html([r.asDict() for r in res[:5]])
    assert html.startswith("<html>") and "<table>" in html


def test_httpscan_fragment_cut_before_query(spark):
    """Review r4 follow-up: probe_matrix must apply the Go url.Parse
    cut order to the QUERY too — a '#' before the '?' means the '?' is
    inside the fragment (no query at all → no param probes), and a '#'
    after the '?' ends the query (the key is 'key', never
    'key#frag')."""
    urls = spark.createDataFrame(
        pd.DataFrame({"url": [
            "http://h.test/p#f?x=1",      # '?' inside fragment: RawQuery ""
            "http://h.test/p?key#frag",   # fragment ends the query
        ]}),
        "url string",
    )
    m = probe_matrix(spark, urls).collect()
    params = [r for r in m if r["kind"] == "param"]
    assert all(r["url"] == "http://h.test/p?key#frag" for r in params)
    assert params and all(r["target"] == "key" for r in params)


def test_httpscan_pathless_url_and_empty_test_vector(spark):
    """Review r4: a URL without a path (http://h.test?x=1 — Go
    url.Parse yields u.Path == \"\") must fire NO segment probes, not
    probe the hostname as a segment; and a vector whose Test is the
    empty string must still be detectable — the responder reflects the
    VECTOR itself, matching the O35 fallback the detector applies."""
    from unittest.mock import patch

    from nightcrawlercmd_spark.plans import httpscan as hs

    urls = spark.createDataFrame(
        pd.DataFrame({"url": ["http://h.test?x=1", "http://h.test"]}),
        "url string",
    )
    m = probe_matrix(spark, urls, scan_headers=True).collect()
    assert not any(r["kind"] == "segment" for r in m)
    # ?x=1 still fires its param probes; the bare URL fires none
    assert sum(1 for r in m if r["kind"] == "param") == 5

    # 20/28 shipped reference vectors have Test "" (mainHttpScan.go:
    # 185-188) — with one in the dim, a large URL set must FIND some
    empty_test = [{"vector": "<inj>", "test": "", "section": None}]
    many = spark.createDataFrame(
        pd.DataFrame({"url": [f"http://v{i:03d}.test/a?k={i}" for i in range(60)]}),
        "url string",
    )
    with patch.object(hs, "VECTORS", empty_test):
        res = hs.run_scan(spark, many).collect()
    found = [r for r in res if r["found"]]
    assert found, "empty-test vectors were undetectable by construction"
    # detector keys on the vector string for these rows
    assert all(r["vector"] == "<inj>" for r in found)


def test_port_scan_range_clamped(spark):
    """Review r4: range mode gets the same 0..65535 clamp as list mode
    (an end past int32 would wrap negative under the non-ANSI cast)."""
    rows = simulate_port_scan(spark, "h.test", 65530, 4_000_000_000).collect()
    assert sorted(r["port"] for r in rows) == list(range(65530, 65536))
    assert simulate_port_scan(spark, "h.test", -5, -1).collect() == []


def test_file_walk_source(spark, tmp_path):
    """O5: recursive file walk → text rows with provenance."""
    from pyspark.sql import functions as F

    (tmp_path / "a").mkdir()
    (tmp_path / "a" / "one.txt").write_text("alpha beta\n")
    (tmp_path / "two.txt").write_text("gamma\n")
    df = (
        spark.read.text(str(tmp_path), recursiveFileLookup=True)
        .withColumn("file", F.input_file_name())
        .filter(F.length(F.trim("value")) > 0)
    )
    rows = df.collect()
    assert {r["value"] for r in rows} == {"alpha beta", "gamma"}
    assert all(r["file"].endswith(".txt") for r in rows)


def test_port_scan_explicit_list_and_show_closed(spark):
    """Reference portlist mode (mainPortScan.go:37-42): explicit
    comma-list, non-numeric entries dropped like toPortList; the
    show-closed gate keeps only open ports when off."""
    rows = simulate_port_scan(spark, "h.test", port_list="80,443,x,8080").collect()
    assert sorted(r["port"] for r in rows) == [80, 443, 8080]
    # int-list form agrees with the string form
    again = simulate_port_scan(spark, "h.test", port_list=[80, 443, 8080]).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    full = simulate_port_scan(spark, "h.test", 1, 256).collect()
    open_only = simulate_port_scan(spark, "h.test", 1, 256, show_closed=False).collect()
    assert sorted(map(tuple, open_only)) == sorted(
        tuple(r) for r in full if r["open"]
    )


def test_port_scan_out_of_range_tokens_dropped(spark):
    """ADVICE r3: tokens valid for Go's 64-bit Atoi but outside the
    TCP port range ('4000000000', '-1', '70000') must be dropped, not
    crash the int32 'port' schema."""
    rows = simulate_port_scan(
        spark, "h.test", port_list="22,4000000000,-1,70000,443"
    ).collect()
    assert sorted(r["port"] for r in rows) == [22, 443]


def test_fuzzer_custom_grammar_and_validation(spark):
    """A custom grammar must flow through generate() AND its oracle
    (both hard-coded the default vectors before); a grammar missing a
    BuildLogic-'url' slot raises a usable error, not
    UNRESOLVED_COLUMN from the final projection."""
    import pytest

    v = {
        "scheme": ["ftp"],
        "host": ["x.test", "y.test"],
        "path": ["/only"],
        "payload": ["%0a", "()"],
        "unused_class": ["ignored"],  # extra classes are legal
    }
    got = {
        (r["id"], r["fuzz_url"])
        for r in fuzzing.generate(spark, 100, vectors=v).collect()
    }
    want = set(
        duckdb.connect().execute(fuzzing.oracle_sql(100, vectors=v)).fetchall()
    )
    assert got == want and len(got) == 100
    with pytest.raises(ValueError, match="scheme"):
        fuzzing.generate(spark, 10, vectors={"host": ["a"], "path": ["/"],
                                             "payload": ["x"]})
    with pytest.raises(ValueError, match="at least one option"):
        fuzzing.generate(spark, 10, vectors={"scheme": [], "host": ["a"],
                                             "path": ["/"], "payload": ["x"]})
