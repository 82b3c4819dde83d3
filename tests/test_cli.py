"""Subcommand CLI dispatcher (reference main.go parity surface).

Each subcommand is smoke-driven through cli.main(argv) inside the
shared session (the CLI reuses a live SparkSession), asserting the
reference-shaped side effects: wordlist text out, DNS xlsx + resume
log, portscan listing, bucketscan provider config, httpscan HTML
report, fuzzer output file, crawler state dir + report CSVs.
"""

import json
import os
import zipfile

from nightcrawlercmd_spark.cli import main


def test_cli_wordlist_showfile_mutator(spark, tmp_path):
    (tmp_path / "a.txt").write_text("Alpha beta\n")
    (tmp_path / "b.txt").write_text("alpha gamma\n")
    tpl = tmp_path / "tpl.txt"
    tpl.write_text("<word>\npre-<word>\n")
    out = tmp_path / "wl.txt"
    res = main([
        "wordlist", "-input", str(tmp_path), "-output", str(out),
        "-extractor", "word", "-mutator", "username",
        "-template", str(tpl), "-show-file-name",
    ])
    lines = out.read_text().splitlines()
    assert res["entries"] == len(lines) > 0
    assert lines == sorted(lines) == sorted(set(lines))
    # the file tag reached the mutator (reference interplay): some
    # variant joins the word with its file's basename-derived runs
    assert any("txt" in ln and "alpha" in ln for ln in lines)
    assert any(ln.startswith("pre-") for ln in lines)


def test_cli_portscan_and_fuzzer(spark, tmp_path, capsys):
    res = main(["portscan", "-target", "h.test", "-portlist",
                "80,443,notaport,99999999", "-show-closed"])
    assert res["probed"] == 2  # junk + out-of-range dropped like Atoi
    assert "h.test:80" in capsys.readouterr().out

    cfgp = tmp_path / "fuzz.json"
    cfgp.write_text(json.dumps({
        "Vectors": {"a": ["x", "y"], "b": ["1", "2"]},
        "BuildLogic": "{document.a}{document.b}",
        "Seed": 7, "Iterations": 25,
    }))
    outp = tmp_path / "fuzz.txt"
    res = main(["fuzzer", "-input", str(cfgp), "-output", str(outp)])
    assert res["cases"] == 25
    assert len(outp.read_text().splitlines()) == 25


def test_cli_dns_resume_and_xlsx(spark, tmp_path):
    wl = tmp_path / "words.txt"
    wl.write_text("www\nmail\ndev\napi\n")
    log = tmp_path / "dns.log"
    rep = tmp_path / "dns.xlsx"
    res1 = main(["dns", "-domain", "ex.test", "-wordlist", str(wl),
                 "-log", str(log), "-report", str(rep)])
    assert res1["swept"] == 4
    assert res1["type"] == 1  # reference default: typeNumber 1 (A)
    assert zipfile.is_zipfile(rep)  # real SpreadsheetML package
    # dnsReportExcel path writes NO log (mainDNS.go:100-104, ADVICE r4)
    assert not log.exists()
    # log mode: found ANSWER records + not-found NAMES (dnsReport)
    res1b = main(["dns", "-domain", "ex.test", "-wordlist", str(wl),
                  "-log", str(log)])
    logged = log.read_text().splitlines()
    n_notfound = 4 - res1b["found"]
    assert res1b["found"] > 0 and n_notfound > 0
    assert sum(1 for ln in logged if ln.endswith(".ex.test.")) >= n_notfound
    # resume skips previously-scanned MISSES — readReport's first-token
    # keys only ever match the `word.domain.` not-found lines, so the
    # resumed sweep re-resolves exactly the found names (ADVICE r4)
    res2 = main(["dns", "-domain", "ex.test", "-wordlist", str(wl),
                 "-resume", "-log", str(log)])
    assert res2["swept"] == res1b["found"]
    # reference precedence (mainDNS.go:44-55): a non-empty -typeName
    # OVERRIDES -typeNumber
    res3 = main(["dns", "-domain", "ex.test", "-wordlist", str(wl),
                 "-typeName", "MX", "-typeNumber", "28",
                 "-log", str(tmp_path / "other.log")])
    assert res3["type"] == "MX"


def test_cli_bucketscan_reference_config(spark, tmp_path, capsys):
    wl = tmp_path / "words.txt"
    wl.write_text("\n".join(f"w{i}" for i in range(30)) + "\n")
    cfg = tmp_path / "buckets.json"
    cfg.write_text(json.dumps([
        {"Name": "aws", "Urls": ["s3.test", "s3-eu.test"],
         "NoSuchBucket": 404, "AccessDenied": 403},
        {"Name": "other", "Urls": ["o.test"],
         "NoSuchBucket": 400, "AccessDenied": 401},
    ]))
    res = main(["bucketscan", "-wordlist", str(wl), "-provider", "aws",
                "-config", str(cfg), "-filter", "s3-eu"])
    # provider filter keeps only the s3-eu suffix (O47): 30 words × 1
    assert res["probed"] == 30
    out = capsys.readouterr().out
    assert "s3-eu.test" in out or res["hits"] == 0


def test_cli_httpscan_html_report(spark, tmp_path):
    from nightcrawlercmd_spark.cli import build_parser

    rep = tmp_path / "scan.html"
    res = main(["httpscan", "-url", "http://t.test/a?x=1", "-report", str(rep)])
    assert res["probes"] > 0
    html = rep.read_text()
    assert html.startswith("<html>") and "<table>" in html
    # the reference ALWAYS writes a report, default report.html
    # (mainHttpScan.go:66, ADVICE r4) — assert the default without
    # polluting the CWD
    ns = build_parser().parse_args(["httpscan", "-url", "http://x.test/"])
    assert ns.report == "report.html"
    # -input is a RAW REQUEST file (getRequest, mainHttpScan.go:243),
    # not a URL list: the scanned URL derives from its host + path;
    # -host overrides it like getRequest (mainHttpScan.go:254-256)
    reqf = tmp_path / "req.txt"
    reqf.write_text("GET /a/b?key=1 HTTP/1.1\nHost: raw.test\n\n")
    res2 = main(["httpscan", "-input", str(reqf),
                 "-report", str(tmp_path / "r2.html")])
    assert res2["probes"] > 0
    import pytest

    with pytest.raises(SystemExit):
        main(["httpscan", "-report", str(tmp_path / "r3.html")])


def test_cli_httpscan_vectors_host_output(spark, tmp_path):
    """-vectors custom file (reference JSON shape), -host override,
    -output per-probe body dump (mainHttpScan.go:63-70,194-199)."""
    import json as _json
    import os as _os

    vecf = tmp_path / "vectors.json"
    vecf.write_text(_json.dumps([
        {"Vector": "<v1>", "Test": "<v1>", "SQLInjection": False,
         "Section": ""},
        {"Vector": "zzseg", "Test": "", "SQLInjection": True,
         "Section": "urlsegment"},
    ]))
    dump = tmp_path / "bodies"
    rep = tmp_path / "scan.html"
    res = main(["httpscan", "-url", "http://orig.test/seg?x=1",
                "-host", "override.test", "-vectors", str(vecf),
                "-output", str(dump), "-report", str(rep)])
    # 2 vectors × (1 query key + 1 path segment) = 4 probes
    assert res["probes"] == 4
    assert res["dumped"] == 4
    files = _os.listdir(dump)
    assert len(files) == 4
    assert all((dump / f).read_text().startswith("<html>") for f in files)
    # the host override reached the probe URLs
    assert "override.test" in rep.read_text()
    assert "orig.test" not in rep.read_text()


def test_cli_httppipe_parse_and_httpserver(tmp_path, capsys):
    """httppipe parse-only summary, and the static httpserver serving
    a folder for exactly one request (reference mainHttpServer.go)."""
    import threading
    import time
    import urllib.request

    reqf = tmp_path / "req.txt"
    reqf.write_text("GET /x?a=1 HTTP/1.1\nHost: pipe.test\n\n")
    res = main(["httppipe", "-input", str(reqf)])
    assert res == {"method": "GET", "path": "/x?a=1", "host": "pipe.test"}
    # -H sets (replaces) headers after parsing (mainHttpPipe.go:53-60);
    # a colon-less -H sets the empty string
    res_h = main(["httppipe", "-input", str(reqf),
                  "-H", "Host: other.test", "-H", "X-Flag"])
    assert res_h["host"] == "other.test"

    # bind port 0 and parse the actual address from the server's
    # printed listening line — a fixed port is flaky under parallel
    # test runs, and body must predate the loop so an all-attempts
    # failure asserts instead of raising NameError (ADVICE r4)
    (tmp_path / "hello.txt").write_text("served")
    got = {}

    def serve():
        got.update(main(["httpserver", "-folder", str(tmp_path),
                         "-listen", "127.0.0.1:0", "-one-request"]))

    t = threading.Thread(target=serve)
    t.start()
    body = None
    addr = None
    seen_out = ""
    for _ in range(200):
        if addr is None:
            seen_out += capsys.readouterr().out
            for ln in seen_out.splitlines():
                if '"listening"' in ln:
                    addr = json.loads(ln)["listening"]
        if addr is not None:
            try:
                body = urllib.request.urlopen(
                    f"http://{addr}/hello.txt", timeout=2
                ).read()
                break
            except OSError:
                pass
        time.sleep(0.05)
    t.join(timeout=10)
    assert body == b"served" and got == {"served": True}


def test_cli_crawler_then_report(spark, tmp_path):
    state = tmp_path / "state"
    # scoping defaults ON like the reference (mainCrawler.go:54) and
    # -max-pages defaults to the -1 infinite sentinel — both omitted
    res = main(["crawler", "-storage-path", str(state), "-max-rounds", "3",
                "-world-hosts", "4", "-world-pages", "8",
                "-world-tag", "cli-t"])
    assert res["fetched_total"] > 0
    reports = tmp_path / "reports"
    rep = main(["report", "-storage-path", str(state),
                "-reportsfolder", str(reports)])
    assert rep["pages"] == res["fetched_total"]
    csvs = os.listdir(reports)
    # wordlist.csv is gated behind -wordlist, reference default FALSE
    # (mainReport.go:58,262)
    assert not any("wordlist" in c for c in csvs)
    assert any("querykeys" in c for c in csvs)
    rep2 = main(["report", "-storage-path", str(state),
                 "-reportsfolder", str(reports), "-wordlist"])
    assert any("wordlist" in c for c in os.listdir(reports))
    assert "wordlist" in rep2["reports"]
    # -wait is the reference politeness flag, accepted and mapped to
    # budget/round (mainCrawler.go:45) — a -wait crawl must run
    res_w = main(["crawler", "-storage-path", str(tmp_path / "state_w"),
                  "-max-rounds", "2", "-world-hosts", "3",
                  "-world-pages", "6", "-world-tag", "cli-w",
                  "-wait", "1000"])
    assert res_w["fetched_total"] > 0 and res_w["wait_ms"] == 1000


def test_cli_fuzzer_action_stage(tmp_path):
    """-param + trailing argv: per-iteration command exec with the
    payload substituted into EVERY argv occurrence, payloads arriving
    in reference iteration order, -output rewritten per iteration
    (mainFuzzer.go:31,49-66; seed 40039 fixture)."""
    cfgp = tmp_path / "fuzz.json"
    cfgp.write_text(json.dumps({
        "Vectors": {"a": ["x", "y"], "b": ["1", "2"]},
        "BuildLogic": "{document.a}{document.b}",
        "Seed": 40039, "Iterations": 8,
    }))
    outp = tmp_path / "payload.txt"
    sink = tmp_path / "seen.txt"
    res = main(["fuzzer", "-input", str(cfgp), "-output", str(outp),
                "-param", "FUZZ",
                "sh", "-c", f"printf '%s\\n' 'FUZZ' >> {sink}"])
    assert res["cases"] == 8 and res["ran"] == 8 and res["failed"] == 0
    seen = sink.read_text().splitlines()
    # expected order = the generator's own id-ordered stream
    main(["fuzzer", "-input", str(cfgp),
          "-output", str(tmp_path / "all.txt")])
    expected_lines = (tmp_path / "all.txt").read_text().splitlines()
    assert seen == expected_lines and len(seen) == 8
    # -output holds the LAST iteration's payload (rewritten each time)
    assert outp.read_text() == expected_lines[-1]
    assert res["output"] == str(outp)
