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
    logged = log.read_text().splitlines()
    assert len(logged) == res1["found"] > 0
    # resume: the logged names anti-join away (O46)
    res2 = main(["dns", "-domain", "ex.test", "-wordlist", str(wl),
                 "-resume", "-log", str(log)])
    assert res2["swept"] == 4 - res1["found"]
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
    rep = tmp_path / "scan.html"
    res = main(["httpscan", "-url", "http://t.test/a?x=1", "-report", str(rep)])
    assert res["probes"] > 0
    html = rep.read_text()
    assert html.startswith("<html>") and "<table>" in html
    # -input is a RAW REQUEST file (getRequest, mainHttpScan.go:243),
    # not a URL list: the scanned URL derives from its host + path
    reqf = tmp_path / "req.txt"
    reqf.write_text("GET /a/b?key=1 HTTP/1.1\nHost: raw.test\n\n")
    res2 = main(["httpscan", "-input", str(reqf)])
    assert res2["probes"] > 0
    import pytest

    with pytest.raises(SystemExit):
        main(["httpscan"])  # need -url or -input


def test_cli_httppipe_parse_and_httpserver(tmp_path):
    """httppipe parse-only summary, and the static httpserver serving
    a folder for exactly one request (reference mainHttpServer.go)."""
    import threading
    import urllib.request

    reqf = tmp_path / "req.txt"
    reqf.write_text("GET /x?a=1 HTTP/1.1\nHost: pipe.test\n\n")
    res = main(["httppipe", "-input", str(reqf)])
    assert res == {"method": "GET", "path": "/x?a=1", "host": "pipe.test"}

    (tmp_path / "hello.txt").write_text("served")
    got = {}

    def serve():
        got.update(main(["httpserver", "-folder", str(tmp_path),
                         "-listen", "127.0.0.1:18473", "-one-request"]))

    t = threading.Thread(target=serve)
    t.start()
    import time

    for _ in range(50):
        try:
            body = urllib.request.urlopen(
                "http://127.0.0.1:18473/hello.txt", timeout=2
            ).read()
            break
        except OSError:
            time.sleep(0.1)
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
    assert any("wordlist" in c for c in csvs)
