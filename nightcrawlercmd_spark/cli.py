"""Reference-compatible subcommand CLI (``python -m nightcrawlercmd_spark``).

The reference binary dispatches ``ncrawler <subcommand> -flags``
(/root/reference/main.go); this module exposes the same ten
subcommands over the Spark engine so a reference user can switch
command-for-command. Flags keep the reference's single-dash spellings
(``-url``, ``-max-pages``, ``-show-file-name``, …). Each handler is a
thin composition of the package's operators — no logic lives here —
and prints one JSON summary line.

A live SparkSession is reused when present (tests, notebooks);
otherwise one is created via ``session.get_spark`` (``-cpus``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _spark(args):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    from .session import get_spark

    return get_spark(cpus=getattr(args, "cpus", None))


def _read_words(spark, path):
    """Wordlist file → DataFrame(word) — one word per line, like
    crawlbase.ReadWordlist."""
    from pyspark.sql import functions as F

    return spark.read.text(path).select(F.col("value").alias("word"))


# ---------------------------------------------------------- handlers ----


def cmd_crawler(args) -> dict:
    """mainCrawler.go flags → EngineConfig. ``-url``/``-url-list`` seed
    the frontier; the deterministic world responder stands in for the
    network (``fetch.HttpFetcher`` + ``-http-endpoint`` for real HTTP)."""
    import tempfile

    from .sources.corpus import WorldConfig
    from .streaming.engine import CrawlEngine, EngineConfig

    import shutil

    spark = _spark(args)
    seeds_path = None
    tmp = None
    try:
        if args.url_list:
            from pyspark.sql import functions as F

            tmp = tempfile.mkdtemp(prefix="ncs_cli_seeds_")
            seeds_path = os.path.join(tmp, "seeds.parquet")
            spark.read.text(args.url_list).select(
                F.col("value").alias("url")
            ).write.mode("overwrite").parquet(seeds_path)
        elif args.url:
            import pandas as pd

            tmp = tempfile.mkdtemp(prefix="ncs_cli_seeds_")
            seeds_path = os.path.join(tmp, "seeds.parquet")
            spark.createDataFrame(pd.DataFrame({"url": [args.url]})).write.mode(
                "overwrite"
            ).parquet(seeds_path)
        cfg = EngineConfig(
            state_dir=args.storage_path,
            world=WorldConfig(
                n_hosts=args.world_hosts, base_pages=args.world_pages,
                tag=args.world_tag,
            ),
            seeds_path=seeds_path,
            scope_seed_hosts=args.scoped_to_domain,
            max_rounds=args.max_rounds,
            # reference default/sentinel: -1 = infinite (mainCrawler.go:46)
            max_pages=None if args.max_pages is None or args.max_pages < 0
            else args.max_pages,
            no_new_links=args.no_new_links,
            load_resources=args.load_resources,
            follow=args.follow or None,
            dont_follow=args.dont_follow or None,
            http_endpoint=args.http_endpoint,
            # -wait (mainCrawler.go:45, WaitBetweenRequests ms) maps to
            # the engine's per-host fallback budget/round — politeness
            # is rate-shaped here, not sleep-shaped (corpus.py:96-99);
            # anchored so the reference default 500 ms keeps the
            # engine default budget of 4 (≈ a 2 s round)
            default_budget=max(1, round(2000 / max(1, args.wait))),
        )
        stats = CrawlEngine(spark, cfg).run()
    finally:
        if tmp is not None:
            shutil.rmtree(tmp, ignore_errors=True)
    return {"fetched_total": stats["fetched_total"], "rounds": stats["rounds"],
            "wait_ms": args.wait}


def cmd_report(args) -> dict:
    """mainReport.go: read a crawl's page store, write the report suite
    as ';'-CSV into ``-reportsfolder`` (O8). ``-tagsfile`` swaps the
    HTML-validation ruleset (mainReport.go:59); wordlist.csv is gated
    behind ``-wordlist`` like the reference (mainReport.go:58,
    default FALSE — genReportWordlist only runs when set)."""
    from .plans.reports import run_report_suite
    from .sources.tableio import StateStore

    spark = _spark(args)
    store = StateStore(args.storage_path)
    last = store.last_round()
    pages = (
        store.read_appends(spark, "pages", last) if last is not None else None
    )
    if pages is None:
        return {"error": "no committed pages in " + args.storage_path}
    out = run_report_suite(
        pages,
        out_dir=args.reportsfolder,
        ruleset_path=args.tagsfile,
        include_wordlist=args.wordlist,
    )
    # fetched_total comes from the commit meta — no extra count job
    return {"reports": sorted(out),
            "pages": store.meta(last).get("fetched_total")}


def cmd_wordlist(args) -> dict:
    """mainWordlist.go end-to-end via textops.create_wordlist: whole
    files in (``wholetext`` — extractors span lines like the
    reference's ReadFile), sorted deduped entries out."""
    from pyspark.sql import functions as F

    from .operators.textops import create_wordlist

    spark = _spark(args)
    docs = (
        spark.read.text(args.input, wholetext=True, recursiveFileLookup=True)
        .select(
            F.col("value").alias("text"),
            F.input_file_name().alias("source"),
        )
    )
    templates = None
    if args.template:
        with open(args.template) as fh:
            templates = fh.read().split("\n")
    entries = create_wordlist(
        docs,
        extractor=args.extractor,
        file_col="source" if args.show_file_name else None,
        mutator=args.mutator or None,
        templates=templates,
    )
    with open(args.output, "w") as fh:  # driver sink, like the reference
        n = 0
        for row in entries.toLocalIterator():
            fh.write(row["entry"] + "\n")
            n += 1
    return {"output": args.output, "entries": n}


def cmd_dns(args) -> dict:
    """mainDNS.go: wordlist × domain sweep, optional resume log and
    XLSX report (O9/O15/O46/O58/O65)."""
    from pyspark.sql import functions as F

    from .sources.connectors import simulate_dns_sweep
    from .sources.httppipe import write_xlsx

    spark = _spark(args)
    words = _read_words(spark, args.wordlist)
    history = None
    if args.resume and args.log and os.path.exists(args.log):
        # readReport (mainDNS.go:69-84): the history key is the FIRST
        # whitespace/tab token of each log line. Only NOT-FOUND lines
        # (`word.domain.`) ever match filterLines' name keys — found
        # lines are answer records (addresses/targets), so a resumed
        # sweep skips previously-scanned MISSES, not hits (ADVICE r4)
        history = spark.read.text(args.log).select(
            F.split(F.split(F.trim(F.col("value")), "\t").getItem(0), " ")
            .getItem(0)
            .alias("name")
        )
    # reference precedence (mainDNS.go:44-55): a non-empty -typeName
    # OVERRIDES -typeNumber (whose default is 1/A)
    dns_type = args.typeName if args.typeName else args.typeNumber
    out = simulate_dns_sweep(spark, words, args.domain, history, dns_type=dns_type)
    rows = out.collect()
    names = {r["name"] for r in rows}
    found = sorted({r["name"] for r in rows if r["found"]})
    if args.report:
        # dnsReportExcel path: XLSX only, NO log write (mainDNS.go:100-104)
        write_xlsx(out, args.report, sheet_name="DNS")
    elif args.log:
        # dnsReport path (mainDNS.go:138-155): found ANSWER records plus
        # not-found NAMES (`word.domain.`) — the latter are what a later
        # -resume parses back as its skip set
        entries = sorted(r["entry"] for r in rows if r["found"] and r["entry"])
        notfound = sorted({r["name"] for r in rows if not r["found"]})
        with open(args.log, "a") as fh:
            for line in entries + notfound:
                fh.write(line + "\n")
    # a found name can carry several answer records (explode_outer),
    # so rows ≥ names
    return {"swept": len(names), "rows": len(rows), "found": len(found),
            "type": dns_type, "report": args.report}


def cmd_portscan(args) -> dict:
    """mainPortScan.go: range or ``-portlist`` probe; ``-show-closed``
    keeps refused ports in the output (O14/O45)."""
    from .sources.connectors import simulate_port_scan

    spark = _spark(args)
    out = simulate_port_scan(
        spark,
        args.target,
        start=args.start,
        end=args.end,
        port_list=args.portlist,
        show_closed=args.show_closed,
    ).collect()
    for r in out:
        print(f"{args.target}:{r['port']} "
              + ("open" if r["open"] else f"closed ({r['error']})"))
    return {"target": args.target, "probed": len(out),
            "open": sum(1 for r in out if r["open"])}


def cmd_bucketscan(args) -> dict:
    """mainBucketScan.go: words × provider templates; the provider
    config carries the reference BucketInfo shape (Name/Urls/
    NoSuchBucket/AccessDenied); ``-prefix`` is the ``{w}`` template
    (``-splitter`` is dead in the reference — '.' is hardcoded)."""
    from .sources.connectors import bucket_scan

    spark = _spark(args)
    with open(args.config) as fh:
        buckets = json.load(fh)
    chosen = [b for b in buckets if b["Name"] == args.provider]
    if not chosen:
        return {"error": f"provider {args.provider} not found"}
    urls = [args.url] if args.url else chosen[0]["Urls"]
    if args.filter:
        # the reference filters the provider's BARE url suffixes, not
        # the assembled https://{prefix}.{suffix} template
        # (mainBucketScan.go:100-102) — matching on the template made
        # e.g. `-filter https` match everything (ADVICE r4)
        urls = [u for u in urls if args.filter in u]
    providers = spark.createDataFrame(
        [
            (
                chosen[0]["Name"],
                "https://" + args.prefix + "." + u,
                int(chosen[0]["NoSuchBucket"]),
                int(chosen[0]["AccessDenied"]),
            )
            for u in urls
        ],
        "name string, url_template string, not_found_code int, denied_code int",
    )
    words = _read_words(spark, args.wordlist)
    rows = bucket_scan(spark, words, providers).collect()
    hits = [r for r in rows if r["result"] != "not found"]
    for r in hits:
        print(r["url"], r["result"])
    return {"probed": len(rows), "hits": len(hits)}


def cmd_httpscan(args) -> dict:
    """mainHttpScan.go: probe matrix × vectors over ``-url`` or an
    ``-input`` RAW REQUEST file (getRequest, mainHttpScan.go:243 —
    same contract as httppipe, not a URL list); ``-scheme``/``-host``
    override scheme and host like getRequest does. ``-vectors`` loads a
    custom attack-vector file (reference JSON shape: Vector/Test/
    Section; mainHttpScan.go:67,94-97); ``-output`` dumps each probe's
    response body into the folder (mainHttpScan.go:194-199, O12 —
    file names are deterministic probe hashes rather than wall-clock
    UnixNano, so runs are reproducible). HTML report like the
    reference template, default report.html (O10/O35/O55-O57)."""
    from urllib.parse import urlsplit, urlunsplit

    import pandas as pd

    from .plans.httpscan import render_html, run_scan

    spark = _spark(args)
    if args.input:
        from .sources.httppipe import parse_raw_request

        with open(args.input) as fh:
            req = parse_raw_request(fh.read())
        host = args.host or req.headers.get("host", "localhost")
        url = f"{args.scheme or 'http'}://{host}{req.path}"
    elif args.url:
        url = args.url
        if args.host or args.scheme:
            parts = urlsplit(url)
            url = urlunsplit((
                args.scheme or parts.scheme, args.host or parts.netloc,
                parts.path, parts.query, parts.fragment,
            ))
    else:
        raise SystemExit("httpscan: need -url or -input")
    urls = spark.createDataFrame(pd.DataFrame({"url": [url]}))
    vectors = None
    if args.vectors:
        from .plans.httpscan import load_vectors

        vectors = load_vectors(spark, args.vectors)
    res = run_scan(
        spark, urls, scan_headers=args.scanheader, vectors=vectors,
        keep_body=bool(args.output),
    )
    rows = [r.asDict() for r in res.collect()]
    dumped = 0
    if args.output:
        from .functions.determinism import h64

        os.makedirs(args.output, exist_ok=True)
        for r in rows:
            name = str(h64("dump", r["url"], r["kind"], r["target"], r["vector"]))
            with open(os.path.join(args.output, name), "w") as fh:
                fh.write(r.pop("body") or "")
            r["file_path"] = os.path.join(args.output, name)
            dumped += 1
    if args.report:
        with open(args.report, "w") as fh:
            fh.write(render_html(rows))
    return {"probes": len(rows),
            "found": sum(1 for r in rows if r.get("found")),
            "report": args.report, "dumped": dumped}


def cmd_fuzzer(args) -> dict:
    """mainFuzzer.go: seeded deterministic generation from the
    FuzzingInput config (Vectors/BuildLogic/Seed/Iterations, O79);
    random-key mode when BuildLogic is empty."""
    from .operators import fuzzing

    spark = _spark(args)
    with open(args.input) as fh:
        fi = json.load(fh)
    kw = dict(
        iterations=int(fi.get("Iterations", 1000)),
        seed=int(fi.get("Seed", fuzzing.DEFAULT_SEED)),
        vectors=fi.get("Vectors"),
    )
    vecs = fi.get("Vectors") or {}
    # BuildLogic mode needs the url grammar's four classes (empty
    # Vectors falls back to the package defaults, which have them);
    # anything else — the reference ships arbitrary class names like
    # "7"/"b" — runs the random-key mode over the same vector map
    classes_ok = not vecs or not (
        {"scheme", "host", "path", "payload"} - set(vecs)
    )
    if fi.get("BuildLogic") and classes_ok:
        out = fuzzing.generate(spark, **kw)
    else:
        out = fuzzing.generate_random(spark, **kw)
    case_col = "fuzz_url" if "fuzz_url" in out.columns else "fuzz_text"
    # generation order is the `id` column — the action stage must see
    # payloads in reference iteration order regardless of partitioning
    rows = out.orderBy("id").collect()
    if args.command:
        # action stage (mainFuzzer.go:49-66): per iteration, write the
        # payload to -output (when set), substitute EVERY occurrence of
        # -param in each trailing-argv element with the payload
        # (strings.Replace n=-1), exec the command, stop consuming on
        # failure like the reference's `return false`. A driver-side
        # subprocess per payload — the same real-side-effect class as
        # pipe_request's socket; the payload STREAM stays distributed.
        import subprocess

        ran = failed = 0
        for r in rows:
            payload = r[case_col]
            if args.output:
                try:
                    with open(args.output, "w") as fh:
                        fh.write(payload)
                except OSError:
                    failed += 1
                    continue
            argv = [
                a.replace(args.param, payload) if args.param else a
                for a in args.command
            ]
            try:
                subprocess.run(argv, check=True)
                ran += 1
            except (OSError, subprocess.CalledProcessError):
                failed += 1
        return {"cases": len(rows), "ran": ran, "failed": failed,
                "output": args.output}
    if args.output:
        # no command: keep the whole generated stream (one case per
        # line) — a deliberate divergence from the reference, whose
        # no-command invocation panics on args[0] (mainFuzzer.go:62)
        with open(args.output, "w") as fh:
            for r in rows:
                fh.write(r[case_col] + "\n")
    return {"cases": len(rows), "output": args.output}


def cmd_httppipe(args) -> dict:
    """mainHttpPipe.go: parse a raw HTTP request file; fire it over a
    real socket when ``-host`` is given (O7), optional XLSX out.
    Repeated ``-H "Key: Value"`` SET (replace) headers after parsing,
    like the reference's header loop (mainHttpPipe.go:53-60); a
    colon-less value sets the header to the empty string."""
    from .sources.httppipe import parse_raw_request, pipe_request, write_xlsx

    with open(args.input) as fh:
        req = parse_raw_request(fh.read(), default_host=args.host or "localhost")
    for header in args.headers:
        k, _, v = header.partition(":")
        req.headers[k.strip().lower()] = v.strip()
    summary = {"method": req.method, "path": req.path,
               "host": req.headers.get("host")}
    if args.host:
        resp = pipe_request(req, args.host, scheme=args.scheme)
        summary["status"] = resp["status_code"]
        if args.output:
            spark = _spark(args)
            flat = [
                (resp["status_code"], resp["url"], len(resp["body"] or b""))
            ]
            write_xlsx(
                spark.createDataFrame(
                    flat, "status_code int, url string, body_len int"
                ),
                args.output,
                sheet_name="Pipe",
            )
    return summary


def cmd_httpserver(args) -> dict:
    """mainHttpServer.go: serve ``-folder`` statically on ``-listen``
    (stdlib handler; the package's WorldHTTPServer remains the
    virtual-hosted fixture for crawl tests). Blocks until killed;
    ``-one-request`` exits after a single request (tests)."""
    import functools
    from http.server import SimpleHTTPRequestHandler, ThreadingHTTPServer

    host, _, port = args.listen.rpartition(":")
    handler = functools.partial(
        SimpleHTTPRequestHandler, directory=args.folder
    )
    srv = ThreadingHTTPServer((host or "127.0.0.1", int(port)), handler)
    print(json.dumps({"listening": f"{srv.server_address[0]}:{srv.server_address[1]}",
                      "folder": args.folder}), flush=True)
    if args.one_request:
        srv.handle_request()
    else:  # pragma: no cover - interactive serve loop
        srv.serve_forever()
    srv.server_close()
    return {"served": True}


# ---------------------------------------------------------- dispatch ----


def _parse_bool(s: str) -> bool:
    return s.strip().lower() not in ("false", "0", "f", "no")


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(prog="nightcrawlercmd_spark")
    ap.add_argument("-cpus", default=None, help="local[N] when no session is live")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawler")
    c.add_argument("-url", default=None)
    c.add_argument("-url-list", dest="url_list", default=None)
    c.add_argument("-storage-path", dest="storage_path", required=True)
    # -1 = infinite, the reference default (mainCrawler.go:46)
    c.add_argument("-max-pages", dest="max_pages", type=int, default=-1)
    c.add_argument("-max-rounds", dest="max_rounds", type=int, default=16)
    c.add_argument("-no-new-links", dest="no_new_links", action="store_true")
    c.add_argument("-load-resources", dest="load_resources", action="store_true")
    # reference DEFAULT is true (mainCrawler.go:54) — Go users disable
    # with `-scoped-to-domain=false`; accept an optional bool value
    c.add_argument(
        "-scoped-to-domain", dest="scoped_to_domain",
        nargs="?", const=True, default=True, type=_parse_bool,
    )
    c.add_argument("-follow", action="append", default=[])
    c.add_argument("-dont-follow", dest="dont_follow", action="append", default=[])
    c.add_argument("-http-endpoint", dest="http_endpoint", default=None)
    c.add_argument("-world-hosts", dest="world_hosts", type=int, default=10)
    c.add_argument("-world-pages", dest="world_pages", type=int, default=10)
    c.add_argument("-world-tag", dest="world_tag", default="cli")
    # reference politeness flag (mainCrawler.go:45): ms between
    # requests, default 500 — mapped to budget/round in cmd_crawler
    c.add_argument("-wait", type=int, default=500)
    c.set_defaults(fn=cmd_crawler)

    r = sub.add_parser("report")
    r.add_argument("-storage-path", dest="storage_path", required=True)
    # reference default: always writes ./report (mainReport.go)
    r.add_argument("-reportsfolder", default="./report")
    # custom HTML-validation ruleset; None = package default
    # (reference default ./config/tags.json, mainReport.go:59)
    r.add_argument("-tagsfile", default=None)
    # wordlist.csv only under -wordlist, reference default FALSE
    # (mainReport.go:58)
    r.add_argument("-wordlist", action="store_true")
    r.set_defaults(fn=cmd_report)

    w = sub.add_parser("wordlist")
    w.add_argument("-input", required=True)
    w.add_argument("-output", default="wordlist.txt")
    w.add_argument("-extractor", default="word")
    w.add_argument("-mutator", default="")
    w.add_argument("-template", default=None)
    w.add_argument("-show-file-name", dest="show_file_name", action="store_true")
    w.set_defaults(fn=cmd_wordlist)

    d = sub.add_parser("dns")
    d.add_argument("-domain", required=True)
    d.add_argument("-wordlist", required=True)
    # reference defaults (mainDNS.go:31-34): typeName EMPTY (typeNumber
    # 1/A applies unless a name is given), log always dnsscan.log
    d.add_argument("-typeName", default="")
    d.add_argument("-typeNumber", type=int, default=1)
    d.add_argument("-resume", action="store_true")
    d.add_argument("-log", default="dnsscan.log")
    d.add_argument("-report", default=None)
    d.set_defaults(fn=cmd_dns)

    p = sub.add_parser("portscan")
    p.add_argument("-target", required=True)
    p.add_argument("-start", type=int, default=79)
    p.add_argument("-end", type=int, default=81)
    p.add_argument("-portlist", default=None)
    p.add_argument("-show-closed", dest="show_closed", action="store_true")
    p.set_defaults(fn=cmd_portscan)

    b = sub.add_parser("bucketscan")
    b.add_argument("-wordlist", required=True)
    b.add_argument("-provider", default="aws")
    b.add_argument("-prefix", default="{w}")
    b.add_argument("-config", required=True)
    b.add_argument("-filter", default=None)
    b.add_argument("-url", default=None)
    # accepted for drop-in compatibility (mainBucketScan.go:43,45);
    # the engine probes in parallel batches, not with per-request
    # sleeps, and prints hits unconditionally — both are no-ops here
    b.add_argument("-delay", type=int, default=100)
    b.add_argument("-verbose", type=int, default=0)
    b.set_defaults(fn=cmd_bucketscan)

    h = sub.add_parser("httpscan")
    h.add_argument("-url", default=None)
    h.add_argument("-input", default=None, help="raw HTTP request file")
    h.add_argument("-host", default=None)
    h.add_argument("-scheme", default="")
    h.add_argument("-scanheader", action="store_true")
    # the reference ALWAYS writes the HTML report, default report.html
    # (mainHttpScan.go:66) — a None default silently dropped it
    h.add_argument("-report", default="report.html")
    # custom attack-vector file (mainHttpScan.go:67); None = built-ins
    h.add_argument("-vectors", default=None)
    # per-probe response-body dump folder (mainHttpScan.go:70,194-199)
    h.add_argument("-output", default=None)
    h.set_defaults(fn=cmd_httpscan)

    f = sub.add_parser("fuzzer")
    f.add_argument("-input", required=True)
    f.add_argument("-output", default=None)
    # -param + trailing argv: the per-iteration action stage
    # (mainFuzzer.go:31,49-66)
    f.add_argument("-param", default="")
    f.add_argument("command", nargs=argparse.REMAINDER)
    f.set_defaults(fn=cmd_fuzzer)

    pp = sub.add_parser("httppipe")
    pp.add_argument("-input", required=True)
    pp.add_argument("-host", default=None)
    pp.add_argument("-scheme", default="http")
    pp.add_argument("-output", default=None)
    # repeated header overrides (mainHttpPipe.go:37,53-60)
    pp.add_argument("-H", dest="headers", action="append", default=[])
    pp.set_defaults(fn=cmd_httppipe)

    hs = sub.add_parser("httpserver")
    hs.add_argument("-folder", default=".")
    hs.add_argument("-listen", default="127.0.0.1:0")
    hs.add_argument("-one-request", dest="one_request", action="store_true")
    hs.set_defaults(fn=cmd_httpserver)

    return ap


def main(argv: list[str] | None = None) -> dict:
    args = build_parser().parse_args(argv if argv is not None else sys.argv[1:])
    out = args.fn(args)
    print(json.dumps(out))
    return out
