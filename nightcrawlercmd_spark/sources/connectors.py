"""Network-connector analogs: DNS sweep, port scan, bucket scan.

The reference's dns/portscan/bucketscan subcommands are sequential
network loops (mainDNS.go:86-106, mainPortScan.go:14-56,
mainBucketScan.go:95-137). The engine expresses each as a dataflow —
wordlist/sequence source → resume anti-join → cross join with a
broadcast dimension → mapInPandas connector → classification — with a
deterministic synthetic responder standing in for the network (this
sandbox is offline; a real deployment swaps the responder inside the
same batch function).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import h64, hint


# ------------------------------------------------------------- DNS --------

# public IANA RR type numbers (RFC 1035 §3.2.2 and successors) — the
# reference resolves `-typeName` through the same mapping
# (crawlbase.DnsTypesByName, mainDNS.go:33-34,48-55)
DNS_TYPES_BY_NAME = {
    "A": 1, "NS": 2, "CNAME": 5, "SOA": 6, "PTR": 12, "MX": 15,
    "TXT": 16, "AAAA": 28, "SRV": 33, "ANY": 255,
}


def simulate_dns_sweep(
    spark: SparkSession,
    words: DataFrame,
    domain: str,
    history: DataFrame | None = None,
    dns_type: str | int = 1,
) -> DataFrame:
    """word × domain template → resolve → found/not-found rows
    (O58 name build, O46 resume anti-join, O65 found aggregation).

    words: DataFrame(word string); history: DataFrame(name string).

    Names carry the reference's trailing dot (absolute FQDN form:
    ``word.domain.``, mainDNS.go:112) — the resume history set stores
    that form, so a dot-less build would anti-join against nothing and
    silently re-resolve every already-scanned name.

    ``dns_type`` selects the query record type (VERDICT r3 item 6):
    a name (`-typeName`, looked up in the public RR-type table; an
    unknown name raises like the reference's log.Fatal,
    mainDNS.go:48-55) or a number (`-typeNumber`, default 1 = A). The
    responder keys its deterministic answers on (name, type), so an
    AAAA sweep resolves a different subset than an A sweep — as
    distinct record types do."""
    if isinstance(dns_type, str):
        if dns_type not in DNS_TYPES_BY_NAME:
            raise ValueError(
                f"dnsType {dns_type!r} not found; one of "
                f"{sorted(DNS_TYPES_BY_NAME)}"
            )
        type_nr = DNS_TYPES_BY_NAME[dns_type]
    else:
        type_nr = int(dns_type)
    names = words.select(
        F.concat(F.trim("word"), F.lit("."), F.lit(domain), F.lit(".")).alias("name")
    ).filter(F.length(F.trim("word")) > 0).distinct()
    if history is not None:
        names = names.join(history.select("name"), "name", "left_anti")

    def resolve_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for name in pdf["name"]:
                # deterministic fake resolver: ~40% of (name, type)
                # pairs resolve; answers are type-shaped (address for
                # A/AAAA-style queries, target names for the rest)
                if h64("dns", name, type_nr) % 5 < 2:
                    n = hint(1, 3, "dnsn", name, type_nr)
                    if type_nr == 28:
                        entries = [
                            "2001:db8::%x:%x"
                            % (h64("ip6a", name, i) % 0x10000,
                               h64("ip6b", name, i) % 0x10000)
                            for i in range(n)
                        ]
                    elif type_nr in (1, 255):
                        entries = [
                            f"10.{h64('ip', name, i) % 256}."
                            f"{h64('ip2', name, i) % 256}."
                            f"{h64('ip3', name, i) % 256}"
                            for i in range(n)
                        ]
                    else:
                        entries = [
                            f"rr{type_nr}-{h64('tgt', name, i) % 100:02d}.{name}"
                            for i in range(n)
                        ]
                else:
                    entries = []
                rows.append(
                    {"name": name, "type_number": type_nr, "entries": entries}
                )
            yield pd.DataFrame(rows)

    resolved = names.repartition(max(spark.sparkContext.defaultParallelism, 4)).mapInPandas(
        resolve_batch, schema="name string, type_number int, entries array<string>"
    )
    return resolved.select(
        "name",
        "type_number",
        (F.size("entries") > 0).alias("found"),
        F.explode_outer("entries").alias("entry"),
    )


# --------------------------------------------------------- port scan ------

def simulate_port_scan(
    spark: SparkSession,
    host: str,
    start: int = 79,
    end: int = 81,
    port_list: str | list[int] | None = None,
    show_closed: bool = True,
) -> DataFrame:
    """Port-probe connector (O12/O14).

    Two source modes mirroring the reference (mainPortScan.go:37-42):
    with ``port_list`` (a ``"80,443,8080"`` string or an int list) the
    explicit list is scanned — non-numeric entries are silently dropped
    like ``toPortList`` (mainPortScan.go:46-56) — otherwise the
    contiguous ``[start, end]`` range. ``show_closed=False`` keeps only
    open ports, the reference's default output gate (its AfterScan
    prints a port only when ``pi.Open || *showClosed``,
    mainPortScan.go:28-33; this API defaults to True because the full
    probe table is the more useful relational form — the reference CLI
    default is the filtered view)."""
    if port_list is not None:
        if isinstance(port_list, str):
            import re as _re

            parsed = []
            for tok in port_list.split(","):
                # Go strconv.Atoi semantics: optional sign + digits
                # only — no whitespace, no '8_0' (Python int() would
                # accept both); errors are skipped (toPortList)
                if _re.fullmatch(r"[+-]?[0-9]+", tok):
                    parsed.append(int(tok))
        else:
            parsed = [int(p) for p in port_list]
        # Go's 64-bit Atoi keeps tokens like '4000000000' that the
        # reference would then fail to dial; the 'port int' schema
        # would crash on them instead (ADVICE r3) — drop anything
        # outside the valid TCP port range before building the frame
        parsed = [p for p in parsed if 0 <= p <= 65535]
        ports = spark.createDataFrame(
            [(p,) for p in parsed], "port int"
        )
    else:
        # same 0..65535 clamp as list mode: an out-of-range start/end
        # would emit undialable probe rows (and an end past int32 wraps
        # negative under the non-ANSI cast) instead of being dropped
        lo, hi = max(start, 0), min(end, 65535)
        ports = spark.range(lo, max(hi + 1, lo)).select(
            F.col("id").cast("int").alias("port")
        )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for port in pdf["port"]:
                open_ = h64("port", host, int(port)) % 17 == 0
                rows.append(
                    {
                        "port": int(port),
                        "open": bool(open_),
                        "size": int(hint(16, 512, "psz", host, int(port))) if open_ else 0,
                        "error": None if open_ else "connection refused",
                    }
                )
            yield pd.DataFrame(rows)

    scanned = ports.repartition(
        max(spark.sparkContext.defaultParallelism, 4)
    ).mapInPandas(probe, schema="port int, open boolean, size int, error string")
    return scanned if show_closed else scanned.filter(F.col("open"))


# -------------------------------------------------------- bucket scan -----

def bucket_scan(
    spark: SparkSession,
    words: DataFrame,
    providers: DataFrame,
    provider_filter: str | None = None,
) -> DataFrame:
    """words × providers cross join → probe → status classification
    (O54 cross join, O34 {w} substitution, O45 classifier).

    providers: DataFrame(name string, url_template string /*…{w}…*/,
    not_found_code int, denied_code int) — broadcast dimension.
    ``provider_filter`` keeps only providers whose url_template contains
    the substring, applied BEFORE the cross join (O47; reference
    `-filter`, mainBucketScan.go:100-103 skips non-matching URL
    suffixes before the word loop).
    """
    if provider_filter:
        providers = providers.filter(
            F.contains(F.col("url_template"), F.lit(provider_filter))
        )
    probes = words.select(F.trim("word").alias("word")).filter(
        F.length("word") > 0
    ).crossJoin(F.broadcast(providers)).select(
        "word",
        "name",
        F.replace(F.col("url_template"), F.lit("{w}"), F.col("word")).alias("url"),
        "not_found_code",
        "denied_code",
    )

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf[["word", "name", "url", "not_found_code", "denied_code"]].copy()
            codes = []
            for url, nf, dn in zip(pdf["url"], pdf["not_found_code"], pdf["denied_code"]):
                r = h64("bucket", url) % 10
                codes.append(200 if r == 0 else (int(dn) if r <= 2 else int(nf)))
            out["status_code"] = codes
            yield out

    scanned = probes.repartition(max(spark.sparkContext.defaultParallelism, 4)).mapInPandas(
        probe,
        schema=(
            "word string, name string, url string, not_found_code int, "
            "denied_code int, status_code int"
        ),
    )
    # mainBucketScan.go:117-134: 404→skip, 403→denied, else found
    return scanned.select(
        "word",
        "name",
        "url",
        "status_code",
        F.when(F.col("status_code") == F.col("not_found_code"), "not found")
        .when(F.col("status_code") == F.col("denied_code"), "access denied")
        .otherwise("found")
        .alias("result"),
    )
