"""HTTP attack-surface scan analog (reference `httpscan`, mainHttpScan.go).

The reference builds a probe matrix — every query param × vector,
every header × vector, every path segment × section-eligible vector
(mainHttpScan.go:118-165, O55-O57) — fires them sequentially, and
flags responses containing the vector's test string (O35), rendering
an HTML report (O10). The engine builds the same matrix relationally
(broadcast vector dim × posexploded URL parts), probes via a
deterministic batch connector, and renders the report driver-side from
the collected (small) result.

The vector dimension is our own minimal set shaped like D8
(attackVector{Vector, Test, SQLInjection, Section}).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.determinism import h64, hint
from ..operators.links import host_of_col, path_of_col

# our own vectors (shape of D8; values ours, not the reference config's)
VECTORS = [
    {"vector": "<probe>", "test": "<probe>", "section": None},
    {"vector": "'--", "test": "syntax error", "section": None},
    {"vector": "%0d%0aX-Inj: 1", "test": "X-Inj", "section": "header"},
    {"vector": "../etc/hosts", "test": "localhost", "section": "urlsegment"},
    {"vector": "{{9*9}}", "test": "81", "section": "urlsegment"},
]


def vectors_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        pd.DataFrame(VECTORS), schema="vector string, test string, section string"
    )


def load_vectors(spark: SparkSession, path: str) -> DataFrame:
    """Custom attack-vector file → vector dim, accepting the reference
    config shape — a JSON array of {Vector, Test, SQLInjection,
    Section} objects (mainHttpScan.go:40-45,94-97; SQLInjection is dead
    in the reference scan loop, ignored here too). Lower-case keys are
    accepted so a dumped vectors_df round-trips."""
    import json

    with open(path) as fh:
        raw = json.load(fh)
    rows = [
        {
            "vector": v.get("Vector", v.get("vector", "")),
            "test": v.get("Test", v.get("test")) or None,
            "section": v.get("Section", v.get("section")) or None,
        }
        for v in raw
    ]
    return spark.createDataFrame(
        pd.DataFrame(rows), schema="vector string, test string, section string"
    )


def probe_matrix(
    spark: SparkSession,
    urls: DataFrame,
    scan_headers: bool = False,
    vectors: DataFrame | None = None,
) -> DataFrame:
    """urls(url string) × vectors → one probe per (url part, vector).

    Three branches (O55 params, O56 headers, O57 path segments), each a
    cross join against the broadcast vector dim; section filter O49.
    ``vectors`` swaps in a custom dim (the reference ``-vectors`` file,
    load_vectors) — same (vector, test, section) schema."""
    vecs = F.broadcast(vectors if vectors is not None else vectors_df(spark))
    # fragment cut FIRST (Go url.Parse order, like host_of_col/
    # path_of_col): a '#' before the '?' means the '?' is inside the
    # fragment and there is NO query ('/p#f?x=1' → RawQuery ""), and a
    # '#' after it ends the query ('/p?key#frag' → key, not key#frag)
    prefrag = F.substring_index(F.col("url"), "#", 1)
    base = urls.select(
        F.col("url"),
        host_of_col(F.col("url")).alias("host"),
        path_of_col(F.col("url")).alias("path"),
        # everything after the FIRST '?' — substring_index with -1 would
        # take after the LAST one and mangle ?next=/login?retry=1
        prefrag.substr(
            F.instr(prefrag, "?") + F.lit(1), F.length("url")
        ).alias("query"),
        prefrag.contains("?").alias("has_query"),
    )
    # O55: every UNIQUE query key × EVERY vector — the reference
    # iterates `for key := range u.Query()`, a url.Values MAP, so a
    # repeated key (?a=1&a=2) probes once and an empty query ('?')
    # probes nothing; no Section check (mainHttpScan.go:118-130).
    # (Go's map order is nondeterministic; distinct keys give the same
    # SET of probes deterministically.)
    params = (
        base.filter(F.col("has_query"))
        .select("url", F.explode(F.split("query", "&")).alias("kv"))
        .filter(F.length("kv") > 0)
        .select("url", F.substring_index("kv", "=", 1).alias("target"))
        .distinct()
        .crossJoin(vecs)
        .select("url", F.lit("param").alias("kind"), "target", "vector", "test")
    )
    # O56: every header × EVERY vector (no Section check in the header
    # loop either, mainHttpScan.go:133-142) — but the whole branch is
    # behind the `-scanheader` flag, default off
    # (mainHttpScan.go:69,132: `if settings.ScanHTTPHeaders`;
    # VERDICT r3 item 7)
    if scan_headers:
        headers = (
            base.select("url", F.explode(F.array(F.lit("User-Agent"), F.lit("Referer"))).alias("target"))
            .crossJoin(vecs)
            .select("url", F.lit("header").alias("kind"), "target", "vector", "test")
        )
    else:
        headers = None
    # O57: every non-empty path segment × segment-eligible vectors
    # (O49). Section gates ONLY this branch and only EXCLUDES vectors
    # whose section is NON-EMPTY and lacks 'urlsegment'
    # (mainHttpScan.go:151-153: `vec.Section != "" && !contains` →
    # skip) — a NULL/empty section therefore QUALIFIES, and
    # multi-valued sections like "header,urlsegment" qualify too.
    segments = (
        base.select("url", F.posexplode(F.split("path", "/")).alias("pos", "seg"))
        .filter(F.length("seg") > 0)
        .crossJoin(vecs)
        .filter(
            F.col("section").isNull()
            | (F.col("section") == "")
            | F.col("section").contains("urlsegment")
        )
        .select(
            "url",
            F.lit("segment").alias("kind"),
            F.concat_ws(":", F.col("pos").cast("string"), F.col("seg")).alias("target"),
            "vector",
            "test",
        )
    )
    out = params
    if headers is not None:
        out = out.unionByName(headers)
    return out.unionByName(segments)


def run_scan(
    spark: SparkSession,
    urls: DataFrame,
    scan_headers: bool = False,
    vectors: DataFrame | None = None,
    keep_body: bool = False,
) -> DataFrame:
    """Probe the matrix with the deterministic responder; flag bodies
    containing the vector's test string (O35: instr(body, test) > 0).
    ``scan_headers`` mirrors the reference's `-scanheader` CLI default
    (off, mainHttpScan.go:69); ``vectors`` a custom dim (`-vectors`);
    ``keep_body`` adds the response body column for the `-output`
    per-probe dump (mainHttpScan.go:194-199) — off by default so the
    report path never collects bodies."""
    matrix = probe_matrix(spark, urls, scan_headers=scan_headers, vectors=vectors)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            bodies, durs = [], []
            for url, kind, target, vector, test in zip(
                pdf["url"], pdf["kind"], pdf["target"], pdf["vector"], pdf["test"]
            ):
                # ~12% of probes 'reflect' the test string; keyed per
                # PROBE (url, kind, target, vector) — the reference
                # fires and times each request individually, so two
                # probes of the same url+vector must not share a body
                reflected = h64("scan", url, kind, target, vector) % 8 == 0
                # a reflection echoes what the detector looks for: the
                # Test string, or the VECTOR itself when Test is empty
                # (the O35 fallback below, mainHttpScan.go:185-188) —
                # appending '' for empty-test vectors made them
                # undetectable by construction (review r4)
                marker = test if test else vector
                bodies.append(
                    f"<html>resp {h64('b', url, kind, target) % 9999}"
                    + (marker if reflected else "")
                )
                durs.append(hint(3, 120, "dur", url, kind, target, vector))
            out["body"] = bodies
            out["duration_ms"] = durs
            yield out

    schema = (
        "url string, kind string, target string, vector string, test string, "
        "body string, duration_ms int"
    )
    res = matrix.repartition(max(spark.sparkContext.defaultParallelism, 4)).mapInPandas(
        probe, schema=schema
    )
    return res.select(
        "url",
        "kind",
        "target",
        "vector",
        "duration_ms",
        *(["body"] if keep_body else []),
        # O35 fallback: the reference substitutes Vector whenever Test
        # is the EMPTY STRING (mainHttpScan.go:185-188; 20/28 shipped
        # vectors have Test "") — coalesce alone would pass '' through
        # and instr(body, '') flags every row found
        (
            F.instr(
                F.col("body"),
                F.when(
                    F.col("test").isNull() | (F.col("test") == ""),
                    F.col("vector"),
                ).otherwise(F.col("test")),
            )
            > 0
        ).alias("found"),
        F.length("body").alias("body_len"),
    )


def render_html(results: list[dict]) -> str:
    """Driver-side HTML render of a (small) collected result — the
    reference's template sink (O10, template/httpscanresult.tmpl).
    Values are escaped like Go's auto-escaping html/template: every
    vector contains HTML metacharacters by construction, and an
    unescaped '\"><script>' payload would break (and XSS) the report."""
    from html import escape

    rows = "\n".join(
        "<tr><td>{url}</td><td>{kind}</td><td>{target}</td><td>{vector}</td>"
        "<td>{found}</td><td>{duration_ms}ms</td></tr>".format(
            **{k: escape(str(v), quote=True) for k, v in r.items()}
        )
        for r in results
    )
    return (
        "<html><body><h1>httpscan results</h1><table>"
        "<tr><th>url</th><th>kind</th><th>target</th><th>vector</th>"
        f"<th>found</th><th>duration</th></tr>{rows}</table></body></html>"
    )
