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


def probe_matrix(spark: SparkSession, urls: DataFrame) -> DataFrame:
    """urls(url string) × vectors → one probe per (url part, vector).

    Three branches (O55 params, O56 headers, O57 path segments), each a
    cross join against the broadcast vector dim; section filter O49.
    """
    vecs = F.broadcast(vectors_df(spark))
    base = urls.select(
        F.col("url"),
        host_of_col(F.col("url")).alias("host"),
        path_of_col(F.col("url")).alias("path"),
        F.substring_index(F.col("url"), "?", -1).alias("query"),
    )
    # O55: every query key × every vector (mutate one param)
    params = (
        base.filter(F.col("url").contains("?"))
        .select("url", F.explode(F.split("query", "&")).alias("kv"))
        .select("url", F.substring_index("kv", "=", 1).alias("target"))
        .crossJoin(vecs)
        .filter(F.col("section").isNull())
        .select("url", F.lit("param").alias("kind"), "target", "vector", "test")
    )
    # O56: every header × every vector (appended to the value)
    headers = (
        base.select("url", F.explode(F.array(F.lit("User-Agent"), F.lit("Referer"))).alias("target"))
        .crossJoin(vecs)
        .filter(F.col("section").isNull() | (F.col("section") == "header"))
        .select("url", F.lit("header").alias("kind"), "target", "vector", "test")
    )
    # O57: every non-empty path segment × section-eligible vectors (O49)
    segments = (
        base.select("url", F.posexplode(F.split("path", "/")).alias("pos", "seg"))
        .filter(F.length("seg") > 0)
        .crossJoin(vecs)
        .filter(F.col("section").isNull() | (F.col("section") == "urlsegment"))
        .select(
            "url",
            F.lit("segment").alias("kind"),
            F.concat_ws(":", F.col("pos").cast("string"), F.col("seg")).alias("target"),
            "vector",
            "test",
        )
    )
    return params.unionByName(headers).unionByName(segments)


def run_scan(spark: SparkSession, urls: DataFrame) -> DataFrame:
    """Probe the matrix with the deterministic responder; flag bodies
    containing the vector's test string (O35: instr(body, test) > 0)."""
    matrix = probe_matrix(spark, urls)

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            bodies, durs = [], []
            for url, vector, test in zip(pdf["url"], pdf["vector"], pdf["test"]):
                # ~12% of probes 'reflect' the test string
                reflected = h64("scan", url, vector) % 8 == 0
                bodies.append(f"<html>resp {h64('b', url) % 9999}" + (test if reflected else ""))
                durs.append(hint(3, 120, "dur", url, vector))
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
        (F.instr(F.col("body"), F.coalesce(F.col("test"), F.col("vector"))) > 0).alias("found"),
        F.length("body").alias("body_len"),
    )


def render_html(results: list[dict]) -> str:
    """Driver-side HTML render of a (small) collected result — the
    reference's template sink (O10, template/httpscanresult.tmpl)."""
    rows = "\n".join(
        "<tr><td>{url}</td><td>{kind}</td><td>{target}</td><td>{vector}</td>"
        "<td>{found}</td><td>{duration_ms}ms</td></tr>".format(**r)
        for r in results
    )
    return (
        "<html><body><h1>httpscan results</h1><table>"
        "<tr><th>url</th><th>kind</th><th>target</th><th>vector</th>"
        f"<th>found</th><th>duration</th></tr>{rows}</table></body></html>"
    )
