"""Similarity search over an embedding column (array<float>).

Target-side capability (no reference analog — the reference has no
vector data): brute-force cosine top-k as the exact baseline, and a
random-hyperplane LSH-bucketed variant as the scale path (candidates
come from matching signature buckets only, so the pairwise work drops
from O(N) per query to O(N / 2^bits) expected).

All arithmetic stays JVM-side (`zip_with` / `aggregate` fold) — the
fold order over the array is sequential in both Spark and DuckDB, so
results are bit-identical and oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, x: s + x))


def cosine_to_query(emb: DataFrame, query_vec: list[float]) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = sum(float(x) ** 2 for x in query_vec) ** 0.5
    e = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id",
        F.round(_dot(e, q) / (_norm(e) * F.lit(qn)), 6).alias("sim"),
    )


def brute_force_topk(emb: DataFrame, query_vec: list[float], k: int = 10) -> DataFrame:
    """Exact cosine top-k. At scale this is a single map + a TakeOrdered
    (no shuffle of the full table — Spark's sort-limit pushes k down)."""
    return (
        cosine_to_query(emb, query_vec)
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def hyperplane_signature(emb: DataFrame, planes: list[list[float]]) -> DataFrame:
    """Deterministic random-hyperplane LSH signature (one int bucket)."""
    e = F.col("embedding").cast("array<double>")
    sig = None
    for i, p in enumerate(planes):
        bit = F.when(_dot(e, F.array(*[F.lit(float(x)) for x in p])) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
        sig = bit if sig is None else sig + bit
    return emb.withColumn("bucket", sig.cast("int"))


def lsh_topk(
    emb: DataFrame, query_vec: list[float], planes: list[list[float]], k: int = 10
) -> DataFrame:
    """ANN top-k: probe the query's bucket (+ all buckets at Hamming
    distance 1 — multi-probe) then exact-rank the candidates."""
    qsig = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(query_vec, p)) >= 0:
            qsig |= 1 << i
    probe = [qsig] + [qsig ^ (1 << i) for i in range(len(planes))]
    cands = hyperplane_signature(emb, planes).filter(F.col("bucket").isin(probe))
    return (
        cosine_to_query(cands, query_vec)
        .orderBy(F.desc("sim"), F.asc("vec_id"))
        .limit(k)
    )


def norm_stats_by_label(emb: DataFrame) -> DataFrame:
    """Per-label embedding L2-norm statistics (oracle-checkable)."""
    e = F.col("embedding").cast("array<double>")
    return (
        emb.select("label", _norm(e).alias("nrm"))
        .groupBy("label")
        .agg(
            F.round(F.avg("nrm"), 6).alias("avg_norm"),
            F.round(F.min("nrm"), 6).alias("min_norm"),
            F.round(F.max("nrm"), 6).alias("max_norm"),
            F.count("*").alias("n"),
        )
    )


def deterministic_planes(dim: int, n_planes: int = 6) -> list[list[float]]:
    """Pseudo-random hyperplanes derived from a counter hash — no RNG
    state, reproducible everywhere."""
    from ..functions.determinism import hfloat

    return [
        [hfloat("plane", i, j) * 2.0 - 1.0 for j in range(dim)] for i in range(n_planes)
    ]
