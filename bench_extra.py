#!/usr/bin/env python
"""Round-6 optimization harness (NOT the frozen bench.py).

Per-query noop-sink isolation (guide §1.4) + formatted-plan capture
(guide §7.2) for every benched query, plus optional repeat runs so
before/after deltas are separable from session warmup noise.

Usage:
  python bench_extra.py queries [--reps N] [--plans DIR] [--queries a,b,c]
  python bench_extra.py crawl  [--cpus N] [--rounds N] [--world bench|mid]

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

BENCH_QUERIES = [
    "report_wordlist",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "ngram_jaccard",
    "quality_score",
    "token_count",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "dedup_clusters",
    "tfidf_top_terms",
    "embedding_norms",
    "repetition_filter",
    "asof_attribution",
    "pricing_summary",
    "join_orders_customers",
    "window_dequeue",
    "anti_join_resume",
]


def warm(spark):
    """Same warmup as bench.py: parquet reader + codegen + regex."""
    from pyspark.sql import functions as F

    from nightcrawlercmd_spark.operators.textops import WORD_RE

    docs_warm = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs_warm.write.format("noop").mode("overwrite").save()
    (
        docs_warm.limit(50)
        .select(F.explode(F.regexp_extract_all("text", F.lit(WORD_RE), F.lit(0))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c"), F.min(F.length("w")).alias("m"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def run_queries(args) -> None:
    from nightcrawlercmd_spark.plans.queries import QUERIES
    from nightcrawlercmd_spark.session import get_spark

    spark = get_spark(app="ncs-bench-extra", cpus=CPUS, shuffle_partitions=max(8, CPUS))
    warm(spark)
    names = args.queries.split(",") if args.queries else BENCH_QUERIES
    out: dict[str, list[float]] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"bench_extra:{name}")
        times = []
        for rep in range(args.reps):
            t0 = time.time()
            df = QUERIES[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            times.append(round(time.time() - t0, 3))
        out[name] = times
        print(f"{name}: {times}", flush=True)
        if args.plans:
            os.makedirs(args.plans, exist_ok=True)
            df = QUERIES[name](spark, SF_DIR)
            path = os.path.join(args.plans, f"{name}{args.suffix}.txt")
            with open(path, "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
    spark.sparkContext.setJobDescription(None)
    mins = {k: min(v) for k, v in out.items()}
    print(json.dumps({"queries_min": mins, "total_min": round(sum(mins.values()), 2),
                      "samples": out}))
    spark.stop()


def run_crawl_profile(args) -> None:
    import bench

    world = bench.bench_world() if args.world == "bench" else bench.mid_world(6)
    os.environ.setdefault("NCS_TIMING", "1")
    t0 = time.time()
    res = bench.run_crawl(args.cpus, args.rounds, world=world)
    res.pop("round_times", None)
    print(json.dumps({"wall": round(time.time() - t0, 2), **res}))


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    q = sub.add_parser("queries")
    q.add_argument("--reps", type=int, default=2)
    q.add_argument("--plans", default=None)
    q.add_argument("--suffix", default="_before")
    q.add_argument("--queries", default=None)
    c = sub.add_parser("crawl")
    c.add_argument("--cpus", type=int, default=CPUS)
    c.add_argument("--rounds", type=int, default=3)
    c.add_argument("--world", choices=["bench", "mid"], default="bench")
    args = p.parse_args()
    if args.cmd == "queries":
        run_queries(args)
    else:
        run_crawl_profile(args)


if __name__ == "__main__":
    main()
