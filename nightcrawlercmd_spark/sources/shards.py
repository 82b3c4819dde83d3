"""Training-shard sink: deterministic, size-balanced parquet shards.

The output side of the curation pipeline — after dedup/filter/pack, a
training corpus ships as N addressable shards a dataloader can map to
workers. Requirements at 100 TB:

- **Deterministic assignment**: a row lands in the same shard on every
  run at any parallelism (hash of a stable key, never round-robin or
  rand()), so reshipping a corpus is reproducible and incremental jobs
  can target single shards.
- **Balanced sizes**: md5-prefix hash spreads keys uniformly; shard
  row counts concentrate around n/N (binomial, CV ≈ sqrt(N/n)).
- **One writer task per shard directory**: hash-repartitioning on the
  shard id sends every row of a shard to the same task (a task may own
  more than one shard when ``hash(shard) mod N`` collides, and some
  tasks idle — but no shard is ever split across tasks), so each
  ``shard=K`` directory is written by exactly one task — no small-file
  explosion; ``maxRecordsPerFile`` bounds file size below that.
  (``repartitionByRange`` was rejected: its sampled range boundaries
  make the task↔shard mapping nondeterministic across runs.)
- **Deterministic intra-shard order**: ``sortWithinPartitions`` on
  (shard, hash, key) fixes row order for byte-stable downstream
  tokenization runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textops import md5i


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 16,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as ``path/shard=K/*.parquet`` for K in 0..n_shards-1,
    sharded by a deterministic hash of ``key_col``."""
    # hash once: Catalyst does not CSE the md5+conv expression across
    # the shard projection and the sort key, so a repeated md5i() would
    # hash every row twice
    sharded = df.withColumn("_h", md5i(F.col(key_col).cast("string"))).withColumn(
        "shard", F.pmod(F.col("_h"), F.lit(n_shards))
    )
    out = (
        sharded.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_h", key_col)
        .drop("_h")  # projection after the sort keeps intra-partition order
    )
    w = out.write.mode("overwrite").partitionBy("shard")
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def shard_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Per-shard manifest: row count + file count — the index a
    dataloader (or an incremental re-shard job) reads first."""
    df = spark.read.parquet(path)
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.countDistinct("_file").alias("n_files"),
        )
        .orderBy("shard")
    )
