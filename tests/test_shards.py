"""Training-shard sink: deterministic assignment, no loss/dup,
balanced sizes, one writer task per shard directory, reproducible
content across rewrites at different parallelism."""

from pyspark.sql import functions as F

from nightcrawlercmd_spark.operators.textops import md5i
from nightcrawlercmd_spark.sources.shards import shard_manifest, write_training_shards

SF = "/root/testdata/sf0.001"
N = 8


def _content(spark, path):
    rows = spark.read.parquet(path).select("shard", "doc_id", "source").collect()
    return sorted((r["shard"], r["doc_id"], r["source"]) for r in rows)


def test_shards_complete_balanced_deterministic(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    p1 = str(tmp_path / "shards1")
    write_training_shards(docs, p1, key_col="doc_id", n_shards=N)

    back = spark.read.parquet(p1)
    # every doc exactly once
    assert back.count() == docs.count()
    assert back.select("doc_id").distinct().count() == docs.count()
    # assignment is the contract hash, not an accident of partitioning
    mismatch = back.filter(
        F.col("shard") != F.pmod(md5i(F.col("doc_id").cast("string")), F.lit(N))
    ).count()
    assert mismatch == 0

    man = {r["shard"]: (r["n_rows"], r["n_files"]) for r in shard_manifest(spark, p1).collect()}
    assert set(man) == set(range(N))
    n = docs.count()
    for shard, (rows, files) in man.items():
        # binomial balance: allow a generous ±60% band around n/N
        assert 0.4 * n / N <= rows <= 1.6 * n / N, (shard, rows)
        assert files == 1  # one writer task per shard → one file

    # rewrite at a different parallelism → identical content
    p2 = str(tmp_path / "shards2")
    write_training_shards(docs.repartition(3), p2, key_col="doc_id", n_shards=N)
    assert _content(spark, p1) == _content(spark, p2)
