"""Bloom seen-set properties: zero false negatives, bounded FPR (SURVEY.md §5.2.1)."""

import numpy as np

from nightcrawlercmd_spark.operators.bloomseen import (
    BloomConfig,
    PartitionedBloom,
    bloom_partition_df,
    build_filter_deltas,
)


def _keys(n, seed):
    rng = np.random.Generator(np.random.Philox(seed))
    return rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)


def test_no_false_negatives_and_low_fpr(spark):
    cfg = BloomConfig(partitions=8, bits_per_key=12, k=7)
    inserted = _keys(20_000, 1)
    probes_absent = np.setdiff1d(_keys(20_000, 2), inserted)
    m = PartitionedBloom.size_for(len(inserted), cfg)
    bloom = PartitionedBloom(cfg, m)
    df = spark.createDataFrame([(int(k),) for k in inserted], "url_hash bigint")
    bloom.add_filter_rows(build_filter_deltas(df, cfg, m))
    # every inserted key must be 'maybe' (no false negatives)
    assert bloom.maybe_contains(inserted).all()
    # absent keys: false-positive rate well under 1%
    fpr = bloom.maybe_contains(probes_absent).mean()
    assert fpr < 0.01, fpr


def test_incremental_or_merge(spark):
    cfg = BloomConfig(partitions=4, bits_per_key=12, k=7)
    a, b = _keys(5000, 3), _keys(5000, 4)
    m = PartitionedBloom.size_for(10_000, cfg)
    bloom = PartitionedBloom(cfg, m)
    for chunk in (a, b):
        df = spark.createDataFrame([(int(k),) for k in chunk], "url_hash bigint")
        bloom.add_filter_rows(build_filter_deltas(df, cfg, m))
    assert bloom.maybe_contains(a).all() and bloom.maybe_contains(b).all()


def test_probe_udf_matches_driver_probe(spark):
    cfg = BloomConfig(partitions=4, bits_per_key=12, k=7)
    keys = _keys(2000, 5)
    m = PartitionedBloom.size_for(len(keys), cfg)
    bloom = PartitionedBloom(cfg, m)
    df = spark.createDataFrame([(int(k),) for k in keys], "url_hash bigint")
    bloom.add_filter_rows(build_filter_deltas(df, cfg, m))
    probes = np.concatenate([keys[:500], _keys(500, 6)])
    pdf = (
        bloom_partition_df(
            spark.createDataFrame([(int(k),) for k in probes], "url_hash bigint"), bloom
        )
        .toPandas()
        .sort_values("url_hash")
    )
    want = bloom.maybe_contains(pdf["url_hash"].to_numpy())
    assert (pdf["maybe_seen"].to_numpy() == want).all()
