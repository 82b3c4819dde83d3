"""Seen-table compaction: long crawls must read O(1) state dirs per
round and compaction must never lose a URL (dedupe stays exact)."""

from nightcrawlercmd_spark.sources.corpus import WorldConfig
from nightcrawlercmd_spark.streaming.engine import CrawlEngine, EngineConfig
from nightcrawlercmd_spark.streaming.simulator import simulate

WORLD = WorldConfig(n_hosts=4, base_pages=14, hot_factor=3, budget_lo=2, budget_hi=3, tag="t-compact")


def _run(spark, tmp, every):
    eng = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp), world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=every),
    )
    eng.run()
    return eng


def test_compaction_preserves_crawl_exactly(spark, tmp_path):
    eng = _run(spark, tmp_path / "c", every=3)  # compacts at rounds 3,6,9
    sim = simulate(WORLD, max_rounds=9, default_budget=4)
    got_log = [
        (r["round"], r["seq"], r["canon_url"]) for r in eng.crawl_log().collect()
    ]
    assert got_log == [(r, s, u) for r, s, u, _ in sim.log]
    got_seen = {r["canon_url"] for r in eng.seen().collect()}
    assert got_seen == set(sim.seen)
    # a base snapshot actually exists and is recorded in the meta chain
    last = eng.store.last_round()
    assert eng.store.meta(last).get("seen_base_round") is not None
    assert eng.store.exists("seen_base", eng.store.meta(last)["seen_base_round"])


def test_resume_across_compaction_boundary(spark, tmp_path):
    first = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "r"), world=WORLD, max_rounds=4,
                     fetch_tasks=4, compact_seen_every=3),
    )
    first.run()  # stops after round 4 (compaction happened at 3)
    second = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "r"), world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=3),
    )
    second.run()
    full = _run(spark, tmp_path / "full", every=3)
    a = [(r["round"], r["seq"], r["canon_url"]) for r in second.crawl_log().collect()]
    b = [(r["round"], r["seq"], r["canon_url"]) for r in full.crawl_log().collect()]
    assert a == b


def test_bucket_pruned_seen_probe_is_exact(spark, tmp_path):
    """Force the partition-pruned exact probe on from round 1
    (seen_prune_min_total=0, 8 sbuckets, compaction every 2 rounds):
    the crawl log and seen set must still match the sequential oracle
    exactly — pruning may only skip partitions that cannot contain a
    suspect, never change the answer — and the compacted base must be
    laid out as sbucket= partition dirs."""
    import os

    eng = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "p"), world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=2,
                     seen_buckets=8, seen_prune_min_total=0),
    )
    eng.run()
    sim = simulate(WORLD, max_rounds=9, default_budget=4)
    got_log = [
        (r["round"], r["seq"], r["canon_url"]) for r in eng.crawl_log().collect()
    ]
    assert got_log == [(r, s, u) for r, s, u, _ in sim.log]
    assert {r["canon_url"] for r in eng.seen().collect()} == set(sim.seen)
    base_round = eng.store.meta(eng.store.last_round())["seen_base_round"]
    base_dir = os.path.join(eng.store.root, "seen_base", f"round={base_round}")
    parts = [p for p in os.listdir(base_dir) if p.startswith("sbucket=")]
    assert parts, "compacted seen base must be sbucket-partitioned"
    # and the pruning reaches the SCAN: with the incremental manifest
    # layout the bucket filter is PATH-level — only the filtered
    # buckets' sbucket= leaf dirs are ever handed to the reader (other
    # dirs aren't even listed, stronger than a PartitionFilter) — so
    # every base file backing the plan lives under sbucket=1 or =3
    pruned = eng._read_seen(eng.store.last_round(), bucket_filter=[1, 3])
    base_files = [f for f in pruned.inputFiles() if "/seen_base/" in f]
    assert base_files, "pruned read must still scan base dirs"
    assert all(
        "/sbucket=1/" in f or "/sbucket=3/" in f for f in base_files
    ), base_files


def test_resume_with_different_seen_buckets_is_exact(spark, tmp_path):
    """Resuming with a different seen_buckets modulus must NOT trust
    the old base's on-disk sbucket partition values (pruning with
    new-modulus bucket ids against old-modulus partitions would
    silently miss seen URLs → re-fetch duplicates). The modulus is
    PINNED in round-0 meta (like the bloom geometry): the resumed
    engine keeps bucketing with the build-time value and the changed
    config is ignored."""
    def cfg(rounds, buckets):
        return EngineConfig(
            state_dir=str(tmp_path / "m"), world=WORLD, max_rounds=rounds,
            fetch_tasks=4, compact_seen_every=2,
            seen_buckets=buckets, seen_prune_min_total=0,
        )

    first = CrawlEngine(spark, cfg(4, buckets=8))
    first.run()  # compactions at 2 and 4 with modulus 8
    second = CrawlEngine(spark, cfg(9, buckets=4))  # resume, new modulus
    second.run()
    assert second._sb_mod() == 8  # pinned build-time modulus wins

    full = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "f"), world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=2),
    )
    full.run()
    a = [(r["round"], r["seq"], r["canon_url"]) for r in second.crawl_log().collect()]
    b = [(r["round"], r["seq"], r["canon_url"]) for r in full.crawl_log().collect()]
    assert a == b
    got = sorted(r["canon_url"] for r in second.seen().collect())
    want = sorted(r["canon_url"] for r in full.seen().collect())
    assert got == want  # no duplicates, no misses


def test_incremental_seen_compaction_mixed_manifest(spark, tmp_path):
    """Seen analog of incremental pending compaction: with activity
    concentrated in few hosts, later compactions fold only buckets
    with unfolded deltas — the manifest ends up holding base dirs from
    more than one round — while dedupe stays exact vs the oracle."""
    from nightcrawlercmd_spark.sources.corpus import WorldConfig as WC

    world = WC(
        n_hosts=40, base_pages=10, hot_factor=2,
        p_same=0.97, p_cross=0.97, p_offsite=0.97,
        seeds_lo=1, seeds_hi=2, budget_lo=6, budget_hi=8, tag="t-seeninc",
    )
    eng = CrawlEngine(
        spark,
        EngineConfig(
            state_dir=str(tmp_path / "si"), world=world, max_rounds=6,
            round_capacity=12, fetch_tasks=8, compact_seen_every=2,
            seen_buckets=32, seen_prune_min_total=0,
            # sbuckets are url_hash-uniform, so in a young crawl every
            # bucket crosses any small dirty threshold together; a high
            # frac isolates the cohort staggering (≈1/max_lag of the
            # table per compaction after the first full fold)
            seen_compact_dirty_frac=10.0,
        ),
    )
    eng.run()
    meta = eng.store.meta(eng.store.last_round())
    manifest = {int(k): int(v) for k, v in meta["seen_manifest"].items()}
    folded = {int(k): int(v) for k, v in meta["seen_folded"].items()}
    assert len(set(manifest.values())) > 1, manifest  # mixed-round bases
    assert all(folded[b] >= v for b, v in manifest.items())
    sim = simulate(world, max_rounds=6, round_capacity=12)
    got = [(r["round"], r["seq"], r["canon_url"]) for r in eng.crawl_log().collect()]
    assert got == [(r, s, u) for r, s, u, _ in sim.log]
    assert {r["canon_url"] for r in eng.seen().collect()} == set(sim.seen)


def test_upgrade_from_pre_incremental_store(spark, tmp_path):
    """A store whose commit metas predate the incremental seen layout
    (no seen_folded/seen_manifest keys — simulated by stripping them)
    must resume via the legacy read path, then the first compaction
    folds everything once into the per-bucket layout, and the finished
    crawl still matches an uninterrupted fresh run."""
    import json
    import os

    state = str(tmp_path / "up")
    CrawlEngine(
        spark,
        EngineConfig(state_dir=state, world=WORLD, max_rounds=4,
                     fetch_tasks=4, compact_seen_every=0),
    ).run()
    # forge pre-incremental metas: drop the new keys from every commit
    cdir = os.path.join(state, "_commits")
    for fn in os.listdir(cdir):
        p = os.path.join(cdir, fn)
        with open(p) as f:
            meta = json.load(f)
        for k in ("seen_manifest", "seen_folded", "seen_bucket_rows"):
            meta.pop(k, None)
        with open(p, "w") as f:
            json.dump(meta, f)

    second = CrawlEngine(
        spark,
        EngineConfig(state_dir=state, world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=3),
    )
    second.run()  # round 6 compaction runs the legacy full-fold branch
    last = second.store.last_round()
    assert second.store.meta(last).get("seen_folded") is not None  # upgraded

    full = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "uf"), world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=3),
    )
    full.run()
    a = [(r["round"], r["seq"], r["canon_url"]) for r in second.crawl_log().collect()]
    b = [(r["round"], r["seq"], r["canon_url"]) for r in full.crawl_log().collect()]
    assert a == b
    got = sorted(r["canon_url"] for r in second.seen().collect())
    want = sorted(r["canon_url"] for r in full.seen().collect())
    assert got == want


def test_large_suspect_probe_storage_partitioned_exact(spark, tmp_path):
    """Force the LARGE-suspect regime (suspect_broadcast_max=0 disables
    the broadcast-inverted form; seen_prune_min_total=0 forces the
    pruned probe from round 1): once the first fold writes a keyed base,
    the exact probe must run the storage-partitioned chain
    (seen_probe_parts) — and the crawl log + seen set must still match
    the sequential oracle exactly."""
    eng = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "lp"), world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=2,
                     seen_buckets=8, seen_prune_min_total=0,
                     suspect_broadcast_max=0, seen_key_buckets=4),
    )
    stats = eng.run()
    sim = simulate(WORLD, max_rounds=9, default_budget=4)
    got_log = [
        (r["round"], r["seq"], r["canon_url"]) for r in eng.crawl_log().collect()
    ]
    assert got_log == [(r, s, u) for r, s, u, _ in sim.log]
    assert {r["canon_url"] for r in eng.seen().collect()} == set(sim.seen)
    # the chain actually ran after the first fold, and the fold round
    # recorded its layout so resume re-registers the same bucket spec
    assert any(rt.get("seen_probe_parts") for rt in stats["round_times"])
    assert not any(rt.get("seen_probe_inverted") for rt in stats["round_times"])
    base_round = eng.store.meta(eng.store.last_round())["seen_base_round"]
    assert eng.store.meta(base_round)["seen_base_layout"]["key_buckets"] == 4


def test_plain_layout_large_suspect_falls_back_exact(spark, tmp_path):
    """seen_key_buckets=0 keeps the pre-keyed plain layout: the
    large-suspect probe must fall back to the unioned read + plain
    LEFT ANTI (seen_probe_parts never set) and stay exact."""
    eng = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "pl"), world=WORLD, max_rounds=9,
                     fetch_tasks=4, compact_seen_every=2,
                     seen_buckets=8, seen_prune_min_total=0,
                     suspect_broadcast_max=0, seen_key_buckets=0),
    )
    stats = eng.run()
    sim = simulate(WORLD, max_rounds=9, default_budget=4)
    got_log = [
        (r["round"], r["seq"], r["canon_url"]) for r in eng.crawl_log().collect()
    ]
    assert got_log == [(r, s, u) for r, s, u, _ in sim.log]
    assert not any(rt.get("seen_probe_parts") for rt in stats["round_times"])
