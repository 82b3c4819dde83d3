"""Merge-on-read pending maintenance (Iceberg equality-delete / LSM
analog): non-compaction rounds write ZERO pending rows (the seen delta
and pages log double as add/remove deltas), compaction rounds rewrite
the assembled bucket-partitioned base, the arithmetic pending count
equals the assembled table, and the end state still matches the
sequential oracle exactly."""

import os

from nightcrawlercmd_spark.sources.corpus import WorldConfig
from nightcrawlercmd_spark.streaming.engine import CrawlEngine, EngineConfig
from nightcrawlercmd_spark.streaming.simulator import simulate

WORLD = WorldConfig(n_hosts=12, base_pages=8, hot_factor=2, tag="t-pb")
MAX_PAGES = 40
MAX_ROUNDS = 5
CAPACITY = 10


def _engine(spark, tmp_path_factory):
    cfg = EngineConfig(
        state_dir=str(tmp_path_factory.mktemp("crawl_state_pb")),
        world=WORLD,
        max_rounds=MAX_ROUNDS,
        max_pages=MAX_PAGES,
        round_capacity=CAPACITY,
        fetch_tasks=8,
        pending_buckets=32,
        pending_compact_every=2,  # exercise compaction mid-crawl
        expected_urls=1 << 13,
    )
    eng = CrawlEngine(spark, cfg)
    eng.run()
    return eng


def test_pending_merge_on_read_writes_are_o_delta(spark, tmp_path_factory):
    eng = _engine(spark, tmp_path_factory)
    store = eng.store
    rounds = store.committed_rounds()
    assert len(rounds) >= 4

    saw_zero_write = saw_compaction = False
    for r in rounds:
        meta = store.meta(r)
        if r > 0:
            rew = meta.get("pending_rewritten")
            compacted = r % 2 == 0 and meta.get("fetched_round", 0) > 0
            dir_exists = os.path.isdir(
                os.path.join(store.root, "pending_b", f"round={r}")
            )
            if compacted:
                saw_compaction = True
                assert dir_exists, r
                assert meta["pending_compact_round"] == r
                assert all(v == r for v in meta["pending_manifest"].values())
            elif rew is not None:
                # non-compaction round: zero pending rows written
                saw_zero_write = True
                assert rew == 0, (r, rew)
                assert not dir_exists, r
        # arithmetic count == assembled table count (exact-resume invariant)
        actual = eng._read_pending(r).count()
        assert actual == meta["pending"], (r, actual, meta["pending"])
    assert saw_zero_write and saw_compaction

    # end state still exactly matches the oracle
    sim = simulate(
        WORLD,
        max_rounds=MAX_ROUNDS,
        max_pages=MAX_PAGES,
        round_capacity=CAPACITY,
    )
    got_log = [
        (r["round"], r["seq"], r["canon_url"], r["status_code"])
        for r in eng.crawl_log().collect()
    ]
    assert got_log == sim.log
    got_seen = {
        r["canon_url"]: (r["first_round"], r["depth"]) for r in eng.seen().collect()
    }
    assert got_seen == sim.seen


def test_round_capacity_parity_with_links(spark, tmp_path_factory):
    """round_capacity with normal link discovery still matches the
    oracle ordering + seen set exactly."""
    world = WorldConfig(n_hosts=5, base_pages=8, hot_factor=3, tag="t-cap")
    cfg = EngineConfig(
        state_dir=str(tmp_path_factory.mktemp("crawl_state_cap")),
        world=world,
        max_rounds=5,
        round_capacity=12,
        fetch_tasks=8,
        expected_urls=1 << 13,
    )
    eng = CrawlEngine(spark, cfg)
    eng.run()
    sim = simulate(world, max_rounds=5, round_capacity=12)
    got = [
        (r["round"], r["seq"], r["canon_url"], r["status_code"])
        for r in eng.crawl_log().collect()
    ]
    assert got == sim.log
    got_seen = {
        r["canon_url"]: (r["first_round"], r["depth"]) for r in eng.seen().collect()
    }
    assert got_seen == sim.seen
