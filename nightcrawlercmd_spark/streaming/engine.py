"""The crawl round loop — driver-side micro-batch iteration (SURVEY.md O73).

Replaces the reference's single-threaded fetch→store→extract→enqueue
loop (``cw.FetchSites``; mainCrawler.go:84-89,142-146) with rounds of
distributed micro-batches:

    dequeue (window-ranked per-host budget, O69/O74)
      → mapInPandas fetch (O6)
      → link extract + canonicalize + scope/robots filters (O30/O18/O39/O75)
      → bloom pre-probe + exact anti-join vs seen (O51)
      → append pages/seen/crawl_log, snapshot pending, commit marker

Structured Streaming cannot express the feedback edge (the frontier
feeds itself), so the loop is driver-side; every round re-reads state
from parquet, which doubles as lineage truncation (plan depth stays
O(1) in rounds) and as the exact-resume checkpoint (O77): the loop can
be killed after any round and restarted — it continues from the last
commit marker and the final state is identical to an uninterrupted run.

Scale design (10^10 frontier): pending snapshots are partitioned by
(host_hash, salt); the seen set is append-only with partitioned bloom
filters as pre-probe so each round's anti-join shuffle only carries
bloom-positive candidates; hot hosts are defused by the salt in the
fetch repartition + the per-host dequeue budget; AQE handles residual
skew. With Iceberg jars, pending/seen become MERGE-maintained tables
(sources/tableio.py is the seam).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloomseen import BloomConfig, PartitionedBloom, bloom_partition_df, build_filter_deltas
from ..operators.dequeue import dequeue
from ..operators.fetch import fetch_stage
from ..operators.links import (
    enqueue_rows,
    host_of_col,
    path_of_col,
    robots_allowed_filter,
)
from ..sources.corpus import WorldConfig, priority_of
from ..sources.tableio import StateStore
from ..functions.urlnorm import canonicalize

import pandas as pd

# Bump whenever round/ordering semantics change: deterministic state
# dirs (e.g. q_crawl_e2e's) are salted with this so stale state from an
# older engine version is never resumed.
STATE_VERSION = 2

PENDING_COLS = [
    "canon_url",
    "url_hash",
    "host",
    "host_hash",
    "salt",
    "priority",
    "depth",
    "discovered_round",
    "parent_url_hash",
]


@dataclass
class EngineConfig:
    state_dir: str
    world: WorldConfig
    seeds_path: str | None = None  # parquet with column `url`; None → world seeds
    scope_seed_hosts: bool = True
    default_budget: int = 4
    max_rounds: int = 64
    max_pages: int | None = None
    n_salts: int = 8
    fetch_tasks: int = 32
    use_bloom: bool = True
    decode_images: bool = False  # fetch+decode image payloads per page
    no_new_links: bool = False  # O78: enqueue only redirect Locations
    compact_seen_every: int = 8  # consolidate seen deltas every K rounds
    expected_urls: int = 1 << 17
    bloom: BloomConfig = field(default_factory=BloomConfig)


def seed_udf():
    """url → struct(canon_url, priority@depth0) — one fused Python pass."""

    def fn(url: pd.Series) -> pd.DataFrame:
        canon = url.map(canonicalize)
        prio = [None if c is None else priority_of(c, 0) for c in canon]
        return pd.DataFrame({"canon_url": canon, "priority": prio})

    return F.pandas_udf(fn, "canon_url string, priority double")


def _with_salt_cols(df: DataFrame, n_salts: int) -> DataFrame:
    return df.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int"))


def robots_df(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    from ..sources.corpus import robots_rows

    return spark.createDataFrame(
        pd.DataFrame(robots_rows(cfg.world)),  # pandas → arrow fast path
        schema="host string, disallow_prefixes array<string>, crawl_budget int",
    )


def seeds_df(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    if cfg.seeds_path:
        return spark.read.parquet(cfg.seeds_path)
    from ..sources.corpus import seed_rows

    return spark.createDataFrame(pd.DataFrame(seed_rows(cfg.world)), schema="url string")


class CrawlEngine:
    def __init__(self, spark: SparkSession, cfg: EngineConfig):
        self.spark = spark
        self.cfg = cfg
        self.store = StateStore(cfg.state_dir)
        self.robots = robots_df(spark, cfg).cache()
        self._bloom: PartitionedBloom | None = None

    # ------------------------------------------------------------ init ----

    def _init_round0(self) -> None:
        """Seed the frontier (reference: url-list load + ToAbsUrl +
        RemoveLinksNotSameHost, mainCrawler.go:117-140)."""
        cfg = self.cfg
        seeds = (
            seeds_df(self.spark, cfg)
            .select(seed_udf()(F.col("url")).alias("s"))
            .select("s.canon_url", "s.priority")
            .filter(F.col("canon_url").isNotNull())
            .withColumn("host", host_of_col(F.col("canon_url")))
            .persist()  # one Python pass feeds scope-collect AND the write
        )
        if cfg.scope_seed_hosts:
            scope = sorted(
                r["host"] for r in seeds.select("host").distinct().collect()
            )
        else:
            scope = None
        # robots applies to seeds too (north_rule: robots compliance)
        seeds = robots_allowed_filter(
            seeds.withColumn("path", path_of_col(F.col("canon_url"))), self.robots
        ).drop("path")
        pend = (
            seeds.groupBy("canon_url", "host")
            .agg(F.min("priority").alias("priority"))  # distinct (canon is fn → same prio)
            .withColumn("url_hash", F.xxhash64("canon_url"))
            .withColumn("host_hash", F.xxhash64("host"))
            .withColumn("depth", F.lit(0))
            .withColumn("discovered_round", F.lit(0))
            .withColumn("parent_url_hash", F.lit(None).cast("bigint"))
        )
        pend = _with_salt_cols(pend, cfg.n_salts).select(*PENDING_COLS)
        self.store.write_snapshot(pend.repartition(cfg.fetch_tasks, "host_hash", "salt"), "pending", 0)
        seeds.unpersist()
        # seen delta shares the pending shape (+first_round) across all rounds
        seen0 = self.store.read_snapshot(self.spark, "pending", 0).withColumn(
            "first_round", F.lit(0)
        )
        self.store.append(seen0, "seen", 0)
        n = self.store.read_snapshot(self.spark, "pending", 0).count()
        self.store.commit(
            0,
            {
                "fetched_total": 0,
                "pending": n,
                "scope_hosts": scope,
                "bloom_m_bits": PartitionedBloom.size_for(self.cfg.expected_urls, self.cfg.bloom),
            },
        )

    # ------------------------------------------------------------ seen ----

    def _read_seen(self, upto_round: int) -> DataFrame:
        """seen = latest compacted base + the deltas after it. Without
        compaction the per-round anti-join would read O(rounds) delta
        dirs on long crawls (SURVEY.md §7.3.5 growth concern)."""
        base_round = -1
        for r in reversed(self.store.committed_rounds()):
            if r > upto_round:
                continue
            if self.store.meta(r).get("seen_base_round") is not None:
                base_round = self.store.meta(r)["seen_base_round"]
                break
        parts = []
        if base_round >= 0 and self.store.exists("seen_base", base_round):
            parts.append(self.store.read_snapshot(self.spark, "seen_base", base_round))
        for r in self.store.committed_rounds():
            if base_round < r <= upto_round and self.store.exists("seen", r):
                parts.append(self.store.read_snapshot(self.spark, "seen", r))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _maybe_compact_seen(self, r: int) -> int | None:
        """Every K rounds, rewrite the union of deltas as one base."""
        cfg = self.cfg
        if not cfg.compact_seen_every or r % cfg.compact_seen_every != 0:
            return None
        # round r is not committed yet — union its just-written delta
        # explicitly or the base would silently drop it
        full = self._read_seen(r - 1)
        if self.store.exists("seen", r):
            full = full.unionByName(self.store.read_snapshot(self.spark, "seen", r))
        self.store.write_snapshot(
            full.repartition(cfg.fetch_tasks, "url_hash"), "seen_base", r
        )
        return r

    # ----------------------------------------------------------- bloom ----

    def _ensure_bloom(self, upto_round: int) -> PartitionedBloom:
        """Rebuild filters from the exact seen table (filters are a
        cache; the table is the truth — SURVEY.md §7.3.4)."""
        if self._bloom is not None:
            return self._bloom
        m_bits = self.store.meta(0)["bloom_m_bits"]
        bloom = PartitionedBloom(self.cfg.bloom, m_bits)
        seen = self._read_seen(upto_round)
        if seen is not None:
            bloom.add_filter_rows(build_filter_deltas(seen, self.cfg.bloom, m_bits))
        self._bloom = bloom
        return bloom

    # ------------------------------------------------------------ round ---

    def _run_round(self, r: int, scope_hosts: list[str] | None, fetched_total: int) -> dict:
        import os
        import time as _time

        _timing = os.environ.get("NCS_TIMING") == "1"
        _t = [_time.time()]

        def tick(label: str) -> None:
            if _timing:
                now = _time.time()
                print(f"    [round {r}] {label}: {now - _t[0]:.1f}s", flush=True)
                _t[0] = now

        cfg, store, spark = self.cfg, self.store, self.spark
        pending = store.read_snapshot(spark, "pending", r - 1)
        remaining = None
        if cfg.max_pages is not None:
            remaining = cfg.max_pages - fetched_total
            if remaining <= 0:
                return {"fetched": 0, "stop": True}
        deq = dequeue(pending, self.robots, cfg.default_budget, max_take=remaining)
        pages = fetch_stage(deq, cfg.world, cfg.fetch_tasks, decode_images=cfg.decode_images)
        # free per-round metrics: observed during the write action itself
        from pyspark.sql import Observation

        obs = Observation(f"round_{r}")
        pages = pages.observe(
            obs,
            F.count(F.lit(1)).alias("fetched"),
            F.sum((F.col("status_code") == 200).cast("int")).alias("ok_200"),
            F.sum(F.col("status_code").between(300, 307).cast("int")).alias("redirects"),
            F.sum(F.col("error").isNotNull().cast("int")).alias("errors"),
            F.sum(F.col("img_phash").isNotNull().cast("int")).alias("images_decoded"),
            F.sum("resp_ms").alias("sum_resp_ms"),
        )
        store.append(pages, "pages", r)  # materializes the fetch exactly once
        metrics = {k: (int(v) if v is not None else 0) for k, v in obs.get.items()}
        tick("dequeue+fetch+write_pages")
        pages = store.read_snapshot(spark, "pages", r)
        n_fetched = pages.count()
        tick("count_pages")
        if n_fetched == 0:
            store.write_snapshot(pending, "pending", r)
            store.commit(r, {"fetched_total": fetched_total, "pending": pending.count(),
                             "fetched_round": 0})
            return {"fetched": 0, "stop": True}
        store.append(
            pages.select(
                F.lit(r).alias("round"), "canon_url", "status_code", "host",
                "depth", "priority"
            ),
            "crawl_log",
            r,
        )
        tick("write_crawl_log")
        link_src = pages
        if cfg.no_new_links:
            # reference no-new-links mode: page hrefs are NOT enqueued,
            # only redirect Location targets (mainCrawler.go:164-173)
            link_src = pages.filter(F.col("status_code").between(300, 307))
        cands = enqueue_rows(link_src, self.robots, scope_hosts, r)
        seen = self._read_seen(r - 1)
        if cfg.use_bloom:
            bloom = self._ensure_bloom(r - 1)
            # persist: the bloom split consumes `tagged` twice (fresh +
            # suspects) — without the cache the extract/dedupe pipeline
            # runs twice per round
            tagged = bloom_partition_df(cands, bloom).persist()
            fresh = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            suspects = (
                tagged.filter(F.col("maybe_seen"))
                .drop("maybe_seen")
                .join(seen.select("url_hash"), "url_hash", "left_anti")
            )
            new = fresh.unionByName(suspects)
        else:
            tagged = None
            new = cands.join(seen.select("url_hash"), "url_hash", "left_anti")
        new = _with_salt_cols(new, cfg.n_salts).select(*PENDING_COLS)
        # the seen delta carries the full pending shape (lineage incl.) so
        # the next-round pending rows are a column-pruned re-read, not a
        # recompute; first_round == discovered_round here.
        store.append(
            new.withColumn("first_round", F.lit(r)),
            "seen",
            r,
        )
        if tagged is not None:
            tagged.unpersist()
        tick("enqueue+dedupe+write_seen")
        new_pending = store.read_snapshot(spark, "seen", r).select(*PENDING_COLS)
        # dequeued rows == this round's pages (already materialized) —
        # reuse them for the pending subtraction instead of re-running
        # the dequeue window.
        next_pending = pending.join(
            pages.select("url_hash"), "url_hash", "left_anti"
        ).select(*PENDING_COLS).unionByName(new_pending)
        store.write_snapshot(
            next_pending.repartition(cfg.fetch_tasks, "host_hash", "salt"), "pending", r
        )
        tick("write_pending")
        n_pending = store.read_snapshot(spark, "pending", r).count()
        tick("count_pending")
        # extend bloom with this round's discoveries
        if cfg.use_bloom and self._bloom is not None:
            delta = store.read_snapshot(spark, "seen", r)
            self._bloom.add_filter_rows(
                build_filter_deltas(delta, cfg.bloom, self._bloom.m_bits)
            )
            tick("bloom_delta_build")
        base = self._maybe_compact_seen(r)
        if base is None:
            # carry the latest base forward so resume finds it
            prev = self.store.meta(r - 1).get("seen_base_round")
            base = prev
        store.commit(
            r,
            {
                "fetched_total": fetched_total + n_fetched,
                "pending": n_pending,
                "fetched_round": n_fetched,
                "metrics": metrics,
                "seen_base_round": base,
            },
        )
        return {"fetched": n_fetched, "pending": n_pending, "stop": n_pending == 0}

    # ------------------------------------------------------------- run ----

    def run(self) -> dict:
        import time as _time

        cfg, store = self.cfg, self.store
        if store.last_round() is None:
            self._init_round0()
        last = store.last_round()
        scope_hosts = store.meta(0)["scope_hosts"]
        stats: dict = {"rounds": last, "round_times": []}
        for r in range(last + 1, cfg.max_rounds + 1):
            fetched_total = store.meta(r - 1)["fetched_total"]
            if store.meta(r - 1).get("pending") == 0:
                break
            if cfg.max_pages is not None and fetched_total >= cfg.max_pages:
                break
            t0 = _time.time()
            out = self._run_round(r, scope_hosts, fetched_total)
            stats["round_times"].append(
                {"round": r, "seconds": round(_time.time() - t0, 2),
                 "fetched": out.get("fetched", 0)}
            )
            stats["rounds"] = r
            if out.get("stop"):
                break
        stats["fetched_total"] = store.meta(store.last_round())["fetched_total"]
        return stats

    # ------------------------------------------------------- accessors ----

    def crawl_log(self) -> DataFrame:
        """Crawl log with the derived sequence number. The total order
        is pinned as (round, priority desc, canon_url); seq is an
        analytics-time window, never part of the crawl hot path."""
        from pyspark.sql import Window

        df = self.store.read_appends(self.spark, "crawl_log", self.store.last_round() or 0)
        if df is None:
            return None
        w = Window.partitionBy("round").orderBy(F.desc("priority"), F.asc("canon_url"))
        return (
            df.withColumn("seq", F.row_number().over(w))
            .select("round", "seq", "canon_url", "status_code", "host", "depth")
            .orderBy("round", "seq")
        )

    def seen(self) -> DataFrame:
        return self._read_seen(self.store.last_round() or 0)

    def pages(self) -> DataFrame:
        return self.store.read_appends(self.spark, "pages", self.store.last_round() or 0)
