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
from ..operators.links import enqueue_rows, priority_udf
from ..sources.corpus import WorldConfig
from ..sources.tableio import StateStore
from ..functions.urlnorm import canonicalize

import pandas as pd

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
    expected_urls: int = 1 << 17
    bloom: BloomConfig = field(default_factory=BloomConfig)


def canonicalize_udf():
    def fn(url: pd.Series) -> pd.Series:
        return url.map(canonicalize)

    return F.pandas_udf(fn, "string")


def _with_salt_cols(df: DataFrame, n_salts: int) -> DataFrame:
    return df.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int"))


def robots_df(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    from ..sources.corpus import robots_rows

    return spark.createDataFrame(
        robots_rows(cfg.world),
        schema="host string, disallow_prefixes array<string>, crawl_budget int",
    )


def seeds_df(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    if cfg.seeds_path:
        return spark.read.parquet(cfg.seeds_path)
    from ..sources.corpus import seed_rows

    return spark.createDataFrame(seed_rows(cfg.world), schema="url string")


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
            .select(canonicalize_udf()(F.col("url")).alias("canon_url"))
            .filter(F.col("canon_url").isNotNull())
            .withColumn("host", F.lower(F.parse_url(F.col("canon_url"), F.lit("HOST"))))
        )
        if cfg.scope_seed_hosts:
            scope = sorted(
                r["host"] for r in seeds.select("host").distinct().collect()
            )
            seeds = seeds.filter(F.col("host").isin(scope))
        else:
            scope = None
        # robots applies to seeds too (north_rule: robots compliance)
        seeds = (
            seeds.withColumn(
                "path", F.coalesce(F.parse_url(F.col("canon_url"), F.lit("PATH")), F.lit("/"))
            )
            .join(F.broadcast(self.robots.select("host", "disallow_prefixes")), "host", "left")
            .filter(
                F.col("disallow_prefixes").isNull()
                | ~F.exists(F.col("disallow_prefixes"), lambda p: F.startswith(F.col("path"), p))
            )
            .select("canon_url", "host")
            .distinct()
        )
        pend = (
            seeds.withColumn("url_hash", F.xxhash64("canon_url"))
            .withColumn("host_hash", F.xxhash64("host"))
            .withColumn("depth", F.lit(0))
            .withColumn("priority", priority_udf()(F.col("canon_url"), F.col("depth")))
            .withColumn("discovered_round", F.lit(0))
            .withColumn("parent_url_hash", F.lit(None).cast("bigint"))
        )
        pend = _with_salt_cols(pend, cfg.n_salts).select(*PENDING_COLS)
        self.store.write_snapshot(pend.repartition(cfg.fetch_tasks, "host_hash", "salt"), "pending", 0)
        seen0 = self.store.read_snapshot(self.spark, "pending", 0).select(
            "url_hash", "canon_url", F.lit(0).alias("first_round"), "depth", "parent_url_hash"
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

    # ----------------------------------------------------------- bloom ----

    def _ensure_bloom(self, upto_round: int) -> PartitionedBloom:
        """Rebuild filters from the exact seen table (filters are a
        cache; the table is the truth — SURVEY.md §7.3.4)."""
        if self._bloom is not None:
            return self._bloom
        m_bits = self.store.meta(0)["bloom_m_bits"]
        bloom = PartitionedBloom(self.cfg.bloom, m_bits)
        seen = self.store.read_appends(self.spark, "seen", upto_round)
        if seen is not None:
            bloom.add_filter_rows(build_filter_deltas(seen, self.cfg.bloom, m_bits))
        self._bloom = bloom
        return bloom

    # ------------------------------------------------------------ round ---

    def _run_round(self, r: int, scope_hosts: list[str] | None, fetched_total: int) -> dict:
        cfg, store, spark = self.cfg, self.store, self.spark
        pending = store.read_snapshot(spark, "pending", r - 1)
        remaining = None
        if cfg.max_pages is not None:
            remaining = cfg.max_pages - fetched_total
            if remaining <= 0:
                return {"fetched": 0, "stop": True}
        deq = dequeue(pending, self.robots, cfg.default_budget, max_take=remaining)
        pages = fetch_stage(deq, cfg.world, cfg.fetch_tasks)
        store.append(pages, "pages", r)  # materializes the fetch exactly once
        pages = store.read_snapshot(spark, "pages", r)
        n_fetched = pages.count()
        if n_fetched == 0:
            store.write_snapshot(pending, "pending", r)
            store.commit(r, {"fetched_total": fetched_total, "pending": pending.count(),
                             "fetched_round": 0})
            return {"fetched": 0, "stop": True}
        store.append(
            pages.select(
                F.lit(r).alias("round"), "seq", "canon_url", "status_code", "host", "depth"
            ),
            "crawl_log",
            r,
        )
        cands = enqueue_rows(pages, self.robots, scope_hosts, r)
        seen = store.read_appends(spark, "seen", r - 1)
        if cfg.use_bloom:
            bloom = self._ensure_bloom(r - 1)
            tagged = bloom_partition_df(cands, bloom)
            fresh = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            suspects = (
                tagged.filter(F.col("maybe_seen"))
                .drop("maybe_seen")
                .join(seen.select("url_hash"), "url_hash", "left_anti")
            )
            new = fresh.unionByName(suspects)
        else:
            new = cands.join(seen.select("url_hash"), "url_hash", "left_anti")
        new = _with_salt_cols(new, cfg.n_salts).select(*PENDING_COLS)
        store.append(
            new.select(
                "url_hash", "canon_url", F.lit(r).alias("first_round"), "depth", "parent_url_hash"
            ),
            "seen",
            r,
        )
        new_pending = _with_salt_cols(
            store.read_snapshot(spark, "seen", r)
            .select("canon_url", "url_hash", "first_round", "depth", "parent_url_hash")
            .withColumn("host", F.lower(F.parse_url(F.col("canon_url"), F.lit("HOST"))))
            .withColumn("host_hash", F.xxhash64("host"))
            .withColumn("priority", priority_udf()(F.col("canon_url"), F.col("depth")))
            .withColumn("discovered_round", F.col("first_round")),
            cfg.n_salts,
        ).select(*PENDING_COLS)
        # dequeued rows == this round's pages (already materialized) —
        # reuse them for the pending subtraction instead of re-running
        # the dequeue window.
        next_pending = pending.join(
            pages.select("url_hash"), "url_hash", "left_anti"
        ).select(*PENDING_COLS).unionByName(new_pending)
        store.write_snapshot(
            next_pending.repartition(cfg.fetch_tasks, "host_hash", "salt"), "pending", r
        )
        n_pending = store.read_snapshot(spark, "pending", r).count()
        # extend bloom with this round's discoveries
        if cfg.use_bloom and self._bloom is not None:
            delta = store.read_snapshot(spark, "seen", r)
            self._bloom.add_filter_rows(
                build_filter_deltas(delta, cfg.bloom, self._bloom.m_bits)
            )
        store.commit(
            r,
            {
                "fetched_total": fetched_total + n_fetched,
                "pending": n_pending,
                "fetched_round": n_fetched,
            },
        )
        return {"fetched": n_fetched, "pending": n_pending, "stop": n_pending == 0}

    # ------------------------------------------------------------- run ----

    def run(self) -> dict:
        cfg, store = self.cfg, self.store
        if store.last_round() is None:
            self._init_round0()
        last = store.last_round()
        scope_hosts = store.meta(0)["scope_hosts"]
        stats = {"rounds": last}
        for r in range(last + 1, cfg.max_rounds + 1):
            fetched_total = store.meta(r - 1)["fetched_total"]
            if store.meta(r - 1).get("pending") == 0:
                break
            if cfg.max_pages is not None and fetched_total >= cfg.max_pages:
                break
            out = self._run_round(r, scope_hosts, fetched_total)
            stats["rounds"] = r
            if out.get("stop"):
                break
        stats["fetched_total"] = store.meta(store.last_round())["fetched_total"]
        return stats

    # ------------------------------------------------------- accessors ----

    def crawl_log(self) -> DataFrame:
        df = self.store.read_appends(self.spark, "crawl_log", self.store.last_round() or 0)
        return df.orderBy("round", "seq") if df is not None else None

    def seen(self) -> DataFrame:
        return self.store.read_appends(self.spark, "seen", self.store.last_round() or 0)

    def pages(self) -> DataFrame:
        return self.store.read_appends(self.spark, "pages", self.store.last_round() or 0)
