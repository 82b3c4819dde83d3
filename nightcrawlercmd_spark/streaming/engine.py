"""The crawl round loop — driver-side micro-batch iteration (SURVEY.md O73).

Replaces the reference's single-threaded fetch→store→extract→enqueue
loop (``cw.FetchSites``; mainCrawler.go:84-89,142-146) with rounds of
distributed micro-batches:

    dequeue (window-ranked per-host budget, O69/O74)
      → mapInPandas fetch (O6)
      → link extract + canonicalize + scope/robots filters (O30/O18/O39/O75)
      → bloom pre-probe + exact anti-join vs seen (O51)
      → append pages/seen (crawl_log is a projection of pages), commit marker

Structured Streaming cannot express the feedback edge (the frontier
feeds itself), so the loop is driver-side; every round re-reads state
from parquet, which doubles as lineage truncation (plan depth stays
O(1) in rounds) and as the exact-resume checkpoint (O77): the loop can
be killed after any round and restarted — it continues from the last
commit marker and the final state is identical to an uninterrupted run.

Scale design (10^10 frontier): pending is merge-on-read (Iceberg
equality-delete / LSM analog) — pending(r) assembles from the last
compacted ``pbucket = host_hash mod B`` base ∪ the seen deltas since ∖
the fetched log since, all tables the rounds already write, so the
per-round pending write is zero rows at any frontier size; a scheduled
compaction (``pending_compact_every``) rewrites the assembled base to
bound read amplification, with a bucket→round manifest + compaction
round in the commit marker. The seen set is append-only
with partitioned bloom filters as pre-probe so each round's anti-join
shuffle only carries bloom-positive candidates; beyond broadcast size
the filters live in a co-partitioned ``seen_filters`` table (no driver
state). Hot hosts are defused by the salt in the fetch repartition +
the per-host dequeue budget; AQE handles residual skew. With Iceberg
jars, pending/seen become MERGE-maintained tables (sources/tableio.py
is the seam).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.bloomseen import (
    BloomConfig,
    PartitionedBloom,
    bloom_partition_df,
    bloom_payload,
    bloom_probe_cogroup,
    build_filter_delta_df,
    build_filter_deltas,
    build_filter_rows_from_hashes,
    or_merge_filters_df,
)
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
# v3: priority_of tie-spread rescaled to the inter-depth gap (dequeue
# ordering changed) — resuming v2 state would replay old-order rounds
# against the new simulator and fail the self-validation column.
STATE_VERSION = 3

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

# the seen table shares the pending shape plus the discovery round
SEEN_COLS = PENDING_COLS + ["first_round"]

_PENDING_SCHEMA = [
    ("canon_url", "string"),
    ("url_hash", "bigint"),
    ("host", "string"),
    ("host_hash", "bigint"),
    ("salt", "int"),
    ("priority", "double"),
    ("depth", "int"),
    ("discovered_round", "int"),
    ("parent_url_hash", "bigint"),
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
    # per-round global fetch capacity (cluster capacity per micro-batch):
    # dequeue the global top-priority slice up to this size. This is the
    # regime where bucketed pending maintenance is O(delta) — hosts
    # outside the round's slice never touch their bucket.
    round_capacity: int | None = None
    n_salts: int = 8
    fetch_tasks: int = 32
    use_bloom: bool = True
    decode_images: bool = False  # fetch+decode image payloads per page
    no_new_links: bool = False  # O78: enqueue only redirect Locations
    # -load-resources: also enqueue img/script src URLs from 200 pages
    # (mainCrawler.go:55,191-196; unfiltered, loses to no_new_links)
    load_resources: bool = False
    # O20/O40: substring filters on raw hrefs (reference -follow /
    # -dont-follow, mainCrawler.go:175-216; see functions/linkfilter.py)
    follow: list[str] | None = None
    dont_follow: list[str] | None = None
    strict_reference_filters: bool = False
    # real-HTTP mode (O13 fixture / deployment seam): "host:port" of a
    # WorldHTTPServer (or any virtual-hosting endpoint); None = the
    # deterministic in-process responder
    http_endpoint: str | None = None
    compact_seen_every: int = 8  # consolidate seen deltas every K rounds
    expected_urls: int = 1 << 17
    bloom: BloomConfig = field(default_factory=BloomConfig)
    # None → auto: co-partitioned seen_filters table probe when the total
    # filter bytes exceed the broadcast budget (the 10^10-URL path);
    # True/False force table/broadcast mode (tests force both).
    bloom_table_probe: bool | None = None
    bloom_broadcast_max_bytes: int = 128 << 20
    bloom_rebuild_subsplits: int = 8  # bounds per-task keys on full rebuilds
    # pending is merge-on-read (Iceberg equality-delete / LSM analog):
    # per round NOTHING extra is written — pending(r) assembles from the
    # last compacted bucket base ∪ the seen deltas since ∖ the fetched
    # log since (both already materialized by the round itself). Every
    # `pending_compact_every` rounds the assembled table is rewritten
    # into `pbucket = host_hash mod pending_buckets` partitions, keeping
    # read amplification bounded. Write cost per round is O(delta) by
    # construction, independent of how activity spreads over hosts.
    pending_buckets: int = 16
    pending_compact_every: int = 8
    # incremental compaction (VERDICT r2 item 4): a compaction round
    # folds ONLY buckets whose accumulated delta rows exceed
    # `dirty_frac` of the bucket's base rows (clean buckets advance
    # their fold watermark for free; a full-table rewrite never
    # happens once the crawl focuses a subset of hosts — at 10^10
    # pending rows a compaction touches O(dirty buckets), not the
    # table). Low-delta buckets may skip several compactions, so their
    # watermark lags; `max_lag_compactions` force-folds any dirty
    # bucket more than that many compaction periods behind, bounding
    # the merge-on-read delta window to
    # max_lag_compactions × pending_compact_every rounds.
    pending_compact_dirty_frac: float = 0.1
    pending_compact_max_lag: int = 4
    # priority-stat bucket pruning (VERDICT r3 item 2): when a round
    # has a global capacity (round_capacity / max_pages remainder), the
    # dequeue keeps only the top-capacity rows — so rounds need not
    # READ pending buckets that cannot reach the cutoff. The commit
    # meta carries per-bucket upper bounds (max priority / row count:
    # exact at fold time, max/sum-updated with each round's delta,
    # removals ignored — stale-high is still a sound bound). A round
    # assembles the maxp-ranked bucket prefix holding ≥ slack×capacity
    # candidate rows, dequeues it, and accepts iff the result is FULL
    # and its minimum selected priority strictly beats every skipped
    # bucket's bound — sound because pbucket is a pure function of
    # host, so per-host budget ranks are bucket-local. Anything else
    # falls back to the full read (counted in prune_fallback). This
    # turns the per-round read from O(frontier) to O(contributing
    # buckets) in the capacity-bound regime.
    pending_prune: bool = True
    pending_prune_slack: float = 4.0
    # drift guard (ADVICE r2): n_pending is arithmetic
    # (prev - fetched + new), which silently relies on fetch emitting
    # exactly one row per dequeued row and enqueue deduping within the
    # round. Every K rounds (0 = off) the engine counts the assembled
    # pending table and raises if it disagrees — any future code drift
    # corrupting the frontier count that drives stop detection fails
    # loudly instead of stopping the crawl early/late.
    pending_reconcile_every: int = 0
    # seen_base is written partitioned by sbucket = url_hash mod
    # seen_buckets; once fetched_total exceeds seen_prune_min_total the
    # per-round exact anti-join reads ONLY the partitions holding the
    # round's bloom-positive suspects (partition-pruned scan) instead
    # of the whole seen table. Below the threshold the extra
    # bucket-list job isn't worth its fixed cost (the table is tiny);
    # at the 10^10 design point the pruned read is the difference
    # between O(suspect buckets) and O(all history) I/O per round.
    seen_buckets: int = 64
    seen_prune_min_total: int = 5_000_000
    # inverted exact probe: the straight `suspects LEFT ANTI seen`
    # shuffles BOTH sides on (url_hash, canon_url) — at the 10^10-URL
    # design point the pruned seen read is still the dominant exchange
    # of the round (PLANS.md "Known scale limits"). When the round's
    # suspect set is small (mature-crawl regime: bloom FPs + a thin
    # true-dup band, counted for free by the same job that lists the
    # suspect buckets), the join inverts: seen LEFT SEMI
    # broadcast(suspect keys) → confirmed (≤ suspects rows), then
    # suspects LEFT ANTI broadcast(confirmed). The seen side becomes a
    # pure streamed scan — zero Exchange, zero sort — and only
    # O(suspects) bytes ever move. Set-identical to the shuffle form
    # because anti(suspects, seen) ≡ anti(suspects, seen ∩ suspects).
    # 0 disables; the threshold bounds the broadcast build
    # (~100 B/row → default ≈ 20 MB).
    suspect_broadcast_max: int = 200_000
    # storage-partitioned exact probe (VERDICT r4 item 1 — the last
    # shuffle seam): seen_base fold rounds are written as Spark
    # bucketed tables CLUSTERED BY (url_hash, canon_url) INTO this
    # many key-hash buckets per sbucket dir (Iceberg bucket-transform
    # analog, tableio.write_keyed_bucketed). The LARGE-suspect exact
    # anti-join then chains one LEFT ANTI per fold round, each with
    # HashPartitioning satisfied from storage — the 10^10-row history
    # side carries ZERO Exchange in every regime (small suspect sets
    # were already covered by the broadcast-inverted form; only the
    # round-scale survivor set reshuffles, once). 0 = legacy plain
    # layout. Not pinned: each fold round records its own value in
    # commit meta and readers use the recorded one, so config changes
    # apply to future folds only.
    seen_key_buckets: int = 32
    # state-table backend: "parquet" (this sandbox — Iceberg contract
    # emulated on files, tableio.py) or "iceberg" (real catalog,
    # tableio_iceberg.py — bucket(N,key) transform + MERGE INTO;
    # requires the runtime jar, gated by iceberg_available)
    state_backend: str = "parquet"
    state_catalog: str = "iceberg"
    # incremental seen compaction (seen analog of the pending knobs
    # above): a compaction folds only sbuckets whose unfolded delta
    # exceeds dirty_frac of their base rows; max_lag bounds how far a
    # low-delta bucket's watermark may trail. seen_buckets itself is
    # PINNED in round-0 meta — see _sb_mod.
    seen_compact_dirty_frac: float = 0.1
    seen_compact_max_lag: int = 4


def seed_udf():
    """url → struct(canon_url, priority@depth0) — one fused Python pass."""

    def fn(url: pd.Series) -> pd.DataFrame:
        canon = url.map(canonicalize)
        prio = [None if c is None else priority_of(c, 0) for c in canon]
        return pd.DataFrame({"canon_url": canon, "priority": prio})

    return F.pandas_udf(fn, "canon_url string, priority double")


def _with_salt_cols(df: DataFrame, n_salts: int) -> DataFrame:
    return df.withColumn("salt", F.pmod(F.col("url_hash"), F.lit(n_salts)).cast("int"))


_SEEN_KEY = ["url_hash", "canon_url"]


def seen_anti_join(suspects: DataFrame, seen: DataFrame, invert: bool) -> DataFrame:
    """Rows of ``suspects`` whose (url_hash, canon_url) is NOT in
    ``seen`` — the exact half of the O51 dedupe (the hash alone has
    expected birthday collisions > 1 at the 10^10-URL design point; a
    hash-only key would drop a distinct URL forever).

    ``invert=False`` is the plain LEFT ANTI: both sides exchange on
    the key. ``invert=True`` is the broadcast-inverted form for small
    suspect sets: confirmed = seen LEFT SEMI broadcast(suspect keys),
    then suspects LEFT ANTI broadcast(confirmed). Set-identical
    (anti(S, T) ≡ anti(S, T ∩ S), and LEFT ANTI keeps left
    multiplicity either way) but the executed plan carries NO shuffle
    Exchange — the seen side is a streamed scan probed against a
    ≤ |suspects|-row broadcast, so a 10^10-row history moves zero
    bytes. Engaged by the engine only when the suspect count (known
    from the bucket-stats job) is under ``suspect_broadcast_max``."""
    if not invert:
        return suspects.join(seen.select(*_SEEN_KEY), _SEEN_KEY, "left_anti")
    confirmed = seen.select(*_SEEN_KEY).join(
        F.broadcast(suspects.select(*_SEEN_KEY)), _SEEN_KEY, "left_semi"
    )
    return suspects.join(F.broadcast(confirmed), _SEEN_KEY, "left_anti")


def seen_anti_join_parts(suspects: DataFrame, parts: list[DataFrame]) -> DataFrame:
    """Chained exact probe for the LARGE-suspect regime:
    ``anti(S, ∪ parts) ≡ anti(…anti(anti(S, p1), p2)…, pn)`` (LEFT ANTI
    distributes over the right side's union and keeps left multiplicity
    throughout), so instead of unioning the seen side — which erases
    storage partitioning and forces the whole history through an
    Exchange — each part is probed on its own. Keyed base parts
    (tableio.read_keyed_bucketed) arrive with
    ``HashPartitioning(url_hash, canon_url, K)`` satisfied from
    storage: the SortMergeJoin shuffles ONLY the suspect side, once —
    its output keeps that partitioning, so the chain's later joins add
    no further suspect-side Exchange either. Delta parts are
    round-scale on both sides. Net shuffled bytes per round: O(round),
    never O(history), even when the suspect set is too large for the
    broadcast-inverted form."""
    out = suspects
    for p in parts:
        out = out.join(p.select(*_SEEN_KEY), _SEEN_KEY, "left_anti")
    return out


def robots_df(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    from ..sources.corpus import robots_rows

    return spark.createDataFrame(
        pd.DataFrame(robots_rows(cfg.world)),  # pandas → arrow fast path
        schema="host string, disallow_prefixes array<string>, crawl_budget int",
    )


def seeds_df(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    if cfg.seeds_path:
        return spark.read.parquet(cfg.seeds_path)
    from ..sources.corpus import host_seed_urls, hosts

    # distributed seed generation: ship the O(n_hosts) host list and
    # expand each host's seed URLs on the executors (same per-host unit
    # the sequential oracle uses → identical multiset). The driver-side
    # expansion was ~2s serial + a 360k-row Arrow ship per bench leg —
    # pure Amdahl overhead charged to every parallelism level.
    world = cfg.world
    hs = hosts(world)
    host_pdf = pd.DataFrame({"host": hs, "is_hot": [h == hs[0] for h in hs]})
    n_hosts = len(hs)

    def expand(batches):
        for pdf in batches:
            urls: list[str] = []
            for hst, hot in zip(pdf["host"], pdf["is_hot"]):
                urls.extend(host_seed_urls(world, hst, bool(hot), n_hosts))
            yield pd.DataFrame({"url": urls})

    n_parts = max(1, min(n_hosts, spark.sparkContext.defaultParallelism * 2))
    return (
        spark.createDataFrame(host_pdf)
        .repartition(n_parts)
        .mapInPandas(expand, schema="url string")
    )


def world_seed_canon_df(spark: SparkSession, cfg: EngineConfig) -> DataFrame:
    """World seeds already canonicalized: ONE fused Python stage does
    per-host expansion + canonicalize + depth-0 priority (the exact
    functions seed_udf applies), instead of a mapInPandas expansion
    followed by a second Arrow round-trip through seed_udf. Null
    canon rows (junk seeds) are dropped inside the stage. Used by
    _init_round0 for the no-seeds-path case; a seeds_path parquet keeps
    the raw-url + seed_udf pipeline."""
    from ..sources.corpus import host_seed_urls, hosts

    world = cfg.world
    hs = hosts(world)
    host_pdf = pd.DataFrame({"host": hs, "is_hot": [h == hs[0] for h in hs]})
    n_hosts = len(hs)

    def expand(batches):
        for pdf in batches:
            canon: list[str] = []
            prio: list[float] = []
            for hst, hot in zip(pdf["host"], pdf["is_hot"]):
                for u in host_seed_urls(world, hst, bool(hot), n_hosts):
                    c = canonicalize(u)
                    if c is not None:
                        canon.append(c)
                        prio.append(priority_of(c, 0))
            yield pd.DataFrame({"canon_url": canon, "priority": prio})

    n_parts = max(1, min(n_hosts, spark.sparkContext.defaultParallelism * 2))
    return (
        spark.createDataFrame(host_pdf)
        .repartition(n_parts)
        .mapInPandas(expand, schema="canon_url string, priority double")
    )


class CrawlEngine:
    def __init__(self, spark: SparkSession, cfg: EngineConfig):
        self.spark = spark
        self.cfg = cfg
        if cfg.state_backend == "parquet":
            self.store = StateStore(cfg.state_dir)
        else:
            # cluster path (SURVEY §7.5(a)): same contract on a real
            # Iceberg catalog — jar-gated, raises a clear error here
            from ..sources.tableio_iceberg import make_state_store

            self.store = make_state_store(
                cfg.state_dir, spark, backend=cfg.state_backend,
                catalog=cfg.state_catalog,
            )
        self.robots = robots_df(spark, cfg).cache()
        self._bloom: PartitionedBloom | None = None
        self._bloom_bc = None  # current broadcast generation (broadcast mode)
        self._bloom_bc_stale = True
        self._bc_generations = 0  # observability: broadcasts created so far
        self._sb_mod_cache: int | None = None  # pinned seen_buckets (_sb_mod)
        self._pb_mod_cache: int | None = None  # pinned pending_buckets (_pb_mod)

    # ------------------------------------------------------------ init ----

    def _init_round0(self) -> None:
        """Seed the frontier (reference: url-list load + ToAbsUrl +
        RemoveLinksNotSameHost, mainCrawler.go:117-140)."""
        import os as _os
        import time as _time

        _timing = _os.environ.get("NCS_TIMING") == "1"
        _t = [_time.time()]

        def tick(label: str) -> None:
            if _timing:
                now = _time.time()
                print(f"    [init] {label}: {now - _t[0]:.1f}s", flush=True)
                _t[0] = now

        cfg = self.cfg
        if cfg.seeds_path:
            canon_seeds = (
                seeds_df(self.spark, cfg)
                .select(seed_udf()(F.col("url")).alias("s"))
                .select("s.canon_url", "s.priority")
                .filter(F.col("canon_url").isNotNull())
            )
        else:
            # world seeds: canonicalization fused into the distributed
            # expansion — one Python stage instead of two
            canon_seeds = world_seed_canon_df(self.spark, cfg)
        seeds = (
            canon_seeds.withColumn("host", host_of_col(F.col("canon_url")))
            .persist()  # one Python pass feeds both derived writes
        )
        # scope hosts are NOT collected to the driver: the filter is a
        # semi-join against the seed-host set derived from the round-0
        # seen table at run time (a 10^8-host seed list stays distributed)
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
        tick("seed_plan")
        written = self.store.write_bucketed(
            self._with_pbucket(pend).repartition(cfg.fetch_tasks, "pbucket", "salt"),
            "pending_b",
            0,
        )
        manifest = {b: 0 for b in written}
        seeds.unpersist()
        tick("write_pending0")
        # seen delta shares the pending shape (+first_round) across all
        # rounds; the pending count is observed during this write — no
        # dedicated count job or second manifest scan at init (the same
        # zero-extra-jobs pattern _run_round uses)
        from pyspark.sql import Observation

        obs0 = Observation("seen0")
        seen0 = self._read_pending_manifest(manifest).withColumn("first_round", F.lit(0))
        self.store.append(
            seen0.observe(obs0, F.count(F.lit(1)).alias("rows")), "seen", 0
        )
        n = int(obs0.get.get("rows") or 0)
        tick("write_seen0")
        m_bits = PartitionedBloom.size_for(self.cfg.expected_urls, self.cfg.bloom)
        if cfg.use_bloom and self._table_probe():
            self.store.append(
                build_filter_delta_df(
                    self.store.read_snapshot(self.spark, "seen", 0),
                    cfg.bloom,
                    m_bits,
                    # a 10^8-row seed list must not materialize a whole
                    # pid partition's keys in one pandas task — same
                    # bound _ensure_bloom and the catch-up path honor
                    subsplits=cfg.bloom_rebuild_subsplits,
                ),
                "seen_filters",
                0,
            )
        # per-bucket priority/count bounds for the pruned pending read
        # (one column-pruned agg over the just-written seed buckets;
        # skipped when pruning is off — a later enable bootstraps)
        st0_maxp: dict | None = None
        st0_cnt: dict | None = None
        tick("bloom0")
        # bounds are only consumed by capacitated rounds; an
        # uncapacitated crawl (no round_capacity / max_pages) skips the
        # init agg too — a later capacitated invocation bootstraps via
        # _bucket_stats like a legacy store
        if cfg.pending_prune and (
            cfg.round_capacity is not None or cfg.max_pages is not None
        ):
            st0_maxp, st0_cnt = self._bucket_stats(
                self._read_pending_manifest(manifest)
            )
        tick("bucket_stats0")
        self.store.commit(
            0,
            {
                "fetched_total": 0,
                "pending": n,
                "pending_manifest": manifest,
                "pending_compact_round": 0,
                "pending_folded": {b: 0 for b in range(cfg.pending_buckets)},
                **(
                    {
                        "pending_bucket_maxp": st0_maxp,
                        "pending_bucket_cnt_ub": st0_cnt,
                    }
                    if st0_maxp is not None
                    else {}
                ),
                # base sizes start unknown ({} → every dirty bucket
                # folds at the first compaction, which populates them)
                "pending_bucket_rows": {},
                # incremental seen layout from round 0: no base dirs
                # yet, every bucket's watermark at -1 (all deltas,
                # round 0 included, are unfolded)
                "seen_manifest": {},
                "seen_folded": {b: -1 for b in range(cfg.seen_buckets)},
                "seen_bucket_rows": {},
                # moduli pinned like the bloom geometry (_sb_mod/_pb_mod)
                "seen_buckets": cfg.seen_buckets,
                "pending_buckets": cfg.pending_buckets,
                "scope_seed_hosts": cfg.scope_seed_hosts,
                "bloom_m_bits": m_bits,
                # geometry pinned with m_bits: a resumed crawl must probe
                # persisted filters with the build-time partitions/k
                "bloom_partitions": cfg.bloom.partitions,
                "bloom_bits_per_key": cfg.bloom.bits_per_key,
                "bloom_k": cfg.bloom.k,
            },
        )

    # --------------------------------------------------------- pending ----

    def _pb_mod(self) -> int:
        """pending_buckets modulus PINNED at round 0, same class as
        _sb_mod/bloom geometry: a resume with a changed value would
        hash delta rows into pbuckets the manifest and fold watermarks
        never heard of — the non-uniform watermark join coalesces
        __folded=-1 for them and re-adds already-folded rows (duplicate
        pending, re-fetches), and the next compaction writes a
        mixed-modulus manifest. Config changes take effect only on a
        fresh store."""
        if self._pb_mod_cache is not None:
            return self._pb_mod_cache
        try:
            self._pb_mod_cache = self.store.meta(0).get(
                "pending_buckets", self.cfg.pending_buckets
            )
            return self._pb_mod_cache
        except FileNotFoundError:
            return self.cfg.pending_buckets  # pre-init: don't cache yet

    def _with_pbucket(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "pbucket",
            F.pmod(F.col("host_hash"), F.lit(self._pb_mod())).cast("int"),
        )

    def _manifest(self, round_no: int) -> dict[int, int]:
        return {
            int(k): v for k, v in self.store.meta(round_no)["pending_manifest"].items()
        }

    def _read_pending_manifest(self, manifest: dict[int, int]) -> DataFrame:
        df = self.store.read_buckets(self.spark, "pending_b", manifest)
        if df is None:
            return self.spark.createDataFrame(
                [], schema=", ".join(f"{c} {t}" for c, t in _PENDING_SCHEMA)
            )
        return df.select(*PENDING_COLS)

    def _folded_of(self, meta: dict) -> dict[int, int]:
        """Per-bucket fold watermark: the round up to which each
        bucket's deltas are folded into its on-disk base. Pre-
        incremental stores carry only the uniform pending_compact_round
        — expand it so both formats resume identically."""
        f = meta.get("pending_folded")
        if f is not None:
            return {int(k): int(v) for k, v in f.items()}
        c = meta.get("pending_compact_round", 0)
        return {b: c for b in range(self._pb_mod())}

    def _assemble_pending(
        self,
        manifest: dict[int, int],
        folded: dict[int, int],
        upto_round: int,
        buckets: set[int] | None = None,
    ) -> DataFrame:
        """Merge-on-read pending: per-bucket compacted base ∪ each
        bucket's seen deltas in (folded[b], upto_round] ∖ fetched log.
        Uses only tables the rounds already wrote — zero extra write
        per round (Iceberg equality-delete analog; VERDICT r1 item 3).
        With incremental compaction the watermark is per-bucket: adds
        are filtered by a broadcast (pbucket, folded) dimension so a
        delta already folded into one bucket's base is never re-added,
        while a lagging bucket still sees its older deltas. Removals
        (fetched pages) are applied over the whole window — an already-
        folded removal anti-joins nothing (idempotent; a fetched URL
        can never re-enter pending because the seen anti-join blocks
        it). ``buckets`` restricts assembly to a bucket subset (the
        incremental-compaction path folds only dirty buckets)."""
        if buckets is not None:
            manifest = {b: v for b, v in manifest.items() if b in buckets}
            folded = {b: v for b, v in folded.items() if b in buckets}
        df = self._read_pending_manifest(manifest)
        lo = min(folded.values(), default=upto_round)
        uniform = len(set(folded.values())) <= 1
        adds, removals = [], []
        for j in range(lo + 1, upto_round + 1):
            if self.store.exists("seen", j):
                a = self.store.read_snapshot(self.spark, "seen", j).select(*PENDING_COLS)
                adds.append(a if uniform else a.withColumn("__dr", F.lit(j)))
            if self.store.exists("pages", j):
                removals.append(
                    self.store.read_snapshot(self.spark, "pages", j).select(
                        "url_hash", "canon_url", "host_hash"
                    )
                )
        if adds:
            add = adds[0]
            for p in adds[1:]:
                add = add.unionByName(p)
            if buckets is not None or not uniform:
                add = self._with_pbucket(add)
            if buckets is not None:
                add = add.filter(F.col("pbucket").isin(sorted(buckets)))
            if not uniform:
                wm = self.spark.createDataFrame(
                    [(int(b), int(v)) for b, v in sorted(folded.items())],
                    "pbucket int, __folded int",
                )
                add = (
                    add.join(F.broadcast(wm), "pbucket", "left")
                    .filter(F.col("__dr") > F.coalesce(F.col("__folded"), F.lit(-1)))
                )
            df = df.unionByName(add.select(*PENDING_COLS))
        if removals:
            rem = removals[0]
            for p in removals[1:]:
                rem = rem.unionByName(p)
            if buckets is not None:
                rem = self._with_pbucket(rem).filter(
                    F.col("pbucket").isin(sorted(buckets))
                )
            # (hash, canon) key: a 64-bit collision must not evict a
            # distinct never-fetched pending row
            df = df.join(
                rem.select("url_hash", "canon_url"),
                ["url_hash", "canon_url"],
                "left_anti",
            )
        return df

    def _bucket_stats(self, df: DataFrame) -> tuple[dict[int, float], dict[int, int]]:
        """(maxp, count) per pbucket — THE definition of the pruning
        bounds; every producer (round-0 init, legacy bootstrap,
        fallback refresh, compaction fold) goes through here so the
        soundness invariant (every bucket with rows has an entry)
        cannot drift between copies."""
        rows = (
            self._with_pbucket(df)
            .groupBy("pbucket")
            .agg(F.count(F.lit(1)).alias("c"), F.max("priority").alias("mp"))
            .collect()
        )
        return (
            {int(x["pbucket"]): float(x["mp"]) for x in rows},
            {int(x["pbucket"]): int(x["c"]) for x in rows},
        )

    def _pending_stats_of(self, meta: dict) -> tuple[dict, dict] | None:
        """(maxp, cnt_ub) per-bucket upper bounds from the commit meta,
        or None on a pre-stats (legacy) store — pruning stays off until
        the next round bootstraps them."""
        mp = meta.get("pending_bucket_maxp")
        cu = meta.get("pending_bucket_cnt_ub")
        if mp is None or cu is None:
            return None
        return (
            {int(k): float(v) for k, v in mp.items()},
            {int(k): int(v) for k, v in cu.items()},
        )

    def _unfolded_deltas(
        self,
        tables: tuple[str, ...],
        cols: list[str] | None,
        folded: dict[int, int],
        upto_round: int,
        bucket_of,
        wm_key: str,
        join_type: str = "left",
    ) -> DataFrame | None:
        """THE single definition of the fold-window scan: union the
        delta snapshots of ``tables`` over (min folded, upto_round],
        tag each row with its round (``__dr``), key it with
        ``bucket_of`` (adds the ``wm_key`` column), and keep only rows
        past their bucket's fold watermark. ``join_type='left'``
        treats unknown buckets as never folded (coalesce -1);
        ``'inner'`` restricts to the buckets present in ``folded``
        (the fold-assembly read passes only the fold set). Shared by
        both compaction-decision scans and the fold assembly so the
        invariant cannot drift between copies (review r4); _read_seen
        keeps its own optimized form for the uniform-watermark and
        bucket-pruned fast paths. Returns None when no delta dirs
        exist in the window."""
        lo = min(folded.values(), default=upto_round)
        parts = []
        for j in range(max(lo + 1, 0), upto_round + 1):
            for tbl in tables:
                if self.store.exists(tbl, j):
                    d = self.store.read_snapshot(self.spark, tbl, j)
                    if cols is not None:
                        d = d.select(*cols)
                    parts.append(d.withColumn("__dr", F.lit(j)))
        if not parts:
            return None
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        wm = self.spark.createDataFrame(
            [(int(b), int(v)) for b, v in sorted(folded.items())],
            f"{wm_key} int, __folded int",
        )
        df = bucket_of(df)
        if join_type == "left":
            return df.join(F.broadcast(wm), wm_key, "left").filter(
                F.col("__dr") > F.coalesce(F.col("__folded"), F.lit(-1))
            )
        return df.join(F.broadcast(wm), wm_key, "inner").filter(
            F.col("__dr") > F.col("__folded")
        )

    def _pending_delta_counts(self, folded: dict[int, int], upto_round: int) -> dict[int, int]:
        """Per-bucket count of UNFOLDED delta rows (adds + removals) in
        (min folded, upto_round] — scans only the delta tables, never
        the base, so the compaction decision itself is O(delta)."""
        df = self._unfolded_deltas(
            ("seen", "pages"), ["host_hash"], folded, upto_round,
            self._with_pbucket, "pbucket",
        )
        if df is None:
            return {}
        rows = df.groupBy("pbucket").count().collect()
        return {int(x["pbucket"]): int(x["count"]) for x in rows}

    def _read_pending(self, round_no: int) -> DataFrame:
        meta = self.store.meta(round_no)
        manifest = {int(k): v for k, v in meta["pending_manifest"].items()}
        return self._assemble_pending(manifest, self._folded_of(meta), round_no)

    # ------------------------------------------------------------ seen ----

    def _sb_mod(self) -> int:
        """seen_buckets modulus PINNED at round 0 (same class as bloom
        geometry): a resume with a changed config value would map rows
        to different buckets than the persisted base dirs and fold
        watermarks assume — pruned probes and watermark filtering would
        silently miss seen URLs. Config changes take effect only on a
        fresh store. Cached once round 0 exists — it is immutable by
        construction, and _sbucket sits on the per-round hot path."""
        if self._sb_mod_cache is not None:
            return self._sb_mod_cache
        try:
            self._sb_mod_cache = self.store.meta(0).get(
                "seen_buckets", self.cfg.seen_buckets
            )
            return self._sb_mod_cache
        except FileNotFoundError:
            return self.cfg.seen_buckets  # pre-init: don't cache yet

    def _sbucket(self, col):
        return F.pmod(col, F.lit(self._sb_mod())).cast("int")

    def _seen_state_of(self, meta: dict) -> tuple[dict, dict, dict] | None:
        """(manifest, folded, bucket_rows) for the incremental seen
        layout, or None for a pre-incremental store (legacy single-base
        read path)."""
        f = meta.get("seen_folded")
        if f is None:
            return None
        return (
            {int(k): int(v) for k, v in (meta.get("seen_manifest") or {}).items()},
            {int(k): int(v) for k, v in f.items()},
            {int(k): int(v) for k, v in (meta.get("seen_bucket_rows") or {}).items()},
        )

    def _read_seen(
        self, upto_round: int, bucket_filter: list[int] | None = None
    ) -> DataFrame:
        """seen = per-bucket compacted base ∪ each bucket's deltas after
        its fold watermark. Without compaction the per-round anti-join
        would read O(rounds) delta dirs on long crawls (SURVEY.md
        §7.3.5 growth concern); with the incremental layout the base is
        a manifest of ``seen_base/round=R/sbucket=B`` leaf dirs, so
        ``bucket_filter`` prunes the base read to exactly the suspect
        buckets' directories (never even listed otherwise) and the
        delta read by a computed-bucket filter. Seen is append-only, so
        unlike pending there are no removals — the watermark join only
        prevents re-reading deltas already folded into a bucket's
        base."""
        state = self._seen_state_of(self.store.meta(upto_round))
        if state is None:
            return self._read_seen_legacy(upto_round, bucket_filter)
        manifest, folded, _ = state
        if bucket_filter is not None:
            manifest = {b: v for b, v in manifest.items() if b in bucket_filter}
            folded = {b: v for b, v in folded.items() if b in bucket_filter}
        parts = []
        base = self.store.read_buckets(
            self.spark, "seen_base", manifest, bucket_col="sbucket"
        )
        if base is not None:
            parts.append(base.select(*SEEN_COLS))
        add = self._seen_unfolded_delta(folded, upto_round, bucket_filter)
        if add is not None:
            parts.append(add.select(*SEEN_COLS))
        if not parts:
            return self.spark.createDataFrame(
                [],
                schema=", ".join(f"{c} {t}" for c, t in _PENDING_SCHEMA)
                + ", first_round int",
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _seen_unfolded_delta(
        self,
        folded: dict[int, int],
        upto_round: int,
        bucket_filter: list[int] | None,
    ) -> DataFrame | None:
        """Union of the UNFOLDED seen-delta rounds — each bucket's
        deltas strictly after its fold watermark, bucket-filtered when
        asked. Shared by the unioned read (_read_seen) and the
        storage-partitioned parts read (_read_seen_parts) so the two
        assemble byte-identical delta windows."""
        lo = min(folded.values(), default=upto_round)
        uniform = len(set(folded.values())) <= 1
        adds = []
        for j in range(max(lo + 1, 0), upto_round + 1):
            if self.store.exists("seen", j):
                d = self.store.read_snapshot(self.spark, "seen", j)
                adds.append(d if uniform else d.withColumn("__dr", F.lit(j)))
        if not adds:
            return None
        add = adds[0]
        for p in adds[1:]:
            add = add.unionByName(p)
        if bucket_filter is not None or not uniform:
            add = add.withColumn("__sb", self._sbucket(F.col("url_hash")))
        if bucket_filter is not None:
            add = add.filter(F.col("__sb").isin(sorted(bucket_filter)))
        if not uniform:
            wm = self.spark.createDataFrame(
                [(int(b), int(v)) for b, v in sorted(folded.items())],
                "__sb int, __folded int",
            )
            add = add.join(F.broadcast(wm), "__sb", "left").filter(
                F.col("__dr") > F.coalesce(F.col("__folded"), F.lit(-1))
            )
        return add

    def _read_seen_parts(
        self, upto_round: int, bucket_filter: list[int] | None = None
    ) -> list[DataFrame] | None:
        """Storage-partitioned form of _read_seen for the LARGE-suspect
        exact probe (VERDICT r4 item 1 — the last shuffle seam): one
        DataFrame per fold round whose base dirs are still current,
        each a catalog bucketed-table scan (tableio.read_keyed_bucketed)
        carrying HashPartitioning(url_hash, canon_url) FROM STORAGE,
        plus one round-scale unfolded-delta part. Fed to
        seen_anti_join_parts the 10^10-row history side then joins with
        ZERO Exchange — only the round's suspect set reshuffles, once.
        Returns None when any referenced base round predates the keyed
        layout (seen_key_buckets=0 at its fold time, or a pre-keyed
        store) — callers fall back to the unioned read + plain probe.

        Each round's scan is filtered to the manifest's buckets for
        that round even without a caller filter: an sbucket refolded at
        a later round leaves its stale dir in the earlier round's path,
        and the manifest — not the directory listing — is the truth."""
        state = self._seen_state_of(self.store.meta(upto_round))
        if state is None:
            return None
        manifest, folded, _ = state
        if bucket_filter is not None:
            bf = set(bucket_filter)
            manifest = {b: v for b, v in manifest.items() if b in bf}
            folded = {b: v for b, v in folded.items() if b in bf}
        by_round: dict[int, list[int]] = {}
        for b, rr in manifest.items():
            by_round.setdefault(int(rr), []).append(int(b))
        parts = []
        for rr in sorted(by_round):
            layout = self.store.meta(rr).get("seen_base_layout") or {}
            kb = int(layout.get("key_buckets") or 0)
            if not kb:
                return None  # plain/mixed layout → unioned read path
            base = self.store.read_keyed_bucketed(
                self.spark, "seen_base", rr, list(_SEEN_KEY), kb,
                bucket_col="sbucket",
            )
            parts.append(
                base.filter(F.col("sbucket").isin(sorted(by_round[rr])))
                .select(*_SEEN_KEY)
            )
        add = self._seen_unfolded_delta(folded, upto_round, bucket_filter)
        if add is not None:
            parts.append(add.select(*_SEEN_KEY))
        return parts

    def _read_seen_legacy(
        self, upto_round: int, bucket_filter: list[int] | None = None
    ) -> DataFrame:
        """Pre-incremental layout: latest single compacted base + the
        deltas after it (kept so old state dirs resume byte-identically;
        their first compaction under the new code folds everything once
        and switches them to the manifest layout)."""
        base_round = self._latest_base_round("seen_base_round", upto_round)
        parts = []
        if base_round >= 0 and self.store.exists("seen_base", base_round):
            base = self.store.read_snapshot(self.spark, "seen_base", base_round)
            # prune ONLY if the base was bucketed with the CURRENT
            # modulus (recorded in its compaction round's commit meta)
            base_mod = self.store.meta(base_round).get("seen_buckets")
            if (
                bucket_filter is not None
                and "sbucket" in base.columns
                and base_mod == self._sb_mod()
            ):
                base = base.filter(F.col("sbucket").isin(bucket_filter))
            parts.append(base.drop("sbucket"))
        for r in self.store.committed_rounds():
            if base_round < r <= upto_round and self.store.exists("seen", r):
                d = self.store.read_snapshot(self.spark, "seen", r)
                if bucket_filter is not None:
                    d = d.filter(
                        self._sbucket(F.col("url_hash")).isin(bucket_filter)
                    )
                parts.append(d)
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _latest_base_round(self, key: str, upto_round: int) -> int:
        """Most recent committed compaction base at or before
        ``upto_round`` (shared by the seen and filter readers — the two
        must resolve bases identically or their reads desynchronize:
        zero-fetch commits carry the key forward as a copied value, and
        the delta window is strictly (base, upto])."""
        for r in reversed(self.store.committed_rounds()):
            if r > upto_round:
                continue
            v = self.store.meta(r).get(key)
            if v is not None:
                return v
        return -1

    def _suspect_bucket_counts(self, suspects: DataFrame) -> dict[int, int]:
        """Per-sbucket row counts of the round's bloom-positive
        suspects — ≤ cfg.seen_buckets result rows by construction. One
        small job against the round-cached `tagged` set; the keys drive
        the partition-pruned seen read and the summed counts decide
        whether the exact probe can invert to the broadcast form."""
        rows = (
            suspects.select(self._sbucket(F.col("url_hash")).alias("sb"))
            .groupBy("sb")
            .count()
            .collect()
        )
        return {int(r["sb"]): int(r["count"]) for r in rows}

    def _seen_delta_counts(self, folded: dict[int, int], upto_round: int) -> dict[int, int]:
        """Per-sbucket count of UNFOLDED seen-delta rows in
        (min folded, upto_round] — scans only delta tables (seen is
        append-only: no removal side)."""
        df = self._unfolded_deltas(
            ("seen",), ["url_hash"], folded, upto_round,
            lambda d: d.withColumn("__sb", self._sbucket(F.col("url_hash"))),
            "__sb",
        )
        if df is None:
            return {}
        rows = df.groupBy("__sb").count().collect()
        return {int(x["__sb"]): int(x["count"]) for x in rows}

    def _write_seen_base(self, assembled: DataFrame, r: int) -> list[int]:
        """Write a fold round's seen base. Keyed layout
        (cfg.seen_key_buckets > 0, the default): a Spark bucketed table
        CLUSTERED BY (url_hash, canon_url) — the Iceberg
        bucket(N, key) transform analog — so the large-suspect exact
        probe joins it with zero seen-side Exchange
        (tableio.write_keyed_bucketed). The pre-write repartition uses
        the SAME (key, N) hash partitioning as the bucket spec, so each
        write task holds exactly one key-bucket: one file per
        (sbucket, key-bucket) pair instead of tasks × buckets."""
        cfg = self.cfg
        if cfg.seen_key_buckets:
            return self.store.write_keyed_bucketed(
                assembled.repartition(cfg.seen_key_buckets, *_SEEN_KEY),
                "seen_base",
                r,
                list(_SEEN_KEY),
                cfg.seen_key_buckets,
                bucket_col="sbucket",
            )
        return self.store.write_bucketed(
            assembled.repartition(cfg.fetch_tasks, "sbucket", "url_hash"),
            "seen_base",
            r,
            bucket_col="sbucket",
        )

    def _maybe_compact_seen(self, r: int) -> dict:
        """Every K rounds, fold ONLY the sbuckets whose unfolded delta
        exceeds ``seen_compact_dirty_frac`` of their base rows (or whose
        watermark lags > ``seen_compact_max_lag`` compactions) into
        per-bucket base dirs — the seen analog of incremental pending
        compaction (VERDICT r2 watch item: at 10^10 fetched rows a
        full-table base rewrite every K rounds is the worst round's
        cost; dirty-bucket folding bounds it to O(active buckets)).
        Returns the commit-meta updates (carried forward unchanged on
        non-compaction rounds). Round r's just-written (uncommitted)
        delta is inside the fold window — dropping it would lose a
        round of discoveries from the base."""
        cfg, store = self.cfg, self.store
        prev = store.meta(r - 1)
        state = self._seen_state_of(prev)
        carry = {
            k: prev.get(k)
            for k in (
                "seen_manifest",
                "seen_folded",
                "seen_bucket_rows",
                "seen_base_round",
            )
            if prev.get(k) is not None
        }
        if not cfg.compact_seen_every or r % cfg.compact_seen_every != 0:
            carry["seen_rewritten"] = 0
            return carry
        if state is None:
            # pre-incremental store: fold EVERYTHING once (same cost as
            # the old full rewrite), then incremental from here on
            full = self._read_seen_legacy(r - 1)
            if store.exists("seen", r):
                full = full.unionByName(store.read_snapshot(self.spark, "seen", r))
            assembled = full.withColumn(
                "sbucket", self._sbucket(F.col("url_hash"))
            ).persist()
            written = self._write_seen_base(assembled, r)
            counts = {
                int(x["sbucket"]): int(x["count"])
                for x in assembled.groupBy("sbucket").count().collect()
            }
            assembled.unpersist()
            return {
                "seen_manifest": {b: r for b in written},
                "seen_folded": {b: r for b in range(self._sb_mod())},
                "seen_bucket_rows": counts,
                "seen_base_round": r,
                "seen_base_layout": {"key_buckets": cfg.seen_key_buckets},
                "seen_rewritten": sum(counts.values()),
            }
        manifest, folded, brows = ({**d} for d in state)
        dirty = self._seen_delta_counts(folded, r)
        # sbuckets hash url_hash UNIFORMLY (unlike pending's host-keyed
        # buckets), so every bucket's delta/base ratio crosses the
        # threshold at the same time — without staggering, compactions
        # would fold the whole table in one burst. Round-robin cohorts
        # fold each bucket once per max_lag compactions, bounding BOTH
        # the watermark lag (≤ max_lag×K rounds) and the worst single
        # compaction (≈ 1/max_lag of the table + threshold-triggered
        # hot buckets); lag_floor stays as a safety net across cadence
        # changes.
        lag = max(1, cfg.seen_compact_max_lag)
        cohort = (r // cfg.compact_seen_every) % lag
        lag_floor = r - lag * cfg.compact_seen_every
        fold_set = {
            b
            for b, c in dirty.items()
            if c > cfg.seen_compact_dirty_frac * brows.get(b, 0)
            or b % lag == cohort
            or folded.get(b, -1) < lag_floor
        }
        for b in folded:
            if b not in dirty:
                folded[b] = r  # clean bucket: free watermark advance
        base_round = carry.get("seen_base_round")
        if fold_set:
            assembled = (
                self._read_seen_for_fold(manifest, folded, r, fold_set)
                .withColumn("sbucket", self._sbucket(F.col("url_hash")))
                .persist()
            )
            written = self._write_seen_base(assembled, r)
            counts = {
                int(x["sbucket"]): int(x["count"])
                for x in assembled.groupBy("sbucket").count().collect()
            }
            assembled.unpersist()
            for b in fold_set:
                folded[b] = r
                manifest.pop(b, None)
                brows[b] = 0
            for b in written:
                manifest[b] = r
            brows.update(counts)
            base_round = r
        return {
            "seen_manifest": manifest,
            "seen_folded": folded,
            "seen_bucket_rows": brows,
            "seen_base_round": base_round,
            # recorded ONLY on rounds that wrote a base: _read_seen_parts
            # looks the layout up per manifest round, so a config change
            # applies to future folds without invalidating old bases
            **(
                {"seen_base_layout": {"key_buckets": cfg.seen_key_buckets}}
                if fold_set
                else {}
            ),
            # O(dirty-buckets) evidence, seen analog of pending_rewritten
            "seen_rewritten": sum(counts.values()) if fold_set else 0,
        }

    def _read_seen_for_fold(
        self,
        manifest: dict[int, int],
        folded: dict[int, int],
        upto_round: int,
        buckets: set[int],
    ) -> DataFrame:
        """Assemble the full seen content of ``buckets`` up to and
        including round ``upto_round`` (whose delta is not committed
        yet): their base dirs ∪ their unfolded deltas."""
        man = {b: v for b, v in manifest.items() if b in buckets}
        fol = {b: v for b, v in folded.items() if b in buckets}
        parts = []
        base = self.store.read_buckets(
            self.spark, "seen_base", man, bucket_col="sbucket"
        )
        if base is not None:
            parts.append(base.select(*SEEN_COLS))
        add = self._unfolded_deltas(
            ("seen",), None, fol, upto_round,
            lambda d: d.withColumn("__sb", self._sbucket(F.col("url_hash"))),
            "__sb",
            join_type="inner",  # inner: only the fold set's buckets
        )
        if add is not None:
            parts.append(add.select(*SEEN_COLS))
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    def _maybe_compact_filters(self, r: int) -> int | None:
        """Filter-table analog of seen compaction: OR-merge all delta
        blobs per pid into one base row (table-probe mode only)."""
        cfg = self.cfg
        if not cfg.use_bloom or not self._table_probe():
            return None
        if not cfg.compact_seen_every or r % cfg.compact_seen_every != 0:
            return None
        merged = or_merge_filters_df(self._read_filters_with_round(r))
        self.store.write_snapshot(merged, "seen_filters_base", r)
        return r

    def _read_filters_with_round(self, r: int) -> DataFrame:
        """_read_filters(r-1) plus round r's just-written (uncommitted)
        delta, mirroring _maybe_compact_seen's union."""
        df = self._read_filters(r - 1)
        if self.store.exists("seen_filters", r):
            df = df.unionByName(self.store.read_snapshot(self.spark, "seen_filters", r))
        return df

    # ----------------------------------------------------------- bloom ----

    def _m_bits(self) -> int:
        try:
            return self.store.meta(0)["bloom_m_bits"]
        except FileNotFoundError:
            return PartitionedBloom.size_for(self.cfg.expected_urls, self.cfg.bloom)

    def _bloom_cfg(self) -> BloomConfig:
        """Bloom geometry pinned at init (round-0 meta, like bloom_m_bits):
        a resume with a changed partitions/k would otherwise probe the
        persisted filter blobs with the wrong pid / bit positions —
        bloom false negatives whose rows bypass the exact anti-join and
        get re-crawled. Config changes to the geometry take effect only
        on a fresh store."""
        try:
            m = self.store.meta(0)
        except FileNotFoundError:
            return self.cfg.bloom
        return BloomConfig(
            partitions=m.get("bloom_partitions", self.cfg.bloom.partitions),
            bits_per_key=m.get("bloom_bits_per_key", self.cfg.bloom.bits_per_key),
            k=m.get("bloom_k", self.cfg.bloom.k),
        )

    def _table_probe(self) -> bool:
        """Probe-path choice: forced by config, else by total filter
        bytes vs the broadcast budget (static per crawl — m_bits is
        fixed at init from expected_urls)."""
        if self.cfg.bloom_table_probe is not None:
            return self.cfg.bloom_table_probe
        total = self._bloom_cfg().partitions * self._m_bits() // 8
        return total > self.cfg.bloom_broadcast_max_bytes

    def _ensure_bloom(self, upto_round: int) -> PartitionedBloom:
        """Rebuild filters from the exact seen table (filters are a
        cache; the table is the truth — SURVEY.md §7.3.4)."""
        if self._bloom is not None:
            return self._bloom
        m_bits = self._m_bits()
        bloom = PartitionedBloom(self._bloom_cfg(), m_bits)
        seen = self._read_seen(upto_round)
        if seen is not None:
            bloom.add_filter_rows(
                build_filter_deltas(
                    seen, self._bloom_cfg(), m_bits,
                    subsplits=self.cfg.bloom_rebuild_subsplits,
                )
            )
        self._bloom = bloom
        self._bloom_bc_stale = True
        return bloom

    def _bloom_broadcast(self):
        """One live broadcast generation at a time: destroy the previous
        one before re-broadcasting the updated filters (a long crawl
        must not accumulate a stale copy per round; ADVICE r1)."""
        if self._bloom_bc is not None and not self._bloom_bc_stale:
            return self._bloom_bc
        if self._bloom_bc is not None:
            self._bloom_bc.unpersist(blocking=False)
            self._bloom_bc.destroy(blocking=False)
        self._bloom_bc = self.spark.sparkContext.broadcast(bloom_payload(self._bloom))
        self._bloom_bc_stale = False
        self._bc_generations += 1
        return self._bloom_bc

    def _read_filters(self, upto_round: int) -> DataFrame:
        """seen_filters = latest compacted base + deltas after it, PLUS
        an in-memory catch-up delta for every committed round whose seen
        delta has no persisted filter delta (rounds run with
        use_bloom=False or in broadcast mode, or a store that predates
        table mode). Filters are a cache — the seen table is the truth —
        and a silent coverage gap would turn into bloom false negatives
        whose rows bypass the exact anti-join. The catch-up is never
        written into a committed round's directory (that would violate
        the write-then-commit invariant: a crash mid-write could leave a
        committed round unreadable with nothing re-running to heal it);
        it is recomputed per round until the next filter compaction
        folds it into the persisted base."""
        base_round = self._latest_base_round("filters_base_round", upto_round)
        parts = []
        if base_round >= 0 and self.store.exists("seen_filters_base", base_round):
            parts.append(self.store.read_snapshot(self.spark, "seen_filters_base", base_round))
        missing = []
        for r in self.store.committed_rounds():
            if base_round < r <= upto_round:
                if self.store.exists("seen_filters", r):
                    parts.append(self.store.read_snapshot(self.spark, "seen_filters", r))
                elif self.store.exists("seen", r):
                    missing.append(r)
        if missing:
            gap = self.store.read_snapshot(self.spark, "seen", missing[0])
            for r in missing[1:]:
                gap = gap.unionByName(self.store.read_snapshot(self.spark, "seen", r))
            parts.append(
                build_filter_delta_df(
                    gap, self._bloom_cfg(), self._m_bits(),
                    subsplits=self.cfg.bloom_rebuild_subsplits,
                )
            )
        df = parts[0]
        for p in parts[1:]:
            df = df.unionByName(p)
        return df

    # ------------------------------------------------------------ round ---

    def _run_round(self, r: int, scope_hosts: DataFrame | None, fetched_total: int) -> dict:
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
        prev_meta = store.meta(r - 1)
        prev_manifest = {int(k): v for k, v in prev_meta["pending_manifest"].items()}
        prev_folded = self._folded_of(prev_meta)
        prev_brows = {
            int(k): int(v)
            for k, v in (prev_meta.get("pending_bucket_rows") or {}).items()
        }
        prev_pending_n = prev_meta["pending"]
        pending = self._assemble_pending(prev_manifest, prev_folded, r - 1)
        remaining = None
        if cfg.max_pages is not None:
            remaining = cfg.max_pages - fetched_total
            if remaining <= 0:
                return {"fetched": 0, "stop": True}
        if cfg.round_capacity is not None:
            remaining = (
                cfg.round_capacity
                if remaining is None
                else min(remaining, cfg.round_capacity)
            )
        prev_stats = self._pending_stats_of(prev_meta)
        prune_info = {"buckets_read": None, "prune_fallback": 0}
        deq = None
        deq_cached = None
        if cfg.pending_prune and remaining is not None and prev_stats is None:
            # legacy-store bootstrap: one full-frontier agg this round;
            # every later round prunes off the maintained bounds
            prev_stats = self._bucket_stats(pending)
            prune_info["refreshed"] = True  # bootstrap IS a refresh
        if (
            cfg.pending_prune
            and remaining is not None
            and 0 < remaining < prev_pending_n  # full drain needs every bucket
            and prev_stats is not None
            # supply-limited regime (post-budget eligible rows < the
            # capacity — review r4 finding): no prefix can ever fill
            # the capacity, so skip the attempts until a round fills it
            and prev_meta.get("capacity_filled", True)
        ):
            maxp_b, cnt_b = prev_stats
            order_b = sorted(maxp_b, key=lambda b: (-maxp_b[b], b))
            target = cfg.pending_prune_slack * remaining
            # initial prefix: maxp-ranked buckets holding ≥ slack×
            # capacity candidate rows. That can undershoot — the top-k
            # rows live in the first j* buckets where j* = count of
            # buckets with maxp ≥ the true cutoff, and j* is not
            # derivable from the bounds — so the prefix GROWS
            # geometrically on a failed check (≤ log attempts, total
            # rows read bounded by a constant × the final prefix) and
            # degenerates to the full read when the frontier genuinely
            # needs every bucket (uniform top band).
            m = 0
            acc = 0
            while m < len(order_b) and acc < target:
                acc += cnt_b.get(order_b[m], 0)
                m += 1
            attempts = 0
            while m < len(order_b):
                prefix = order_b[:m]
                skipped = order_b[m:]
                attempts += 1
                pruned = self._assemble_pending(
                    prev_manifest, prev_folded, r - 1, buckets=set(prefix)
                )
                cand = dequeue(
                    pruned, self.robots, cfg.default_budget, max_take=remaining
                ).persist()
                a = cand.agg(
                    F.count(F.lit(1)).alias("c"), F.min("priority").alias("mp")
                ).collect()[0]
                thresh = max(maxp_b[b] for b in skipped)
                # sound iff the capacity filled from the prefix AND the
                # worst selected priority strictly beats every skipped
                # bucket's bound (a tie could lose on canon_url order)
                if (
                    int(a["c"]) == remaining
                    and a["mp"] is not None
                    and float(a["mp"]) > thresh
                ):
                    deq = deq_cached = cand
                    prune_info["buckets_read"] = len(prefix)
                    prune_info["prune_attempts"] = attempts
                    break
                cand.unpersist()
                m = min(len(order_b), max(m * 4, 1))
            if deq is None and attempts:
                prune_info["prune_fallback"] = 1
        if deq is None:
            deq = dequeue(pending, self.robots, cfg.default_budget, max_take=remaining)
        pages = fetch_stage(
            deq,
            cfg.world,
            cfg.fetch_tasks,
            decode_images=cfg.decode_images,
            follow=cfg.follow,
            dont_follow=cfg.dont_follow,
            strict_filters=cfg.strict_reference_filters,
            http_endpoint=cfg.http_endpoint,
            no_new_links=cfg.no_new_links,
            load_resources=cfg.load_resources,
        )
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
        if deq_cached is not None:
            deq_cached.unpersist()
        metrics = {k: (int(v) if v is not None else 0) for k, v in obs.get.items()}
        tick("dequeue+fetch+write_pages")
        pages = store.read_snapshot(spark, "pages", r)
        # free: observed during the write — no extra count job per round
        n_fetched = metrics.get("fetched", 0)
        if n_fetched == 0:
            # nothing dequeued → pending unchanged; carry the manifest
            # forward instead of rewriting any bucket
            seen_carry = {
                k: prev_meta.get(k)
                for k in ("seen_manifest", "seen_folded", "seen_bucket_rows",
                          "seen_base_round", "seen_buckets",
                          "pending_bucket_maxp", "pending_bucket_cnt_ub",
                          "pending_stats_refresh_round")
                if prev_meta.get(k) is not None
            }
            store.commit(r, {"fetched_total": fetched_total, "pending": prev_pending_n,
                             "pending_manifest": prev_manifest,
                             "pending_compact_round": min(prev_folded.values(), default=r - 1),
                             "pending_folded": prev_folded,
                             "pending_bucket_rows": prev_brows,
                             **seen_carry,
                             "fetched_round": 0})
            return {"fetched": 0, "stop": True}
        # NOTE: no separate crawl-log write — the pages table already
        # carries (canon_url, status_code, host, depth, priority) and
        # the round number is in the partition path; crawl_log() is a
        # column-pruned read of pages. One fewer job per round: constant
        # per-round cost is the Amdahl serial fraction of the whole
        # engine, so every removed fixed job buys scaling efficiency.
        link_src = pages
        if cfg.no_new_links:
            # reference no-new-links mode: page hrefs are NOT enqueued,
            # only redirect Location targets (mainCrawler.go:164-173)
            link_src = pages.filter(F.col("status_code").between(300, 307))
        cands = enqueue_rows(link_src, self.robots, scope_hosts, r)
        invert = False  # whether the exact probe ran broadcast-inverted
        probe_parts = False  # whether it ran storage-partitioned (keyed bases)
        if cfg.use_bloom:
            # persist: the bloom split consumes `tagged` twice (fresh +
            # suspects) — without the cache the extract/dedupe pipeline
            # runs twice per round
            if self._table_probe():
                tagged = bloom_probe_cogroup(
                    cands, self._read_filters(r - 1), self._bloom_cfg(), self._m_bits()
                ).persist()
            else:
                self._ensure_bloom(r - 1)
                tagged = bloom_partition_df(cands, bc=self._bloom_broadcast()).persist()
            fresh = tagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
            raw_suspects = tagged.filter(F.col("maybe_seen")).drop("maybe_seen")
            # exact-probe read: once the crawl is large, prune the seen
            # scan to the partitions holding this round's suspects (the
            # bucket stats cost one small job against the cached tagged
            # set; below the threshold the whole table is cheaper).
            # The same job's counts decide the join strategy: a small
            # suspect set inverts the anti-join to the broadcast form
            # (seen_anti_join) so the pruned history is scanned, never
            # shuffled. Bloom stays hash-keyed (a colliding new URL
            # just becomes a suspect and resolves in the exact probe).
            if fetched_total >= cfg.seen_prune_min_total:
                sb_counts = self._suspect_bucket_counts(raw_suspects)
                bf = sorted(sb_counts)
                invert = (
                    0 < sum(sb_counts.values()) <= cfg.suspect_broadcast_max
                )
            else:
                bf = None
            if invert:
                seen = self._read_seen(r - 1, bucket_filter=bf)
                suspects = seen_anti_join(raw_suspects, seen, True)
            else:
                # LARGE-suspect regime: probe each storage-bucketed base
                # part on its own (seen_anti_join_parts) — the history
                # side carries zero Exchange; only the suspect set
                # reshuffles, once. Falls back to the unioned read +
                # plain anti-join on pre-keyed layouts or when the
                # keyed layout is disabled (seen_key_buckets=0).
                parts = (
                    self._read_seen_parts(r - 1, bucket_filter=bf)
                    if cfg.seen_key_buckets
                    else None
                )
                if parts is not None:
                    suspects = seen_anti_join_parts(raw_suspects, parts)
                    probe_parts = True
                else:
                    seen = self._read_seen(r - 1, bucket_filter=bf)
                    suspects = seen_anti_join(raw_suspects, seen, False)
            new = fresh.unionByName(suspects)
        else:
            tagged = None
            seen = self._read_seen(r - 1)
            new = cands.join(
                seen.select("url_hash", "canon_url"),
                ["url_hash", "canon_url"],
                "left_anti",
            )
        new = _with_salt_cols(new, cfg.n_salts).select(*PENDING_COLS)
        # the seen delta carries the full pending shape (lineage incl.) so
        # the next-round pending rows are a column-pruned re-read, not a
        # recompute; first_round == discovered_round here. The delta size
        # is observed during the write — no extra count job per round.
        sobs = Observation(f"seen_{r}")
        store.append(
            new.withColumn("first_round", F.lit(r)).observe(
                sobs, F.count(F.lit(1)).alias("rows")
            ),
            "seen",
            r,
        )
        n_new = int(sobs.get.get("rows") or 0)
        if tagged is not None:
            tagged.unpersist()
        # maintain the per-bucket pruning bounds: one O(delta) agg over
        # the just-written seen delta (the round's pending adds).
        # Removals are ignored — bounds stay upper bounds; fold below
        # resets folded buckets to exact values.
        st_maxp: dict[int, float] | None = None
        st_cnt: dict[int, int] | None = None
        stats_refresh_round = int(prev_meta.get("pending_stats_refresh_round", 0))
        if remaining is None:
            # uncapacitated round: the pruned read can never engage (it
            # requires a capacity), so the per-round stats-maintenance
            # agg is pure overhead — skip it and DROP the stats from
            # this commit (carrying them forward un-maintained would
            # break their upper-bound invariant). A later capacitated
            # round bootstraps fresh bounds via _bucket_stats, exactly
            # like a legacy store.
            prev_stats = None
        if prev_stats is not None:
            # (never created from deltas alone — a delta-only map is
            # not an upper bound for buckets with untracked base rows;
            # stats exist only via round-0 init or the bootstrap agg)
            st_maxp, st_cnt = dict(prev_stats[0]), dict(prev_stats[1])
            if prune_info.get("refreshed"):
                stats_refresh_round = r
            elif (
                prune_info["prune_fallback"]
                and n_fetched >= (remaining or 0)
                and r - stats_refresh_round >= 2
            ):
                # a fallback means the stored bounds no longer rank the
                # buckets usefully (stale-high maxp after the top rows
                # were fetched) — re-derive them exactly from the
                # frontier the fallback already paid to read. Rate-
                # limited so a genuinely unprunable (uniform-top-band)
                # frontier doesn't pay a refresh scan every round.
                st_maxp, st_cnt = self._bucket_stats(pending)
                stats_refresh_round = r
            if n_new:
                drows = (
                    self._with_pbucket(store.read_snapshot(spark, "seen", r))
                    .groupBy("pbucket")
                    .agg(F.count(F.lit(1)).alias("c"), F.max("priority").alias("mp"))
                    .collect()
                )
                for x in drows:
                    b = int(x["pbucket"])
                    mp = float(x["mp"])
                    st_maxp[b] = mp if b not in st_maxp else max(st_maxp[b], mp)
                    st_cnt[b] = st_cnt.get(b, 0) + int(x["c"])
        tick("enqueue+dedupe+write_seen")
        # merge-on-read pending: the round's seen delta and pages log ARE
        # the pending add/remove deltas — nothing extra is written here.
        # Every pending_compact_every rounds the assembled table is
        # rewritten bucket-partitioned to bound read amplification.
        pending_rewritten = 0
        manifest, folded, brows = dict(prev_manifest), dict(prev_folded), dict(prev_brows)
        if cfg.pending_compact_every and r % cfg.pending_compact_every == 0:
            # incremental compaction (VERDICT r2 item 4): fold ONLY the
            # buckets whose unfolded delta exceeds dirty_frac of their
            # base rows (or whose watermark lags > max_lag compactions)
            # — a compaction touches O(dirty buckets), never the table.
            dirty = self._pending_delta_counts(folded, r)
            # cohort staggering (see _maybe_compact_seen): if activity
            # is uniform over host buckets, all cross the threshold
            # together — the round-robin cohort bounds the worst
            # compaction round to ~1/max_lag of the table
            lag = max(1, cfg.pending_compact_max_lag)
            cohort = (r // cfg.pending_compact_every) % lag
            lag_floor = r - lag * cfg.pending_compact_every
            fold_set = {
                b
                for b, c in dirty.items()
                if c > cfg.pending_compact_dirty_frac * brows.get(b, 0)
                or b % lag == cohort
                or folded.get(b, -1) < lag_floor
            }
            # clean buckets advance their watermark for free: no deltas
            # to fold, so the base already reflects round r
            for b in folded:
                if b not in dirty:
                    folded[b] = r
            if fold_set:
                assembled = self._with_pbucket(
                    self._assemble_pending(manifest, folded, r, buckets=fold_set)
                ).persist()
                written = store.write_bucketed(
                    assembled.repartition(cfg.fetch_tasks, "pbucket", "salt"),
                    "pending_b",
                    r,
                )
                fold_maxp, counts = self._bucket_stats(assembled)
                assembled.unpersist()
                for b in fold_set:
                    folded[b] = r
                    manifest.pop(b, None)  # empty after fold → no dir
                    brows[b] = 0
                    if st_maxp is not None:
                        # fold resets the bounds to exact values; an
                        # empty bucket loses its entries entirely
                        st_maxp.pop(b, None)
                        st_cnt.pop(b, None)
                for b in written:
                    manifest[b] = r
                brows.update(counts)
                if st_maxp is not None:
                    st_maxp.update(fold_maxp)
                    st_cnt.update(counts)
                pending_rewritten = sum(counts.values())
        tick("write_pending")
        # dequeued rows == pages (1:1) and the adds are exactly the seen
        # delta, so the count is arithmetic — no frontier scan
        n_pending = prev_pending_n - n_fetched + n_new
        if (
            cfg.pending_reconcile_every
            and r % cfg.pending_reconcile_every == 0
        ):
            actual = self._assemble_pending(manifest, folded, r).count()
            if actual != n_pending:
                raise RuntimeError(
                    f"pending drift at round {r}: arithmetic count "
                    f"{n_pending} != assembled table {actual} — a fetch/"
                    "enqueue invariant (1 row per dequeued URL; in-round "
                    "dedup) has been violated"
                )
        tick("count_pending")
        # extend the filters with this round's discoveries
        if cfg.use_bloom:
            delta = store.read_snapshot(spark, "seen", r)
            if self._table_probe():
                store.append(
                    # subsplits: a high-discovery round's delta is
                    # bounded only by the frontier, not by politeness
                    build_filter_delta_df(
                        delta, self._bloom_cfg(), self._m_bits(),
                        subsplits=cfg.bloom_rebuild_subsplits,
                    ),
                    "seen_filters",
                    r,
                )
            elif self._bloom is not None and n_new:
                if n_new <= 2_000_000:
                    # round-scale delta: one column-pruned Arrow collect
                    # (≤16 MB of hashes) + a local numpy build — same
                    # bits, none of the shuffle + pandas-group fixed
                    # cost the distributed build pays per round
                    hashes = (
                        delta.select("url_hash").toPandas()["url_hash"].to_numpy()
                    )
                    self._bloom.add_filter_rows(
                        build_filter_rows_from_hashes(
                            hashes, self._bloom_cfg(), self._bloom.m_bits
                        )
                    )
                else:
                    self._bloom.add_filter_rows(
                        build_filter_deltas(
                            delta, self._bloom_cfg(), self._bloom.m_bits
                        )
                    )
                self._bloom_bc_stale = True
            tick("bloom_delta_build")
        seen_meta = self._maybe_compact_seen(r)  # fold or carry forward
        fbase = self._maybe_compact_filters(r)
        if fbase is None:
            fbase = self.store.meta(r - 1).get("filters_base_round")
        store.commit(
            r,
            {
                "fetched_total": fetched_total + n_fetched,
                "pending": n_pending,
                "pending_manifest": manifest,
                # informational uniform lower bound; the true per-bucket
                # watermark is pending_folded. NOTE: downgrading a store
                # to pre-incremental code is NOT supported — an old
                # reader has no watermark filter and would double-count
                # deltas already folded into newer per-bucket bases
                "pending_compact_round": min(folded.values(), default=r),
                "pending_folded": folded,
                "pending_bucket_rows": brows,
                "fetched_round": n_fetched,
                "metrics": metrics,
                **seen_meta,
                # modulus in effect (pinned at round 0 — _sb_mod); the
                # legacy pruned read checks it against the base's
                # compaction round before trusting on-disk sbucket dirs
                "seen_buckets": self._sb_mod(),
                "filters_base_round": fbase,
                # O(delta) evidence: pending rows rewritten this round
                # (0 except compaction rounds) — the bench's
                # frontier-growth check reads this
                "pending_rewritten": pending_rewritten,
                # supply regime marker for the prune guard: did this
                # round's dequeue fill its capacity?
                "capacity_filled": remaining is None or n_fetched >= remaining,
                **(
                    {
                        "pending_bucket_maxp": st_maxp,
                        "pending_bucket_cnt_ub": st_cnt,
                        "pending_stats_refresh_round": stats_refresh_round,
                    }
                    if st_maxp is not None
                    else {}
                ),
            },
        )
        return {
            "fetched": n_fetched,
            "pending": n_pending,
            "pending_rewritten": pending_rewritten,
            "seen_rewritten": seen_meta.get("seen_rewritten", 0),
            "pending_before": prev_pending_n,
            # O(contributing buckets) evidence for the pruned read:
            # buckets actually assembled for the dequeue (None = full)
            "pending_buckets_read": prune_info["buckets_read"],
            "prune_fallback": prune_info["prune_fallback"],
            # whether the exact seen probe ran as the shuffle-free
            # broadcast-inverted join this round (small suspect set)
            "seen_probe_inverted": invert,
            # large-suspect regime ran the zero-history-Exchange
            # storage-partitioned chain (VERDICT r4 item 1)
            "seen_probe_parts": probe_parts,
            "stop": n_pending == 0,
        }

    # ------------------------------------------------------------- run ----

    def run(self) -> dict:
        import time as _time

        cfg, store = self.cfg, self.store
        if store.last_round() is None:
            self._init_round0()
        last = store.last_round()
        scope_hosts = None
        if store.meta(0).get("scope_seed_hosts", cfg.scope_seed_hosts):
            # seed hosts = round-0 seen table (exact under resume too);
            # cached: it is re-joined every round
            scope_hosts = (
                store.read_snapshot(self.spark, "seen", 0)
                .select("host")
                .distinct()
                .cache()
            )
        stats: dict = {"rounds": last, "round_times": []}
        for r in range(last + 1, cfg.max_rounds + 1):
            prev = store.meta(r - 1)
            fetched_total = prev["fetched_total"]
            if prev.get("pending") == 0:
                break
            if cfg.max_pages is not None and fetched_total >= cfg.max_pages:
                break
            if r - 1 > 0 and prev.get("fetched_round") == 0:
                # stalled stop: the prior invocation concluded with an
                # empty round (pending exists but nothing dequeuable —
                # e.g. budget-0 hosts). The dequeue is deterministic
                # under a pinned config, so re-running would only
                # append another spurious empty committed round per
                # invocation, breaking exact-resume (O77) and the
                # simulator's rounds parity.
                break
            t0 = _time.time()
            out = self._run_round(r, scope_hosts, fetched_total)
            stats["round_times"].append(
                {"round": r, "seconds": round(_time.time() - t0, 2),
                 "fetched": out.get("fetched", 0),
                 "pending_before": out.get("pending_before"),
                 "pending_rewritten": out.get("pending_rewritten"),
                 "seen_rewritten": out.get("seen_rewritten"),
                 "pending_buckets_read": out.get("pending_buckets_read"),
                 "prune_fallback": out.get("prune_fallback"),
                 "seen_probe_inverted": out.get("seen_probe_inverted"),
                 "seen_probe_parts": out.get("seen_probe_parts")}
            )
            stats["rounds"] = r
            if out.get("stop"):
                break
        stats["fetched_total"] = store.meta(store.last_round())["fetched_total"]
        if scope_hosts is not None:
            scope_hosts.unpersist()
        return stats

    # ------------------------------------------------------- accessors ----

    def crawl_log(self) -> DataFrame:
        """Crawl log with the derived sequence number, projected from
        the pages table (column-pruned parquet scan — body never read;
        the round comes from the ``round=K`` partition path). The total
        order is pinned as (round, priority desc, canon_url); seq is an
        analytics-time window, never part of the crawl hot path."""
        from pyspark.sql import Window

        df = self.store.read_appends(self.spark, "pages", self.store.last_round() or 0)
        if df is None:
            # zero pages ever fetched (all seeds robots-blocked / empty
            # seed list): an EMPTY log, not None — the simulator oracle
            # returns [] for the same inputs and callers chain
            # .collect()/.filter() directly
            return self.spark.createDataFrame(
                [],
                "round int, seq int, canon_url string, status_code int, "
                "host string, depth int",
            )
        df = df.select(
            # anchored to the file's own partition dir (…/round=K/<file>)
            # so a state_dir path that itself contains "round=" can't
            # shadow the real partition value
            F.regexp_extract(F.input_file_name(), r"round=(\d+)/[^/]+$", 1)
            .cast("int")
            .alias("round"),
            "canon_url", "status_code", "host", "depth", "priority",
        )
        # distributed per-round rank (VERDICT r3 item 9): a 10^8-page
        # round must not sort in one task, so seq is computed as the
        # standard range-partitioned rank — range-partition by the
        # total order (round asc, priority desc, canon_url asc), rank
        # WITHIN each (round, partition) slice, and add the count of
        # the round's rows in earlier partitions. Range partitioning
        # guarantees every row of partition i precedes every row of
        # partition j>i in that order, so offset+rank is the exact
        # global rank. The offset table is ≤ rounds×npart rows
        # (broadcast); both consumers of `ranked` hang off the same
        # range Exchange. __pid is only meaningful if both consumers
        # see the SAME partitioning instance — RangePartitioner
        # re-samples boundaries with an rdd.id-derived seed on every
        # execution, so relying on ReusedExchange alone would corrupt
        # seq whenever the planner doesn't (or can't) reuse it. The
        # localCheckpoint pins the partitioned data once: both
        # branches read the identical materialized partitions, and an
        # executor loss fails loudly instead of recomputing into a
        # different partitioning (review r4 finding).
        npart = max(16, self.spark.sparkContext.defaultParallelism)
        order = [F.desc("priority"), F.asc("canon_url")]
        ranked = (
            df.repartitionByRange(npart, F.asc("round"), *order)
            .withColumn("__pid", F.spark_partition_id())
            .localCheckpoint(eager=False)
        )
        w = Window.partitionBy("round", "__pid").orderBy(*order)
        ranked = ranked.withColumn("__rk", F.row_number().over(w))
        cum = (
            Window.partitionBy("round")
            .orderBy("__pid")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        offs = (
            ranked.groupBy("round", "__pid")
            .agg(F.count(F.lit(1)).alias("__cnt"))
            .withColumn("__off", F.coalesce(F.sum("__cnt").over(cum), F.lit(0)))
            .select("round", "__pid", "__off")
        )
        return (
            ranked.join(F.broadcast(offs), ["round", "__pid"])
            .withColumn("seq", (F.col("__off") + F.col("__rk")).cast("int"))
            .select("round", "seq", "canon_url", "status_code", "host", "depth")
            .orderBy("round", "seq")
        )

    def seen(self) -> DataFrame:
        return self._read_seen(self.store.last_round() or 0)

    def lineage(self) -> DataFrame:
        """Per-partition lineage (north_rule): for every pending bucket,
        the round whose write produced its current on-disk state — the
        bucket-level provenance the merge-on-read reader resolves
        against. Rows: (pbucket, written_round, as_of_round)."""
        last = self.store.last_round() or 0
        meta = self.store.meta(last)
        manifest = {int(k): int(v) for k, v in meta["pending_manifest"].items()}
        rows = [
            {"pbucket": b, "written_round": r, "as_of_round": last}
            for b, r in sorted(manifest.items())
        ]
        schema = "pbucket int, written_round int, as_of_round int"
        return self.spark.createDataFrame(rows, schema=schema)

    def round_metrics(self) -> DataFrame:
        """Per-round crawl metrics from the commit markers (observed
        during the writes — zero extra jobs at crawl time): fetched,
        ok_200, redirects, errors, images_decoded, sum_resp_ms, plus
        frontier accounting. The ops-dashboard twin of crawl_monitor."""
        rows = []
        for r in self.store.committed_rounds():
            if r == 0:
                continue
            m = self.store.meta(r)
            met = m.get("metrics", {})
            rows.append(
                {
                    "round": r,
                    "fetched": int(m.get("fetched_round", 0)),
                    "ok_200": int(met.get("ok_200", 0)),
                    "redirects": int(met.get("redirects", 0)),
                    "errors": int(met.get("errors", 0)),
                    "images_decoded": int(met.get("images_decoded", 0)),
                    "sum_resp_ms": int(met.get("sum_resp_ms", 0)),
                    "pending_after": int(m.get("pending", 0)),
                    "pending_rewritten": int(m.get("pending_rewritten", 0)),
                }
            )
        schema = (
            "round int, fetched bigint, ok_200 bigint, redirects bigint, "
            "errors bigint, images_decoded bigint, sum_resp_ms bigint, "
            "pending_after bigint, pending_rewritten bigint"
        )
        return self.spark.createDataFrame(rows, schema=schema)

    def pages(self) -> DataFrame:
        df = self.store.read_appends(self.spark, "pages", self.store.last_round() or 0)
        if df is None:
            # same empty-not-None contract as crawl_log()
            from ..operators.fetch import PAGE_SCHEMA

            return self.spark.createDataFrame([], PAGE_SCHEMA)
        return df
