"""Iceberg-backed StateStore (SURVEY.md §7.5(a), VERDICT r4 item 7).

The parquet ``StateStore`` (tableio.py) implements the Iceberg contract
— per-round snapshots, append deltas, dynamic partition overwrite,
bucket-transform layout, commit-marker atomicity — on plain files so
this sandbox (no Iceberg runtime jar) can run it. This module is the
same contract on a REAL Iceberg catalog, for a cluster where the jars
exist: one Iceberg table per logical state table, partitioned by
``round`` (identity) so every round is a partition-pruned snapshot
read, plus Iceberg's ``bucket(N, key)`` transform for the seen base so
the large-suspect exact anti-join runs as a storage-partitioned join
(zero history-side Exchange — the same property the parquet store's
``write_keyed_bucketed`` provides via Spark data-source bucketing).

Commit protocol: a ``_commits`` Iceberg table appended LAST, exactly
like the parquet store writes its JSON marker last. Iceberg appends
are atomic snapshot commits, so a crash mid-round leaves the previous
round fully consistent and ``committed_rounds`` (a read of the commits
table) never sees a torn round — the engine's resume logic works
unchanged over either backend.

Selection: ``make_state_store(root, spark=spark, backend="iceberg",
catalog="my_catalog")``; the engine picks this up via
``EngineConfig.state_backend``. ``iceberg_available()`` gates
construction (and the tests) on the runtime actually carrying the
Iceberg SQL extensions — everything here import-cleans without them.

Reference analog: the crawler's page store + resume history
(mainCrawler.go:95-98) — as a cluster-grade table format instead of a
directory of JSON files.
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def iceberg_available(spark: SparkSession, catalog: str) -> bool:
    """True when ``catalog`` is a usable Iceberg catalog in this
    session — the gate every constructor and test goes through."""
    try:
        cls = spark.conf.get(f"spark.sql.catalog.{catalog}", None)
    except Exception:
        return False
    if not cls or "iceberg" not in cls.lower():
        return False
    try:
        # cheap end-to-end probe: namespace listing hits the catalog
        # implementation and fails fast if the jar is absent
        spark.sql(f"SHOW NAMESPACES IN {catalog}").collect()
        return True
    except Exception:
        return False


class IcebergStateStore:
    """Drop-in ``StateStore`` over an Iceberg catalog.

    Layout: namespace ``<catalog>.ncs_<digest(root)>``; logical table
    ``name`` → Iceberg table ``<ns>.<name>`` partitioned by
    ``round`` (identity) [+ ``bucket_col`` identity and
    ``bucket(N, key)`` when keyed]. ``root`` is only an identity salt
    here — data lives wherever the catalog's warehouse points.
    """

    COMMITS = "_commits"

    def __init__(self, root: str, spark: SparkSession, catalog: str = "iceberg"):
        if not iceberg_available(spark, catalog):
            raise RuntimeError(
                f"Iceberg catalog {catalog!r} is not configured in this "
                "session — add the iceberg-spark-runtime jar and "
                f"spark.sql.catalog.{catalog} settings, or use the "
                "parquet StateStore backend"
            )
        self.root = root
        self.spark = spark
        digest = hashlib.md5(root.encode()).hexdigest()[:10]
        self.ns = f"{catalog}.ncs_{digest}"
        spark.sql(f"CREATE NAMESPACE IF NOT EXISTS {self.ns}")
        spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self.ns}.{self.COMMITS} "
            "(round INT, meta STRING) USING iceberg"
        )

    # ---- commit protocol (append LAST = the atomicity point) ---------

    def committed_rounds(self) -> list[int]:
        rows = self.spark.table(f"{self.ns}.{self.COMMITS}").select("round").collect()
        return sorted(int(r["round"]) for r in rows)

    def last_round(self) -> int | None:
        rs = self.committed_rounds()
        return rs[-1] if rs else None

    def commit(self, round_no: int, meta: dict) -> None:
        # one-row append = one atomic Iceberg snapshot commit
        self.spark.createDataFrame(
            [(int(round_no), json.dumps({"round": round_no, **meta}))],
            "round int, meta string",
        ).writeTo(f"{self.ns}.{self.COMMITS}").append()

    def meta(self, round_no: int) -> dict:
        row = (
            self.spark.table(f"{self.ns}.{self.COMMITS}")
            .filter(F.col("round") == int(round_no))
            .select("meta")
            .head()
        )
        if row is None:
            raise FileNotFoundError(f"no commit for round {round_no}")
        return json.loads(row["meta"])

    # ---- snapshot / append tables -------------------------------------

    def _tbl(self, name: str) -> str:
        return f"{self.ns}.{name}"

    def _ensure(self, df: DataFrame, name: str, extra_partitions: str = "") -> None:
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
        )
        parts = "round" + (", " + extra_partitions if extra_partitions else "")
        self.spark.sql(
            f"CREATE TABLE IF NOT EXISTS {self._tbl(name)} "
            f"({cols}, round INT) USING iceberg PARTITIONED BY ({parts})"
        )

    def write_snapshot(self, df: DataFrame, name: str, round_no: int) -> None:
        """Iceberg dynamic partition overwrite of ``round=K`` — a
        re-run after a crash replaces the torn partition atomically."""
        self._ensure(df, name)
        (
            df.withColumn("round", F.lit(int(round_no)))
            .writeTo(self._tbl(name))
            .overwritePartitions()
        )

    def read_snapshot(self, spark: SparkSession, name: str, round_no: int) -> DataFrame:
        return (
            spark.table(self._tbl(name))
            .filter(F.col("round") == int(round_no))
            .drop("round")
        )

    def append(self, df: DataFrame, name: str, round_no: int) -> None:
        # a per-round append IS that round's snapshot (same rule as the
        # parquet store) — overwritePartitions keeps crash re-runs exact
        self.write_snapshot(df, name, round_no)

    def read_appends(
        self, spark: SparkSession, name: str, upto_round: int
    ) -> DataFrame | None:
        committed = self.committed_rounds()
        if not committed:
            return None
        keep = [r for r in committed if r <= upto_round]
        if not keep:
            return None
        return (
            spark.table(self._tbl(name))
            .filter(F.col("round").isin(keep))
            .drop("round")
        )

    def exists(self, name: str, round_no: int) -> bool:
        if not self.spark.catalog.tableExists(self._tbl(name)):
            return False
        return (
            self.spark.table(self._tbl(name))
            .filter(F.col("round") == int(round_no))
            .head(1)
            != []
        )

    # ---- bucketed tables ------------------------------------------------

    def write_bucketed(
        self, df: DataFrame, name: str, round_no: int, bucket_col: str = "pbucket"
    ) -> list[int]:
        self._ensure(df, name, extra_partitions=f"`{bucket_col}`")
        (
            df.withColumn("round", F.lit(int(round_no)))
            .writeTo(self._tbl(name))
            .overwritePartitions()
        )
        rows = (
            self.spark.table(self._tbl(name))
            .filter(F.col("round") == int(round_no))
            .select(bucket_col)
            .distinct()
            .collect()
        )
        return sorted(int(r[bucket_col]) for r in rows)

    def read_buckets(
        self,
        spark: SparkSession,
        name: str,
        manifest: dict[int, int],
        bucket_col: str = "pbucket",
    ) -> DataFrame | None:
        """Union of (round=R, bucket=B) partitions per the manifest —
        two partition-identity predicates, so Iceberg prunes to exactly
        the manifest's data files."""
        if not manifest:
            return None
        t = spark.table(self._tbl(name))
        cond = None
        for b, r in sorted(manifest.items()):
            c = (F.col("round") == int(r)) & (F.col(bucket_col) == int(b))
            cond = c if cond is None else (cond | c)
        return t.filter(cond).drop("round")

    def write_keyed_bucketed(
        self,
        df: DataFrame,
        name: str,
        round_no: int,
        key_cols: list[str],
        n_key_buckets: int,
        bucket_col: str = "sbucket",
    ) -> list[int]:
        """The real ``bucket(N, key)`` transform the parquet store
        emulates: with spark.sql.sources.v2.bucketing.enabled (+
        pushPartValues / partiallyClusteredDistribution for skew), an
        equi-join on exactly ``key_cols`` against this table plans as a
        storage-partitioned join — no Exchange on this side. Iceberg's
        bucket transform hashes single columns, so multi-column keys
        bucket on the FIRST key column; the join still co-partitions
        correctly because the remaining key columns only subdivide
        within a bucket."""
        self._ensure(
            df,
            name,
            extra_partitions=(
                f"`{bucket_col}`, bucket({int(n_key_buckets)}, `{key_cols[0]}`)"
            ),
        )
        (
            df.withColumn("round", F.lit(int(round_no)))
            .writeTo(self._tbl(name))
            .overwritePartitions()
        )
        rows = (
            self.spark.table(self._tbl(name))
            .filter(F.col("round") == int(round_no))
            .select(bucket_col)
            .distinct()
            .collect()
        )
        return sorted(int(r[bucket_col]) for r in rows)

    def read_keyed_bucketed(
        self,
        spark: SparkSession,
        name: str,
        round_no: int,
        key_cols: list[str],
        n_key_buckets: int,
        bucket_col: str = "sbucket",
    ) -> DataFrame:
        # the bucket spec lives in Iceberg metadata — nothing to
        # re-register on a fresh session, unlike the parquet emulation
        return (
            spark.table(self._tbl(name))
            .filter(F.col("round") == int(round_no))
            .drop("round")
        )

    # ---- frontier merge (the north-star MERGE INTO) ---------------------

    def merge_frontier(self, updates: DataFrame, name: str = "frontier") -> None:
        """``MERGE INTO frontier`` — the north-star single-table form of
        the engine's seen/pending delta writes: new URLs insert, already
        -seen URLs keep their first-discovery lineage (first_round) and
        only refresh mutable queue fields. The engine's merge-on-read
        layout (seen/pending deltas + fold compactions) is the same
        algebra expressed as append tables; on an Iceberg cluster this
        one statement replaces the delta-write + fold pair for the
        frontier table."""
        updates.createOrReplaceTempView("_ncs_frontier_updates")
        cols = [c for c in updates.columns]
        set_cols = [c for c in cols if c in ("priority", "depth", "salt")]
        sets = ", ".join(f"t.`{c}` = s.`{c}`" for c in set_cols) or "t.priority = s.priority"
        ins_cols = ", ".join(f"`{c}`" for c in cols)
        ins_vals = ", ".join(f"s.`{c}`" for c in cols)
        self.spark.sql(
            f"MERGE INTO {self._tbl(name)} t "
            "USING _ncs_frontier_updates s "
            "ON t.url_hash = s.url_hash AND t.canon_url = s.canon_url "
            f"WHEN MATCHED THEN UPDATE SET {sets} "
            f"WHEN NOT MATCHED THEN INSERT ({ins_cols}) VALUES ({ins_vals})"
        )


def make_state_store(
    root: str,
    spark: SparkSession | None = None,
    backend: str = "parquet",
    catalog: str = "iceberg",
):
    """StateStore factory — the one switch the engine flips
    (EngineConfig.state_backend). parquet: the sandbox-runnable store
    with the same contract; iceberg: the cluster-grade store above."""
    if backend == "parquet":
        from .tableio import StateStore

        return StateStore(root)
    if backend == "iceberg":
        if spark is None:
            raise ValueError("iceberg backend needs the SparkSession")
        return IcebergStateStore(root, spark, catalog=catalog)
    raise ValueError(f"unknown state backend {backend!r}")
