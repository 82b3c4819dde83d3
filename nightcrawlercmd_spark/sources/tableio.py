"""Round-versioned table IO — the Iceberg-shaped state layer.

The design target is Iceberg tables (``MERGE INTO frontier``, snapshot
reads for exact resume — BASELINE.json north_star). This sandbox has
no Iceberg runtime jar, so the same contract is implemented on plain
parquet (SURVEY.md §7.5):

* a *snapshot* table writes a full copy per round under
  ``<name>/round=K/`` — Iceberg snapshot analog;
* an *append* table adds ``<name>/round=K/`` deltas — Iceberg
  append analog; reading unions all committed rounds;
* a commit marker ``_commits/round_K.json`` is written **last**, so a
  crash mid-round leaves the previous round fully consistent and
  resume is exact (reference analog: crawler resume via LoadPages,
  mainCrawler.go:95-98, and the DNS log-file history, mainDNS.go:69-84).

With Iceberg jars present, ``frontier`` becomes one table with
``MERGE INTO`` per round and time-travel for resume; this module is the
only piece that would change.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class StateStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "_commits"), exist_ok=True)

    # ---- commit protocol ----------------------------------------------

    def committed_rounds(self) -> list[int]:
        d = os.path.join(self.root, "_commits")
        out = []
        for f in os.listdir(d):
            if f.startswith("round_") and f.endswith(".json"):
                out.append(int(f[6:-5]))
        return sorted(out)

    def last_round(self) -> int | None:
        rs = self.committed_rounds()
        return rs[-1] if rs else None

    def commit(self, round_no: int, meta: dict) -> None:
        path = os.path.join(self.root, "_commits", f"round_{round_no}.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"round": round_no, **meta}, f)
        os.replace(tmp, path)  # atomic → marker is all-or-nothing

    def meta(self, round_no: int) -> dict:
        with open(os.path.join(self.root, "_commits", f"round_{round_no}.json")) as f:
            return json.load(f)

    # ---- snapshot tables ------------------------------------------------

    def _dir(self, name: str, round_no: int) -> str:
        return os.path.join(self.root, name, f"round={round_no}")

    def write_snapshot(self, df: DataFrame, name: str, round_no: int) -> None:
        df.write.mode("overwrite").parquet(self._dir(name, round_no))

    def read_snapshot(self, spark: SparkSession, name: str, round_no: int) -> DataFrame:
        return spark.read.parquet(self._dir(name, round_no))

    # ---- append tables ---------------------------------------------------

    def append(self, df: DataFrame, name: str, round_no: int) -> None:
        # same write path as snapshots on purpose (a per-round append IS
        # a snapshot of that round's delta); delegating keeps the two
        # formats from drifting apart — e.g. under an Iceberg swap-in
        self.write_snapshot(df, name, round_no)

    def read_appends(
        self, spark: SparkSession, name: str, upto_round: int
    ) -> DataFrame | None:
        """Union of COMMITTED per-round dirs only: a crash mid-write
        leaves a round dir with no commit marker, and adopting it would
        break the module's crash-consistency protocol (the marker, not
        directory existence, is the truth — same rule the engine's
        resume follows)."""
        dirs = [
            self._dir(name, r)
            for r in self.committed_rounds()
            if r <= upto_round and os.path.isdir(self._dir(name, r))
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)

    def exists(self, name: str, round_no: int) -> bool:
        return os.path.isdir(self._dir(name, round_no))

    # ---- bucketed tables (Iceberg partition-overwrite analog) -----------

    def write_bucketed(
        self, df: DataFrame, name: str, round_no: int, bucket_col: str = "pbucket"
    ) -> list[int]:
        """Write a bucket-partitioned snapshot containing ONLY the
        buckets present in ``df`` (Iceberg dynamic partition overwrite
        analog). Returns the bucket ids actually written — an empty
        bucket produces no dir, so callers drop it from their manifest.

        The overwrite is pinned to static mode: the manifest is derived
        from a listdir of the round dir, so under a session-level
        ``partitionOverwriteMode=dynamic`` a crashed earlier attempt's
        stale bucket dirs would survive the re-run's overwrite and be
        adopted into the new manifest — pending rows from an abandoned
        timeline. Static mode clears the whole round dir first."""
        d = self._dir(name, round_no)
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "static")
            .partitionBy(bucket_col)
            .parquet(d)
        )
        pref = bucket_col + "="
        return sorted(
            int(p[len(pref):]) for p in os.listdir(d) if p.startswith(pref)
        )

    def read_buckets(
        self,
        spark: SparkSession,
        name: str,
        manifest: dict[int, int],
        bucket_col: str = "pbucket",
    ) -> DataFrame | None:
        """Read the union of per-bucket leaf dirs named by ``manifest``
        (bucket → round of its latest version). Each bucket is read from
        exactly one round — this is what makes per-round maintenance
        O(touched buckets) instead of O(frontier)."""
        dirs = [
            os.path.join(self._dir(name, r), f"{bucket_col}={b}")
            for b, r in sorted(manifest.items())
        ]
        if not dirs:
            return None
        return spark.read.parquet(*dirs)
