"""SparkSession factory with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "nightcrawlercmd-spark",
    cpus: int | str | None = None,
    shuffle_partitions: int = 32,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS", "*")
    want = f"local[{cpus}]"
    # getOrCreate() silently reuses ANY live session and ignores the
    # requested master/configs — a bench leg asking for local[2] while
    # a local[32] session leaks would "measure" garbage scaling with no
    # error. Fail loudly on a master mismatch instead (review r4).
    # getOrCreate() consults the GLOBAL _instantiatedSession (plus the
    # thread-local active one), so the guard must check both — a
    # session created in another thread makes getActiveSession()
    # return None here while getOrCreate() would still reuse it
    # (review r4 follow-up; verified against pyspark 4.1.2 source).
    for candidate in (
        SparkSession.getActiveSession(),
        getattr(SparkSession, "_instantiatedSession", None),
    ):
        if candidate is None:
            continue
        try:
            live = candidate.sparkContext._jsc is not None
            cur = candidate.sparkContext.master if live else None
        except Exception:
            cur = None
        if cur is not None and cur != want:
            raise RuntimeError(
                f"get_spark(cpus={cpus}) would silently reuse the live "
                f"session on master {cur!r}; stop it first"
            )
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # split parquet scans finely enough that Arrow-UDF stages keep
        # every core busy (state tables are ~100s of MB per round; the
        # 128MB default collapses them to 2-3 tasks and serializes the
        # Python stages — measured 3× slowdown)
        .config("spark.sql.files.maxPartitionBytes", "16m")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("NCS_DRIVER_MEM", "8g"))
        .getOrCreate()
    )
