"""Structured Streaming jobs: stateful crawl monitor + watermarked
windowed aggregation (streaming result == batch oracle)."""

import pytest

from nightcrawlercmd_spark.sources.corpus import WorldConfig
from nightcrawlercmd_spark.streaming.engine import CrawlEngine, EngineConfig
from nightcrawlercmd_spark.streaming.jobs import (
    crawl_monitor,
    events_windowed_counts_batch,
    events_windowed_counts_stream,
    stream_dedup,
)

SF = "/root/testdata/sf0.001"


def test_events_windowed_counts_stream_matches_batch(spark, tmp_path):
    import datetime

    from pyspark.sql import functions as F

    q = events_windowed_counts_stream(spark, SF, str(tmp_path / "ckpt"), "ev_win_t")
    q.awaitTermination(120)
    got = {
        (r["win_start"], r["event_type"], r["cnt"], r["sum_value"])
        for r in spark.sql("select * from ev_win_t").collect()
    }
    # append mode emits only windows the watermark has closed:
    # window.end <= max(ts) - 5min; trailing windows stay in state
    ev = spark.read.parquet(f"{SF}/events.parquet")
    max_ts = ev.agg(F.max(F.col("ts").cast("timestamp"))).head()[0]
    cutoff = max_ts - datetime.timedelta(minutes=5)
    want = {
        (r["win_start"], r["event_type"], r["cnt"], r["sum_value"])
        for r in events_windowed_counts_batch(spark, SF).collect()
        if r["win_start"] + datetime.timedelta(minutes=10) <= cutoff
    }
    assert got == want and got


def test_user_sessions_stream_matches_batch(spark, tmp_path):
    """Native stateful session windows on a stream == the batch twin
    (for sessions the watermark has closed)."""
    import datetime

    from pyspark.sql import functions as F

    from nightcrawlercmd_spark.streaming.jobs import user_sessions_stream

    q = user_sessions_stream(spark, SF, str(tmp_path / "ckpt_sess"), "ev_sess_t")
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 6))
        for r in spark.sql("select * from ev_sess_t").collect()
    }
    ev = spark.read.parquet(f"{SF}/events.parquet").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    max_ts = ev.agg(F.max("ts")).head()[0]
    cutoff = max_ts - datetime.timedelta(minutes=1)  # 1-min watermark
    want = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["sum_value"], 6))
        for r in (
            ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("sw"))
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
            )
            .select(
                "user_id",
                F.unix_timestamp("sw.start").alias("session_start"),
                F.col("sw.end").alias("session_end"),
                "n_events",
                "sum_value",
            )
            .collect()
        )
        if r["session_end"] <= cutoff
    }
    assert got == want and got


def test_crawl_monitor_stateful_across_batches(spark, tmp_path):
    world = WorldConfig(n_hosts=3, base_pages=8, tag="t-stream")
    eng = CrawlEngine(
        spark,
        EngineConfig(state_dir=str(tmp_path / "s"), world=world,
                     max_rounds=4, max_pages=60, fetch_tasks=4),
    )
    eng.run()
    # small trigger size → several micro-batches → state must carry over
    q = crawl_monitor(spark, str(tmp_path / "s"), str(tmp_path / "ck"),
                      "mon_t", max_files_per_trigger=3)
    q.awaitTermination(180)
    rows = spark.sql(
        "select host, max(pages) pages, max(batches) batches from mon_t group by host"
    ).collect()
    got = {r["host"]: r["pages"] for r in rows}
    want = {
        r["host"]: r["cnt"]
        for r in eng.pages().groupBy("host").count().withColumnRenamed("count", "cnt").collect()
    }
    assert got == want
    # at least one host saw multiple micro-batches (state actually carried)
    assert any(r["batches"] > 1 for r in rows)


def test_monitor_ema_chunk_order_invariant():
    """A group larger than one Arrow chunk arrives as several pdfs in
    nondeterministic order — the EMA fold must sort the WHOLE
    micro-batch by canon_url, not each chunk independently, so any
    chunking/arrival order yields the same ema_resp_ms."""
    import pandas as pd

    from nightcrawlercmd_spark.streaming.jobs import _monitor_fn

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.val = v

    rows = pd.DataFrame(
        {
            "canon_url": [f"http://h.test/{i:03d}" for i in range(10)],
            "resp_ms": [5.0, 40.0, 2.0, 90.0, 7.0, 1.0, 33.0, 8.0, 60.0, 4.0],
            "error": [None] * 10,
        }
    )

    def run(chunks):
        st = FakeState()
        out = list(_monitor_fn(("h.test",), iter(chunks), st))[0]
        return float(out["ema_resp_ms"].iloc[0])

    whole = run([rows])
    split = run([rows.iloc[7:], rows.iloc[2:7], rows.iloc[:2]])
    assert whole == split


def test_stream_dedup_within_watermark(spark, tmp_path):
    """dropDuplicatesWithinWatermark: a redelivered event inside the
    watermark window is emitted exactly once; state is bounded by the
    watermark (this is the streaming twin of the URL-seen anti-join)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF}/events.parquet")
    src = str(tmp_path / "src")
    # file 1: the full event log; file 2: a redelivery of every 3rd
    # event with identical event_id and ts (inside any watermark)
    ev.coalesce(1).write.parquet(src)
    dups = ev.filter(F.col("event_id") % 3 == 0)
    dups.coalesce(1).write.mode("append").parquet(src)
    q = stream_dedup(
        spark, src, str(tmp_path / "ckpt"), ev.schema, ("event_id",),
        watermark="30 minutes", query_name="dedup_t",
    )
    q.awaitTermination(120)
    got = [r["event_id"] for r in spark.sql("select event_id from dedup_t").collect()]
    want = {r["event_id"] for r in ev.select("event_id").distinct().collect()}
    assert len(got) == len(set(got)) == len(want)  # once each, no dup rows
    assert set(got) == want


def test_asof_attribution_stream_matches_batch(spark, tmp_path):
    """Stateful streaming as-of == the batch union-window as-of: events
    split into 4 time-ordered files, one micro-batch each, so a click
    in a late batch must attribute via state carried from an early
    batch (never by re-reading it)."""
    import os
    import pandas as pd

    from nightcrawlercmd_spark.plans.queries import q_asof_attribution
    from nightcrawlercmd_spark.streaming.jobs import asof_attribution_stream

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pdf = ev.toPandas().sort_values(["ts", "event_id"]).reset_index(drop=True)
    # pyarrow would write pandas ns-timestamps as TIMESTAMP(NANOS),
    # which Spark's vectorized reader rejects — down-cast to µs
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    src = tmp_path / "ev_src"
    src.mkdir()
    # split on ts boundaries (never inside an equal-ts run) so batch
    # order respects event time per user
    cuts = [len(pdf) * i // 4 for i in (1, 2, 3)]
    bounds = [pdf.ts.iloc[c] for c in cuts]
    parts = [
        pdf[pdf.ts <= bounds[0]],
        pdf[(pdf.ts > bounds[0]) & (pdf.ts <= bounds[1])],
        pdf[(pdf.ts > bounds[1]) & (pdf.ts <= bounds[2])],
        pdf[pdf.ts > bounds[2]],
    ]
    for i, part in enumerate(parts):
        p = str(src / f"part{i}.parquet")
        part.to_parquet(p, index=False)
        os.utime(p, (1_700_000_000 + i * 60, 1_700_000_000 + i * 60))
    q = asof_attribution_stream(
        spark, str(src), str(tmp_path / "ckpt_asof"), ev.schema, "ev_asof_t"
    )
    q.awaitTermination(180)
    assert len(q.recentProgress) >= 4  # state really crossed batches
    got = {
        (r["click_id"], r["user_id"], r["click_epoch"], r["attributed_view"])
        for r in spark.sql("select * from ev_asof_t").collect()
    }
    want = {
        (r["click_id"], r["user_id"], r["click_epoch"], r["attributed_view"])
        for r in q_asof_attribution(spark, SF).collect()
    }
    assert got == want
