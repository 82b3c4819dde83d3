"""Property tests for operators/timeseries.py: the union-window as-of
join and the binned trailing range join must match a brute-force
per-row oracle on seeded random inputs, including boundary timestamps
(exact bin edges, equal-timestamp ties, empty windows)."""

import datetime as dt
import random

import pandas as pd
import pytest
from pyspark.sql import functions as F

from nightcrawlercmd_spark.operators import timeseries as TS

BASE = dt.datetime(2024, 1, 1)


@pytest.fixture(scope="module")
def tsdata():
    rng = random.Random(7)
    rows = []
    for i in range(400):
        # coarse second grid forces equal-ts ties; offsets hit exact
        # hour-bin edges (0 and 3600 deltas)
        sec = rng.choice([0, 1, 3599, 3600, 3601, 7200]) + 3600 * rng.randint(0, 5)
        rows.append(
            {
                "event_id": i,
                "user_id": rng.randint(0, 4),
                "ts": BASE + dt.timedelta(seconds=sec),
                "kind": rng.choice(["L", "R"]),
                "value": float(rng.randint(1, 9)),
            }
        )
    return pd.DataFrame(rows)


def test_asof_join_matches_bruteforce(spark, tsdata):
    pdf = tsdata
    left = spark.createDataFrame(pdf[pdf.kind == "L"].drop(columns=["kind"]))
    right = spark.createDataFrame(pdf[pdf.kind == "R"].drop(columns=["kind"]))
    out = TS.asof_join(
        left,
        right,
        on="user_id",
        ts="ts",
        payload={"matched": "event_id"},
        right_tiebreak="event_id",
    )
    got = {r["event_id"]: r["matched"] for r in out.collect()}
    lf = pdf[pdf.kind == "L"]
    rf = pdf[pdf.kind == "R"]
    assert len(got) == len(lf)
    for _, lrow in lf.iterrows():
        cand = rf[(rf.user_id == lrow.user_id) & (rf.ts <= lrow.ts)]
        want = None
        if len(cand):
            last_ts = cand.ts.max()
            want = int(cand[cand.ts == last_ts].event_id.max())
        assert got[lrow.event_id] == want, f"left {lrow.event_id}"


@pytest.mark.parametrize("bin_s", [None, 1000])  # divisor + non-divisor bins
def test_range_join_trailing_matches_bruteforce(spark, tsdata, bin_s):
    pdf = tsdata
    left = spark.createDataFrame(
        pdf[pdf.kind == "L"].drop(columns=["kind", "value"]).rename(
            columns={"event_id": "lid"}
        )
    )
    right = spark.createDataFrame(
        pdf[pdf.kind == "R"]
        .drop(columns=["kind", "event_id"])
        .rename(columns={"ts": "rts", "value": "rvalue"})
    )
    out = TS.range_join_trailing(
        left,
        right,
        on="user_id",
        left_ts="ts",
        right_ts="rts",
        window_s=3600,
        left_id="lid",
        aggs=[F.count("*").alias("_n"), F.sum("rvalue").alias("_s")],
        bin_s=bin_s,
    )
    got = {
        r["lid"]: (r["_n"] or 0, r["_s"] or 0.0) for r in out.collect()
    }
    lf = pdf[pdf.kind == "L"]
    rf = pdf[pdf.kind == "R"]
    assert len(got) == len(lf)
    for _, lrow in lf.iterrows():
        lo = lrow.ts - dt.timedelta(seconds=3600)
        cand = rf[(rf.user_id == lrow.user_id) & (rf.ts > lo) & (rf.ts <= lrow.ts)]
        assert got[lrow.event_id] == (len(cand), float(cand.value.sum())), (
            f"left {lrow.event_id}"
        )


def test_asof_join_null_timestamps(spark):
    """NULL-ts rows follow the SQL formulation: a null-ts right row
    never matches anything (NULL <= t is never true), and a null-ts
    left row gets a null payload — in BOTH directions. Nulls-first
    window ordering without the right-side filter would hand the
    null-ts right row's payload to unmatched left rows."""
    left = spark.createDataFrame(
        [(1, 0, BASE), (2, 0, None)], "event_id bigint, user_id bigint, ts timestamp"
    )
    # right rows: one null-ts (must never match), one real at BASE+1h
    right = spark.createDataFrame(
        [(10, 0, None), (11, 0, BASE + dt.timedelta(hours=1))],
        "event_id bigint, user_id bigint, ts timestamp",
    )
    for direction, want in (
        # backward: left@BASE has no right ≤ BASE (null never counts)
        ("backward", {1: None, 2: None}),
        # forward: left@BASE matches the real row at BASE+1h only
        ("forward", {1: 11, 2: None}),
    ):
        out = TS.asof_join(
            left, right, on="user_id", ts="ts",
            payload={"matched": "event_id"},
            right_tiebreak="event_id", direction=direction,
        )
        got = {r["event_id"]: r["matched"] for r in out.collect()}
        assert got == want, direction


def test_asof_join_forward_matches_bruteforce(spark, tsdata):
    pdf = tsdata
    left = spark.createDataFrame(pdf[pdf.kind == "L"].drop(columns=["kind"]))
    right = spark.createDataFrame(pdf[pdf.kind == "R"].drop(columns=["kind"]))
    out = TS.asof_join(
        left,
        right,
        on="user_id",
        ts="ts",
        payload={"matched": "event_id"},
        right_tiebreak="event_id",
        direction="forward",
    )
    got = {r["event_id"]: r["matched"] for r in out.collect()}
    lf = pdf[pdf.kind == "L"]
    rf = pdf[pdf.kind == "R"]
    assert len(got) == len(lf)
    for _, lrow in lf.iterrows():
        cand = rf[(rf.user_id == lrow.user_id) & (rf.ts >= lrow.ts)]
        want = None
        if len(cand):
            first_ts = cand.ts.min()
            want = int(cand[cand.ts == first_ts].event_id.min())
        assert got[lrow.event_id] == want, f"left {lrow.event_id}"
