"""Time-series relational operators Spark lacks as built-ins: as-of
join and trailing-window range join.

These are part of the training-data-pipeline family (event attribution
and temporal feature joins over crawl/event logs), not reference
operators — the reference has no time-series queries. Both are built
from shuffle-once DataFrame compositions, no Python:

- ``asof_join``: the union-window formulation. Tag both inputs, union,
  sort per key by (ts, side, tiebreak), and carry the last non-null
  right payload forward with ``last(ignorenulls)``. ONE shuffle on the
  key, per-key sort — the same cost as a sort-merge join, with no
  range-condition blowup. At 100 TB the key shuffle co-partitions with
  any downstream per-key work; skewed keys fall to AQE skew-split
  because the window is rows-bounded (running state, not whole-key
  buffering in one frame... Spark still sorts per key; salting is not
  applicable to as-of semantics, so hot keys are the sort's problem —
  acceptable: the state carried is one struct).
- ``range_join_trailing``: the bucketized (binned) range join. A naive
  inequality join is a broadcast-nested-loop in Spark — O(n·m). Binning
  both sides to ``bin_s``-second buckets turns the range predicate into
  an equi-join on (key, bin) with a bounded explode factor of
  ``ceil(window_s/bin_s) + 1`` on the probe side, then the exact
  predicate filters residuals. This is the plan Databricks' range-join hint
  produces, expressed portably.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    payload: dict[str, str],
    right_tiebreak: str,
    direction: str = "backward",
) -> DataFrame:
    """As-of join. ``backward``: for each left row, attach the payload
    of the right row with the greatest ``ts`` ≤ the left row's ``ts``
    (ties on ``ts`` broken by the greatest ``right_tiebreak``).
    ``forward``: the right row with the smallest ``ts`` ≥ the left
    row's ``ts`` (ties broken by the smallest tiebreak).

    ``payload`` maps output alias → right column name. Left columns are
    passed through unchanged; unmatched left rows get null payload.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    tb_type = dict(right.dtypes).get(right_tiebreak)
    if tb_type not in ("tinyint", "smallint", "int", "bigint"):
        # a silent cast('bigint') would null a non-numeric tiebreak and
        # quietly degrade equal-ts resolution to nondeterministic
        raise ValueError(
            f"right_tiebreak {right_tiebreak!r} must be an integral column, "
            f"got {tb_type}"
        )
    back = direction == "backward"
    pay_struct = F.struct(
        *[F.col(src).alias(alias) for alias, src in payload.items()]
    )
    pay_type = right.select(pay_struct.alias("_p")).schema["_p"].dataType
    # side ordering puts the right rows inside the left row's frame at
    # equal ts: rights sort before lefts for backward (frame ends at
    # the current row), after lefts for forward (frame starts at it)
    # equality-join semantics: a null key never matches. Null-key right
    # rows are dropped (they could match nothing); null-key left rows
    # share the nulls window partition, which then contains no right
    # rows, so their payload is null — same as the SQL formulation.
    # Null-TS right rows are dropped for the same reason: NULL <= t /
    # NULL >= t never holds in the SQL formulation, but nulls-first
    # ordering would put such a row inside every left frame with no
    # real match. Null-ts LEFT rows must yield null payload; the
    # direction-matched null ordering below guarantees their frame
    # contains no right rows (nulls sort before all rights in the
    # backward frame's past, after all rights in the forward frame's
    # future).
    r = right.filter(F.col(on).isNotNull() & F.col(ts).isNotNull()).select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(0 if back else 1).alias("_side"),
        F.col(right_tiebreak).cast("bigint").alias("_tb"),
        pay_struct.alias("_p"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("_l")).schema["_l"].dataType
        ).alias("_l"),
    )
    left_side = 1 if back else 0
    l = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_t"),
        F.lit(left_side).alias("_side"),
        F.lit(0).cast("bigint").alias("_tb"),
        F.lit(None).cast(pay_type).alias("_p"),
        F.struct(*left.columns).alias("_l"),
    )
    ts_order = F.col("_t").asc_nulls_first() if back else F.col("_t").asc_nulls_last()
    w = Window.partitionBy("_k").orderBy(ts_order, "_side", "_tb")
    if back:
        w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        pick = F.last("_p", ignorenulls=True)
    else:
        w = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
        pick = F.first("_p", ignorenulls=True)
    matched = (
        r.unionByName(l)
        .withColumn("_m", pick.over(w))
        .filter(F.col("_side") == left_side)
    )
    return matched.select(
        *[F.col(f"_l.{c}").alias(c) for c in left.columns],
        *[F.col(f"_m.{alias}").alias(alias) for alias in payload],
    )


def range_join_trailing(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_s: int,
    aggs: list[Column],
    left_id: str,
    bin_s: int | None = None,
) -> DataFrame:
    """Trailing-window aggregate join: for each left row, aggregate the
    right rows with ``right_ts`` in ``(left_ts - window_s, left_ts]``
    and the same ``on`` key. Returns all left rows (empty windows keep
    the aggregate's null, callers coalesce).

    ``aggs`` aggregate right-side columns; ``left_id`` must uniquely
    identify left rows. Bin size defaults to the window length (probe
    explode factor 2).
    """
    bin_s = bin_s or window_s
    # ceil, not floor: with a non-divisor bin size the window can span
    # ceil(window/bin) full bins plus the partial one the left row is in
    n_bins = -(-window_s // bin_s) + 1
    # unix_timestamp floors to whole seconds; floor(floor(e)/bin) ==
    # floor(e/bin) for integer bin sizes, so binning fidelity is kept
    # (the exact range predicate below still compares raw timestamps).
    # prune the probe side to the three columns the candidate join
    # needs: the explode duplicates every probe column n_bins times
    # through the equi-join shuffle and the groupBy, and all left
    # payload re-attaches by left_id at the end anyway — a wide left
    # table would otherwise ship its full width n_bins times for
    # nothing (review r4)
    lb = (
        left.select(
            F.col(on).alias("_lk"),
            F.col(left_ts).alias("_lts"),
            F.col(left_id),
        )
        .withColumn("_bin0", F.floor(F.unix_timestamp(F.col("_lts")) / bin_s))
        .withColumn(
            "_bin", F.explode(F.sequence(F.col("_bin0") - n_bins + 1, F.col("_bin0")))
        )
    )
    rb = right.select(
        F.col(on).alias("_rk"),
        F.floor(F.unix_timestamp(F.col(right_ts)) / bin_s).alias("_bin"),
        F.col(right_ts).alias("_rts"),
        *[c for c in right.columns if c not in (on, right_ts)],
    )
    cand = lb.join(
        rb,
        (F.col("_lk") == F.col("_rk"))
        & (lb["_bin"] == rb["_bin"])
        & (F.col("_rts") > F.col("_lts") - F.expr(f"INTERVAL {window_s} SECOND"))
        & (F.col("_rts") <= F.col("_lts")),
    )
    per_left = cand.groupBy(F.col(left_id).alias("_lid")).agg(*aggs)
    return left.join(per_left, left[left_id] == per_left["_lid"], "left").drop("_lid")
