"""Priority dequeue with per-host politeness budgets (SURVEY.md O69/O74).

The reference fetches one URL at a time in Go-map order with a fixed
inter-request sleep (``-wait 500`` ms → ≤2 pages/s; reference
mainCrawler.go:45,81). The engine replaces wall-clock politeness with a
*per-host budget per round*: each round, at most ``crawl_budget(host)``
URLs per host are dequeued — per-host rate = budget/round-duration —
while cross-host parallelism is unbounded. Dequeue order is pinned and
total (priority DESC, canon_url ASC) so crawl ordering is reproducible
(the reference's map iteration is nondeterministic; SURVEY.md §7.3.1).

Scale notes: the window partitions by ``host``, so each host sorts only
its own pending rows; a hot host's pending set is bounded per round by
the budget cutoff, and the fetch stage re-partitions by (host_hash,
salt) so one hot host cannot pin a single task. The global-sequence
window only ever sees the *dequeued* set (≤ hosts × budget rows per
round), never the full frontier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dequeue(
    pending: DataFrame,
    robots: DataFrame,
    default_budget: int,
    max_take: int | None = None,
) -> DataFrame:
    """Top-budget pending URLs per host.

    ``robots`` is a small dimension (host, crawl_budget) — broadcast.
    ``max_take`` truncates the round by the pinned global total order
    (max-pages gate; reference mainCrawler.go:149-155, O48). It is a
    two-level rank (VERDICT r2 item 3): rank inside hash-salted
    partitions in parallel, keep each partition's top ``max_take``,
    then rank only the ≤ salts×max_take survivors — no single task
    ever sorts the full dequeued set (hosts × budget can be ~10^8 rows
    with ``round_capacity`` on a 10^6-host world). The rewrite is
    exact because the total order (priority DESC, canon_url ASC) is
    unique per row — canon_url is unique within a round's pending set —
    so the global top-N is a subset of the per-salt top-Ns. The
    crawl-log sequence number is *derived at read time* from
    (priority desc, canon_url), never materialized in the hot path.
    """
    per_host = Window.partitionBy("host").orderBy(
        F.desc("priority"), F.asc("canon_url")
    )
    ranked = (
        pending.join(
            F.broadcast(robots.select("host", "crawl_budget")), "host", "left"
        )
        .withColumn("budget", F.coalesce("crawl_budget", F.lit(default_budget)))
        .withColumn("__rk", F.row_number().over(per_host))
        .filter(F.col("__rk") <= F.col("budget"))
        .drop("__rk", "budget", "crawl_budget")
    )
    if max_take is not None:
        order = [F.desc("priority"), F.asc("canon_url")]
        salts = 16
        per_salt = Window.partitionBy("__tsalt").orderBy(*order)
        total = Window.orderBy(*order)
        ranked = (
            ranked.withColumn(
                "__tsalt", F.pmod(F.xxhash64("canon_url"), F.lit(salts)).cast("int")
            )
            .withColumn("__prk", F.row_number().over(per_salt))
            .filter(F.col("__prk") <= max_take)  # survivors ≤ salts*max_take
            .withColumn("__seq", F.row_number().over(total))
            .filter(F.col("__seq") <= max_take)
            .drop("__tsalt", "__prk", "__seq")
        )
    return ranked
