"""Priority dequeue with per-host politeness budgets (SURVEY.md O69/O74).

The reference fetches one URL at a time in Go-map order with a fixed
inter-request sleep (``-wait 500`` ms → ≤2 pages/s; reference
mainCrawler.go:45,81). The engine replaces wall-clock politeness with a
*per-host budget per round*: each round, at most ``crawl_budget(host)``
URLs per host are dequeued — per-host rate = budget/round-duration —
while cross-host parallelism is unbounded. Dequeue order is pinned and
total (priority DESC, canon_url ASC) so crawl ordering is reproducible
(the reference's map iteration is nondeterministic; SURVEY.md §7.3.1).

Scale notes: the per-host rank is two-level — rank inside (host,
hash-salt) partitions, then per host over the ≤ salts×budget
survivors — so even a single hot host's pending sort spreads over
``salts`` tasks, and the fetch stage re-partitions by (host_hash,
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
    salts: int | None = None,
) -> DataFrame:
    """Top-budget pending URLs per host.

    ``robots`` is a small dimension (host, crawl_budget) — broadcast.
    The per-host rank is itself two-level (VERDICT r3 item 1): rank
    inside (host, hash-salt) partitions in parallel, keep each salt's
    top ``budget``, then rank per host over the ≤ salts×budget
    survivors. A pathological single-host crawl (one host holding
    ~10^8 pending rows) no longer serializes into one task's sort —
    the level-1 sort splits over ``salts`` tasks and level 2 only ever
    sees salts×budget rows per host. Exact for the same reason as the
    ``max_take`` rewrite below: the order (priority DESC, canon_url
    ASC) is a unique total order within a host, so every row of the
    host's true top-budget ranks ≤ budget inside its own salt
    partition. The level-2 shuffle moves only survivors, so the added
    cost over the single-window form is one shuffle of ≤ salts×budget
    rows per host.

    ``max_take`` truncates the round by the pinned global total order
    (max-pages gate; reference mainCrawler.go:149-155, O48). Same
    two-level trick (VERDICT r2 item 3): no single task ever sorts the
    full dequeued set (hosts × budget can be ~10^8 rows with
    ``round_capacity`` on a 10^6-host world). The crawl-log sequence
    number is *derived at read time* from (priority desc, canon_url),
    never materialized in the hot path.

    ``salts`` widens both two-level ranks (ADVICE r3: at
    round_capacity ~10^6 the fixed 16 left ~1.6e7 survivor rows in
    one task). Defaults to max(16, defaultParallelism) so bigger
    deployments widen automatically; any value is exact.
    """
    if salts is None:
        salts = max(16, pending.sparkSession.sparkContext.defaultParallelism)
    order = [F.desc("priority"), F.asc("canon_url")]
    per_host_salt = Window.partitionBy("host", "__hsalt").orderBy(*order)
    per_host = Window.partitionBy("host").orderBy(*order)
    ranked = (
        pending.join(
            F.broadcast(robots.select("host", "crawl_budget")), "host", "left"
        )
        .withColumn("budget", F.coalesce("crawl_budget", F.lit(default_budget)))
        .withColumn(
            "__hsalt", F.pmod(F.xxhash64("canon_url"), F.lit(salts)).cast("int")
        )
        .withColumn("__hrk", F.row_number().over(per_host_salt))
        .filter(F.col("__hrk") <= F.col("budget"))  # ≤ salts×budget / host
        .withColumn("__rk", F.row_number().over(per_host))
        .filter(F.col("__rk") <= F.col("budget"))
        .drop("__hsalt", "__hrk", "__rk", "budget", "crawl_budget")
    )
    if max_take is not None:
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
