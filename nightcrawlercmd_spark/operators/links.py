"""Link extraction → canonicalize → scope/robots filter → enqueue rows.

Implements the reference's AfterCrawl link-selection path
(mainCrawler.go:157-198: redirect Location | hrefs | filters) plus the
north_rule additions (robots compliance, canonical dedupe key):

* extraction, base-resolution, RFC-3986 canonicalization and child
  priority are fused into ONE vectorized pandas UDF per round
  (SURVEY.md O30/O18) — a single Python stage per round keeps the page
  body crossing the JVM↔Arrow boundary exactly once (three chained
  scalar UDFs measured ~10× slower than the fused form on 1M links);
* redirect targets come from the Location header (O76/O21);
* host/path splitting for the scope (O39) and robots (O75) filters is
  plain string codegen (`substring_index`), not `parse_url` — the URLs
  are already canonical, and the codegen form is ~2× faster;
* blanks/junk are dropped inside the UDF (O44);
* in-batch dedupe picks the deterministic minimal (depth, parent)
  lineage per canonical URL so the result is independent of task
  scheduling; the child's priority rides along in the min-struct.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

def _after_scheme(canon: Column) -> Column:
    """Everything after the FIRST '://' — mirrors the Python twin's
    split('://', 1). substring_index with count -1 would split on the
    LAST occurrence, which mis-parses any canonical URL embedding a URL
    in its path or query (…/go?to=http://other.example/x)."""
    return canon.substr(F.instr(canon, "://") + F.lit(3), F.length(canon))


def _pre_query(rest: Column) -> Column:
    """Cut the fragment (first '#') then the query (first '?') — the
    order Go's url.Parse applies before any authority/path split. On
    RAW inputs (httpscan accepts arbitrary URLs) a '/' inside the
    query ('http://h.test?next=/login') must NOT read as the path
    start, and '?x=1' directly after the host must not leak into the
    authority. No-op for canonical URLs: the canonicalizer guarantees
    a '/' path, percent-encodes '#', and '?' always starts the
    query."""
    return F.substring_index(F.substring_index(rest, "#", 1), "?", 1)


def host_of_col(canon: Column) -> Column:
    """Host of a URL via string ops (codegen, no parse_url). Query and
    fragment are cut first (raw pathless inputs like
    'http://h.test?x=1' otherwise leak '?x=1' into the authority);
    IPv6 literals ([::1]:8080) unwrap to the bracket contents, and
    userinfo is stripped on the LAST '@' ('@' inside userinfo is always
    percent-encoded in canonical form), matching the Python
    ``urlnorm.host_of`` twin on canonical URLs and Go url.Parse's
    u.Hostname() on raw ones."""
    auth = F.substring_index(
        F.substring_index(_pre_query(_after_scheme(canon)), "/", 1), "@", -1
    )
    return F.when(
        F.startswith(auth, F.lit("[")),
        F.regexp_extract(auth, r"^\[([^\]]+)\]", 1),
    ).otherwise(F.substring_index(auth, ":", 1))


def path_of_col(canon: Column) -> Column:
    """Path (sans query/fragment) of a URL. Canonical URLs always
    carry a '/' (the canonicalizer guarantees a non-empty path); for
    RAW inputs the query/fragment are cut FIRST, so a pathless URL
    ('http://h.test?x=1') yields the empty path and a '/' inside the
    query ('http://h.test?next=/login') is not mistaken for the path
    start — both matching Go url.Parse's u.Path."""
    rest = _pre_query(_after_scheme(canon))
    slash = F.instr(rest, "/")
    return F.when(slash > 0, rest.substr(slash, F.length(rest))).otherwise(
        F.lit("")
    )


def robots_allowed_filter(df: DataFrame, robots: DataFrame) -> DataFrame:
    """Drop rows whose path matches a disallow prefix of their host
    (broadcast robots dim). Requires `host` and `path` columns."""
    return (
        df.join(F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left")
        .filter(
            F.col("disallow_prefixes").isNull()
            | ~F.exists(
                F.col("disallow_prefixes"), lambda p: F.startswith(F.col("path"), p)
            )
        )
        .drop("disallow_prefixes")
    )


def enqueue_rows(
    pages: DataFrame,
    robots: DataFrame,
    scope_hosts: DataFrame | None,
    round_no: int,
) -> DataFrame:
    """Candidate frontier rows for the next round (pre seen-dedupe).

    Pure JVM: the `children` column was produced inside the fetch
    stage's single Python pass (operators/fetch.py), so this reads one
    pruned parquet column and never touches the body again.
    """
    cand = (
        pages.select(
            F.col("canon_url").alias("parent_canon"),
            F.col("url_hash").alias("parent_url_hash"),
            "depth",
            F.explode("children").alias("child"),
        )
        .select(
            "parent_canon",
            "parent_url_hash",
            "depth",
            F.col("child.canon_url").alias("canon_url"),
            F.col("child.priority").alias("priority"),
        )
        .withColumn("host", host_of_col(F.col("canon_url")))
        .withColumn("path", path_of_col(F.col("canon_url")))
    )
    if scope_hosts is not None:
        # semi-join, not a driver-collected isin list: a seed set can be
        # 10^8 hosts (VERDICT r1 item 10). AQE broadcasts the dim when
        # it is small; a huge one degrades to a shuffled semi-join.
        cand = cand.join(scope_hosts.select("host"), "host", "left_semi")
    cand = robots_allowed_filter(cand, robots)
    # deterministic in-batch dedupe: minimal (depth, parent) lineage per
    # URL; the child priority (a function of canon+child depth) rides
    # along with the winning struct.
    dedup = cand.groupBy("canon_url", "host").agg(
        F.min(
            F.struct("depth", "parent_canon", "parent_url_hash", "priority")
        ).alias("m")
    )
    return dedup.select(
        "canon_url",
        F.xxhash64("canon_url").alias("url_hash"),
        "host",
        F.xxhash64("host").alias("host_hash"),
        (F.col("m.depth") + 1).cast("int").alias("depth"),
        F.col("m.parent_url_hash").alias("parent_url_hash"),
        F.col("m.priority").alias("priority"),
        F.lit(round_no).alias("discovered_round"),
    )
