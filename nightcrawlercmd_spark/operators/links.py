"""Link extraction → canonicalize → scope/robots filter → enqueue rows.

Implements the reference's AfterCrawl link-selection path
(mainCrawler.go:157-198: redirect Location | hrefs | filters) plus the
north_rule additions (robots compliance, canonical dedupe key):

* hrefs come out of the page *body* via a vectorized pandas UDF
  (SURVEY.md O30), redirect targets from the Location header (O76/O21);
* every candidate is resolved against its parent and RFC-3986
  canonicalized (O18) — the dedupe key of the engine;
* scope filter keeps only seed-list hosts (O39 RemoveLinksNotSameHost
  generalized to a host *set*), robots filter drops disallowed path
  prefixes (O75), blanks/junk are dropped (O44);
* in-batch dedupe picks the deterministic minimal (depth, parent)
  lineage per canonical URL so the result is independent of task
  scheduling.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.html import extract_hrefs
from ..functions.urlnorm import resolve
from ..sources.corpus import priority_of


# UDFs are built lazily (pandas_udf parses its DDL type against the
# active session, so module import must stay session-free).

def extract_hrefs_udf():
    def fn(body: pd.Series) -> pd.Series:
        return body.map(extract_hrefs)

    return F.pandas_udf(fn, "array<string>")


def resolve_udf():
    def fn(base: pd.Series, href: pd.Series) -> pd.Series:
        return pd.Series(
            [resolve(b, h) for b, h in zip(base, href)], index=base.index, dtype=object
        )

    return F.pandas_udf(fn, "string")


def priority_udf():
    def fn(canon_url: pd.Series, depth: pd.Series) -> pd.Series:
        return pd.Series(
            [priority_of(c, int(d)) for c, d in zip(canon_url, depth)],
            index=canon_url.index,
            dtype="float64",
        )

    return F.pandas_udf(fn, "double")


def candidate_links(pages: DataFrame) -> DataFrame:
    """(parent_canon, parent_hash, depth, href) for every outgoing edge."""
    ok = pages.filter(F.col("status_code") == 200).select(
        F.col("canon_url").alias("parent_canon"),
        F.col("url_hash").alias("parent_url_hash"),
        "depth",
        F.explode(extract_hrefs_udf()(F.col("body"))).alias("href"),
    )
    redirects = pages.filter(
        F.col("status_code").between(300, 307) & F.col("location").isNotNull()
    ).select(
        F.col("canon_url").alias("parent_canon"),
        F.col("url_hash").alias("parent_url_hash"),
        "depth",
        F.col("location").alias("href"),
    )
    return ok.unionByName(redirects)


def enqueue_rows(
    pages: DataFrame,
    robots: DataFrame,
    scope_hosts: list[str] | None,
    round_no: int,
) -> DataFrame:
    """Candidate frontier rows for the next round (pre seen-dedupe)."""
    cand = (
        candidate_links(pages)
        .withColumn("canon_url", resolve_udf()(F.col("parent_canon"), F.col("href")))
        .filter(F.col("canon_url").isNotNull())
        .withColumn("host", F.lower(F.parse_url(F.col("canon_url"), F.lit("HOST"))))
        .withColumn("path", F.coalesce(F.parse_url(F.col("canon_url"), F.lit("PATH")), F.lit("/")))
    )
    if scope_hosts is not None:
        cand = cand.filter(F.col("host").isin(scope_hosts))
    # robots: broadcast dimension; keep rows with no matching disallow prefix
    cand = (
        cand.join(
            F.broadcast(robots.select("host", "disallow_prefixes")), "host", "left"
        )
        .filter(
            F.col("disallow_prefixes").isNull()
            | ~F.exists(
                F.col("disallow_prefixes"),
                lambda p: F.startswith(F.col("path"), p),
            )
        )
        .drop("disallow_prefixes")
    )
    # deterministic in-batch dedupe: minimal (depth, parent) lineage per URL
    dedup = cand.groupBy("canon_url", "host").agg(
        F.min(F.struct("depth", "parent_canon", "parent_url_hash")).alias("m")
    )
    child_depth = F.col("m.depth") + 1
    return dedup.select(
        "canon_url",
        F.xxhash64("canon_url").alias("url_hash"),
        "host",
        F.xxhash64("host").alias("host_hash"),
        child_depth.cast("int").alias("depth"),
        F.col("m.parent_url_hash").alias("parent_url_hash"),
    ).withColumn("priority", priority_udf()(F.col("canon_url"), F.col("depth"))).withColumn(
        "discovered_round", F.lit(round_no)
    )
