"""Vectorized fetch stage (SURVEY.md O6) and page schema.

The reference fetches with a single-threaded ``http.DefaultClient.Do``
loop (mainHttpScan.go:178-204, mainCrawler.go:81). The engine fetches a
whole micro-batch per round with ``mapInPandas``: the dequeued frontier
rows are repartitioned by ``(host_hash, salt)`` so each task holds a
slice of hosts (politeness already enforced by the dequeue budget) and
a hot host's rows spread over ``n_salts`` tasks.

This sandbox is offline, so the fetch body is the deterministic
synthetic responder from ``sources.corpus`` — a pure function of the
URL. A real deployment swaps ``fetch_one`` for an HTTP client; the
Spark plumbing (schema, partitioning, batch shape) is identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..sources.corpus import WorldConfig, fetch_one

PAGE_SCHEMA = (
    "canon_url string, url_hash bigint, host string, host_hash bigint, "
    "salt int, depth int, priority double, seq int, "
    "status_code int, location string, content_type string, body binary, "
    "image_id string, caption string, resp_ms int, error string"
)

_PASSTHRU = ["canon_url", "url_hash", "host", "host_hash", "salt", "depth", "priority", "seq"]


def fetch_stage(dequeued: DataFrame, world: WorldConfig, n_tasks: int) -> DataFrame:
    """dequeued frontier rows → fetched pages (one row per URL)."""

    def fetch_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = [fetch_one(world, u) for u in pdf["canon_url"]]
            out = pdf[_PASSTHRU].reset_index(drop=True)
            rdf = pd.DataFrame(res).reset_index(drop=True)
            for col in (
                "status_code",
                "location",
                "content_type",
                "body",
                "image_id",
                "caption",
                "resp_ms",
                "error",
            ):
                out[col] = rdf[col]
            yield out

    return dequeued.repartition(n_tasks, "host_hash", "salt").mapInPandas(
        fetch_batches, schema=PAGE_SCHEMA
    )
