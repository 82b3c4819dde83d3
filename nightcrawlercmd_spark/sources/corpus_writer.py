"""Materialize the synthetic world as parquet tables.

Writes ``seeds``, ``robots`` and the payload table ``images`` (exact
input_hint schema) for a WorldConfig. The images build is distributed —
pixels are generated and encoded executor-side via mapInPandas — so the
same path scales to the bench corpus.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import SparkSession

from .corpus import WorldConfig, all_page_urls, images_pdf, robots_rows, seed_rows

IMAGES_SCHEMA = (
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash bigint"
)


def write_corpus(spark: SparkSession, out_dir: str, world: WorldConfig) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    seeds = spark.createDataFrame(seed_rows(world), schema="url string")
    seeds.write.mode("overwrite").parquet(os.path.join(out_dir, "seeds.parquet"))
    robots = spark.createDataFrame(
        robots_rows(world),
        schema="host string, disallow_prefixes array<string>, crawl_budget int",
    )
    robots.write.mode("overwrite").parquet(os.path.join(out_dir, "robots.parquet"))

    urls = all_page_urls(world)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = images_pdf(world, list(pdf["canon_url"]))
            if not out.empty:
                yield out

    n_tasks = max(4, min(64, len(urls) // 64 or 1))
    (
        spark.createDataFrame([(u,) for u in urls], schema="canon_url string")
        .repartition(n_tasks)
        .mapInPandas(gen, schema=IMAGES_SCHEMA)
        .dropDuplicates(["image_id"])
        .write.mode("overwrite")
        .parquet(os.path.join(out_dir, "images.parquet"))
    )
    return {"seeds": seeds.count(), "pages": len(urls)}
