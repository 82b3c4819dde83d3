"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline on sf0.001.
``queries()`` / ``oracle_sql()`` — operator coverage from SURVEY.md §2
plus the training-data pipeline operators; definitions live in
``nightcrawlercmd_spark.plans.queries``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nightcrawlercmd_spark.plans.queries import ORACLES, QUERIES, q_report_wordlist

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: reference word-dictionary report (SURVEY.md O59) over
    sf0.001 documents — regex extract, normalize, group-count, rank."""
    return (
        q_report_wordlist(spark, SF0001)
        .orderBy(F.desc("cnt"), F.asc("word"))
        .limit(50)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLES)
