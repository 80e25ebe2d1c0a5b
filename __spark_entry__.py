"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship crawl-round candidate selection on sf0.001.
queries()     — one entry per implemented operator from SURVEY.md §2
                (plus the training-data pipeline family), implemented in
                ghcrawler_spark/plans/analytics.py. 59 entries.
oracle_sql()  — DuckDB-equivalent SQL for each query (exact value parity;
                see analytics.py float discipline notes). All entries except
                v1_image_validation (binary pipeline → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ghcrawler_spark.plans import analytics


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return analytics.flagship_crawl_round(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return analytics.queries()


def oracle_sql() -> dict[str, str]:
    return analytics.oracle_sql()
