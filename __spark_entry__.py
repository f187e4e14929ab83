"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship chained-left-join lookup on sf0.001;
``queries()`` / ``oracle_sql()`` expose the full operator catalog from
``bag_parser_spark.plans.catalog`` (one entry per SURVEY.md §2 operator,
each with a DuckDB oracle unless genuinely non-SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from bag_parser_spark.plans import catalog

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return catalog.queries()["j1_chained_left_join"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return catalog.queries()


def oracle_sql() -> dict[str, str]:
    return catalog.oracle_sql()
