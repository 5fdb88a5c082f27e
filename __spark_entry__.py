"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowflake_stock_dbt_spark.plans import ALL_ORACLES, ALL_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q1 top-10 entities by metric (reference
    sql/03_analytics_queries.sql:6-22) on the sf0.001 corpus."""
    return ALL_QUERIES["q01_top_by_metric"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(ALL_QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect twins of ``queries()`` (same aliases, same semantics).
    Keys absent here (non-SQL-expressible ops) get a rows-only check."""
    return dict(ALL_ORACLES)
