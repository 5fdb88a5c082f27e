"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The driver may pass a SparkSession it built itself, so every callable
defensively applies the engine's required RUNTIME confs to the incoming
session (all are runtime-settable — verified): UTC timestamps, the
TIMESTAMP(NANOS) parquet read mode the events table needs, non-ANSI
try_cast semantics, and Arrow for the pandas seams. A bare session would
otherwise fail on events.parquet with PARQUET_TYPE_ILLEGAL.
"""

from __future__ import annotations

import functools
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from snowflake_stock_dbt_spark.plans import ALL_ORACLES, ALL_QUERIES

_REQUIRED_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}

#: Conf keys _ensure_confs could not apply, with the error — kept so a
#: wrong-result investigation can see which required conf was refused
#: instead of silently running with the session owner's value.
CONF_FAILURES: dict[str, str] = {}


def _ensure_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_RUNTIME_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception as exc:  # locked conf: record loudly, keep going
            CONF_FAILURES[k] = repr(exc)
            print(
                f"[spark_entry] WARNING: required conf {k}={v} could not be "
                f"applied ({exc!r}); results may diverge from the oracle",
                file=sys.stderr,
            )


def _wrap(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_confs(spark)
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q1 top-10 entities by metric (reference
    sql/03_analytics_queries.sql:6-22) on the sf0.001 corpus."""
    _ensure_confs(spark)
    return ALL_QUERIES["q01_top_by_metric"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _wrap(fn) for name, fn in ALL_QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-dialect twins of ``queries()`` (same aliases, same semantics).
    Keys absent here (non-SQL-expressible ops) get a rows-only check."""
    return dict(ALL_ORACLES)
