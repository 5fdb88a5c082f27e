"""Parquet table loaders for the driver-generated test corpus.

At 100 TB these reads are the dominant cost; everything here is a plain
``spark.read.parquet`` so Catalyst keeps predicate pushdown, column pruning
and partition pruning (SURVEY.md §4). No caching by default — callers decide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import TESTDATA_TABLES

#: Columns stored as parquet TIMESTAMP(NANOS), which Spark reads as long
#: under spark.sql.legacy.parquet.nanosAsLong (session.py). Converted here to
#: TimestampType by integer ns->us division — the same truncation DuckDB
#: applies when casting TIMESTAMP_NS to TIMESTAMP, so both engines see
#: identical instants.
_NANO_TS_COLUMNS = {"events": ["ts"]}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table (``{sf_dir}/{name}.parquet``)."""
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NANO_TS_COLUMNS.get(name, []):
        df = normalize_instant(df, c)
    return df


def normalize_instant(df: DataFrame, c: str) -> DataFrame:
    """Normalize a timestamp column to TimestampType UTC instants.

    The corpus has shipped the events ``ts`` column as both TIMESTAMP(NANOS)
    (surfaced as bigint under nanosAsLong; ns->us division truncates exactly
    like DuckDB's TIMESTAMP_NS->TIMESTAMP cast) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (surfaced as TIMESTAMP_NTZ if the inferTimestampNTZ
    conf could not be applied; the session TZ is UTC so an NTZ->LTZ cast is
    instant-preserving). Handle every surfaced type so the engine does not
    depend on which corpus generation it runs against.
    """
    dtype = dict(df.dtypes).get(c)
    if dtype == "bigint":
        return df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Read several tables into a dict keyed by table name."""
    return {n: load_table(spark, sf_dir, n) for n in (names or TESTDATA_TABLES)}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every test table as a temp view for ``spark.sql`` use."""
    for n in TESTDATA_TABLES:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)
