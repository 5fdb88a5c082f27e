"""Bronze ingestion: landing-directory CSV -> raw table with load metadata.

Replaces the reference's stage + COPY INTO (sql/02_load_data.sql:8-60,
S5-S7): quoted CSV, skip header, trim, empty->NULL, all columns STRING, plus
METADATA$FILENAME / METADATA$FILE_ROW_NUMBER / load_id / ingested_at.

File row numbers use a window partitioned by file name; ordering within a
file uses ``monotonically_increasing_id`` which preserves on-disk row order
per partition — matching Snowflake's METADATA$FILE_ROW_NUMBER semantics
(1-based, per file). FAILFAST ≈ ON_ERROR = ABORT_STATEMENT.

Scale note: one CSV file lands in one Spark partition unless splittable;
the window shuffles per file name only — at 100 TB with many files this
stays balanced (partition count = file count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..schemas import RAW_CSV_SCHEMA, SCRAPE_COLUMNS


def read_raw_csv(spark: SparkSession, path: str) -> DataFrame:
    """Landing CSV(s) -> bronze DataFrame (BRONZE_SCHEMA shape)."""
    raw = (
        spark.read.schema(RAW_CSV_SCHEMA)
        .option("header", True)
        .option("quote", '"')
        .option("ignoreLeadingWhiteSpace", True)
        .option("ignoreTrailingWhiteSpace", True)
        .option("nullValue", "")
        .option("mode", "FAILFAST")
        .csv(path)
    )
    w = Window.partitionBy(F.input_file_name()).orderBy(
        F.monotonically_increasing_id()
    )
    return raw.select(
        F.expr("uuid()").alias("load_id"),
        F.input_file_name().alias("source_file_name"),
        F.row_number().over(w).cast("long").alias("source_row_number"),
        *SCRAPE_COLUMNS,
        F.current_timestamp().alias("ingested_at"),
    )


def read_raw_json(
    spark: SparkSession, path: str, multiline: bool = True
) -> DataFrame:
    """Landing JSON file(s) -> bronze DataFrame, same shape and metadata
    contract as :func:`read_raw_csv`.

    The scraper emits both CSV and JSON (reference scraper/scrape.py:
    183-197, S3/S4); this is the JSON side of the same COPY INTO
    replacement. ``multiline=True`` (default) reads the scraper's
    indented-array form; pass False for JSON-lines landing files (the
    splittable form you want at scale — an array file is one task).
    Schema is declared, never inferred (SURVEY.md §1.2); FAILFAST aborts
    on malformed documents like ON_ERROR = ABORT_STATEMENT.
    """
    raw = (
        spark.read.schema(RAW_CSV_SCHEMA)
        .option("mode", "FAILFAST")
        .option("multiLine", multiline)
        .json(path)
    )
    w = Window.partitionBy(F.input_file_name()).orderBy(
        F.monotonically_increasing_id()
    )
    return raw.select(
        F.expr("uuid()").alias("load_id"),
        F.input_file_name().alias("source_file_name"),
        F.row_number().over(w).cast("long").alias("source_row_number"),
        *SCRAPE_COLUMNS,
        F.current_timestamp().alias("ingested_at"),
    )


def raw_quality_metrics(bronze: DataFrame) -> DataFrame:
    """Strict post-load aggregate (reference sql/02_load_data.sql:66-73):
    row count, missing identity fields, unparseable numerics."""

    def count_if(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    return bronze.agg(
        F.count("*").alias("raw_row_count"),
        count_if(
            F.col("symbol").isNull() | (F.trim("symbol") == "")
        ).alias("missing_symbol_rows"),
        count_if(
            F.col("entity_name").isNull() | (F.trim("entity_name") == "")
        ).alias("missing_entity_name_rows"),
        count_if(
            F.col("price").try_cast("decimal(18,4)").isNull()
        ).alias("invalid_price_rows"),
        count_if(
            F.col("market_cap").try_cast("decimal(38,0)").isNull()
        ).alias("invalid_market_cap_rows"),
        count_if(
            F.col("volume").try_cast("decimal(38,0)").isNull()
        ).alias("invalid_volume_rows"),
    )
