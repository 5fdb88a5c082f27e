"""Interchange formats: declarative round-trips for the lake formats
Spark ships natively — parquet, ORC, CSV, JSON-lines, and (Spark 4)
XML.

The reference's interchange surface is CSV + JSON files (reference
scraper/scrape.py:183-197, app/streamlit_app.py:106-111); a warehouse
replacement additionally needs the columnar lake formats. One writer /
reader pair keeps the engine's rules in force everywhere:

- **schemas are declared, never inferred** for text formats (CSV/JSON) —
  inference is a second scan and a correctness hazard on 100 TB;
- **columnar formats keep pushdown**: parquet and ORC readers expose
  min/max/dictionary filters to Catalyst (`PushedFilters` in the scan
  node — asserted by tests/test_layout.py so a format regression that
  silently drops pushdown fails CI);
- **CSV/JSON are write-once interchange**, not analytics storage: no
  stats, no pushdown, row-oriented — the docstring is the guard rail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

FORMATS = ("parquet", "orc", "csv", "json", "xml")

#: Formats whose scans push filters/column pruning down to the file.
COLUMNAR = ("parquet", "orc")


def write_table(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    **options,
) -> None:
    """Write ``df`` at ``path`` in ``fmt``; CSV gets a header by default
    (the reference's interchange convention)."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    writer = df.write.mode(mode).format(fmt)
    if fmt == "csv" and "header" not in options:
        writer = writer.option("header", True)
    if fmt == "xml" and "rowTag" not in options:
        # Spark 4's NATIVE XML source (spark-xml merged upstream); a row
        # tag is mandatory — default it so round-trips are symmetric.
        writer = writer.option("rowTag", "row")
    for k, v in options.items():
        writer = writer.option(k, v)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: StructType | str | None = None,
    **options,
) -> DataFrame:
    """Read ``path`` as ``fmt``. Text formats (CSV/JSON) REQUIRE an
    explicit schema — production paths never infer."""
    if fmt not in FORMATS:
        raise ValueError(f"fmt must be one of {FORMATS}")
    if fmt in ("csv", "json", "xml") and schema is None:
        raise ValueError(
            f"{fmt} reads require an explicit schema (no inference in "
            "production paths; SURVEY.md §1.2)"
        )
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        reader = reader.option("header", True)
    if fmt == "xml" and "rowTag" not in options:
        reader = reader.option("rowTag", "row")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)
