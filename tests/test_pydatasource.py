"""The Spark 4 Python DataSource feed: partition planning + parity with
the scraper's serial pagination path."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_datasource_reads_feed_with_page_partitions(spark):
    from snowflake_stock_dbt_spark.sources.pydatasource import (
        FEED_SCHEMA,
        MostActivesDataSource,
    )

    spark.dataSource.register(MostActivesDataSource)
    df = (
        spark.read.format("most_actives")
        .option("n_symbols", "100")
        .option("page_size", "25")
        .load()
    )
    assert df.schema == FEED_SCHEMA
    assert df.count() == 100
    # One input partition per screener page — the pagination loop IS the
    # partition plan.
    assert df.rdd.getNumPartitions() == 4


def test_datasource_rows_equal_scraper_collect_path(spark):
    """format("most_actives") must produce exactly the rows the serial
    scraper path (S1/S2) accumulates."""
    from snowflake_stock_dbt_spark.sources.pydatasource import (
        MostActivesDataSource,
    )
    from snowflake_stock_dbt_spark.sources.scraper import (
        collect_most_actives,
        synthetic_feed,
    )

    spark.dataSource.register(MostActivesDataSource)
    scraped_at = "2024-01-01T00:00:00+00:00"
    df = (
        spark.read.format("most_actives")
        .option("n_symbols", "100")
        .option("scraped_at", scraped_at)
        .load()
    )
    # collect_most_actives stamps its own wall-clock scraped_at; compare
    # the deterministic columns.
    cols = [c for c in df.columns if c != "scraped_at"]
    got = {tuple(r[c] for c in cols) for r in df.collect()}
    rows = collect_most_actives(synthetic_feed(100), target=100)
    expect = {tuple(r[c] for c in cols) for r in rows}
    assert got == expect


def test_datasource_filter_prunes_rows_not_schema(spark):
    from snowflake_stock_dbt_spark.sources.pydatasource import (
        MostActivesDataSource,
    )

    spark.dataSource.register(MostActivesDataSource)
    df = (
        spark.read.format("most_actives")
        .option("n_symbols", "100")
        .load()
        .where(F.col("location") == "US")
        .select("symbol", "price")
    )
    rows = df.collect()
    assert len(rows) == 34  # i % 3 == 0 within 0..99
    assert df.columns == ["symbol", "price"]
