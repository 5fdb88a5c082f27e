"""[EXT] Spark 4 Python DataSource wrapping the screener feed.

The reference ingests by running a scraper script and loading its CSV
(scraper/scrape.py -> sql/02_load_data.sql). Spark 4's Python DataSource
API (SPARK-44076) lets the engine expose the same feed as a FIRST-CLASS
table instead: ``spark.read.format("most_actives")`` plans one input
partition per screener page, so pages are fetched by the executors in
parallel — the pagination loop the reference runs serially on one
machine (scraper/scrape.py:146-170) becomes the cluster's partition
plan. Offline by contract (the deterministic synthetic feed, same rows
as sources/scraper.py's collect path); the HTTP fetch stays in
scraper.fetch_page_http and could be swapped in per-partition, but
tests and the driver gate never touch the network.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .scraper import PAGE_SIZE, TARGET_ROW_COUNT, normalize_quote, synthetic_feed

#: Column order matches sources/scraper.py:normalize_quote.
FEED_SCHEMA = StructType(
    [
        StructField("symbol", StringType()),
        StructField("entity_name", StringType()),
        StructField("category", StringType()),
        StructField("location", StringType()),
        StructField("exchange", StringType()),
        StructField("currency", StringType()),
        StructField("price", DoubleType()),
        StructField("market_cap", LongType()),
        StructField("volume", LongType()),
        StructField("avg_volume_3m", LongType()),
        StructField("source_url", StringType()),
        StructField("scraped_at", StringType()),
    ]
)


class PagePartition(InputPartition):
    def __init__(self, start: int, count: int):
        self.start = start
        self.count = count


class MostActivesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_symbols = int(options.get("n_symbols", TARGET_ROW_COUNT))
        self.page_size = int(options.get("page_size", PAGE_SIZE))
        self.scraped_at = options.get("scraped_at", "2024-01-01T00:00:00+00:00")

    def partitions(self):
        return [
            PagePartition(start, self.page_size)
            for start in range(0, self.n_symbols, self.page_size)
        ]

    def read(self, partition: PagePartition):
        fetch = synthetic_feed(self.n_symbols)
        for quote in fetch(partition.start, partition.count):
            row = normalize_quote(quote, self.scraped_at)
            yield tuple(row[f.name] for f in FEED_SCHEMA.fields)


class MostActivesDataSource(DataSource):
    """``spark.read.format("most_actives")`` after
    ``spark.dataSource.register(MostActivesDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "most_actives"

    def schema(self):
        return FEED_SCHEMA

    def reader(self, schema) -> MostActivesReader:
        return MostActivesReader(self.options)
