"""Every declared schema in the engine (SURVEY.md §1.2).

The reference declares fixed schemas at every warehouse layer
(reference sql/01_create_tables.sql:12-57) and never infers in SQL; we do the
same — bronze is all-string + load metadata, silver is typed with surrogate
keys. ``inferSchema`` is never used on a production path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Stock pipeline layers (reference parity)
# ---------------------------------------------------------------------------

#: Columns produced by the scraper, in CSV column order
#: (reference scraper/scrape.py:102-120, FIELDNAMES at :15-23).
SCRAPE_COLUMNS = [
    "symbol",
    "entity_name",
    "category",
    "location",
    "exchange",
    "currency",
    "price",
    "market_cap",
    "volume",
    "avg_volume_3m",
    "source_url",
    "scraped_at",
]

#: Raw CSV read schema — all STRING, like the permissive raw table
#: (reference sql/01_create_tables.sql:13-31: every scraped column is STRING).
RAW_CSV_SCHEMA = T.StructType(
    [T.StructField(c, T.StringType(), True) for c in SCRAPE_COLUMNS]
)

#: Bronze = raw columns + load metadata (reference sql/01_create_tables.sql:14-17
#: load_id/source_file_name/source_row_number/ingested_at; populated by the
#: COPY INTO transform at sql/02_load_data.sql:42-56).
BRONZE_SCHEMA = T.StructType(
    [
        T.StructField("load_id", T.StringType(), False),
        T.StructField("source_file_name", T.StringType(), True),
        T.StructField("source_row_number", T.LongType(), True),
        *[T.StructField(c, T.StringType(), True) for c in SCRAPE_COLUMNS],
        T.StructField("ingested_at", T.TimestampType(), False),
    ]
)

#: Silver / clean table (reference sql/01_create_tables.sql:33-57). price is
#: DECIMAL(18,4) exactly as declared; the NUMBER(38,0) metrics are narrowed to
#: LongType because the source values are Python ints
#: (reference scraper/scrape.py:93-99) — documented narrowing, SURVEY.md §1.2.
SILVER_SCHEMA = T.StructType(
    [
        T.StructField("observation_sk", T.StringType(), False),
        T.StructField("entity_sk", T.StringType(), False),
        T.StructField("symbol", T.StringType(), True),
        T.StructField("entity_name", T.StringType(), True),
        T.StructField("category", T.StringType(), True),
        T.StructField("location", T.StringType(), True),
        T.StructField("exchange", T.StringType(), True),
        T.StructField("currency", T.StringType(), True),
        T.StructField("price", T.DecimalType(18, 4), True),
        T.StructField("market_cap", T.LongType(), True),
        T.StructField("volume", T.LongType(), True),
        T.StructField("avg_volume_3m", T.LongType(), True),
        T.StructField("source_url", T.StringType(), True),
        T.StructField("scraped_at", T.TimestampType(), True),
        T.StructField("scraped_date", T.DateType(), True),
        T.StructField("loaded_at", T.TimestampType(), False),
    ]
)

# ---------------------------------------------------------------------------
# Driver-provided synthetic tables (/root/testdata, TESTDATA.md)
# ---------------------------------------------------------------------------

#: Table name -> parquet file stem for the TPC-H-ish test corpus.
TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
