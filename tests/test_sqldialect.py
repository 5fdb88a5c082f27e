"""Tests for the Snowflake-dialect QUALIFY rewrite."""

from __future__ import annotations

import pytest

from snowflake_stock_dbt_spark.sqldialect import rewrite_qualify


def test_passthrough_without_qualify():
    sql = "SELECT a FROM t WHERE b = 'QUALIFY me'"
    assert rewrite_qualify(sql) == sql


def test_alias_predicate(spark):
    sql = (
        "SELECT a, ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) AS rn "
        "FROM VALUES (1, 10), (1, 20), (2, 5) t(a, b) QUALIFY rn = 1"
    )
    rows = sorted(tuple(r) for r in spark.sql(rewrite_qualify(sql)).collect())
    assert rows == [(1, 1), (2, 1)]


def test_window_in_predicate_is_hoisted_and_hidden(spark):
    sql = (
        "SELECT a, b FROM VALUES (1, 10), (1, 20), (2, 5) t(a, b) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) = 1"
    )
    df = spark.sql(rewrite_qualify(sql))
    assert df.columns == ["a", "b"]  # helper column hidden via * EXCEPT
    assert sorted(tuple(r) for r in df.collect()) == [(1, 20), (2, 5)]


def test_order_by_and_limit_survive(spark):
    sql = (
        "SELECT a, b FROM VALUES (1, 10), (1, 20), (2, 5), (3, 9) t(a, b) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) = 1 "
        "ORDER BY b DESC LIMIT 2"
    )
    assert [tuple(r) for r in spark.sql(rewrite_qualify(sql)).collect()] == [
        (1, 20),
        (3, 9),
    ]


def test_subquery_qualify_is_not_touched():
    # QUALIFY inside a subquery is below top level; the scanner must not
    # fire on it (the subquery dialect is the caller's concern).
    sql = "SELECT * FROM (SELECT a FROM t) WHERE a > 0"
    assert rewrite_qualify(sql) == sql


def test_two_window_exprs(spark):
    sql = (
        "SELECT a, b FROM VALUES (1, 10), (1, 20), (2, 5) t(a, b) "
        "QUALIFY ROW_NUMBER() OVER (PARTITION BY a ORDER BY b DESC) = 1 "
        "AND COUNT(*) OVER (PARTITION BY a) > 1"
    )
    df = spark.sql(rewrite_qualify(sql))
    assert df.columns == ["a", "b"]
    assert [tuple(r) for r in df.collect()] == [(1, 20)]


def test_refuses_malformed_predicate():
    with pytest.raises(ValueError):
        rewrite_qualify("SELECT a FROM t QUALIFY x OVER (ORDER BY a) = 1")


# --- Snowflake scalar-function rewrites (compile_snowflake_sql door) -------


def test_function_rewrites_text():
    from snowflake_stock_dbt_spark.sqldialect import rewrite_snowflake_functions

    out = rewrite_snowflake_functions(
        "SELECT TRY_TO_NUMBER(v), TRY_TO_DECIMAL(p, 18, 4), "
        "TRY_TO_TIMESTAMP_TZ(ts), IFF(a > 1, 'y', 'n'), "
        "ZEROIFNULL(x), TO_VARCHAR(k) FROM t"
    )
    assert "TRY_CAST(v AS DECIMAL(38,0))" in out
    assert "TRY_CAST(p AS DECIMAL(18,4))" in out
    assert "TRY_CAST(ts AS TIMESTAMP)" in out
    assert "IF(a > 1, 'y', 'n')" in out
    assert "COALESCE(x, 0)" in out
    assert "CAST(k AS STRING)" in out


def test_function_rewrite_nested_and_quoted():
    from snowflake_stock_dbt_spark.sqldialect import rewrite_snowflake_functions

    out = rewrite_snowflake_functions(
        "SELECT TRY_TO_NUMBER(TRIM(TO_VARCHAR(x))), 'TRY_TO_NUMBER(lit)' FROM t"
    )
    assert "TRY_CAST(TRIM(CAST(x AS STRING)) AS DECIMAL(38,0))" in out
    assert "'TRY_TO_NUMBER(lit)'" in out  # string literal untouched


def test_snowflake_rounding_semantics(spark):
    """Snowflake TO_NUMBER ROUNDS fractional text; the DECIMAL(38,0)
    mapping reproduces that ('12.5' -> 13), a BIGINT cast would not."""
    from snowflake_stock_dbt_spark.sqldialect import compile_snowflake_sql

    row = spark.sql(
        compile_snowflake_sql(
            "SELECT TRY_TO_NUMBER('12.5') AS a, TRY_TO_NUMBER('abc') AS b"
        )
    ).first()
    assert int(row["a"]) == 13 and row["b"] is None


def test_reference_staging_worksheet_runs(spark):
    """The reference's staging SELECT (sql/02_load_data.sql:90-112 shape —
    TRY_TO_* casts + QUALIFY latest-wins) runs unmodified through the
    dialect door."""
    from snowflake_stock_dbt_spark.sqldialect import compile_snowflake_sql

    spark.createDataFrame(
        [
            ("AAA", "12.5", "1000", "2024-01-01T10:00:00+00:00", 1),
            ("AAA", "N/A", "2000", "2024-01-02T10:00:00+00:00", 2),
            ("BBB", "7.25", "bad", "2024-01-01T10:00:00+00:00", 3),
        ],
        "symbol string, price string, volume string, scraped_at string, rid long",
    ).createOrReplaceTempView("raw_ws")
    sql = """
    SELECT symbol,
           TRY_TO_DECIMAL(price, 18, 4) AS price,
           TRY_TO_NUMBER(volume) AS volume,
           TRY_TO_TIMESTAMP_TZ(scraped_at) AS scraped_at
    FROM raw_ws
    QUALIFY ROW_NUMBER() OVER (
        PARTITION BY symbol ORDER BY TRY_TO_TIMESTAMP_TZ(scraped_at) DESC
    ) = 1
    """
    rows = {r["symbol"]: r for r in spark.sql(compile_snowflake_sql(sql)).collect()}
    assert len(rows) == 2
    assert rows["AAA"]["price"] is None  # latest row wins, its price is N/A
    assert rows["AAA"]["volume"] == 2000
    assert float(rows["BBB"]["price"]) == 7.25 and rows["BBB"]["volume"] is None
