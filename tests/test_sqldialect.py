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
