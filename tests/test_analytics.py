"""Differential tests: engine DataFrame vs DuckDB oracle for every analytics
query, at two scale factors (ties/windows behave differently as data grows)."""

from __future__ import annotations

import pytest

from snowflake_stock_dbt_spark.plans import ANALYTICS_ORACLES, ANALYTICS_QUERIES

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(ANALYTICS_QUERIES))
def test_analytics_matches_oracle_smoke(spark, sf_dir, name):
    n, _ = compare_query(
        spark, sf_dir, ANALYTICS_QUERIES[name], ANALYTICS_ORACLES[name], name
    )
    assert n >= 0


@pytest.mark.parametrize("name", sorted(ANALYTICS_QUERIES))
def test_analytics_matches_oracle_sf001(spark, oracle_sf_dir, name):
    compare_query(
        spark, oracle_sf_dir, ANALYTICS_QUERIES[name], ANALYTICS_ORACLES[name], name
    )


def test_q1_returns_rows(spark, sf_dir):
    df = ANALYTICS_QUERIES["q01_top_by_metric"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) == 10
    metrics = [r["latest_metric"] for r in rows]
    assert metrics == sorted(metrics, reverse=True)
