"""Differential tests for the pipeline/serving query set (q06-q15)."""

from __future__ import annotations

import pytest

from snowflake_stock_dbt_spark.plans.pipeline import PIPELINE_ORACLES, PIPELINE_QUERIES

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(PIPELINE_QUERIES))
def test_pipeline_matches_oracle_sf001(spark, oracle_sf_dir, name):
    compare_query(
        spark, oracle_sf_dir, PIPELINE_QUERIES[name], PIPELINE_ORACLES[name], name
    )


def test_q06_one_row_per_key(spark, sf_dir):
    df = PIPELINE_QUERIES["q06_latest_wins_dedup"](spark, sf_dir)
    total = df.count()
    distinct = df.select("user_id", "event_type").distinct().count()
    assert total == distinct


def test_q14_upsert_is_idempotent_on_rowcount(spark, sf_dir):
    from snowflake_stock_dbt_spark.operators.upsert import merge_upsert
    from snowflake_stock_dbt_spark.sources.tables import load_table

    orders = load_table(spark, sf_dir, "orders")
    src = orders.limit(100)
    once = merge_upsert(orders, src, "o_orderkey")
    twice = merge_upsert(once, src, "o_orderkey")
    assert once.count() == orders.count() == twice.count()
