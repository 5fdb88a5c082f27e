"""Streaming pipeline tests: final streaming state vs batch/oracle semantics."""

from __future__ import annotations

import pytest

from snowflake_stock_dbt_spark.plans.streaming_plans import (
    STREAMING_ORACLES,
    STREAMING_QUERIES,
)

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(STREAMING_QUERIES))
def test_streaming_matches_oracle(spark, oracle_sf_dir, name):
    n, _ = compare_query(
        spark, oracle_sf_dir, STREAMING_QUERIES[name], STREAMING_ORACLES[name], name
    )
    assert n > 0


def test_streaming_window_equals_batch_query(spark, oracle_sf_dir):
    """Complete-mode final state must equal the batch tumbling window (q28)
    on the shared columns."""
    from snowflake_stock_dbt_spark.plans.events import q28_tumbling_window

    stream = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in STREAMING_QUERIES["q29_streaming_window"](
            spark, oracle_sf_dir
        ).collect()
    }
    batch = {
        (r["window_start_us"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in q28_tumbling_window(spark, oracle_sf_dir).collect()
    }
    assert stream == batch
