"""Incremental aggregate maintenance (operators/incremental.py).

The contract worth pinning: merging partial aggregates is *batching-
independent* — however history is split into batches, the merged state
equals the full recompute bit-for-bit (exact decimal sums). q91's oracle
proves it for one split; these tests prove it for several, including
degenerate ones.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.operators.incremental import (
    finalize,
    merge_partials,
    partial_aggregate,
)
from snowflake_stock_dbt_spark.sources.tables import load_table


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_three_batches_equals_full(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    batches = [
        ev.where(F.col("event_id") % 3 == i) for i in range(3)
    ]
    parts = [partial_aggregate(b, ["event_type"], "value") for b in batches]
    merged = finalize(merge_partials(["event_type"], *parts), ["event_type"])
    full = finalize(
        partial_aggregate(ev, ["event_type"], "value"), ["event_type"]
    )
    assert _rows(merged) == _rows(full)


def test_merge_with_empty_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    empty = ev.where(F.lit(False))
    parts = [
        partial_aggregate(ev, ["event_type"], "value"),
        partial_aggregate(empty, ["event_type"], "value"),
    ]
    merged = finalize(merge_partials(["event_type"], *parts), ["event_type"])
    full = finalize(
        partial_aggregate(ev, ["event_type"], "value"), ["event_type"]
    )
    assert _rows(merged) == _rows(full)


def test_merge_introduces_new_key(spark):
    a = spark.createDataFrame(
        [("x", 1.5), ("x", 2.5)], ["k", "v"]
    )
    b = spark.createDataFrame([("y", 10.0)], ["k", "v"])
    merged = finalize(
        merge_partials(
            ["k"],
            partial_aggregate(a, ["k"], "v"),
            partial_aggregate(b, ["k"], "v"),
        ),
        ["k"],
    )
    got = {r["k"]: (r["n_rows"], r["total"], r["mean"]) for r in merged.collect()}
    assert got == {"x": (2, 4.0, 2.0), "y": (1, 10.0, 10.0)}
