"""Oracle-differential + semantic tests for the relational-surface
extensions (rollup/cube/grouping-sets, set ops, pivot, as-of join, range
join), multimodal queries, and embedding near-dup."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.operators.asof import asof_join, range_join_buckets
from snowflake_stock_dbt_spark.plans.multimodal_plans import (
    MULTIMODAL_ORACLES,
    MULTIMODAL_QUERIES,
)
from snowflake_stock_dbt_spark.plans.relational import (
    RELATIONAL_ORACLES,
    RELATIONAL_QUERIES,
)
from snowflake_stock_dbt_spark.plans.vectors import VECTOR_ORACLES, VECTOR_QUERIES

from .oracle_utils import compare_query


@pytest.mark.parametrize("name", sorted(RELATIONAL_QUERIES))
def test_relational_match_oracle(spark, oracle_sf_dir, name):
    n, _ = compare_query(
        spark, oracle_sf_dir, RELATIONAL_QUERIES[name], RELATIONAL_ORACLES[name], name
    )
    assert n > 0


@pytest.mark.parametrize("name", sorted(MULTIMODAL_QUERIES))
def test_multimodal_match_oracle(spark, oracle_sf_dir, name):
    if name not in MULTIMODAL_ORACLES:
        # Rows-only contract (q81 binary DSP): the driver records the same
        # weaker check; the numeric content is pinned by
        # tests/test_multimodal_quality.py on synthetic PCM.
        n = MULTIMODAL_QUERIES[name](spark, oracle_sf_dir).count()
        assert n > 0
        return
    n, _ = compare_query(
        spark, oracle_sf_dir, MULTIMODAL_QUERIES[name], MULTIMODAL_ORACLES[name], name
    )
    assert n > 0


def test_embedding_neardup_matches_oracle(spark, oracle_sf_dir):
    n, _ = compare_query(
        spark,
        oracle_sf_dir,
        VECTOR_QUERIES["q40_embedding_neardup"],
        VECTOR_ORACLES["q40_embedding_neardup"],
        "q40_embedding_neardup",
    )
    assert n > 0


def test_asof_join_semantics(spark):
    """Hand-built fixture: inclusive backward match, NULL when nothing
    precedes, greatest-tiebreak winner on timestamp ties."""
    left = spark.createDataFrame(
        [(1, 10, "l1"), (1, 5, "l2"), (2, 7, "l3"), (3, 1, "l4")],
        "k long, t long, lv string",
    )
    right = spark.createDataFrame(
        [(1, 5, 100, "r1"), (1, 5, 101, "r2"), (1, 9, 102, "r3"), (2, 8, 103, "r4")],
        "k long, rt long, rid long, rv string",
    )
    out = {
        (r["k"], r["t"]): (r["matched_rt"], r["rv"])
        for r in asof_join(
            left, right, ["k"], "t", "rt", ["rv"], tiebreak="rid"
        ).collect()
    }
    assert out[(1, 10)] == (9, "r3")  # latest preceding
    assert out[(1, 5)] == (5, "r2")  # inclusive + max-tiebreak wins tie
    assert out[(2, 7)] == (None, None)  # right row is AFTER left => no match
    assert out[(3, 1)] == (None, None)  # key with no right rows at all


def test_range_join_buckets_exact_and_unique(spark):
    """Bucketed rewrite returns exactly the pairs the naive inequality join
    returns, each exactly once (including cross-bucket matches)."""
    left = spark.createDataFrame(
        [(1, 0), (1, 95), (1, 200), (2, 50)], "k long, lt long"
    )
    right = spark.createDataFrame(
        [(1, 10), (1, 100), (1, 105), (1, 301), (2, 40)], "k long, rt long"
    )
    got = sorted(
        (r["k"], r["lt"], r["rt"])
        for r in range_join_buckets(left, right, ["k"], "lt", "rt", span=100).collect()
    )
    naive = sorted(
        (r["k"], r["lt"], r["rt"])
        for r in left.join(right, "k")
        .where((F.col("rt") >= F.col("lt")) & (F.col("rt") - F.col("lt") <= 100))
        .collect()
    )
    assert got == naive
    assert len(got) == len(set(got))  # no duplicated pairs from the 2-bucket copy
    assert (1, 95, 100) in got  # cross-bucket match is found


def test_grouping_totals_consistent(spark, sf_dir):
    """Rollup grand total must equal the plain ungrouped aggregate."""
    rolled = RELATIONAL_QUERIES["q31_rollup"](spark, sf_dir)
    total = rolled.where(F.col("gid") == 3).collect()
    assert len(total) == 1
    from snowflake_stock_dbt_spark.functions.numeric import dec_sum
    from snowflake_stock_dbt_spark.sources.tables import load_table

    li = load_table(spark, sf_dir, "lineitem")
    flat = li.agg(
        F.count("*").alias("n"), dec_sum("l_quantity").alias("s")
    ).collect()[0]
    assert total[0]["n_items"] == flat["n"]
    assert total[0]["sum_qty"] == flat["s"]


def test_scale_queries_match_oracle(spark, oracle_sf_dir):
    from snowflake_stock_dbt_spark.plans.scale import SCALE_ORACLES, SCALE_QUERIES

    for name in sorted(SCALE_QUERIES):
        n, _ = compare_query(
            spark, oracle_sf_dir, SCALE_QUERIES[name], SCALE_ORACLES[name], name
        )
        assert n > 0


def test_hll_accuracy_gate(spark, oracle_sf_dir):
    """Every group's HLL estimate must sit inside the declared tolerance —
    the invariant the q46 oracle pins."""
    from snowflake_stock_dbt_spark.plans.scale import q46_approx_distinct

    rows = q46_approx_distinct(spark, oracle_sf_dir).collect()
    assert rows and all(r["approx_within_tol"] for r in rows)
