"""Serving result cache and salted-join semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.operators.skew import salted_join
from snowflake_stock_dbt_spark.serving.cache import ResultCache
from snowflake_stock_dbt_spark.sources.tables import load_table


def test_result_cache_memoizes_and_invalidates(spark, sf_dir):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return load_table(spark, sf_dir, "nation").orderBy("n_nationkey")

    cache = ResultCache()
    a = cache.get(("nations", "All"), build)
    b = cache.get(("nations", "All"), build)
    assert calls["n"] == 1 and a is b
    assert a.storageLevel.useMemory  # persisted, st.cache_data-style
    cache.invalidate(("nations", "All"))
    assert len(cache) == 0
    cache.get(("nations", "All"), build)
    assert calls["n"] == 2
    cache.invalidate()


def test_salted_join_equals_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    plain = orders.join(
        cust, orders.o_custkey == cust.c_custkey
    ).groupBy("c_nationkey").count()
    salted = salted_join(
        orders.withColumnRenamed("o_custkey", "k"),
        cust.withColumnRenamed("c_custkey", "k"),
        on=["k"],
        n_salts=8,
    ).groupBy("c_nationkey").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, lv string")
    right = spark.createDataFrame([(1, "x"), (1, "y")], "k long, rv string")
    out = sorted(
        (r["k"], r["lv"], r["rv"])
        for r in salted_join(left, right, ["k"], n_salts=4, how="left").collect()
    )
    assert out == [(1, "a", "x"), (1, "a", "y"), (2, "b", None), (3, "c", None)]
    with pytest.raises(ValueError):
        salted_join(left, right, ["k"], how="full")
