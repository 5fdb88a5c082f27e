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


def test_salted_aggregate_default_salt_is_content_deterministic(spark):
    """The default salt is a pure function of row content: two runs over a
    differently-partitioned copy of the same rows must land every row in
    the same salt (retry/re-plan stability), and a value-derived salt_col
    makes distributive-only partials (count_distinct) exact."""
    from snowflake_stock_dbt_spark.operators.skew import salted_aggregate

    rows = [(i % 3, f"v{i % 7}", i) for i in range(100)]
    df1 = spark.createDataFrame(rows, "g int, v string, seq long").repartition(2)
    df2 = spark.createDataFrame(rows, "g int, v string, seq long").repartition(13)

    def partials(df):
        staged = df.withColumn(
            "__salt",
            (F.abs(F.hash(*[F.col(c) for c in df.columns])) % 8).cast("int"),
        )
        return sorted(
            map(tuple, staged.groupBy("g", "__salt").count().collect())
        )

    assert partials(df1) == partials(df2)

    # Algebraic partials through the public API stay exact with the default.
    got = {
        r["g"]: (r["n"], r["mx"])
        for r in salted_aggregate(
            spark.createDataFrame(rows, "g int, v string, seq long"),
            keys=["g"],
            partial_aggs={"n": F.count("*"), "mx": F.max("seq")},
            merge_aggs={"n": F.sum, "mx": F.max},
        ).collect()
    }
    exact = {
        r["g"]: (r["n"], r["mx"])
        for r in spark.createDataFrame(rows, "g int, v string, seq long")
        .groupBy("g")
        .agg(F.count("*").alias("n"), F.max("seq").alias("mx"))
        .collect()
    }
    assert got == exact

    # count_distinct needs the documented value-derived salt to stay exact.
    df = spark.createDataFrame(rows, "g int, v string, seq long")
    cd = {
        r["g"]: r["nd"]
        for r in salted_aggregate(
            df,
            keys=["g"],
            partial_aggs={"nd": F.count_distinct("v")},
            merge_aggs={"nd": F.sum},
            salt_col=F.abs(F.hash("v")) % 8,
        ).collect()
    }
    exact_cd = {
        r["g"]: r["nd"]
        for r in df.groupBy("g").agg(F.count_distinct("v").alias("nd")).collect()
    }
    assert cd == exact_cd


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
