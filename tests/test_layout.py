"""Storage-layout contracts: partition pruning prunes, bucketing removes
the join exchange. These assert on the PHYSICAL PLAN, not just results —
the 100 TB behavior is the plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.sinks.layout import (
    write_bucketed_table,
    write_partitioned,
)
from snowflake_stock_dbt_spark.sources.tables import load_table


def _physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partitioned_write_prunes_on_date(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem").withColumn(
        "ship_date", F.to_date("l_shipdate")
    )
    path = str(tmp_path / "fct")
    write_partitioned(li, path, ["ship_date"])

    one_day = li.select("ship_date").distinct().orderBy("ship_date").first()[0]
    back = spark.read.parquet(path).where(F.col("ship_date") == F.lit(one_day))

    plan = _physical(back)
    assert "PartitionFilters: [" in plan
    # The pruning filter must actually reference the partition column…
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "ship_date" in pf
    # …and the values must round-trip.
    expected = li.where(F.col("ship_date") == F.lit(one_day)).count()
    assert back.count() == expected > 0


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = load_table(spark, sf_dir, "orders")
        c = load_table(spark, sf_dir, "customer")
        write_bucketed_table(
            o.select("o_orderkey", "o_custkey", "o_totalprice"),
            "orders_b", ["o_custkey"], 8, sort_cols=["o_custkey"],
        )
        write_bucketed_table(
            c.select("c_custkey", "c_name"),
            "customer_b", ["c_custkey"], 8, sort_cols=["c_custkey"],
        )
        joined = spark.table("orders_b").join(
            spark.table("customer_b"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        plan = _physical(joined)
        assert "Exchange hashpartitioning" not in plan
        # Same answer as the unbucketed join.
        expected = o.join(c, o.o_custkey == c.c_custkey).count()
        assert joined.count() == expected > 0
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS customer_b")


def test_dynamic_partition_pruning_fires(spark, sf_dir, tmp_path):
    """Joining a partitioned fact on its partition column against a
    filtered dim must inject a dynamic-pruning subquery into the fact scan
    (Snowflake micro-partition pruning analog for join-derived filters)."""
    from pyspark.sql import functions as F

    from snowflake_stock_dbt_spark.sinks.layout import write_partitioned
    from snowflake_stock_dbt_spark.sources.tables import load_table

    path = str(tmp_path / "orders_by_priority")
    orders = load_table(spark, sf_dir, "orders")
    write_partitioned(orders, path, ["o_orderpriority"])
    fact = spark.read.parquet(path)
    dim = (
        orders.select("o_orderpriority").distinct()
        .withColumn("keep", F.col("o_orderpriority").startswith("1"))
    )
    joined = fact.join(
        F.broadcast(dim.where(F.col("keep"))), "o_orderpriority"
    )
    plan = joined._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "dynamicpruning" in plan.lower()
    got = joined.select("o_orderkey").count()
    want = orders.where(F.col("o_orderpriority").startswith("1")).count()
    assert got == want


def test_compact_path_reduces_file_count_preserving_rows(spark, tmp_path):
    from snowflake_stock_dbt_spark.sinks.layout import compact_path, describe_files

    path = str(tmp_path / "t")
    df = spark.range(100_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(path)
    before, _ = describe_files(spark, path)
    assert before == 64
    b, after = compact_path(spark, path, target_file_bytes=10 * 1024 * 1024)
    assert b == 64 and after < 64
    out = spark.read.parquet(path)
    assert out.count() == 100_000
    assert out.agg(F.sum("v")).first()[0] == 2 * (99_999 * 100_000 // 2)


def test_compact_path_sorted_clusters_ranges(spark, tmp_path):
    """sort_cols compaction range-partitions files: per-file id ranges must
    not overlap (the min/max-pruning property)."""
    from snowflake_stock_dbt_spark.sinks.layout import compact_path

    path = str(tmp_path / "t")
    spark.range(200_000).withColumn("v", F.rand(5)).repartition(32).write.parquet(path)
    compact_path(spark, path, target_file_bytes=400 * 1024, sort_cols=["id"])
    per_file = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
        .collect()
    )
    assert len(per_file) > 1
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (_, hi_a), (lo_b, _) in zip(spans, spans[1:]):
        assert hi_a < lo_b


def test_compact_path_skips_already_compact(spark, tmp_path):
    from snowflake_stock_dbt_spark.sinks.layout import compact_path

    path = str(tmp_path / "t")
    spark.range(1000).coalesce(1).write.parquet(path)
    before, after = compact_path(spark, path)
    assert (before, after) == (1, 1)


def test_zorder_prunes_both_dimensions(spark, sf_dir, tmp_path):
    """Z-order clustering on (user_id, value) must bound per-file min/max
    spans in BOTH dimensions: a linear sort on user_id alone leaves every
    file spanning most of the value range (measured ~0.77 of it on this
    corpus), so value predicates prune nothing; the Z-order layout must
    cut that span sharply while keeping user_id spans bounded — that is
    the multi-dimensional pruning trade the layout buys."""
    import glob

    import pyarrow.parquet as pq

    from snowflake_stock_dbt_spark.sinks.layout import zorder_write
    from snowflake_stock_dbt_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    n_files = 8

    linear = str(tmp_path / "linear")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zpath = str(tmp_path / "zorder")
    zorder_write(spark, ev, zpath, ["user_id", "value"], n_files)

    def span_fraction(path: str, colidx: int) -> float:
        """Mean per-file [min,max] width relative to the global range."""
        spans, lo, hi = [], [], []
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            mins = [
                md.row_group(i).column(colidx).statistics.min
                for i in range(md.num_row_groups)
            ]
            maxs = [
                md.row_group(i).column(colidx).statistics.max
                for i in range(md.num_row_groups)
            ]
            spans.append(max(maxs) - min(mins))
            lo.append(min(mins))
            hi.append(max(maxs))
        return (sum(spans) / len(spans)) / (max(hi) - min(lo))

    lin_value = span_fraction(linear, 1)
    z_value = span_fraction(zpath, 1)
    z_user = span_fraction(zpath, 0)
    # Value-dimension pruning must improve sharply (measured 0.77 -> 0.35)
    assert z_value < 0.6 * lin_value
    # ...while user-dimension spans stay bounded (z-order trade-off; a
    # linear user sort gives 1/8, z-order must stay under 1/2).
    assert z_user < 0.5

    # And the clustered copy is still the same data.
    a = sorted(tuple(r) for r in spark.read.parquet(zpath).collect())
    b = sorted(tuple(r) for r in ev.collect())
    assert a == b


# --- interchange formats (sources/formats.py) ------------------------------


def test_format_round_trips(spark, sf_dir, tmp_path):
    from snowflake_stock_dbt_spark.sources.formats import read_table, write_table

    src = spark.read.parquet(f"{sf_dir}/customer.parquet")
    want = sorted(tuple(r) for r in src.collect())
    schema = src.schema
    for fmt in ("parquet", "orc", "csv", "json", "xml"):
        p = str(tmp_path / f"t_{fmt}")
        write_table(src, p, fmt)
        got = read_table(spark, p, fmt, schema=schema)
        assert sorted(tuple(r) for r in got.collect()) == want, fmt


def test_text_formats_require_schema(spark, tmp_path):
    import pytest as _pytest

    from snowflake_stock_dbt_spark.sources.formats import read_table

    for fmt in ("csv", "json", "xml"):
        with _pytest.raises(ValueError, match="explicit schema"):
            read_table(spark, str(tmp_path), fmt)


def test_columnar_formats_push_filters(spark, sf_dir, tmp_path):
    """Parquet AND ORC scans must expose predicate pushdown — a format
    regression that silently drops PushedFilters fails here."""
    from pyspark.sql import functions as F

    from snowflake_stock_dbt_spark.sources.formats import read_table, write_table

    src = spark.read.parquet(f"{sf_dir}/customer.parquet")
    for fmt in ("parquet", "orc"):
        p = str(tmp_path / f"pf_{fmt}")
        write_table(src, p, fmt)
        df = read_table(spark, p, fmt).where(F.col("c_custkey") == 42).select(
            "c_custkey", "c_name"
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan and "c_custkey" in plan.split(
            "PushedFilters"
        )[1][:120], f"{fmt}: filter not pushed"
