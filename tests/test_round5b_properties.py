"""Independent re-proofs for the q207-q215 additions (beyond the DuckDB
oracles): structural invariants and brute-force replays on corpora the
oracle never sees."""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_sssp_bounded_brute_force_replay(spark):
    """Bellman-Ford bounded relaxation == brute-force min over all paths
    of <= `rounds` edges, on a graph where the cheap path needs MORE hops
    than the direct edge (so the min-plus fold is actually exercised)."""
    from snowflake_stock_dbt_spark.operators.graph import sssp_bounded

    edges = spark.createDataFrame(
        # 1->2->3->4 costs 5+5+5; direct 1->3 costs 20, 3->4 closes both.
        [(1, 2, 5), (2, 3, 5), (1, 3, 20), (3, 4, 5)],
        "u bigint, v bigint, w bigint",
    )
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {
        r["id"]: r["cost"]
        for r in sssp_bounded(edges, seeds, rounds=3).collect()
    }
    # Within 3 edges: 4 is reachable as 1->2->3->4 (15) — cheaper than
    # 1->3->4 (25); 3 keeps min(10 via two hops, 20 direct).
    assert got == {1: 0, 2: 5, 3: 10, 4: 15}
    # With only 2 rounds the 3-edge path is not available yet.
    got2 = {
        r["id"]: r["cost"]
        for r in sssp_bounded(edges, seeds, rounds=2).collect()
    }
    assert got2 == {1: 0, 2: 5, 3: 10, 4: 25}


def test_q212_other_rollup_conservation(spark):
    """The top-3 + OTHER rows per nation must conserve BOTH the exact
    item count and the part count of the ungrouped aggregate — the
    invariant the naive rank-filter (drop the tail) breaks."""
    from snowflake_stock_dbt_spark.plans.warehouse import q212_topn_other
    from snowflake_stock_dbt_spark.sources.tables import load_table

    out = q212_topn_other(spark, SF)
    per_nation = (
        out.groupBy("n_name")
        .agg(
            F.sum("n_parts").alias("parts"),
            F.sum("n_items").alias("items"),
        )
        .collect()
    )
    li = load_table(spark, SF, "lineitem")
    s = load_table(spark, SF, "supplier")
    n = load_table(spark, SF, "nation")
    truth = {
        r["n_name"]: (r["parts"], r["items"])
        for r in (
            li.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
            .join(n, F.col("s_nationkey") == F.col("n_nationkey"))
            .groupBy("n_name")
            .agg(
                F.countDistinct("l_partkey").alias("parts"),
                F.count("*").alias("items"),
            )
            .collect()
        )
    }
    assert per_nation, "empty rollup"
    for r in per_nation:
        assert (r["parts"], r["items"]) == truth[r["n_name"]]


def test_q214_delta_terms_partition_exactly(spark):
    """The four IVM delta terms must tile the full join with NO overlap
    and NO gap at (orderkey, linenumber) grain — sharper than the
    oracle's aggregate equality."""
    from snowflake_stock_dbt_spark.plans.warehouse import IVM_CUTOFF
    from snowflake_stock_dbt_spark.sources.tables import load_table

    o = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    cut = F.lit(IVM_CUTOFF).cast("date")
    a0 = o.where(F.to_date("o_orderdate") < cut)
    da = o.where(F.to_date("o_orderdate") >= cut)
    b0 = li.where(F.to_date("l_shipdate") < cut)
    db = li.where(F.to_date("l_shipdate") >= cut)
    key = F.col("o_orderkey") == F.col("l_orderkey")
    grain = ["o_orderkey", "l_linenumber"]
    terms = [
        a0.join(b0, key).select(*grain),
        da.join(b0, key).select(*grain),
        a0.join(db, key).select(*grain),
        da.join(db, key).select(*grain),
    ]
    union = terms[0]
    for t in terms[1:]:
        union = union.unionByName(t)
    full = o.join(li, key).select(*grain)
    # MULTISET equality (the synthetic corpus does not keep the TPC-H
    # (orderkey, linenumber) uniqueness, so distinct-counting would
    # under-count): both difference directions must be empty.
    assert union.count() == full.count()
    assert union.exceptAll(full).count() == 0
    assert full.exceptAll(union).count() == 0
    assert da.count() > 0 and db.count() > 0  # the cutoff actually splits


def test_q213_benford_constants_and_digits(spark):
    """Expected-ppm constants sum to ~1e6 (floor loss < 9 ppm) and the
    digit extraction agrees with pure-Python on boundary amounts."""
    from snowflake_stock_dbt_spark.plans.ops_diag import (
        BENFORD_EXPECTED_PPM,
        q213_benford_audit,
    )

    total = sum(BENFORD_EXPECTED_PPM.values())
    assert 1_000_000 - 9 <= total <= 1_000_000
    out = q213_benford_audit(spark, SF).collect()
    digits = {r["digit"] for r in out}
    assert digits <= set(range(1, 10))
    assert sum(r["n"] for r in out) > 0
    # Every observed share is ppm of the same total: sums to <= 1e6.
    assert sum(r["observed_ppm"] for r in out) <= 1_000_000


def test_q210_acf_python_replay(spark):
    """ACF replayed with exact Fractions over the same integer-cents
    series equals the engine output after the shared 9-dp rounding."""
    from fractions import Fraction

    from snowflake_stock_dbt_spark.plans.scale import q210_autocorrelation
    from snowflake_stock_dbt_spark.sources.tables import load_table

    o = load_table(spark, SF, "orders")
    daily = (
        o.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(38,6)")) * 100)
            .cast("decimal(38,0)")
            .cast("long")
            .alias("x")
        )
        .orderBy("day")
        .collect()
    )
    xs = [r["x"] for r in daily]
    n = len(xs)
    mean = Fraction(sum(xs), n)
    den = sum((Fraction(x) - mean) ** 2 for x in xs)
    got = {r["lag"]: r["acf"] for r in q210_autocorrelation(spark, SF).collect()}
    for k in range(1, 8):
        num = sum(
            (Fraction(xs[t]) - mean) * (Fraction(xs[t + k]) - mean)
            for t in range(n - k)
        )
        expect = float(num / den)
        # Engines assemble from exact sums in double; replay is exact
        # rational -> float. Agreement to ~1e-9 on a |r|<=1 quantity.
        assert abs(got[k] - expect) < 2e-9, (k, got[k], expect)
