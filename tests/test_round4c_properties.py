"""Independent re-proofs for the later round-4 additions (q156-q168):
water-filling invariants, Z-order locality payoff, manifest stability,
binary-quantization degeneracy, and a path-mining replay.
"""

from __future__ import annotations

from fractions import Fraction

import pytest
from pyspark.sql import functions as F


def test_mixture_allocation_invariants(spark, oracle_sf_dir):
    """Water-filling must (a) never upsample (rate <= 1), (b) drive the
    binding language to rate exactly 1, and (c) hit the target mix
    exactly in exact rational arithmetic."""
    from snowflake_stock_dbt_spark.plans.curation import (
        q156_mixture_allocation,
    )

    rows = q156_mixture_allocation(spark, oracle_sf_dir).collect()
    assert len(rows) == 5
    binding = [r for r in rows if r["is_binding"]]
    assert len(binding) >= 1
    for r in rows:
        assert r["sample_rate"] <= 1.0 + 1e-12
    for r in binding:
        assert r["sample_rate"] == pytest.approx(1.0, abs=1e-9)
    # Exact mix check: alloc ratios equal target ratios (rationally).
    lam = min(
        Fraction(r["n_tokens"] * 100, r["target_pct"]) for r in rows
    )
    total = sum(lam * Fraction(r["target_pct"], 100) for r in rows)
    for r in rows:
        expect_share = Fraction(r["target_pct"], 100)
        assert Fraction(lam * Fraction(r["target_pct"], 100), total) == (
            expect_share
        )


def test_zorder_shards_prune_for_both_dimensions(spark, oracle_sf_dir):
    """The Morton layout's payoff: a narrow predicate on EITHER
    clustering dimension must scan well under half the shards (a
    single-column sort would pass one dimension and fail the other)."""
    from snowflake_stock_dbt_spark.plans.events import (
        q161_skipping_manifest,
    )

    rows = q161_skipping_manifest(spark, oracle_sf_dir).collect()
    n = len(rows)
    user_scanned = sum(1 for r in rows if r["scan_for_user_probe"])
    value_scanned = sum(1 for r in rows if r["scan_for_value_probe"])
    assert user_scanned < n / 2, (user_scanned, n)
    assert value_scanned < n / 2, (value_scanned, n)


def test_shard_manifest_stable_under_partitioning(spark, oracle_sf_dir):
    """Membership fingerprints must not depend on physical partitioning
    — rerun with a different shuffle-partition count and compare."""
    from snowflake_stock_dbt_spark.plans.curation import q162_shard_manifest

    base = {
        r["shard"]: (r["n_docs"], r["n_tokens"], r["member_fp"])
        for r in q162_shard_manifest(spark, oracle_sf_dir).collect()
    }
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = {
            r["shard"]: (r["n_docs"], r["n_tokens"], r["member_fp"])
            for r in q162_shard_manifest(spark, oracle_sf_dir).collect()
        }
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert base == again


def test_binary_quant_full_candidates_equals_integer_exact(
    spark, oracle_sf_dir
):
    """With the candidate cut widened to the corpus size, Hamming
    pruning is vacuous and the result must equal exact top-k under the
    same integer-grid cosine (the q26 full-probe degeneracy argument)."""
    import snowflake_stock_dbt_spark.plans.vectors as V

    emb_n = 500
    old = V.BQ_CANDIDATES
    try:
        V.BQ_CANDIDATES = emb_n
        wide = {
            (r["query_id"], r["neighbor_id"])
            for r in V.q166_binary_quant_search(
                spark, oracle_sf_dir
            ).collect()
        }
    finally:
        V.BQ_CANDIDATES = old
    # Exact reference on the same integer grid: brute-force quantized
    # cosine top-k via the knn-graph scoring identities.
    from snowflake_stock_dbt_spark.sources.tables import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") < V.N_QUERY_VECS).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
    )
    sc = float(V._KMEANS_SCALE)
    qz = lambda c: F.transform(
        c, lambda x: F.floor(x.cast("double") * F.lit(sc))
    )
    dot = F.aggregate(
        F.zip_with(qz(F.col("qe")), qz(F.col("embedding")), lambda a, b: a * b),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.aggregate(
        F.transform(qz(c), lambda x: x * x),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    scored = (
        emb.crossJoin(F.broadcast(q))
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                dot.cast("double")
                / (
                    F.sqrt(nrm(F.col("qe")).cast("double"))
                    * F.sqrt(nrm(F.col("embedding")).cast("double"))
                )
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id")
    )
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= V.TOP_K)
        .collect()
    }
    assert wide == exact


def test_session_paths_match_python_replay(spark, oracle_sf_dir):
    """Path counts must equal a straight-line Python replay of the
    q27 session contract on the same events."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.events import (
        PATH_TOP_N,
        SESSION_GAP_S,
        q165_session_paths,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, event_id, event_type, "
        f"epoch_us(CAST(ts AS TIMESTAMP)) AS us "
        f"FROM '{oracle_sf_dir}/events.parquet' ORDER BY user_id, us, event_id"
    ).fetchall()
    from collections import Counter, defaultdict

    per_user = defaultdict(list)
    for uid, eid, et, us in rows:
        per_user[uid].append((us, eid, et))
    counts: Counter = Counter()
    for uid, evs in per_user.items():
        sessions, prev = [], None
        for us, eid, et in evs:
            if prev is None or us - prev > SESSION_GAP_S * 1_000_000:
                sessions.append([])
            sessions[-1].append(et)
            prev = us
        for sess in sessions:
            for i in range(len(sess) - 2):
                counts[">".join(sess[i : i + 3])] += 1
    expect = dict(
        sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP_N]
    )
    got = {
        r["path"]: r["n"] for r in q165_session_paths(spark, oracle_sf_dir).collect()
    }
    assert got == expect
