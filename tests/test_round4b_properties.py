"""Independent re-proofs for the round-4 statistical/vector additions
(q151-q155): each operator's oracle pins ONE corpus; these tests verify
the underlying math against a second, independent implementation
(brute force, numpy, or exact rational replay).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_knn_graph_full_probe_equals_brute_force(spark, oracle_sf_dir):
    """With nprobe = #buckets the IVF blocking is vacuous: every node's
    neighbor set must equal brute-force cosine top-k (the q26 full-probe
    degeneracy argument applied to the graph)."""
    from snowflake_stock_dbt_spark.operators.similarity import (
        cosine_topk_exact,
        kmeans_assign,
        knn_graph,
    )
    from snowflake_stock_dbt_spark.sources.tables import load_table

    emb = load_table(spark, oracle_sf_dir, "embeddings").where(
        F.col("vec_id") < 80
    )
    bucketed, cent = kmeans_assign(emb, k=4, iters=2, return_centroids=True)
    n_buckets = bucketed.select("bucket").distinct().count()
    graph = {
        (r["src_id"], r["dst_id"])
        for r in knn_graph(
            bucketed, cent, bucket_col="bucket", k=3, nprobe=n_buckets
        ).collect()
    }
    brute = {
        (r["query_id"], r["neighbor_id"])
        for r in cosine_topk_exact(emb, emb, k=3).collect()
    }
    assert graph == brute


def test_dsir_selection_prefers_target_like_documents(spark):
    """A raw-pool document that shares the target slice's phrases must
    outrank raw-pool documents with off-distribution text — the defining
    property of importance-weighted selection."""
    from snowflake_stock_dbt_spark.plans.curation import (
        DSIR_TARGET_LANG,
        q152_dsir_selection,
    )
    import snowflake_stock_dbt_spark.plans.curation as cur

    rows = []
    # Target slice: repeats a marker phrase.
    for i in range(10):
        rows.append((i, "alpha beta gamma alpha beta gamma", DSIR_TARGET_LANG, "s", 30))
    # Raw doc 100 mimics the target phrases; 101-110 are off-distribution.
    rows.append((100, "alpha beta gamma alpha beta", "de", "s", 25))
    for i in range(101, 111):
        rows.append((i, f"zz{i} qq{i} ww{i} ee{i} rr{i} tt{i}", "de", "s", 30))
    df = spark.createDataFrame(
        rows, "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG"
    )

    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r["imp_score"]
            for r in q152_dsir_selection(spark, d).collect()
        }
    assert 100 in out
    for off in range(101, 111):
        assert out[100] > out[off]


def test_mad_outliers_match_numpy_brute_force(spark, oracle_sf_dir):
    """The flagged set must equal a numpy replay (numpy's default linear
    percentile interpolation is the same formula q45 pins)."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.scale import q153_mad_outliers

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT event_id, event_type, value FROM "
        f"'{oracle_sf_dir}/events.parquet' WHERE value IS NOT NULL"
    ).fetchall()
    by_type: dict[str, list] = {}
    for eid, et, v in rows:
        by_type.setdefault(et, []).append((eid, v))
    expect = set()
    for et, items in by_type.items():
        vals = np.array([v for _, v in items])
        med = np.percentile(vals, 50)
        mad = np.percentile(np.abs(vals - med), 50)
        if mad == 0:
            continue
        rz = 0.6745 * (vals - med) / mad
        for (eid, _), z in zip(items, rz):
            if abs(z) > 3.5:
                expect.add(eid)
    got = {
        r["event_id"] for r in q153_mad_outliers(spark, oracle_sf_dir).collect()
    }
    assert got == expect


def test_ewma_exact_rational_replay(spark, oracle_sf_dir):
    """Replay the EWMA in exact rational arithmetic (Fraction) from the
    daily series; the operator's doubles must equal the rationals'
    nearest-double exactly (the one-division contract)."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.warehouse import (
        _EWMA_HORIZON,
        q154_ewma_revenue,
    )

    con = duckdb.connect()
    base = con.sql(
        f"SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d, "
        f"SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS rev "
        f"FROM '{oracle_sf_dir}/lineitem.parquet' GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, dict] = {}
    for flag, d, rev in base:
        series.setdefault(flag, {})[d] = Fraction(rev)
    got = {
        (r["l_returnflag"], r["day"]): r["ewma_revenue"]
        for r in q154_ewma_revenue(spark, oracle_sf_dir).collect()
    }
    import datetime

    checked = 0
    for (flag, day), ewma in got.items():
        num = Fraction(0)
        den = 0
        for gap in range(_EWMA_HORIZON):
            d = day - datetime.timedelta(days=gap)
            if d in series[flag]:
                w = 1 << (_EWMA_HORIZON - 1 - gap)
                num += series[flag][d] * w
                den += w
        # The operator casts the exact decimal num to double (round-to-
        # nearest) and divides by the exact int den — replay both steps.
        assert ewma == float(num) / float(den), (flag, day)
        checked += 1
    assert checked == len(got) and checked > 0


def test_regression_betas_agree_with_numpy_lstsq(spark, oracle_sf_dir):
    """Cramer-solved betas must agree with numpy's QR-based lstsq to
    numerical tolerance — an independent algorithm on the same moments."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.scale import q155_linear_regression

    con = duckdb.connect()
    pts = con.sql(
        f"SELECT CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE), "
        f"CAST(l_extendedprice AS DOUBLE) "
        f"FROM '{oracle_sf_dir}/lineitem.parquet'"
    ).fetchall()
    a = np.array([[1.0, x1, x2] for x1, x2, _ in pts])
    y = np.array([yy for _, _, yy in pts])
    beta_np, *_ = np.linalg.lstsq(a, y, rcond=None)
    row = q155_linear_regression(spark, oracle_sf_dir).collect()[0]
    got = np.array([row["beta0"], row["beta1"], row["beta2"]])
    scale = np.maximum(np.abs(beta_np), 1.0)
    assert np.all(np.abs(got - beta_np) / scale < 1e-6), (got, beta_np)
    assert row["n_rows"] == len(pts)
