"""Tests for the connected-components / near-dup-grouping operator."""

from __future__ import annotations

from snowflake_stock_dbt_spark.operators.graph import (
    connected_components,
    neardup_components,
)


def _cc_dict(df):
    return {r["id"]: r["component"] for r in df.collect()}


def test_two_components_and_chain(spark):
    # 1-2-3 chained (diameter > 1 forces multiple propagation rounds),
    # 10-11 separate.
    edges = spark.createDataFrame(
        [(2, 1), (3, 2), (10, 11)], "src long, dst long"
    )
    got = _cc_dict(connected_components(edges))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_path_converges(spark):
    # path 0-1-2-...-9: worst-case diameter for label propagation.
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "src long, dst long"
    )
    got = _cc_dict(connected_components(edges))
    assert got == {i: 0 for i in range(10)}


def test_isolated_vertices_keep_own_label(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,), (7,)], "id long")
    got = _cc_dict(connected_components(edges, vertices=verts))
    assert got == {1: 1, 2: 1, 7: 7}


def test_two_phase_equals_label_prop_on_mixed_graph(spark):
    """Kiveris large-star/small-star must produce the identical labeling
    (min id per component) as label propagation — cliques, chains,
    isolated vertices, duplicate/reversed edges all at once."""
    raw = (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]  # clique 0-4
        + [(10 + i, 11 + i) for i in range(6)]  # chain 10..16
        + [(30, 31), (31, 30), (30, 31)]  # dupes + reversal
    )
    edges = spark.createDataFrame(raw, "src long, dst long")
    verts = spark.createDataFrame([(i,) for i in range(40)], "id long")
    a = _cc_dict(connected_components(edges, vertices=verts))
    b = _cc_dict(
        connected_components(edges, vertices=verts, algorithm="two-phase")
    )
    assert a == b
    assert b[4] == 0 and b[16] == 10 and b[31] == 30 and b[25] == 25


def test_two_phase_equals_label_prop_on_neardup_pairs(spark, oracle_sf_dir):
    """On the engine's real candidate-pair graph (the q54 MinHash-LSH
    pairs), both algorithms must agree exactly."""
    from snowflake_stock_dbt_spark.operators.textdedup import minhash_lsh_pairs
    from snowflake_stock_dbt_spark.sources.tables import load_table

    docs = load_table(spark, oracle_sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, "doc_id", "text")
    a = _cc_dict(
        connected_components(pairs, src="doc_a", dst="doc_b", vertices=docs,
                             id_col="doc_id")
    )
    b = _cc_dict(
        connected_components(pairs, src="doc_a", dst="doc_b", vertices=docs,
                             id_col="doc_id", algorithm="two-phase")
    )
    assert a == b


def test_k_core_known_graphs(spark):
    """k-core on known structures: a 4-clique survives k=3 with the
    pendant node peeled (and the CASCADE checked: peeling the pendant
    must not drag clique members below k); a chain has no 2-core; a
    cycle IS its own 2-core."""
    from snowflake_stock_dbt_spark.operators.graph import k_core

    clique_plus = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)],
        "src long, dst long",
    )
    stats: dict = {}
    got = {
        r["node_id"]: r["core_degree"]
        for r in k_core(clique_plus, k=3, _stats=stats).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert stats["rounds"] == 1
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    assert k_core(chain, k=2).count() == 0  # peels from both ends
    cycle = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)], "src long, dst long"
    )
    got_cycle = {
        r["node_id"]: r["core_degree"] for r in k_core(cycle, k=2).collect()
    }
    assert got_cycle == {i: 2 for i in range(6)}


def test_two_phase_bounded_rounds_on_long_chain(spark):
    """The pathological-diameter claim, measured: a 256-node path has
    diameter 255 — label propagation needs ~n rounds (it raises no error
    but would need max_iter≈255), while two-phase must converge in
    O(log² n) — a dozen-ish rounds. The round count is asserted, making
    graph.py's Kiveris citation a tested property instead of a docstring
    promise (round-3 VERDICT item 5; PLANS.md round-4 journal)."""
    n = 256
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    stats: dict = {}
    got = _cc_dict(
        connected_components(
            edges, algorithm="two-phase", max_iter=30, _stats=stats
        )
    )
    assert got == {i: 0 for i in range(n)}
    assert stats["rounds"] <= 12, stats  # log2(256)^2/something — far below 255


def test_neardup_components_keeper_contract(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    rows = {r["doc_id"]: r for r in neardup_components(pairs, docs).collect()}
    assert rows[1]["component"] == 1 and rows[1]["cluster_size"] == 3
    assert rows[3]["component"] == 1 and not rows[3]["is_keeper"]
    assert rows[5]["component"] == 5 and rows[5]["cluster_size"] == 2
    assert rows[4]["cluster_size"] == 1 and rows[4]["is_keeper"]
    # exactly one keeper per cluster
    keepers = [r for r in rows.values() if r["is_keeper"]]
    assert sorted(r["component"] for r in keepers) == [1, 4, 5, 7]


# --- triangle counting -----------------------------------------------------


def test_triangle_counts_known_graphs(spark):
    from snowflake_stock_dbt_spark.operators.graph import triangle_counts

    # K4: every node sits in C(3,2)=3 triangles.
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    got = {
        r["node_id"]: r["n_triangles"]
        for r in triangle_counts(
            spark.createDataFrame(k4, "src bigint, dst bigint")
        ).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}

    # Path graph has no triangles.
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src bigint, dst bigint")
    assert triangle_counts(path).count() == 0

    # Duplicate / reversed / self-loop edges are normalized away.
    messy = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (1, 2)],
        "src bigint, dst bigint",
    )
    got2 = {
        r["node_id"]: r["n_triangles"] for r in triangle_counts(messy).collect()
    }
    assert got2 == {1: 1, 2: 1, 3: 1}


def test_triangle_counts_star_graph_no_quadratic_wedges(spark):
    """Celebrity star: hub connected to 50 leaves, no triangles; the
    degree orientation points every edge INTO the hub, so the hub's
    out-degree is 0 and the wedge join emits nothing."""
    from snowflake_stock_dbt_spark.operators.graph import triangle_counts

    star = spark.createDataFrame(
        [(0, i) for i in range(1, 51)], "src bigint, dst bigint"
    )
    assert triangle_counts(star).count() == 0


def test_bfs_hops_path_graph(spark):
    """Directed path 1->2->3->4->5 seeded at 1, cap 3: hops are exact
    path distances, node 5 (distance 4) is excluded by the cap, and the
    seed itself is hop 0."""
    from snowflake_stock_dbt_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src bigint, dst bigint"
    )
    seeds = spark.createDataFrame([(1,)], "id bigint")
    got = {r["id"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3}


def test_bfs_hops_multi_source_min_and_unreachable(spark):
    """Two seeds: each vertex is stamped at the MINIMUM distance over
    all seeds; a disconnected vertex never appears; a vertex reachable
    by both a short and a long path gets the short one (first-reach
    invariant, not path enumeration)."""
    from snowflake_stock_dbt_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        # Component A: 1->2->3, plus shortcut 9->3; component B: 7->8.
        [(1, 2), (2, 3), (9, 3), (7, 8)],
        "src bigint, dst bigint",
    )
    seeds = spark.createDataFrame([(1,), (9,)], "id bigint")
    got = {r["id"]: r["hop"] for r in bfs_hops(edges, seeds, max_hops=3).collect()}
    # 3 is distance 2 via 1->2->3 but distance 1 via 9->3: min wins.
    assert got == {1: 0, 9: 0, 2: 1, 3: 1}
