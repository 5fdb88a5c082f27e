"""[EXT] Iterative graph operators: connected components for near-dup
group formation.

A dedup pipeline needs more than candidate pairs (MinHash-LSH, SimHash):
the pairs form a graph whose CONNECTED COMPONENTS are the duplicate
clusters, and the keep/drop decision is made per cluster (keep the min-id
doc, drop the rest). No reference analog (the reference's only dedup is a
keyed latest-wins, sql/02_load_data.sql:109-112); this derives from the
BASELINE.json north star.

Algorithm: distributed label propagation — every vertex starts labeled
with itself; each round every vertex takes the min label over itself and
its neighbors; stop when no label changes. Rounds = graph diameter, which
for near-dup clusters is tiny (clusters are dense cliques plus chains).
Each round is one join + one aggregation — both plain DataFrame ops that
shuffle on the vertex id, so a round scales like any keyed aggregation.
``localCheckpoint`` truncates the growing lineage every round (the classic
iterative-algorithm trap: without it, round N replans rounds 1..N-1).

At 100 TB: the label frame is |V| rows (one per doc in any candidate
pair), edges |E| rows; both shuffle-partition by id. For pathological
diameters use the alternating large-star/small-star variant (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) — same
primitive ops, O(log²) rounds; near-dup graphs never need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    vertices: DataFrame | None = None,
    id_col: str = "id",
    max_iter: int = 25,
) -> DataFrame:
    """(id, component) for every vertex; component = min vertex id in its
    connected component.

    ``vertices`` (optional) adds isolated vertices — rows whose id appears
    in no edge keep ``component = id``. Deterministic for any edge input.
    """
    sym = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    labels = sym.select(F.col("a").alias("id")).distinct()
    if vertices is not None:
        labels = labels.union(
            vertices.select(F.col(id_col).alias("id"))
        ).distinct()
    labels = labels.withColumn("component", F.col("id")).localCheckpoint()

    for _ in range(max_iter):
        # Labels flowing across edges: neighbor's current component.
        flowed = (
            sym.join(labels, sym.b == labels.id)
            .select(F.col("a").alias("id"), "component", F.lit(False).alias("is_old"))
        )
        # The vertex's previous label rides along tagged is_old, so the same
        # min-aggregation yields both the new label and the old one —
        # convergence detection costs a scan of the checkpointed frame, not
        # an extra |V|⋈|V| join per round.
        merged = (
            labels.select("id", "component", F.lit(True).alias("is_old"))
            .union(flowed)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                F.min(F.when(F.col("is_old"), F.col("component"))).alias(
                    "old_component"
                ),
            )
            .localCheckpoint()
        )
        changed = (
            merged.where(F.col("component") != F.col("old_component"))
            .limit(1)
            .count()
        )
        labels = merged.select("id", "component")
        if changed == 0:
            break
    sym.unpersist()
    return labels


def neardup_components(
    pairs: DataFrame,
    all_docs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "doc_a",
    pair_b: str = "doc_b",
) -> DataFrame:
    """Duplicate clusters from candidate pairs: every document labeled with
    its cluster representative (min doc_id; singletons label themselves),
    plus the cluster size — the direct input to a keep-one-per-cluster
    filter (``keep = doc_id == component``)."""
    cc = connected_components(
        pairs, src=pair_a, dst=pair_b, vertices=all_docs, id_col=id_col
    )
    sizes = cc.groupBy("component").agg(F.count("*").alias("cluster_size"))
    return (
        cc.join(sizes, "component")
        .select(
            F.col("id").alias(id_col),
            "component",
            "cluster_size",
            (F.col("id") == F.col("component")).alias("is_keeper"),
        )
    )
