"""[EXT] Similarity search over an embedding column (array<float>).

Not in the reference (SURVEY.md flags similarity search as a north-star
extension). Three operators:

- :func:`cosine_topk_exact` — brute-force top-k with exact-decimal dot
  products (posexplode + join on position + decimal sums). Deterministic on
  every engine; the oracle-checked baseline.
- :func:`cosine_topk_fast` — brute-force top-k on the zip_with/fold fast
  path: one broadcast of the query set, no explode, whole-stage codegen.
  The profile you actually run: at 100 TB the corpus side stays partitioned,
  queries broadcast, and the per-row cost is a tight fused loop.
- :func:`ivf_topk` — IVF-style approximate search: partition the corpus by
  an existing coarse quantizer (here the ``label`` cluster column — in a real
  pipeline, k-means centroid ids), rank centroids per query, search only the
  ``nprobe`` closest buckets. Turns the scan into a partition-pruned read at
  scale; recall measured against the exact operator in tests.

Top-k selection is a row_number window per query — at production scale with
many queries this is the standard shuffle-on-query-id pattern; each partition
holds a bounded candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_fast

_DEC = "decimal(38,18)"


def _exploded(df: DataFrame, id_col: str, vec_col: str, prefix: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias(f"{prefix}_id"),
        F.posexplode(vec_col).alias("pos", f"{prefix}_v"),
    )


def _norms_exact(df: DataFrame, id_col: str, vec_col: str, out: str) -> DataFrame:
    e = _exploded(df, id_col, vec_col, "n")
    return e.groupBy("n_id").agg(
        F.sqrt(
            F.sum((F.col("n_v").cast("double") * F.col("n_v").cast("double")).cast(_DEC))
            .cast("double")
        ).alias(out)
    )


def cosine_topk_exact(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine; deterministic everywhere.

    Output: (query_id, neighbor_id, cosine, rank), excluding self-matches.
    """
    qe = _exploded(queries, id_col, vec_col, "q")
    ce = _exploded(corpus, id_col, vec_col, "c")
    dots = (
        qe.join(ce, "pos")
        .where(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(
            F.sum(
                (F.col("q_v").cast("double") * F.col("c_v").cast("double")).cast(_DEC)
            )
            .cast("double")
            .alias("dot")
        )
    )
    qn = _norms_exact(queries, id_col, vec_col, "qn").withColumnRenamed("n_id", "q_id")
    cn = _norms_exact(corpus, id_col, vec_col, "cn").withColumnRenamed("n_id", "c_id")
    scored = (
        dots.join(qn, "q_id")
        .join(cn, "c_id")
        .select(
            F.col("q_id").alias("query_id"),
            F.col("c_id").alias("neighbor_id"),
            (F.col("dot") / F.nullif(F.col("qn") * F.col("cn"), F.lit(0.0))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )


def cosine_topk_fast(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 3,
) -> DataFrame:
    """Brute-force top-k on the fused fast path; broadcast the query set."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_fast(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_col: str = "label",
    k: int = 3,
    nprobe: int = 2,
) -> DataFrame:
    """IVF-style ANN: search only the ``nprobe`` buckets whose centroid is
    closest to the query. Centroids = per-bucket mean vectors (computed here;
    persist them in a real pipeline). Approximate: recall depends on the
    quantizer quality; see tests for the recall gate."""
    dim_probe = corpus.select(F.size(vec_col).alias("d")).first()["d"]
    cent = (
        corpus.select(F.col(bucket_col).alias("bucket"), F.posexplode(vec_col).alias("pos", "v"))
        .groupBy("bucket", "pos")
        .agg(F.avg("v").alias("cv"))
        .groupBy("bucket")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "cv"))).alias("s"))
        .select(
            "bucket",
            F.transform(F.col("s"), lambda x: x["cv"]).alias("centroid"),
        )
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probe_w = Window.partitionBy("query_id").orderBy(
        F.col("c_cos").desc_nulls_last(), F.col("bucket")
    )
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select(
            "query_id",
            "q_vec",
            "bucket",
            cosine_fast(F.col("q_vec"), F.col("centroid")).alias("c_cos"),
        )
        .withColumn("pr", F.row_number().over(probe_w))
        .where(F.col("pr") <= nprobe)
        .select("query_id", "q_vec", "bucket")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(bucket_col).alias("bucket"),
        F.col(vec_col).alias("c_vec"),
    )
    scored = (
        probes.join(c, "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_fast(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc_nulls_last(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("int"))
    )
