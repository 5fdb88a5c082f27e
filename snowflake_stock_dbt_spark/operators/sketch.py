"""Count-min sketch: sublinear frequency estimation for heavy-hitter
queries at 100 TB.

A CMS is a depth×width counter grid; each key increments one bucket per
hash row, and a key's estimate is the MIN over its buckets — always an
overestimate, with error ≤ 2N/width at ~86% per row (Cormode & Muthu-
krishnan, J. Algorithms 2005). The sketch is the scale path where exact
per-key counts (a full keyed shuffle whose state is the key cardinality)
stop fitting: the sketch state is ``depth × width`` counters regardless
of cardinality, it is map-side combinable, and two sketches merge by
cell-wise addition (stream/batch unions for free).

Everything is deterministic (fixed md5-derived hash family — the same
:func:`..functions.text.hash60` the MinHash family uses), so the whole
sketch, not just an accuracy claim, is cross-engine checkable (q95).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hash60

CMS_DEPTH = 4
CMS_WIDTH = 1024


def _bucket(key, j: int, width: int):
    return hash60(F.concat(F.lit(f"{j}:"), key)) % width


def cms_sketch(
    df: DataFrame,
    key,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch: (j, bucket, c) rows, ≤ depth×width of them.

    One explode (depth rows per input row) feeding a map-side-combinable
    keyed count — the shuffle carries at most depth×width partial cells
    per task, independent of input size or key cardinality.
    """
    key = F.col(key) if isinstance(key, str) else key
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(key, j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell")
    )
    return cells.groupBy("cell.j", "cell.bucket").agg(
        F.count("*").alias("c")
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point-estimate each key in ``keys``: min over its depth buckets.

    The sketch is tiny (≤ depth×width rows) and broadcasts; per hash row
    one broadcast equi-join probes the key's bucket, and a keyed MIN
    folds the rows — no shuffle of the (potentially huge) key list.

    The join is a LEFT join with missing cells coalesced to 0: a probed
    key whose bucket holds no sketch row means zero increments landed
    there, and the true CMS estimate for that key is the MIN including
    that 0 — an inner join would silently drop the empty bucket from the
    MIN (inflating absent keys) or drop the key entirely when all its
    buckets are empty, where the correct answer is 0.
    """
    probes = keys.select(
        key_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        _bucket(F.col(key_col), j, width).alias("bucket"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("cell"),
    ).select(key_col, "cell.j", "cell.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("c", F.lit(0))).alias("cms_n"))
    )


def cms_bucket_sql(expr: str, j: int, width: int = CMS_WIDTH) -> str:
    """DuckDB twin of the bucket assignment."""
    return (
        f"CAST(('0x' || substr(md5('{j}:' || {expr}), 1, 15)) AS BIGINT)"
        f" % {width}"
    )
