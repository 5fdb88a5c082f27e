"""Persisted MinHash LSH band index: the dedup-side lake artifact.

q149 probes a history band index built in-session; a real crawling
pipeline builds the index ONCE per ingest and every later batch probes
the stored artifact (the dedup mirror of sinks/ann_index.py's IVF
postings — round-7 VERDICT item 6). Layout, as plain parquet so any
engine can read it:

- ``bands.parquet`` — (doc_id BIGINT, band_hash STRING) partitioned by
  ``band_id``: one directory per LSH band (the on-disk analogue of one
  hash table per band), each sorted by ``band_hash`` so parquet
  row-group min/max stats prune a probe's bucket lookups inside the
  band — the inverted-list locality a FAISS/ScaNN-style store gets from
  its bucket files.
- ``_META.json`` — n_hashes / bands / shingle k of the hash family plus
  the indexed row count: enough to refuse a mismatched or torn load
  loudly (a probe against an index built with a DIFFERENT hash family
  would silently match nothing).

Publish is staged + renamed (ann_index._publish_atomically): readers
never observe parquet-without-meta.

100 TB posture: the index is O(corpus × bands) three-column rows — one
partitioned shuffle to write; probing is |batch| signatures + one
(band_id, band_hash) equi-join against a lazy scan of the artifact.
History is NEVER re-signatured per increment.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.textdedup import LSH_BANDS, MINHASH_SEEDS
from .ann_index import _publish_atomically

#: Session-scoped save memo (path -> meta), mirroring ann_index._SAVED:
#: sweep/bench re-runs of a registered query reuse the artifact instead
#: of re-shuffling the band rows every call.
_SAVED: dict[str, dict] = {}


def band_index_path(sf_dir: str) -> str:
    """Deterministic scratch location for a corpus's band index, keyed on
    a hash of the FULL corpus path (same rationale as ivf_index_path)."""
    norm = os.path.abspath(os.path.normpath(sf_dir))
    tag = os.path.basename(norm) or "corpus"
    digest = hashlib.sha256(norm.encode()).hexdigest()[:12]
    return f"/tmp/spark_graft_band_index/{tag}-{digest}"


def save_band_index(
    spark: SparkSession,
    bands: DataFrame,
    path: str,
    meta: dict | None = None,
    k: int = 3,
    n_hashes: int = MINHASH_SEEDS,
    n_bands: int = LSH_BANDS,
) -> dict:
    """Write a (doc_id, band_id, band_hash) band frame (from
    operators.textdedup.banded_signatures) as the partitioned artifact.
    Idempotent per session; returns the written meta."""
    cached = _SAVED.get(path)
    if cached is not None:
        return cached
    tmp = f"{path}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    rows = (
        bands.select(
            F.col("band_id").cast("int"),
            F.col("doc_id").cast("long"),
            F.col("band_hash").cast("string"),
        )
        # one output partition per band, rows clustered by band_hash so
        # each band directory is a sorted inverted list
        .repartition("band_id")
        .sortWithinPartitions("band_hash")
        .persist()
    )
    n_rows = rows.count()
    (
        rows.write.mode("overwrite")
        .partitionBy("band_id")
        .parquet(f"{tmp}/bands.parquet")
    )
    rows.unpersist()
    info = {
        "n_rows": n_rows,
        "k": k,
        "n_hashes": n_hashes,
        "bands": n_bands,
        **(meta or {}),
    }
    with open(f"{tmp}/_META.json", "w") as f:
        json.dump(info, f)
    _publish_atomically(tmp, path)
    _SAVED[path] = info
    return info


def merge_band_indexes(
    spark: SparkSession,
    paths: list[str],
    out_path: str,
) -> dict:
    """Compact several band-index artifacts (e.g. one per ingest day)
    into ONE: the index-maintenance operation a continuous crawl needs so
    probe cost stays one artifact scan instead of one per day.

    Band rows are per-document independent, so the merge is a pure
    union + re-partition-by-band rewrite — no re-signaturing, no pair
    recomputation. Hash families must match across inputs (checked via
    each _META.json; a mixed-family merge would silently split buckets).
    The merged artifact is bit-identical in CONTENT to an index built in
    one shot over the union of the inputs' corpora — parity pinned by
    q330's oracle, which is exactly Q149's single-build SQL.
    """
    frames, metas = [], []
    for p in paths:
        bands, meta = load_band_index(spark, p)
        frames.append(bands)
        metas.append(meta)
    fam = {k: metas[0][k] for k in ("k", "n_hashes", "bands")}
    for m in metas[1:]:
        got = {k: m.get(k) for k in fam}
        if got != fam:
            raise ValueError(
                f"cannot merge band indexes with different hash families: "
                f"{fam} vs {got}"
            )
    merged = frames[0]
    for f in frames[1:]:
        merged = merged.unionByName(f)
    # save_band_index memoizes per path; a merge target must re-write.
    _SAVED.pop(out_path, None)
    return save_band_index(
        spark,
        merged,
        out_path,
        meta={"merged_from": len(paths)},
        k=fam["k"],
        n_hashes=fam["n_hashes"],
        n_bands=fam["bands"],
    )


def load_band_index(
    spark: SparkSession,
    path: str,
    k: int = 3,
    n_hashes: int = MINHASH_SEEDS,
    n_bands: int = LSH_BANDS,
) -> tuple[DataFrame, dict]:
    """Reload (lazy band frame, meta). Raises on a missing artifact or a
    hash-family mismatch — probing with the wrong family would silently
    return zero matches, the worst failure mode for a dedup gate."""
    meta_path = f"{path}/_META.json"
    if not os.path.exists(meta_path):
        raise FileNotFoundError(
            f"no band index artifact at {path} (expected _META.json; "
            "run save_band_index first)"
        )
    with open(meta_path) as f:
        meta = json.load(f)
    want = {"k": k, "n_hashes": n_hashes, "bands": n_bands}
    got = {key: meta.get(key) for key in want}
    if got != want:
        raise ValueError(
            f"band index at {path} was built with hash family {got}, "
            f"probe expects {want}"
        )
    bands = spark.read.parquet(f"{path}/bands.parquet").select(
        F.col("doc_id").cast("long"),
        F.col("band_id").cast("int"),
        F.col("band_hash").cast("string"),
    )
    return bands, meta
