"""[EXT] Multimodal-column queries over the ``documents`` corpus.

The container ships no media files and no codecs, so the corpus is
manufactured deterministically: each document's UTF-8 bytes become the
opaque ``payload`` of a media row (the engine treats payloads as opaque
bytes either way — SURVEY.md's multimodal mandate is about the Spark-side
plumbing: binary columns, typed metadata, Arrow-batched decode). The
decode/feature stage runs the real ``mapInPandas`` path
(operators/multimodal.py); only the codec inside is a stub.

Oracle bridge: Spark's ``cast(text AS BINARY)`` and DuckDB's
``encode(text)`` both yield the UTF-8 bytes, and DuckDB ``sha256(text)``
hashes those same bytes — so payload length and digest are checkable
cross-engine even though the decode runs in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import (
    audio_features,
    decode_media,
    media_stats,
    resize_media,
    sample_frames,
)
from ..sources.tables import load_table

_MODALITY = "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
_MIME = (
    "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png' "
    "WHEN 1 THEN 'audio/wav' ELSE 'video/mp4' END"
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media corpus: documents re-typed to the MEDIA_SCHEMA
    shape (payload = UTF-8 bytes of the text, modality round-robin)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.expr(_MODALITY).alias("modality"),
        F.col("text").cast("binary").alias("payload"),
        F.expr(_MIME).alias("mime_type"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def q38_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched decode/feature pass; the oracle checks the engine-
    independent outputs (byte length + sha256), the stubbed feature vector
    is gated by tests/test_multimodal_quality.py."""
    media = documents_as_media(spark, sf_dir)
    return decode_media(media).select(
        "media_id", "modality", "n_bytes", "payload_sha"
    )


Q38_SQL = f"""
SELECT doc_id AS media_id,
       {_MODALITY} AS modality,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       sha256(text) AS payload_sha
FROM documents
"""


def q39_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality payload rollup — pure JVM aggregation over binary
    lengths (no Python in the plan)."""
    return media_stats(documents_as_media(spark, sf_dir))


Q39_SQL = f"""
SELECT {_MODALITY} AS modality,
       COUNT(*) AS n_items,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MAX(octet_length(encode(text))) AS max_bytes
FROM documents
GROUP BY 1
"""


RESIZE_W = RESIZE_H = 64
FRAME_BYTES = 256
FRAME_EVERY_K = 4


def q52_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched resize over the image rows. The stub kernel is a
    prefix crop, so the oracle can replay it byte-for-byte with substr —
    the corpus is ASCII, where DuckDB's char-substr equals a byte-substr."""
    media = documents_as_media(spark, sf_dir).where(F.col("modality") == "image")
    return resize_media(media, RESIZE_W, RESIZE_H)


Q52_SQL = f"""
SELECT doc_id AS media_id,
       CAST({RESIZE_W} AS INT) AS out_w,
       CAST({RESIZE_H} AS INT) AS out_h,
       CAST(octet_length(encode(substr(text, 1, {RESIZE_W * RESIZE_H}))) AS BIGINT)
           AS n_bytes,
       sha256(substr(text, 1, {RESIZE_W * RESIZE_H})) AS resized_sha
FROM documents
WHERE {_MODALITY} = 'image'
"""


def q53_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-map frame sampling over the video rows: every {k}-th
    {frame_bytes}-byte chunk. One input row fans out to many frame rows —
    the mapInPandas generator shape a real demuxer would use."""
    media = documents_as_media(spark, sf_dir).where(F.col("modality") == "video")
    return sample_frames(media, FRAME_BYTES, FRAME_EVERY_K)


Q53_SQL = f"""
SELECT doc_id AS media_id,
       CAST(i AS INT) AS frame_idx,
       CAST(octet_length(encode(substr(text, 1 + i * {FRAME_BYTES}, {FRAME_BYTES})))
            AS BIGINT) AS n_bytes,
       sha256(substr(text, 1 + i * {FRAME_BYTES}, {FRAME_BYTES})) AS frame_sha
FROM documents,
     LATERAL UNNEST(range(0,
         CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT))) AS u(i)
WHERE {_MODALITY} = 'video' AND i % {FRAME_EVERY_K} = 0
"""


# ---------------------------------------------------------------------------
# Q81 — Audio frame features over the audio rows: per-frame RMS energy and
# zero-crossing counts from int16 PCM interpretation of the payload — the
# silence-trim / voice-activity primitive, and the one multimodal stage
# whose DSP is REAL (raw PCM needs no codec). Byte-level int16 extraction
# is not reasonably SQL-expressible, so this query is registered WITHOUT an
# oracle (the driver records the rows-only check); the numeric contract is
# pinned by tests/test_multimodal_quality.py on synthetic PCM with known
# RMS and crossing counts.
# ---------------------------------------------------------------------------

AUDIO_FRAME_SAMPLES = 64


def q81_audio_features(spark, sf_dir):
    media = documents_as_media(spark, sf_dir).where(F.col("modality") == "audio")
    return audio_features(media, frame_samples=AUDIO_FRAME_SAMPLES).orderBy(
        "media_id", "frame_idx"
    )


# ---------------------------------------------------------------------------
# Q94 — Perceptual-hash near-dup pairs over the image corpus (dHash
# family): Arrow-batched hash extraction (the real-decoder seam), banded
# 4×16 pigeonhole candidate join, exact Hamming re-rank in JVM bit_count.
# The deterministic byte-"decode" means the whole pipeline — segment
# means, bits, bands, pairs — replays in SQL, so this sketch path gets a
# FULL value oracle (the corpus is ASCII: ord(char) == byte).
#
# The synthetic corpus has no near-identical byte payloads, so the query
# plants deterministic near-dups from the same input: every 30th doc gets
# a same-length twin with its first byte overwritten (id + 1e7) — only
# segment 0's mean moves, so twin distance ≤ 1 bit and the pair machinery
# has real work to find. The oracle replays the same construction.
#
# Scale shape: per-band equi-join on the band value (the q22/q24 LSH
# shape); candidates are bounded by band-bucket sizes, never all-pairs;
# the Python seam touches each image once, before any shuffle.
# ---------------------------------------------------------------------------

PHASH_MAX_DIST = 3
_PHASH_TWIN_OFFSET = 10_000_000


def q94_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import phash_bands, phash_neardup_pairs

    docs = load_table(spark, sf_dir, "documents")
    imgs = docs.where(F.expr(_MODALITY) == "image").select(
        F.col("doc_id").alias("media_id"), "doc_id", "text"
    )
    twins = imgs.where(F.col("doc_id") % 30 == 0).select(
        (F.col("media_id") + _PHASH_TWIN_OFFSET).alias("media_id"),
        "doc_id",
        F.concat(F.lit("z"), F.expr("substr(text, 2)")).alias("text"),
    )
    media = (
        imgs.unionByName(twins)
        .select("media_id", F.col("text").cast("binary").alias("payload"))
    )
    return phash_neardup_pairs(
        phash_bands(media), max_dist=PHASH_MAX_DIST
    ).orderBy("ma", "mb")


_PHASH_SEG_SQL = f"""
base AS (
    SELECT doc_id, doc_id AS media_id, text
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
),
corpus AS (
    SELECT media_id, text FROM base
    UNION ALL
    SELECT media_id + {_PHASH_TWIN_OFFSET} AS media_id,
           'z' || substr(text, 2) AS text
    FROM base WHERE doc_id % 30 = 0
),
imgs AS (
    SELECT media_id, text, length(text) AS n
    FROM corpus WHERE length(text) >= 65
),
pos AS (
    SELECT media_id, text, n,
           unnest(generate_series(0, n - 1)) AS p
    FROM imgs
),
segmented AS (
    SELECT media_id,
           CASE WHEN p < (n % 65) * (n // 65 + 1)
                THEN p // (n // 65 + 1)
                ELSE (n % 65) + (p - (n % 65) * (n // 65 + 1)) // (n // 65)
           END AS s,
           ord(substr(text, CAST(p + 1 AS INT), 1)) AS v
    FROM pos
),
means AS (
    SELECT media_id, s, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS m
    FROM segmented GROUP BY media_id, s
),
bits AS (
    SELECT a.media_id, CAST(a.s AS BIGINT) AS i,
           CASE WHEN a.m > b.m THEN 1 ELSE 0 END AS bit
    FROM means a JOIN means b ON a.media_id = b.media_id AND b.s = a.s + 1
    WHERE a.s < 64
),
bands AS (
    SELECT media_id, i // 16 AS band,
           CAST(SUM(bit * (CAST(1 AS BIGINT) << CAST(i % 16 AS INT)))
                AS BIGINT) AS bv
    FROM bits GROUP BY media_id, band
),
wide AS (
    SELECT media_id,
           MAX(CASE WHEN band = 0 THEN bv END) AS b0,
           MAX(CASE WHEN band = 1 THEN bv END) AS b1,
           MAX(CASE WHEN band = 2 THEN bv END) AS b2,
           MAX(CASE WHEN band = 3 THEN bv END) AS b3
    FROM bands GROUP BY media_id
)"""

Q94_SQL = f"""
WITH {_PHASH_SEG_SQL}
SELECT a.media_id AS ma, b.media_id AS mb,
       CAST(bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
          + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
            AS INT) AS hamming
FROM wide a JOIN wide b
  ON a.media_id < b.media_id
 AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
    + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3)) <= {PHASH_MAX_DIST}
ORDER BY ma, mb
"""


MULTIMODAL_QUERIES = {
    "q38_media_decode": q38_media_decode,
    "q81_audio_features": q81_audio_features,
    "q39_media_stats": q39_media_stats,
    "q52_media_resize": q52_media_resize,
    "q53_frame_sample": q53_frame_sample,
    "q94_phash_neardup": q94_phash_neardup,
}

MULTIMODAL_ORACLES = {
    # q81_audio_features: deliberately absent — rows-only check (binary DSP).
    "q38_media_decode": Q38_SQL,
    "q39_media_stats": Q39_SQL,
    "q52_media_resize": Q52_SQL,
    "q53_frame_sample": Q53_SQL,
    "q94_phash_neardup": Q94_SQL,
}
