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


MULTIMODAL_QUERIES = {
    "q38_media_decode": q38_media_decode,
    "q81_audio_features": q81_audio_features,
    "q39_media_stats": q39_media_stats,
    "q52_media_resize": q52_media_resize,
    "q53_frame_sample": q53_frame_sample,
}

MULTIMODAL_ORACLES = {
    # q81_audio_features: deliberately absent — rows-only check (binary DSP).
    "q38_media_decode": Q38_SQL,
    "q39_media_stats": Q39_SQL,
    "q52_media_resize": Q52_SQL,
    "q53_frame_sample": Q53_SQL,
}
