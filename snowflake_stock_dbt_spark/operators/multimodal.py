"""[EXT] Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct, processed in Arrow batches via ``mapInPandas`` — the
standard Spark shape for byte-level media work (decode libs run per
executor, data never round-trips through the driver).

The decode step itself is STUBBED: the container has no image/audio codecs,
so ``decode_image_batch`` ships a deterministic fake "decoder" behind the
same batch interface a real one (PIL/torchvision/ffmpeg) would use, and
``require_real_decoder`` raises NotImplementedError where production code
would plug in. The Spark-side plumbing — schema, batching, partitioning,
UDF signature — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical multimodal record schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

#: Output schema of the decode/feature stage.
FEATURE_SCHEMA = (
    "media_id long, modality string, n_bytes long, payload_sha string, "
    "feat_mean double, feat_dim int"
)


def require_real_decoder() -> None:
    """Seam for a real codec stack (PIL / torchaudio / ffmpeg)."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "plug a real decoder into decode_image_batch"
    )


def _fake_features(payload: bytes | None, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded-pixel feature vector: byte
    histogram moments. Stable across runs/engines; replace with a real
    decode when codecs exist."""
    if not payload:
        return [0.0] * dim
    return [payload[i::dim] and sum(payload[i::dim]) / len(payload[i::dim]) or 0.0
            for i in range(dim)]


def decode_media(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """mapInPandas decode/feature-extract stage over binary payloads.

    Arrow delivers each partition as pandas batches; per batch we hash the
    payload and compute the (stubbed) feature vector. One narrow pass — no
    shuffle; scales with input bytes.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            feats = [
                _fake_features(p if p is not None else b"", feature_dim)
                for p in payloads
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [len(p) if p is not None else 0 for p in payloads],
                    "payload_sha": [
                        hashlib.sha256(p if p is not None else b"").hexdigest()
                        for p in payloads
                    ],
                    "feat_mean": [sum(f) / len(f) if f else 0.0 for f in feats],
                    "feat_dim": feature_dim,
                }
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


#: Output schema of the resize stage.
RESIZE_SCHEMA = (
    "media_id long, out_w int, out_h int, n_bytes long, resized_sha string"
)

#: Output schema of the frame-sampling stage (flat-map: 1 row in, k out).
FRAME_SCHEMA = "media_id long, frame_idx int, n_bytes long, frame_sha string"


def resize_media(df: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """mapInPandas resize stage: every payload becomes an ``out_w×out_h``
    "image". The resample kernel is STUBBED as a deterministic prefix crop
    (first ``out_w*out_h`` bytes) — a real implementation decodes pixels and
    interpolates (PIL ``Image.resize``) behind the exact same batch
    interface. Narrow pass, no shuffle; output size is bounded by
    ``out_w*out_h`` per row regardless of input payload size, which is the
    property that matters for a 100 TB image corpus (the stage only ever
    shrinks the data it forwards).
    """
    import hashlib

    target = out_w * out_h

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [
                (p if p is not None else b"")[:target] for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "out_w": out_w,
                    "out_h": out_h,
                    "n_bytes": [len(r) for r in resized],
                    "resized_sha": [
                        hashlib.sha256(r).hexdigest() for r in resized
                    ],
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, frame_bytes: int = 256, every_k: int = 4
) -> DataFrame:
    """mapInPandas frame-sampling stage (video → every k-th frame).

    Payloads are treated as a sequence of fixed-size ``frame_bytes`` chunks
    (a real implementation would ffmpeg-demux; same flat-map shape). One
    input row fans out to ``ceil(len/frame_bytes)/every_k`` frame rows —
    the canonical video-corpus reduction: sample early, so downstream
    stages never see the unsampled frame stream.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            shas: list[str] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p if p is not None else b""
                n_frames = (len(p) + frame_bytes - 1) // frame_bytes
                for i in range(0, n_frames, every_k):
                    chunk = p[i * frame_bytes : (i + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(i)
                    sizes.append(len(chunk))
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.mapInPandas(batches, schema=FRAME_SCHEMA)


def media_stats(df: DataFrame) -> DataFrame:
    """Per-modality rollup of payload sizes (pure JVM aggregation)."""
    return (
        df.groupBy("modality")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(F.length("payload").cast("long")).alias("total_bytes"),
            F.max(F.length("payload")).alias("max_bytes"),
        )
        .orderBy("modality")
    )


#: Output schema of the audio feature stage (flat-map: 1 row in, one row
#: per analysis frame out).
AUDIO_FRAME_SCHEMA = (
    "media_id long, frame_idx int, rms double, zero_crossings long"
)


def audio_features(df: DataFrame, frame_samples: int = 512) -> DataFrame:
    """Per-frame RMS energy + zero-crossing counts over 16-bit PCM payloads.

    Unlike the image/video stages this one is NOT a codec stub: raw PCM
    needs no decoder, so the DSP here (numpy-vectorized inside the Arrow
    batch) is the real computation a silence-trimming / voice-activity
    pass runs over an audio corpus. Rows fan out one-per-frame; at 100 TB
    the stage is a narrow mapInPandas pass whose output is a few doubles
    per frame — the corpus reduction happens here, before any shuffle.

    Odd trailing bytes are dropped (PCM16 alignment); empty/None payloads
    produce no frames.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            rms: list[float] = []
            zc: list[int] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = p if p is not None else b""
                samples = np.frombuffer(p[: len(p) - (len(p) % 2)], dtype="<i2")
                n_frames = len(samples) // frame_samples
                if not n_frames:
                    continue
                frames = samples[: n_frames * frame_samples].reshape(
                    n_frames, frame_samples
                )
                x = frames.astype(np.float64) / 32768.0
                frame_rms = np.sqrt((x * x).mean(axis=1))
                signs = np.signbit(frames)
                crossings = (signs[:, 1:] != signs[:, :-1]).sum(axis=1)
                ids.extend([mid] * n_frames)
                idxs.extend(range(n_frames))
                rms.extend(frame_rms.tolist())
                zc.extend(int(c) for c in crossings)
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "zero_crossings": pd.Series(zc, dtype="int64"),
                }
            )

    return df.mapInPandas(batches, schema=AUDIO_FRAME_SCHEMA)


#: dHash geometry: 65 segment means -> 64 neighbor-comparison bits,
#: banded 4×16 for the pigeonhole candidate join (catches every pair
#: within Hamming distance 3: 4 bands can absorb at most 3 flipped bits
#: without one band staying identical).
PHASH_SEGMENTS = 65
PHASH_BANDS = 4
PHASH_BAND_BITS = 16


def phash_bands(media: DataFrame, min_bytes: int = PHASH_SEGMENTS) -> DataFrame:
    """Perceptual-hash bands per media row (dHash family, Arrow-batched).

    A real image pHash resizes decoded pixels to a fixed grid and compares
    neighboring cells; with the container's codec stub, the "decode" is the
    payload byte array itself: 65 contiguous near-equal segments (numpy
    ``array_split`` geometry), segment means compared pairwise -> 64 bits,
    packed into 4×16-bit band integers. Payloads shorter than ``min_bytes``
    are dropped (an empty segment has no mean).

    Runs in ``mapInPandas`` — the same per-executor batch seam a real
    decoder would occupy — and everything downstream (band join, Hamming
    re-rank) is native JVM columns.
    """
    import numpy as np

    n_seg, n_bands, band_bits = PHASH_SEGMENTS, PHASH_BANDS, PHASH_BAND_BITS
    schema = "media_id long, " + ", ".join(
        f"b{i} long" for i in range(n_bands)
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        shifts = np.arange(band_bits, dtype=np.int64)
        for pdf in it:
            rows: list[tuple] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                n = arr.shape[0]
                l, r = divmod(n, n_seg)
                idx = np.arange(n)
                # np.array_split geometry: first r segments take l+1 bytes.
                seg = np.where(
                    idx < r * (l + 1),
                    idx // (l + 1),
                    r + (idx - r * (l + 1)) // max(l, 1),
                )
                sums = np.bincount(seg, weights=arr, minlength=n_seg)
                counts = np.bincount(seg, minlength=n_seg)
                means = sums / counts
                bits = (means[:-1] > means[1:]).astype(np.int64)
                bands = tuple(
                    int((bits[b * band_bits : (b + 1) * band_bits] << shifts).sum())
                    for b in range(n_bands)
                )
                rows.append((int(mid), *bands))
            yield pd.DataFrame(
                rows, columns=["media_id"] + [f"b{i}" for i in range(n_bands)]
            )

    return (
        media.where(F.length("payload") >= min_bytes)
        .select("media_id", "payload")
        .mapInPandas(batches, schema)
    )


def phash_neardup_pairs(bands: DataFrame, max_dist: int = 3) -> DataFrame:
    """Near-duplicate media pairs from pHash bands.

    Candidate generation is a per-band equi self-join (the LSH pigeonhole:
    any pair within ``max_dist`` <= 3 shares at least one exact band), so
    the pair space is bounded by band-bucket sizes — never all-pairs. The
    exact Hamming distance re-ranks candidates with JVM ``bit_count``.
    """
    cols = [f"b{i}" for i in range(PHASH_BANDS)]
    a = bands.alias("a")
    b = bands.alias("b")
    parts = []
    for c in cols:
        parts.append(
            a.join(
                b,
                (F.col(f"a.{c}") == F.col(f"b.{c}"))
                & (F.col("a.media_id") < F.col("b.media_id")),
            ).select(
                F.col("a.media_id").alias("ma"),
                F.col("b.media_id").alias("mb"),
                *[F.col(f"a.{x}").alias(f"a_{x}") for x in cols],
                *[F.col(f"b.{x}").alias(f"b_{x}") for x in cols],
            )
        )
    cands = parts[0]
    for p in parts[1:]:
        cands = cands.unionByName(p)
    cands = cands.distinct()
    hamming = None
    for c in cols:
        term = F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        hamming = term if hamming is None else hamming + term
    return (
        cands.withColumn("hamming", hamming.cast("int"))
        .where(F.col("hamming") <= max_dist)
        .select("ma", "mb", "hamming")
    )
