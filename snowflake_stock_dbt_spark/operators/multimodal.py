"""[EXT] Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct, processed in Arrow batches via ``mapInPandas`` — the
standard Spark shape for byte-level media work (decode libs run per
executor, data never round-trips through the driver).

The decode kernels are REAL for codec-free formats (pure struct+numpy
parsers in functions/codecs.py): uncompressed 24-bit BMP (bottom-up rows,
stride padding), RIFF/WAVE PCM16 (chunk-walking parse), and RVID (a raw
uncompressed frame container). Compressed formats (PNG/JPEG/MP4) need an
external codec stack the environment doesn't ship, so they route to
``require_real_decoder`` — an explicit NotImplementedError seam, never a
silent fake.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.codecs import (
    bmp_file_size,
    decode_bmp,
    decode_rvid,
    decode_wav,
    encode_bmp,
    sniff_format,
)

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

#: Output schema of the decode/feature stage. ``content_*`` columns are
#: computed over the DECODED content bytes (pixels / PCM samples / raw
#: frames), not the encoded file — the real-decode contract.
FEATURE_SCHEMA = (
    "media_id long, modality string, fmt string, width int, height int, "
    "n_frames int, content_bytes long, content_mean double, "
    "content_sha string"
)


def require_real_decoder(fmt_hint: str = "unknown") -> None:
    """Seam for a real codec stack (PIL / torchaudio / ffmpeg): compressed
    formats (PNG/JPEG/MP4/…) cannot be decoded without external codecs, so
    they fail loudly here instead of producing fake numbers. Codec-free
    formats (BMP/WAV/RVID) never reach this — functions/codecs.py decodes
    them for real."""
    raise NotImplementedError(
        f"no codec available for compressed media format {fmt_hint!r}; "
        "plug a real decoder (PIL/ffmpeg) into decode_media"
    )


def _decode_content(payload: bytes | None):
    """Decode one payload to (fmt, width, height, n_frames, content bytes).

    content is the decoded byte stream: row-major top-down BGR pixels for
    BMP (padding stripped, rows re-flipped), little-endian PCM16 bytes for
    WAV, concatenated raw frames for RVID. Unknown non-empty formats are
    compressed media by contract -> require_real_decoder.
    """
    if not payload:
        return ("none", None, None, None, b"")
    payload = bytes(payload)
    fmt = sniff_format(payload)
    if fmt == "bmp":
        px = decode_bmp(payload)
        h, w, _ = px.shape
        return (fmt, w, h, None, px.tobytes())
    if fmt == "wav":
        samples, _rate = decode_wav(payload)
        return (fmt, None, None, None, samples.tobytes())
    if fmt == "rvid":
        frames = decode_rvid(payload)
        n, h, w, _ = frames.shape
        return (fmt, w, h, n, frames.tobytes())
    require_real_decoder(payload[:8].hex())


def decode_media(df: DataFrame) -> DataFrame:
    """mapInPandas decode/feature-extract stage over binary payloads.

    Arrow delivers each partition as pandas batches; per row the payload is
    format-sniffed and REALLY decoded (functions/codecs.py), and the
    features — content byte count, mean content byte value, sha256 of the
    decoded content — are computed from the decoded bytes, not the encoded
    file. One narrow pass — no shuffle; scales with input bytes.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, mod, p in zip(
                pdf["media_id"], pdf["modality"], pdf["payload"]
            ):
                fmt, w, h, n_frames, content = _decode_content(p)
                arr = np.frombuffer(content, dtype=np.uint8)
                mean = (
                    float(int(arr.sum(dtype=np.int64))) / arr.size
                    if arr.size
                    else None
                )
                rows.append(
                    (
                        int(mid),
                        mod,
                        fmt,
                        w,
                        h,
                        n_frames,
                        len(content),
                        mean,
                        hashlib.sha256(content).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id",
                    "modality",
                    "fmt",
                    "width",
                    "height",
                    "n_frames",
                    "content_bytes",
                    "content_mean",
                    "content_sha",
                ],
            )

    return df.mapInPandas(batches, schema=FEATURE_SCHEMA)


#: Output schema of the resize stage.
RESIZE_SCHEMA = (
    "media_id long, out_w int, out_h int, n_bytes long, resized_sha string"
)

#: Output schema of the frame-sampling stage (flat-map: 1 row in, k out).
FRAME_SCHEMA = "media_id long, frame_idx int, n_bytes long, frame_sha string"


def resize_media(df: DataFrame, out_w: int = 64, out_h: int = 64) -> DataFrame:
    """mapInPandas resize stage over BMP payloads: REAL pixel-domain
    nearest-neighbor resample — decode (un-pad, re-flip), index-map each
    output pixel to ``(y*h//out_h, x*w//out_w)``, re-encode as BMP.

    ``n_bytes`` is the re-encoded BMP file size; ``resized_sha`` hashes the
    resized PIXEL bytes (top-down row-major BGR) so the result is checkable
    without replaying the container header. Empty/degenerate payloads
    (zero-height images) produce no row — nothing to resample. Non-BMP
    payloads raise: resizing is an image-domain operation, and a compressed
    image would need :func:`require_real_decoder`'s codec stack.

    Narrow pass, no shuffle; output size is bounded by ``out_w*out_h*3``
    per row regardless of input size — the property that matters for a
    100 TB image corpus (the stage only ever shrinks what it forwards).
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            sizes: list[int] = []
            shas: list[str] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if not p:
                    continue
                fmt = sniff_format(bytes(p))
                if fmt != "bmp":
                    require_real_decoder(fmt)
                px = decode_bmp(bytes(p))
                h, w, _ = px.shape
                if h == 0 or w == 0:
                    continue
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                resized = px[ys][:, xs]
                ids.append(int(mid))
                sizes.append(len(encode_bmp(resized)))
                shas.append(hashlib.sha256(resized.tobytes()).hexdigest())
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "out_w": pd.Series([out_w] * len(ids), dtype="int32"),
                    "out_h": pd.Series([out_h] * len(ids), dtype="int32"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "resized_sha": pd.Series(shas, dtype="object"),
                }
            )

    return df.mapInPandas(batches, schema=RESIZE_SCHEMA)


def sample_frames(df: DataFrame, every_k: int = 4) -> DataFrame:
    """mapInPandas frame-sampling stage (video → every k-th frame).

    Payloads are RVID containers (functions/codecs.py): the header is
    parsed for geometry/frame count and every ``k``-th raw frame is
    extracted — the same flat-map shape an ffmpeg demux would use, with a
    real (uncompressed) demux instead of byte-chunk slicing. One input row
    fans out to ``ceil(n_frames/every_k)`` frame rows — the canonical
    video-corpus reduction: sample early, so downstream stages never see
    the unsampled frame stream. ``frame_sha`` hashes the frame's raw BGR
    pixel bytes. Empty payloads produce no frames; non-RVID payloads are
    compressed video by contract -> require_real_decoder.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sizes: list[int] = []
            shas: list[str] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if not p:
                    continue
                fmt = sniff_format(bytes(p))
                if fmt != "rvid":
                    require_real_decoder(fmt)
                frames = decode_rvid(bytes(p))
                for i in range(0, frames.shape[0], every_k):
                    chunk = frames[i].tobytes()
                    ids.append(int(mid))
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
    """Per-frame RMS energy + zero-crossing counts over PCM16 audio.

    Payloads that sniff as RIFF/WAVE are REALLY parsed (chunk walk,
    functions/codecs.py) to extract the PCM stream; bare payloads are
    treated as headerless little-endian PCM16 (odd trailing bytes dropped
    for alignment). The DSP (numpy-vectorized inside the Arrow batch) is
    the real computation a silence-trimming / voice-activity pass runs
    over an audio corpus. Rows fan out one-per-frame; at 100 TB the stage
    is a narrow mapInPandas pass whose output is a few doubles per frame —
    the corpus reduction happens here, before any shuffle.

    Empty/None payloads produce no frames.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            rms: list[float] = []
            zc: list[int] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                p = bytes(p) if p is not None else b""
                if sniff_format(p) == "wav":
                    samples, _rate = decode_wav(p)
                else:
                    samples = np.frombuffer(
                        p[: len(p) - (len(p) % 2)], dtype="<i2"
                    )
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

    Payloads that sniff as BMP are REALLY decoded first (un-padded,
    re-flipped pixel bytes feed the hash — the image-domain dHash); other
    payloads hash their raw byte stream (the byte-domain fallback for
    opaque blobs). Either way the stream is split into 65 contiguous
    near-equal segments (numpy ``array_split`` geometry), segment means
    compared pairwise -> 64 bits, packed into 4×16-bit band integers.
    Payloads shorter than ``min_bytes`` are dropped (an empty segment has
    no mean).

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
                raw = bytes(p)
                if sniff_format(raw) == "bmp":
                    arr = decode_bmp(raw).reshape(-1)
                    if arr.shape[0] < n_seg:
                        continue
                else:
                    arr = np.frombuffer(raw, dtype=np.uint8)
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


def phash_index_probe(
    batch_bands: DataFrame,
    history_index: DataFrame,
    max_dist: int = 3,
) -> DataFrame:
    """INCREMENTAL media dedup: probe a new batch's pHash bands against a
    historical corpus's PERSISTED band index (sinks/phash_index.py) — the
    media twin of textdedup.simhash_index_probe. History payloads are
    never re-decoded or re-hashed; their term enters only through the
    (media_id, b0..b3, band_id, bv) artifact rows.

    Pigeonhole exactness (max_dist <= 3 < 4 bands): any pair within
    ``max_dist`` shares at least one identical 16-bit band, so the
    (band_id, bv) equi-join finds EVERY qualifying pair and the exact
    JVM bit_count Hamming verdict on the carried signatures removes
    false candidates. A batch item that also exists in history matches
    itself at Hamming 0 — the "already indexed" signal a re-crawl wants.

    Returns one row per batch media item that has a signature:
    (media_id, n_band_candidates, n_dups, matched_min_id NULLable,
    is_dup).

    Scale shape: candidates bounded by band-bucket collisions (never
    all-pairs); the index scan is lazy and band-partitioned, so a probe
    touches only the four band directories with row-group pruning on bv.
    """
    from ..sinks.phash_index import melt_phash_bands

    assert max_dist < PHASH_BANDS, "pigeonhole needs max_dist < bands"
    cols = [f"b{i}" for i in range(PHASH_BANDS)]
    new_b = melt_phash_bands(batch_bands).persist()
    hist = history_index.select(
        "band_id",
        "bv",
        F.col("media_id").alias("hist_id"),
        *[F.col(c).alias(f"h_{c}") for c in cols],
    )
    hamming = None
    for c in cols:
        term = F.bit_count(F.col(c).bitwiseXOR(F.col(f"h_{c}")))
        hamming = term if hamming is None else hamming + term
    cand = (
        new_b.join(hist, ["band_id", "bv"])
        .select("media_id", "hist_id", hamming.cast("int").alias("hamming"))
        .distinct()
    )
    hits = cand.groupBy("media_id").agg(
        F.count("*").alias("n_band_candidates"),
        F.sum(
            F.when(F.col("hamming") <= max_dist, 1).otherwise(0)
        ).alias("n_dups"),
        F.min(
            F.when(F.col("hamming") <= max_dist, F.col("hist_id"))
        ).alias("matched_min_id"),
    )
    # Eagerly materialize the |batch|-bounded verdict rows, then release
    # the melted batch cache — the probe result no longer references it,
    # so a long sweep/bench session doesn't accumulate cached band frames
    # (ADVICE r9: new_b was persisted and never unpersisted).
    hits = hits.localCheckpoint()
    new_b.unpersist()
    probed = batch_bands.select("media_id")
    return probed.join(hits, "media_id", "left").select(
        "media_id",
        F.coalesce("n_band_candidates", F.lit(0))
        .cast("long")
        .alias("n_band_candidates"),
        F.coalesce("n_dups", F.lit(0)).cast("long").alias("n_dups"),
        F.col("matched_min_id").cast("long").alias("matched_min_id"),
        (F.coalesce("n_dups", F.lit(0)) > 0).alias("is_dup"),
    )


SCENE_SCHEMA = (
    "media_id long, frame_idx int, abs_diff_sum long, is_cut boolean"
)


def scene_cuts(df: DataFrame, cut_threshold: int) -> DataFrame:
    """Scene-cut detection over RVID video rows: per consecutive frame
    pair, the exact sum of absolute per-byte differences; a pair whose
    sum exceeds ``cut_threshold`` is a cut. The shot-boundary primitive
    of video-corpus curation (sample per shot, not per frame).

    All-integer output (sum of |a-b| over uint8 bytes), so the full
    value oracle applies. One mapInPandas pass, numpy vectorized; frames
    never leave the batch — only the per-pair statistic rows do.
    ``frame_idx`` is the LATER frame of the pair (the first frame of the
    new shot when ``is_cut``).
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids: list[int] = []
            idxs: list[int] = []
            sums: list[int] = []
            cuts: list[bool] = []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                if not p:
                    continue
                fmt = sniff_format(bytes(p))
                if fmt != "rvid":
                    require_real_decoder(fmt)
                frames = decode_rvid(bytes(p))
                if frames.shape[0] < 2:
                    continue
                flat = frames.reshape(frames.shape[0], -1).astype(np.int64)
                diffs = np.abs(flat[1:] - flat[:-1]).sum(axis=1)
                for i, d in enumerate(diffs, start=1):
                    ids.append(int(mid))
                    idxs.append(i)
                    sums.append(int(d))
                    cuts.append(bool(d > cut_threshold))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "abs_diff_sum": pd.Series(sums, dtype="int64"),
                    "is_cut": pd.Series(cuts, dtype="bool"),
                }
            )

    return df.mapInPandas(batches, schema=SCENE_SCHEMA)
