"""Tests for multimodal column plumbing, the real media codecs, and the
quality-check framework."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from snowflake_stock_dbt_spark.functions.codecs import (
    bmp_file_size,
    bmp_row_stride,
    decode_bmp,
    decode_rvid,
    decode_wav,
    encode_bmp,
    encode_rvid,
    encode_wav,
    sniff_format,
)
from snowflake_stock_dbt_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    decode_media,
    media_stats,
    require_real_decoder,
    resize_media,
    sample_frames,
)
from snowflake_stock_dbt_spark.quality.checks import (
    accepted_range,
    not_null,
    relationships,
    run_checks,
    unique,
)

# ---------------------------------------------------------------------------
# Codec round-trips (pure Python, no Spark)
# ---------------------------------------------------------------------------


def test_bmp_roundtrip_with_padding():
    # width 15 -> row 45 bytes -> stride 48: padding is actually exercised.
    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, size=(12, 15, 3), dtype=np.uint8)
    blob = encode_bmp(px)
    assert blob[:2] == b"BM"
    assert len(blob) == bmp_file_size(15, 12) == 54 + 48 * 12
    assert bmp_row_stride(15) == 48
    out = decode_bmp(blob)
    assert out.shape == (12, 15, 3)
    assert np.array_equal(out, px)


def test_bmp_rows_are_stored_bottom_up():
    # Hand-read the pixel array: the FIRST stored row must be the LAST
    # image row (BMP bottom-up order) — proves encode/decode really flip.
    px = np.arange(2 * 15 * 3, dtype=np.uint8).reshape(2, 15, 3)
    blob = encode_bmp(px)
    (off,) = struct.unpack_from("<I", blob, 10)
    first_stored_row = blob[off : off + 45]
    assert first_stored_row == px[1].tobytes()
    assert np.array_equal(decode_bmp(blob), px)


def test_wav_roundtrip_and_chunk_walk():
    pcm = struct.pack("<8h", 0, 1000, -1000, 32767, -32768, 5, -5, 0)
    blob = encode_wav(pcm, 16_000)
    assert sniff_format(blob) == "wav"
    samples, rate = decode_wav(blob)
    assert rate == 16_000
    assert samples.tobytes() == pcm
    # Decoder must walk chunks, not assume byte-44 data: splice a junk
    # chunk between fmt and data.
    junk = struct.pack("<4sI", b"LIST", 6) + b"junk!\x00"
    spliced = blob[:36] + junk + blob[36:]
    spliced = spliced[:4] + struct.pack("<I", len(spliced) - 8) + spliced[8:]
    samples2, _ = decode_wav(spliced)
    assert samples2.tobytes() == pcm


def test_rvid_roundtrip():
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, size=(7, 4, 4, 3), dtype=np.uint8)
    blob = encode_rvid(frames)
    assert sniff_format(blob) == "rvid"
    assert np.array_equal(decode_rvid(blob), frames)


def test_sniff_and_compressed_formats_refused():
    assert sniff_format(b"\x89PNG\r\n\x1a\n....") == "unknown"
    assert sniff_format(b"\xff\xd8\xff\xe0JFIF") == "unknown"
    assert sniff_format(None) == "unknown"
    with pytest.raises(NotImplementedError):
        require_real_decoder("png")


# ---------------------------------------------------------------------------
# Spark stages over real encoded payloads
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def media_df(spark):
    img_px = np.arange(4 * 15 * 3, dtype=np.uint8).reshape(4, 15, 3)
    pcm = struct.pack("<6h", 100, -100, 2000, -2000, 0, 7)
    frames = (np.arange(3 * 4 * 4 * 3, dtype=np.uint8) % 251).reshape(3, 4, 4, 3)
    rows = [
        (1, "image", encode_bmp(img_px), "image/bmp", 15, 4, None),
        (2, "audio", encode_wav(pcm), "audio/wav", None, None, 1200),
        (3, "video", encode_rvid(frames), "video/x-rvid", 4, 4, 375),
        (4, "video", None, "video/mp4", 640, 480, 5000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_real_kernels(media_df):
    by_id = {r["media_id"]: r for r in decode_media(media_df).collect()}
    img_px = np.arange(4 * 15 * 3, dtype=np.uint8).reshape(4, 15, 3)
    pcm = struct.pack("<6h", 100, -100, 2000, -2000, 0, 7)
    frames = (np.arange(3 * 4 * 4 * 3, dtype=np.uint8) % 251).reshape(3, 4, 4, 3)

    r1 = by_id[1]
    assert (r1["fmt"], r1["width"], r1["height"]) == ("bmp", 15, 4)
    assert r1["content_bytes"] == 180
    assert r1["content_sha"] == hashlib.sha256(img_px.tobytes()).hexdigest()
    assert r1["content_mean"] == float(int(img_px.sum())) / img_px.size

    r2 = by_id[2]
    assert r2["fmt"] == "wav" and r2["width"] is None
    assert r2["content_sha"] == hashlib.sha256(pcm).hexdigest()

    r3 = by_id[3]
    assert (r3["fmt"], r3["n_frames"]) == ("rvid", 3)
    assert r3["content_sha"] == hashlib.sha256(frames.tobytes()).hexdigest()

    r4 = by_id[4]  # NULL payload -> decodable-to-nothing row, no crash
    assert (r4["fmt"], r4["content_bytes"]) == ("none", 0)
    assert r4["content_sha"] == hashlib.sha256(b"").hexdigest()


def test_decode_media_refuses_compressed(spark):
    df = spark.createDataFrame(
        [(9, "image", b"\x89PNG\r\n\x1a\nxxxxxxxx", "image/png", None, None, None)],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        decode_media(df).collect()


def test_media_stats_rollup(media_df):
    stats = {r["modality"]: r for r in media_stats(media_df).collect()}
    assert stats["image"]["n_items"] == 1
    assert stats["image"]["total_bytes"] == bmp_file_size(15, 4)
    assert stats["audio"]["total_bytes"] == 44 + 12
    assert stats["video"]["n_items"] == 2  # NULL payload still counted


def test_resize_is_pixel_domain_nearest_neighbor(media_df):
    out = {r["media_id"]: r for r in resize_media(media_df.where("media_id = 1"), 4, 2).collect()}
    img_px = np.arange(4 * 15 * 3, dtype=np.uint8).reshape(4, 15, 3)
    ys = (np.arange(2) * 4) // 2
    xs = (np.arange(4) * 15) // 4
    expected = img_px[ys][:, xs]
    r = out[1]
    assert (r["out_w"], r["out_h"]) == (4, 2)
    assert r["n_bytes"] == bmp_file_size(4, 2)
    assert r["resized_sha"] == hashlib.sha256(expected.tobytes()).hexdigest()
    # Round-trip sanity: decoding the re-encoded BMP gives the same pixels.
    assert np.array_equal(decode_bmp(encode_bmp(expected)), expected)


def test_resize_refuses_non_image(media_df):
    with pytest.raises(Exception, match="NotImplementedError|no codec"):
        resize_media(media_df.where("media_id = 2"), 4, 2).collect()


def test_frame_sample_demuxes_rvid(media_df):
    frames = (np.arange(3 * 4 * 4 * 3, dtype=np.uint8) % 251).reshape(3, 4, 4, 3)
    vid = media_df.where("media_id = 3")
    # every_k=1 keeps every frame; shas must match the raw frame bytes.
    got = sorted(
        sample_frames(vid, every_k=1).collect(), key=lambda r: r["frame_idx"]
    )
    assert [r["frame_idx"] for r in got] == [0, 1, 2]
    assert [r["frame_sha"] for r in got] == [
        hashlib.sha256(frames[i].tobytes()).hexdigest() for i in range(3)
    ]
    assert all(r["n_bytes"] == 48 for r in got)
    # every_k=2 keeps frames 0, 2; NULL payloads contribute nothing.
    sampled = sample_frames(media_df.where("modality = 'video'"), every_k=2).collect()
    assert sorted(r["frame_idx"] for r in sampled) == [0, 2]


def test_quality_checks_pass_and_fail(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None)], ["id", "v"]
    )
    assert not_null(df, "id").passed
    assert not not_null(df, "v").passed
    assert not unique(df, "id").passed
    assert accepted_range(df, "id", 1, 2).passed
    assert not accepted_range(df, "id", 2, None).passed

    parent = spark.createDataFrame([(1,), (2,)], ["id"])
    child = spark.createDataFrame([(1,), (3,)], ["id"])
    assert not relationships(child, "id", parent, "id").passed

    with pytest.raises(AssertionError, match="unique\\(id\\)"):
        run_checks([unique(df, "id")])


def test_audio_features_known_pcm(spark):
    """RMS and zero-crossings on constructed int16 PCM with known answers:
    a constant-amplitude square wave alternating every sample — fed both
    as raw PCM bytes and as a WAV container (the chunk-walk parse must
    yield identical frames)."""
    from snowflake_stock_dbt_spark.operators.multimodal import audio_features

    amp = 16384  # 2^14 -> rms = 0.5 exactly after /32768 scaling
    n = 128
    square = struct.pack(f"<{n}h", *([amp, -amp] * (n // 2)))
    silence = struct.pack(f"<{n}h", *([0] * n))
    short = b"\x01\x02\x03"  # 1 sample + odd byte: below a frame, no rows
    df = spark.createDataFrame(
        [
            (1, square),
            (2, silence),
            (3, short),
            (4, None),
            (5, encode_wav(square)),  # same signal, WAV-wrapped
        ],
        "media_id long, payload binary",
    )
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in audio_features(df, frame_samples=64).collect()
    }
    # 128 samples / 64 per frame = 2 frames for the full payloads.
    assert set(rows) == {(1, 0), (1, 1), (2, 0), (2, 1), (5, 0), (5, 1)}
    for k in [(1, 0), (1, 1), (5, 0), (5, 1)]:
        assert rows[k]["rms"] == 0.5
        assert rows[k]["zero_crossings"] == 63  # alternates every sample
    for k in [(2, 0), (2, 1)]:
        assert rows[k]["rms"] == 0.0
        assert rows[k]["zero_crossings"] == 0


def test_q81_audio_features_shape(spark, oracle_sf_dir):
    from snowflake_stock_dbt_spark.plans.multimodal_plans import q81_audio_features

    out = q81_audio_features(spark, oracle_sf_dir)
    rows = out.collect()
    assert rows  # audio rows exist and are long enough for >= 1 frame
    assert {r["media_id"] % 3 for r in rows} == {1}  # audio modality only
    assert all(0.0 <= r["rms"] <= 1.0 for r in rows)


def test_phash_near_dup_detection(spark):
    """A few-byte perturbation of a payload must land within Hamming
    distance 3 of the original and be found by the banded pair join; an
    unrelated payload must not pair with either."""
    from snowflake_stock_dbt_spark.operators.multimodal import (
        phash_bands,
        phash_neardup_pairs,
    )

    rng = np.random.default_rng(7)
    base = bytes(rng.integers(0, 256, size=1300, dtype=np.uint8))
    # Perturb one byte inside a single segment: at most one bit flips.
    near = base[:10] + bytes([base[10] ^ 0xFF]) + base[11:]
    other = bytes(rng.integers(0, 256, size=1300, dtype=np.uint8))
    media = spark.createDataFrame(
        [(1, base), (2, near), (3, other)], ["media_id", "payload"]
    )
    pairs = {
        (r["ma"], r["mb"]): r["hamming"]
        for r in phash_neardup_pairs(phash_bands(media), max_dist=3).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] <= 3
    assert all(3 not in k for k in pairs)


def test_phash_is_pixel_domain_for_bmp(spark):
    """A BMP payload must hash its DECODED pixel stream: the bands for
    encode_bmp(px) equal the bands for the raw pixel bytes — even though
    the encoded file interleaves padding and flips row order."""
    from snowflake_stock_dbt_spark.operators.multimodal import phash_bands

    rng = np.random.default_rng(13)
    px = rng.integers(0, 256, size=(12, 15, 3), dtype=np.uint8)
    media = spark.createDataFrame(
        [(1, encode_bmp(px)), (2, px.tobytes())], ["media_id", "payload"]
    )
    rows = {r["media_id"]: r for r in phash_bands(media).collect()}
    assert all(
        rows[1][f"b{i}"] == rows[2][f"b{i}"] for i in range(4)
    )


def test_phash_pigeonhole_guarantee(spark):
    """Any pair within Hamming distance 3 shares at least one exact band,
    so the banded candidate join cannot miss it — flip 3 bits spread over
    3 different bands and the pair must still be found."""
    from snowflake_stock_dbt_spark.operators.multimodal import (
        phash_bands,
        phash_neardup_pairs,
    )

    rng = np.random.default_rng(11)
    base = bytes(rng.integers(0, 256, size=1300, dtype=np.uint8))
    media = spark.createDataFrame([(1, base)], ["media_id", "payload"])
    row = phash_bands(media).collect()[0]
    # Forge a second hash row directly: flip one bit in three of the four
    # 16-bit bands (distance exactly 3).
    forged = (
        2,
        row["b0"] ^ 1,
        row["b1"] ^ 4,
        row["b2"] ^ 1024,
        row["b3"],
    )
    bands = spark.createDataFrame(
        [tuple(row), forged], ["media_id", "b0", "b1", "b2", "b3"]
    )
    got = phash_neardup_pairs(bands, max_dist=3).collect()
    assert len(got) == 1 and got[0]["hamming"] == 3


def test_scene_cuts_known_video(spark):
    """Two identical frames then a very different one: exactly one cut."""
    import numpy as np

    from snowflake_stock_dbt_spark.functions.codecs import encode_rvid
    from snowflake_stock_dbt_spark.operators.multimodal import scene_cuts

    same = np.zeros((4, 4, 3), dtype=np.uint8)
    diff = np.full((4, 4, 3), 200, dtype=np.uint8)
    vid = encode_rvid(np.stack([same, same, diff]))
    df = spark.createDataFrame(
        [(1, bytearray(vid))], "media_id long, payload binary"
    )
    rows = {r["frame_idx"]: r for r in scene_cuts(df, 1000).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["abs_diff_sum"] == 0 and not rows[1]["is_cut"]
    assert rows[2]["abs_diff_sum"] == 200 * 48 and rows[2]["is_cut"]
