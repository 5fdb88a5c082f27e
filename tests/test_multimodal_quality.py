"""Tests for multimodal column plumbing and the quality-check framework."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

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


@pytest.fixture(scope="module")
def media_df(spark):
    rows = [
        (1, "image", b"\x89PNG fake payload 1", "image/png", 64, 64, None),
        (2, "image", b"\x89PNG fake payload two", "image/png", 128, 128, None),
        (3, "audio", b"RIFF fake wav", "audio/wav", None, None, 1200),
        (4, "video", None, "video/mp4", 640, 480, 5000),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_media_batch_plumbing(media_df):
    out = decode_media(media_df).collect()
    assert len(out) == 4
    by_id = {r["media_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 19
    assert by_id[4]["n_bytes"] == 0  # NULL payload -> 0 bytes, no crash
    assert len(by_id[2]["payload_sha"]) == 64
    assert all(r["feat_dim"] == 8 for r in out)
    # determinism: same payload -> same sha/features on a second run
    again = {r["media_id"]: r for r in decode_media(media_df).collect()}
    assert all(
        again[i]["payload_sha"] == by_id[i]["payload_sha"] for i in by_id
    )


def test_media_stats_rollup(media_df):
    stats = {r["modality"]: r for r in media_stats(media_df).collect()}
    assert stats["image"]["n_items"] == 2
    assert stats["audio"]["total_bytes"] == 13


def test_decoder_stub_is_explicit():
    with pytest.raises(NotImplementedError):
        require_real_decoder()


def test_resize_bounds_output(media_df):
    out = {r["media_id"]: r for r in resize_media(media_df, 4, 2).collect()}
    assert all(r["out_w"] == 4 and r["out_h"] == 2 for r in out.values())
    # output never exceeds out_w*out_h bytes regardless of input size
    assert out[1]["n_bytes"] == 8
    assert out[4]["n_bytes"] == 0  # NULL payload
    import hashlib

    assert out[3]["resized_sha"] == hashlib.sha256(b"RIFF fak").hexdigest()


def test_frame_sample_reassembles(media_df):
    # every_k=1 keeps every frame: concatenating them must rebuild the
    # payload exactly (the flat-map loses nothing).
    frames = sample_frames(media_df, frame_bytes=5, every_k=1).collect()
    by_id: dict[int, list] = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    import hashlib

    p1 = b"\x89PNG fake payload 1"
    got = sorted(by_id[1], key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in got] == list(range(4))
    assert [r["frame_sha"] for r in got] == [
        hashlib.sha256(p1[i * 5 : (i + 1) * 5]).hexdigest() for i in range(4)
    ]
    assert sum(r["n_bytes"] for r in got) == len(p1)
    assert 4 not in by_id  # NULL payload -> no frames
    # every_k=2 keeps frames 0,2
    sampled = sample_frames(media_df, frame_bytes=5, every_k=2).collect()
    idxs = sorted(r["frame_idx"] for r in sampled if r["media_id"] == 1)
    assert idxs == [0, 2]


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
    a constant-amplitude square wave alternating every sample."""
    import struct

    from snowflake_stock_dbt_spark.operators.multimodal import audio_features

    amp = 16384  # 2^14 -> rms = 0.5 exactly after /32768 scaling
    n = 128
    square = struct.pack(f"<{n}h", *([amp, -amp] * (n // 2)))
    silence = struct.pack(f"<{n}h", *([0] * n))
    short = b"\x01\x02\x03"  # 1 sample + odd byte: below a frame, no rows
    df = spark.createDataFrame(
        [(1, square), (2, silence), (3, short), (4, None)],
        "media_id long, payload binary",
    )
    rows = {
        (r["media_id"], r["frame_idx"]): r
        for r in audio_features(df, frame_samples=64).collect()
    }
    # 128 samples / 64 per frame = 2 frames for the full payloads.
    assert set(rows) == {(1, 0), (1, 1), (2, 0), (2, 1)}
    for k in [(1, 0), (1, 1)]:
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
    import numpy as np

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


def test_phash_pigeonhole_guarantee(spark):
    """Any pair within Hamming distance 3 shares at least one exact band,
    so the banded candidate join cannot miss it — flip 3 bits spread over
    3 different bands and the pair must still be found."""
    import numpy as np

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
