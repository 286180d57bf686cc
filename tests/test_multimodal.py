"""Multimodal binary-column plumbing (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from vizlinc_ingester_spark.operators import multimodal as mm


def test_sniff_metadata_magic(spark):
    rows = [
        (1, bytes.fromhex("89504E47") + b"rest"),
        (2, bytes.fromhex("FFD8FFE0") + b"jpg"),
        (3, b"plain text"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r["meta"] for r in mm.sniff_metadata(df).collect()}
    assert out[1]["mime"] == "image/png"
    assert out[2]["mime"] == "image/jpeg"
    assert out[3]["mime"] == "application/octet-stream"
    assert out[1]["n_bytes"] == 8
    assert out[3]["content_md5"] == hashlib.md5(b"plain text").hexdigest()


def test_decode_auto_raises_without_pil(spark):
    df = spark.createDataFrame([(1, b"x")], "media_id long, content binary")
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present in this environment")
    except ImportError:
        pass
    with pytest.raises(NotImplementedError):
        mm.decode_and_resize(df, backend="auto")


def test_decode_fake_deterministic_and_resized(spark):
    payload = b"some image bytes"
    df = spark.createDataFrame([(7, payload)], "media_id long, content binary")
    row = mm.decode_and_resize(df, box=64, backend="fake").first()
    w, h = mm._fake_dims(payload)
    assert (row["width"], row["height"]) == (w, h)
    assert 1 <= row["resized_w"] <= 64 and 1 <= row["resized_h"] <= 64
    # aspect preserved within integer truncation
    if w >= h:
        assert row["resized_w"] == 64 or w <= 64
    assert row["content_md5"] == hashlib.md5(payload).hexdigest()


def test_frame_sample_counts(spark):
    df = spark.createDataFrame(
        [(1, 2500), (2, 1000), (3, 0)], "media_id long, duration_ms long"
    )
    out = (
        mm.frame_sample(df, every_ms=1000)
        .groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("frame_ms").alias("last"))
    )
    got = {r["media_id"]: (r["n"], r["last"]) for r in out.collect()}
    assert got[1] == (3, 2000)  # 0, 1000, 2000
    assert got[2] == (1, 0)
    assert got[3] == (1, 0)  # degenerate payload still yields frame 0


def test_audio_chunks_offsets(spark):
    # 64000 bytes PCM16 @16kHz = 2s -> chunks at 0ms and 1000ms
    df = spark.createDataFrame([(1, b"\0" * 64000)], "media_id long, content binary")
    rows = mm.audio_chunks(df).orderBy("chunk_idx").collect()
    assert [r["chunk_ms"] for r in rows] == [0, 1000]
    assert [r["byte_start"] for r in rows] == [0, 32000]
    assert rows[0]["duration_ms"] == 2000
