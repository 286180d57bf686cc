"""Multimodal-column queries (training-data pipeline track).

Binary payloads are synthesized deterministically from the
``documents`` table (magic prefix by doc_id bucket + the UTF-8 text
bytes) so the operators run oracle-checked without media files:
metadata sniffing (JVM-side), fake-backend decode+resize
(mapInPandas — the Arrow path itself under test), frame sampling and
audio chunk plans (sequence+posexplode).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import multimodal as mm

# doc_id % 4 -> (magic hex, expected mime)
_BUCKETS = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("25504446", "application/pdf"),
    ("", "application/octet-stream"),
]


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread the single-split parquet so mapInPandas gets one Arrow
    # stream per core, not one serial stream
    from ..session import read_spread

    d = read_spread(
        spark, os.path.join(sf_dir, "documents.parquet"), "doc_id"
    )
    b = F.col("doc_id") % 4
    magic = None
    for i, (hx, _) in enumerate(_BUCKETS):
        branch = F.unhex(F.lit(hx)) if hx else F.lit(b"")
        magic = F.when(b == i, branch) if magic is None else magic.when(b == i, branch)
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.concat(magic, F.encode("text", "UTF-8")).alias("content"),
        "text",
        "n_chars",
    )


def q_media_metadata(spark, sf_dir):
    """Magic-byte mime sniff + payload size — pure Column logic over
    binary (operators/multimodal.sniff_metadata)."""
    m = mm.sniff_metadata(_media(spark, sf_dir))
    return m.select(
        "media_id",
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.md5(F.encode("text", "UTF-8")).alias("text_md5"),
    )


ORACLE_MEDIA_METADATA = """
SELECT doc_id AS media_id,
       CASE doc_id % 4 WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/jpeg'
            WHEN 2 THEN 'application/pdf' ELSE 'application/octet-stream' END AS mime,
       CAST(octet_length(encode(text))
            + CASE doc_id % 4 WHEN 0 THEN 4 WHEN 1 THEN 3 WHEN 2 THEN 4 ELSE 0 END
            AS BIGINT) AS n_bytes,
       md5(text) AS text_md5
FROM documents
"""


def q_image_decode_resize(spark, sf_dir):
    """Arrow-batched mapInPandas decode (fake backend: md5-derived
    dims) + aspect-preserving resize into a 64px box."""
    media = _media(spark, sf_dir).select(
        "media_id", F.encode("text", "UTF-8").alias("content")
    )
    return mm.decode_and_resize(media, box=64, backend="fake")


def _sql_hex4_to_int(h: str, start: int) -> str:
    """int(md5_hex[start:start+4], 16) without strtol: digit positions."""
    terms = []
    for i in range(4):
        digit = f"(strpos('0123456789abcdef', substr({h}, {start + i}, 1)) - 1)"
        terms.append(f"{digit} * {16 ** (3 - i)}")
    return "(" + " + ".join(terms) + ")"


_W = f"(16 + {_sql_hex4_to_int('md5(text)', 1)} % 640)"
_H = f"(16 + {_sql_hex4_to_int('md5(text)', 5)} % 480)"

ORACLE_IMAGE_DECODE = f"""
SELECT doc_id AS media_id,
       CAST({_W} AS INTEGER) AS width,
       CAST({_H} AS INTEGER) AS height,
       CAST(greatest(1, floor({_W} * least(64.0/{_W}, 64.0/{_H}, 1.0))) AS INTEGER) AS resized_w,
       CAST(greatest(1, floor({_H} * least(64.0/{_W}, 64.0/{_H}, 1.0))) AS INTEGER) AS resized_h,
       md5(text) AS content_md5
FROM documents
"""


FRAME_EVERY_MS = 1000
MS_PER_CHAR = 20


def q_video_frame_sample(spark, sf_dir):
    """Frame-sampling plan: duration derived from n_chars (decode
    stub), one row per sampled frame."""
    v = _media(spark, sf_dir).select(
        "media_id", (F.col("n_chars") * MS_PER_CHAR).cast("long").alias("duration_ms")
    )
    return mm.frame_sample(v, every_ms=FRAME_EVERY_MS)


ORACLE_FRAME_SAMPLE = f"""
SELECT doc_id AS media_id,
       CAST(f.frame_ms // {FRAME_EVERY_MS} AS INTEGER) AS frame_idx,
       CAST(f.frame_ms AS BIGINT) AS frame_ms
FROM documents,
     LATERAL unnest(range(0, greatest(n_chars * {MS_PER_CHAR}, 1), {FRAME_EVERY_MS})) AS f(frame_ms)
"""


CHUNK_MS = 1000
SAMPLE_RATE = 16000
BYTES_PER_SAMPLE = 2


def q_audio_chunks(spark, sf_dir):
    """Audio chunk plan: PCM duration from byte length, 1s chunks."""
    a = _media(spark, sf_dir).select(
        "media_id", F.encode("text", "UTF-8").alias("content")
    )
    return mm.audio_chunks(
        a, chunk_ms=CHUNK_MS, sample_rate=SAMPLE_RATE, bytes_per_sample=BYTES_PER_SAMPLE
    )


_DUR = f"CAST(floor((octet_length(encode(text)) // {BYTES_PER_SAMPLE}) * 1000.0 / {SAMPLE_RATE}) AS BIGINT)"

ORACLE_AUDIO_CHUNKS = f"""
SELECT doc_id AS media_id,
       {_DUR} AS duration_ms,
       CAST(c.chunk_ms // {CHUNK_MS} AS INTEGER) AS chunk_idx,
       CAST(c.chunk_ms AS BIGINT) AS chunk_ms,
       CAST(c.chunk_ms // {CHUNK_MS} * {SAMPLE_RATE * BYTES_PER_SAMPLE * CHUNK_MS // 1000} AS BIGINT) AS byte_start
FROM documents,
     LATERAL unnest(range(0, greatest({_DUR}, 1), {CHUNK_MS})) AS c(chunk_ms)
"""


QUERIES = {
    "media_metadata": q_media_metadata,
    "image_decode_resize": q_image_decode_resize,
    "video_frame_sample": q_video_frame_sample,
    "audio_chunks": q_audio_chunks,
}

ORACLES = {
    "media_metadata": ORACLE_MEDIA_METADATA,
    "image_decode_resize": ORACLE_IMAGE_DECODE,
    "video_frame_sample": ORACLE_FRAME_SAMPLE,
    "audio_chunks": ORACLE_AUDIO_CHUNKS,
}
