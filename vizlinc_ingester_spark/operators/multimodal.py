"""Multimodal columns: opaque binary payloads + typed metadata.

Not in the reference (its media handling stops at Tika text
extraction, src/TextExtractor.groovy:12-28); this is the
training-data-pipeline track: treat image/audio/video as ``binary``
columns with a typed metadata struct, and implement
decode / feature-extract / resize / frame-sample as Arrow-batched
Pandas operations over ``mapInPandas``.

Decode backends: the real image/audio libraries are not in this
container, so the actual pixel decode is STUBBED — ``backend="auto"``
raises NotImplementedError unless PIL is importable;
``backend="fake"`` derives deterministic dimensions from the bytes'
md5 (so the whole path — schema, batching, partitioning, UDF
signature — is real and oracle-checkable while the pixel math is a
placeholder).

Scale notes: binary payloads ride in parquet as byte arrays; all
metadata sniffing is JVM Column logic (one scan, no Python); only the
decode itself crosses into Arrow batches, sized by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it for
multi-MB payloads so a batch stays inside executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# magic-byte prefixes (hex) -> mime; checked longest-first
MAGIC_MIME = [
    ("89504E47", "image/png"),
    ("FFD8FF", "image/jpeg"),
    ("474946", "image/gif"),
    ("25504446", "application/pdf"),
    ("494433", "audio/mpeg"),
    ("52494646", "audio/wav"),  # RIFF container
    ("1A45DFA3", "video/webm"),
]

META_SCHEMA = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_md5", T.StringType()),
    ]
)


def sniff_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Attach meta struct<mime, n_bytes, content_md5> sniffed from the
    payload bytes — pure JVM Column logic, one scan, no UDF."""
    hexhead = F.upper(F.hex(F.substring(F.col(content_col), 1, 4)))
    mime = None
    for prefix, m in MAGIC_MIME:
        cond = hexhead.startswith(prefix)
        mime = F.when(cond, m) if mime is None else mime.when(cond, m)
    mime = mime.otherwise("application/octet-stream")
    return df.withColumn(
        "meta",
        F.struct(
            mime.alias("mime"),
            F.length(F.col(content_col)).cast("long").alias("n_bytes"),
            F.md5(F.col(content_col)).alias("content_md5"),
        ),
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for pixel decode: dimensions from the
    payload md5 (mirrored in DuckDB SQL by the suite oracle)."""
    h = hashlib.md5(payload).hexdigest()
    return 16 + int(h[0:4], 16) % 640, 16 + int(h[4:8], 16) % 480


DECODED_SCHEMA = (
    "media_id long, width int, height int, resized_w int, resized_h int, "
    "content_md5 string"
)


def decode_and_resize(
    media: DataFrame,
    box: int = 64,
    backend: str = "auto",
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Decode image dimensions and compute an aspect-preserving resize
    into a ``box``×``box`` bounding box, as one Arrow-batched
    mapInPandas pass.

    backend='fake' -> md5-derived dims (deterministic, offline);
    backend='auto' -> PIL if importable, else NotImplementedError.
    The resize math (floor scaling, min 1px) is the real operator
    either way — only the pixel source is stubbed.
    """
    if backend == "auto":
        try:
            import PIL.Image  # noqa: F401

            backend = "pil"
        except ImportError as exc:
            raise NotImplementedError(
                "image decode needs PIL (not in this container); "
                "use backend='fake' for the deterministic stub"
            ) from exc

    from ..session import ship_package

    ship_package(media.sparkSession)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        for pdf in batches:
            out = {"media_id": [], "width": [], "height": [],
                   "resized_w": [], "resized_h": [], "content_md5": []}
            for mid, payload in zip(pdf[id_col], pdf[content_col]):
                payload = bytes(payload)
                if backend == "pil":
                    import PIL.Image

                    with PIL.Image.open(io.BytesIO(payload)) as im:
                        w, h = im.size
                else:
                    w, h = _fake_dims(payload)
                scale = min(box / w, box / h, 1.0)
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["resized_w"].append(max(1, int(w * scale)))
                out["resized_h"].append(max(1, int(h * scale)))
                out["content_md5"].append(hashlib.md5(payload).hexdigest())
            yield pd.DataFrame(out)

    return media.select(id_col, content_col).mapInPandas(run, DECODED_SCHEMA)


def frame_sample(
    video: DataFrame,
    every_ms: int = 1000,
    id_col: str = "media_id",
    duration_col: str = "duration_ms",
) -> DataFrame:
    """Frame sampling plan: one row per sampled frame offset —
    ``sequence`` + ``posexplode``, all JVM-side. The per-frame pixel
    fetch would be a follow-on mapInPandas over (media_id, frame_ms)
    against the payload; the *plan* (explode cardinality, partition
    keys) is the part that matters at scale and is fully real here.
    """
    return video.select(
        F.col(id_col),
        F.posexplode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest((F.col(duration_col) - 1), F.lit(0)).cast("long"),
                F.lit(every_ms).cast("long"),
            )
        ).alias("frame_idx", "frame_ms"),
    )


def audio_chunks(
    audio: DataFrame,
    chunk_ms: int = 1000,
    sample_rate: int = 16000,
    bytes_per_sample: int = 2,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Chunk plan for audio payloads: duration inferred from byte
    length (PCM assumption — the decode stub), one row per chunk with
    byte offsets, JVM-side."""
    n_samples = (F.length(F.col(content_col)) / bytes_per_sample).cast("long")
    duration_ms = (n_samples * 1000 / sample_rate).cast("long")
    bytes_per_chunk = sample_rate * bytes_per_sample * chunk_ms // 1000
    return audio.select(
        F.col(id_col),
        duration_ms.alias("duration_ms"),
        F.posexplode(
            F.sequence(
                F.lit(0).cast("long"),
                F.greatest(duration_ms - 1, F.lit(0)).cast("long"),
                F.lit(chunk_ms).cast("long"),
            )
        ).alias("chunk_idx", "chunk_ms"),
    ).withColumn(
        "byte_start", (F.col("chunk_idx") * bytes_per_chunk).cast("long")
    )
