"""Multimodal (binary) column plumbing for LLM-data pipelines.

Convention: media rides in an opaque `binary` column with a typed
metadata struct alongside; decode / feature-extract / resize /
frame-sample are Arrow-batched pandas functions over mapInPandas so the
bytes never round-trip through the driver and each batch stays columnar.

The image/audio codecs aren't installed in this environment, so the
actual decode is STUBBED (clearly marked) behind a deterministic fake —
the Spark-side plumbing (schema, batching, partitioning, UDF signature)
is real and tested. Swap `_decode_stub` for a PIL/ffmpeg call on a real
cluster.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("data", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("source", T.StringType(), True),
                    T.StructField("declared_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("byte_len", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("width", T.LongType(), True),
        T.StructField("height", T.LongType(), True),
    ]
)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media blobs so the
    binary plumbing is exercised end-to-end on the driver tables."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("data"),
        F.struct(
            F.col("source").alias("source"),
            F.col("n_chars").cast("long").alias("declared_bytes"),
        ).alias("meta"),
    )


def _decode_stub(data: bytes) -> tuple[int, int]:
    """STUB: stands in for an image decode (PIL.Image.open). Returns a
    deterministic fake (width, height) derived from the byte length so
    tests and oracles can verify the plumbing without codecs."""
    n = len(data)
    return 16 + n % 64, 16 + (n // 64) % 64


def extract_features(media: DataFrame, *, batch_size_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    Real at any scale: partitions stream through Python in columnar
    batches; output schema is fixed; no driver collection. Only the
    pixel decode itself is faked (see _decode_stub).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = pdf["data"]
            byte_len = datas.map(lambda b: len(b) if b is not None else 0)
            digest = datas.map(
                lambda b: hashlib.md5(b).hexdigest() if b is not None else None
            )
            dims = datas.map(lambda b: _decode_stub(b) if b is not None else (0, 0))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": byte_len.astype("int64"),
                    "digest": digest,
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return media.mapInPandas(fn, schema=FEATURES_SCHEMA)


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes bytes through the same Arrow path; the
    actual pixel resample is NOT implemented in this environment."""
    raise NotImplementedError(
        "pixel resample requires an image codec (PIL/opencv) not present "
        "in this container; the mapInPandas plumbing is extract_features()"
    )


def frame_sample_stub(media: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling: NOT implemented (no ffmpeg in container)."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg; plumbing shape identical to "
        "extract_features()"
    )
