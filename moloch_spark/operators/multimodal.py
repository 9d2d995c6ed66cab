"""Multimodal (binary) column plumbing for LLM-data pipelines.

Convention: media rides in an opaque `binary` column with a typed
metadata struct alongside; decode / feature-extract / resize /
frame-sample are Arrow-batched pandas functions over mapInPandas so the
bytes never round-trip through the driver and each batch stays columnar.

Image DIMENSIONS are decoded for real from container headers — PNG
IHDR, JPEG SOF walk, GIF screen descriptor, BMP info header — no codec
library needed (magic bytes + fixed offsets). Only full PIXEL work
(resample, video frame extraction) needs PIL/ffmpeg, which this
container lacks: `resize_plan` does the complete target-geometry math
(real), while materializing resampled bytes raises NotImplementedError
(honest stub).
"""

from __future__ import annotations

import hashlib
import struct
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
        T.StructField("format", T.StringType(), True),
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


def decode_image_header(data: bytes | None) -> tuple[str | None, int | None, int | None]:
    """(format, width, height) from container headers alone — PNG IHDR,
    JPEG SOF0/1/2 marker walk, GIF screen descriptor, BMP info header.
    Unknown/truncated bytes -> (None, None, None); never throws."""
    if not data:
        return None, None, None
    try:
        if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
            w, h = struct.unpack(">II", data[16:24])
            return "png", w, h
        if data[:2] == b"\xff\xd8":  # JPEG: walk segments to a SOF
            off = 2
            while off + 4 <= len(data):
                if data[off] != 0xFF:
                    break
                marker = data[off + 1]
                if marker in (0xC0, 0xC1, 0xC2):  # baseline/extended/progressive
                    if off + 9 > len(data):
                        break
                    h, w = struct.unpack(">HH", data[off + 5 : off + 9])
                    return "jpeg", w, h
                if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
                    off += 2
                    continue
                seg_len = struct.unpack(">H", data[off + 2 : off + 4])[0]
                off += 2 + seg_len
            return "jpeg", None, None
        if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
            w, h = struct.unpack("<HH", data[6:10])
            return "gif", w, h
        if data[:2] == b"BM" and len(data) >= 26:
            w, h = struct.unpack("<ii", data[18:26])
            return "bmp", abs(w), abs(h)
    except struct.error:
        pass
    return None, None, None


def extract_features(media: DataFrame, *, batch_size_hint: int = 1024) -> DataFrame:
    """Decode + feature-extract over mapInPandas (Arrow batches).

    Real at any scale: partitions stream through Python in columnar
    batches; output schema is fixed; no driver collection. Dimensions
    come from real header parsing (decode_image_header); non-image
    bytes get NULL format/dims.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            datas = pdf["data"]
            byte_len = datas.map(lambda b: len(b) if b is not None else 0)
            digest = datas.map(
                lambda b: hashlib.md5(b).hexdigest() if b is not None else None
            )
            hdr = [decode_image_header(b) for b in datas]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "byte_len": byte_len.astype("int64"),
                    "digest": digest,
                    "format": [x[0] for x in hdr],
                    "width": pd.array([x[1] for x in hdr], dtype="Int64"),
                    "height": pd.array([x[2] for x in hdr], dtype="Int64"),
                }
            )

    return media.mapInPandas(fn, schema=FEATURES_SCHEMA)


def resize_plan(
    media: DataFrame, max_width: int, max_height: int, *, materialize: bool = False
) -> DataFrame:
    """Resize geometry, computed for real from decoded headers: fit the
    image inside (max_width, max_height) preserving aspect ratio, never
    upscaling — columns target_width/target_height/scale alongside the
    original dims. The metadata path is complete; only materializing
    resampled PIXELS needs a codec this container lacks."""
    if materialize:
        raise NotImplementedError(
            "pixel resample requires an image codec (PIL/opencv) not present "
            "in this container; geometry planning (materialize=False) is real"
        )
    feats = extract_features(media).select("media_id", "format", "width", "height")
    # least()/greatest() SKIP null operands, which would hand non-image
    # rows scale=1.0 and a 1x1 target — undecodable media must keep NULL
    # geometry instead
    decodable = F.col("width").isNotNull() & F.col("height").isNotNull()
    scale = F.when(
        decodable,
        F.least(
            F.lit(1.0),
            F.lit(max_width) / F.col("width"),
            F.lit(max_height) / F.col("height"),
        ),
    )
    return (
        media.join(feats, "media_id")
        .withColumn("scale", scale)
        .withColumn(
            "target_width",
            F.when(decodable, F.greatest(F.lit(1), F.floor(F.col("width") * scale))).cast("long"),
        )
        .withColumn(
            "target_height",
            F.when(decodable, F.greatest(F.lit(1), F.floor(F.col("height") * scale))).cast("long"),
        )
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Pixel resample: NOT implemented (no codec). Use resize_plan for
    the (real) geometry math."""
    return resize_plan(media, width, height, materialize=True)


def frame_sample_stub(media: DataFrame, every_n: int) -> DataFrame:
    """Video frame sampling: NOT implemented (no ffmpeg in container)."""
    raise NotImplementedError(
        "frame sampling requires ffmpeg; plumbing shape identical to "
        "extract_features()"
    )
