"""Decode pipelines — display/hunt-time payload transforms.

Reference (viewer/decode.js): chained transforms over reassembled
payload — gunzip (decode.js:139-162), un-base64 (163-169), HTTP body
extraction (497-620), xor-brute-force (208-264).

Spark shape: a chain of column transforms. Base64 is a JVM built-in;
inflate/gzip has no built-in, so it runs as an Arrow-batched pandas UDF
(zlib per batch) — the sanctioned slow path, still columnar. Each stage
is payload -> payload, so pipelines compose with reduce.
"""

from __future__ import annotations

import gzip as _gzip
import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql import types as T


def unbase64(col: Column) -> Column:
    """Base64 -> bytes (JVM built-in)."""
    return F.unbase64(col)


@pandas_udf(T.BinaryType())
def gunzip_udf(data: pd.Series) -> pd.Series:
    """gzip/deflate decompress; passthrough on failure (the reference
    shows raw bytes when a stream doesn't inflate)."""

    def one(b):
        if b is None:
            return None
        try:
            return _gzip.decompress(bytes(b))
        except Exception:
            try:
                return zlib.decompress(bytes(b))
            except Exception:
                return bytes(b)

    return data.map(one)


@pandas_udf(T.BinaryType())
def encode_gzip_udf(text: pd.Series) -> pd.Series:
    """Gate-synthesis encoder: deterministic gzip of the UTF-8 bytes
    (mtime pinned to 0 so the 10-byte header never varies across
    executors/reps). Only gates use this — the engine itself only ever
    DECOMPRESSES (gunzip_udf)."""
    return text.map(
        lambda s: None
        if s is None
        else _gzip.compress(s.encode("utf-8"), mtime=0)
    )


@pandas_udf(T.BinaryType())
def encode_xor_gzip_udf(text: pd.Series, key: pd.Series) -> pd.Series:
    """Gate-synthesis encoder for the xor-brute stage: deterministic
    gzip of the UTF-8 bytes, then XOR with a per-row single-byte key —
    the obfuscated-payload shape decode.js:208-264 brute-forces. Gates
    only; the engine itself only ever SEARCHES (xor_brute_gzip_udf)."""

    def one(s, k):
        if s is None:
            return None
        k = int(k) & 0xFF
        return bytes(
            b ^ k for b in _gzip.compress(s.encode("utf-8"), mtime=0)
        )

    return pd.Series([one(s, k) for s, k in zip(text, key)])


def http_body(col: Column) -> Column:
    """Extract the body after the header terminator CRLFCRLF (the
    http-parser body-extraction path, simplified to the split): built-in
    string ops, no UDF."""
    s = col.cast("string")
    idx = F.instr(s, "\r\n\r\n")
    return F.when(idx > 0, F.substring(s, idx + 4, 2_000_000_000)).otherwise(s)


def decode_pipeline(df: DataFrame, payload_col: str, stages: list[str]) -> DataFrame:
    """Apply named stages in order: 'base64', 'gzip', 'http_body',
    'xor_brute', 'mime_body'."""
    out = F.col(payload_col)
    for s in stages:
        if s == "base64":
            out = unbase64(out.cast("string"))
        elif s == "gzip":
            out = gunzip_udf(out.cast("binary"))
        elif s == "http_body":
            out = http_body(out).cast("binary")
        elif s == "xor_brute":
            out = xor_brute_gzip_udf(out.cast("binary"))
        elif s == "mime_body":
            out = mime_body_udf(out.cast("binary"))
        else:
            raise ValueError(f"unknown decode stage {s!r}")
    return df.withColumn(payload_col, out)


@pandas_udf(T.BinaryType())
def xor_brute_gzip_udf(data: pd.Series) -> pd.Series:
    """xor-brute-force stage (decode.js:208-264): try every single-byte
    key; a key is right when the result starts with the gzip magic
    (1f 8b) AND inflates. Passthrough when no key works. 256 two-byte
    probes per value, at most one real decompress — cheap even though
    it's the Python path."""

    def one(b):
        if b is None:
            return None
        raw = bytes(b)
        for key in range(256):
            if len(raw) >= 2 and raw[0] ^ key == 0x1F and raw[1] ^ key == 0x8B:
                try:
                    return _gzip.decompress(bytes(x ^ key for x in raw))
                except Exception:
                    continue
        return raw

    return data.map(one)


@pandas_udf(T.BinaryType())
def mime_body_udf(data: pd.Series) -> pd.Series:
    """SMTP/MIME body extraction (decode.js:286-496): walk the MIME
    tree, concatenate decoded text/* leaf parts (base64 and
    quoted-printable transfer encodings handled by the stdlib walk).
    Non-MIME input passes through."""
    import email
    import email.policy

    def one(b):
        if b is None:
            return None
        raw = bytes(b)
        try:
            msg = email.message_from_bytes(raw, policy=email.policy.default)
        except Exception:
            return raw
        if not msg.get("Content-Type") and not msg.get("MIME-Version"):
            return raw
        parts = []
        for part in msg.walk():
            if part.get_content_maintype() == "text":
                try:
                    parts.append(part.get_payload(decode=True) or b"")
                except Exception:
                    pass
        return b"\n".join(parts) if parts else raw

    return data.map(one)


# ---------------------------------------------------------------------------
# file carving (viewer/decode.js image/file carve stage)
# ---------------------------------------------------------------------------

_CARVE_MAGICS = (
    ("png", b"\x89PNG\r\n\x1a\n", b"IEND"),
    ("jpeg", b"\xff\xd8\xff", b"\xff\xd9"),
    ("gif", b"GIF89a", b"\x00;"),
    ("gif", b"GIF87a", b"\x00;"),
    ("gzip", b"\x1f\x8b\x08", None),
    ("zip", b"PK\x03\x04", None),
    ("pdf", b"%PDF-", b"%%EOF"),
)

CARVE_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("offset", T.LongType()),
            T.StructField("format", T.StringType()),
            T.StructField("length", T.LongType()),  # NULL = end marker not found
        ]
    )
)


def carve_payload(data: bytes) -> list[tuple[int, str, int | None]]:
    """Find embedded files by signature scan: (offset, format, length)
    per hit; length is end-marker-delimited where the format has one
    (PNG IEND / JPEG EOI / PDF EOF), else NULL (stream formats)."""
    hits = []
    for fmt, magic, endmark in _CARVE_MAGICS:
        start = 0
        while True:
            off = data.find(magic, start)
            if off < 0:
                break
            length = None
            if endmark is not None:
                end = data.find(endmark, off + len(magic))
                if end >= 0:
                    length = end + len(endmark) - off
                    if fmt == "png":
                        length += 4  # IEND chunk CRC
            hits.append((off, fmt, length))
            start = off + 1
    return sorted(hits)


@pandas_udf(CARVE_SCHEMA)
def carve_udf(data: pd.Series) -> pd.Series:
    return pd.Series(
        [
            [
                {"offset": o, "format": f, "length": ln}
                for o, f, ln in carve_payload(bytes(b))
            ]
            if b is not None
            else []
            for b in data
        ]
    )


def carve_files(df: DataFrame, *, payload_col: str = "payload", out_col: str = "carved") -> DataFrame:
    """Signature-scan a payload column for embedded files — the decode.js
    carve stage as a scan-side Arrow batch op. asNondeterministic pins
    one evaluation of the signature scan: the optimizer otherwise
    duplicates it below pushed-down filters on the carved column
    (two ArrowEvalPython nodes in the decode_carve_files plan;
    guide §4.4). The scan is pure."""
    return df.withColumn(
        out_col, carve_udf.asNondeterministic()(F.col(payload_col))
    )
