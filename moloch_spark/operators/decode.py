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


def http_body(col: Column) -> Column:
    """Extract the body after the header terminator CRLFCRLF (the
    http-parser body-extraction path, simplified to the split): built-in
    string ops, no UDF."""
    s = col.cast("string")
    idx = F.instr(s, "\r\n\r\n")
    return F.when(idx > 0, F.substring(s, idx + 4, 2_000_000_000)).otherwise(s)


def decode_pipeline(df: DataFrame, payload_col: str, stages: list[str]) -> DataFrame:
    """Apply named stages in order: 'base64', 'gzip', 'http_body'."""
    out = F.col(payload_col)
    for s in stages:
        if s == "base64":
            out = unbase64(out.cast("string"))
        elif s == "gzip":
            out = gunzip_udf(out.cast("binary"))
        elif s == "http_body":
            out = http_body(out).cast("binary")
        else:
            raise ValueError(f"unknown decode stage {s!r}")
    return df.withColumn(payload_col, out)
