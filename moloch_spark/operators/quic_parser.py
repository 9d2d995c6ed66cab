"""gQUIC parser — eighteenth exemplar field extractor
(ref capture/parsers/quic.c:38-216: the plaintext CHLO crypto-handshake
tag-value structure carries SNI, UAID (user agent), and VER; the Q046+
path validates the 'Q0xx' version marker then scans for the CHLO magic.
IETF QUIC (v1+) encrypts the Initial packet — protocol-label-only
there, like the reference's quic_5x path).

CHLO layout: 'CHLO', u16-LE tag count, 2 pad bytes, count x (4-byte
subtag, u32-LE end offset), then the packed value section — value i
spans [prev_end, end_i). Hostile input never throws.
"""

from __future__ import annotations

import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUIC_SCHEMA = (
    "version string, sni string, user_agent string, chlo_ver string, "
    "n_tags int, parse_error string"
)

_EMPTY = {
    "version": None, "sni": None, "user_agent": None, "chlo_ver": None,
    "n_tags": None, "parse_error": None,
}


def parse_chlo(buf: bytes) -> dict:
    """Parse from the CHLO magic onward (ref quic_chlo_parser)."""
    out = dict(_EMPTY)
    if buf[:4] != b"CHLO":
        raise ValueError("no CHLO magic")
    if len(buf) < 8:
        raise ValueError("truncated CHLO header")
    (n_tags,) = struct.unpack_from("<H", buf, 4)
    data_start = n_tags * 8 + 8
    if len(buf) < data_start:
        raise ValueError("truncated CHLO tag table")
    out["n_tags"] = n_tags
    prev = 0
    for i in range(n_tags):
        tag = buf[8 + i * 8 : 12 + i * 8]
        (end,) = struct.unpack_from("<I", buf, 12 + i * 8)
        if end < prev or data_start + end > len(buf):
            break
        val = buf[data_start + prev : data_start + end]
        if tag == b"SNI\x00":
            out["sni"] = val.decode("utf-8", "replace").lower()
        elif tag == b"UAID":
            out["user_agent"] = val.decode("utf-8", "replace")
        elif tag == b"VER\x00":
            out["chlo_ver"] = val.decode("utf-8", "replace")
        prev = end
    return out


def parse_quic(buf: bytes) -> dict:
    """Q046-48 datagram -> version + CHLO fields (total function)."""
    out = dict(_EMPTY)
    try:
        if len(buf) < 20 or buf[1:2] != b"Q" or (buf[0] & 0xC0) != 0xC0:
            raise ValueError("not a gQUIC long-header packet")
        ver = buf[2:5]
        if not ver.isdigit():
            raise ValueError("non-numeric version")
        out["version"] = "Q" + ver.decode()
        v = int(ver)
        if not 43 <= v <= 48:
            raise ValueError(f"unsupported gQUIC version {v}")
        idx = buf.find(b"CHLO", 5)
        if idx < 0:
            return out  # valid packet, handshake continues elsewhere
        out.update(
            {k: v for k, v in parse_chlo(buf[idx:]).items() if v is not None}
        )
    except (ValueError, IndexError, struct.error) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_chlo_packet(
    *,
    version: int = 46,
    sni: str = "site.example",
    user_agent: str = "app/1.0",
    chlo_ver: str = "Q046",
) -> bytes:
    """Q046-style datagram with an embedded CHLO (test/gate synthesis)."""
    tags = [
        (b"PAD\x00", b"\x00" * 8),
        (b"SNI\x00", sni.encode()),
        (b"UAID", user_agent.encode()),
        (b"VER\x00", chlo_ver.encode()),
    ]
    tags.sort(key=lambda t: t[0])  # gQUIC requires sorted tags
    table = b""
    values = b""
    end = 0
    for tag, val in tags:
        end += len(val)
        table += tag + struct.pack("<I", end)
        values += val
    chlo = b"CHLO" + struct.pack("<H", len(tags)) + b"\x00\x00" + table + values
    hdr = bytes([0xC3]) + f"Q{version:03d}".encode() + b"\x08" + b"\xaa" * 8
    return hdr + chlo


def encode_quic_udf(**fixed):
    """(sni_col, ua_col) -> datagram bytes (gate-synthesis)."""

    @F.pandas_udf("binary")
    def encode(sni: pd.Series, ua: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_chlo_packet(
                    version=fixed.get("version", 46),
                    sni=str(s), user_agent=str(u),
                )
                for s, u in zip(sni, ua)
            ]
        )

    return encode


def parse_quic_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "quic_"
) -> DataFrame:
    """Parse a gQUIC payload column into typed quic_* field columns."""

    @F.pandas_udf(QUIC_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_quic(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_q", parse(F.col(payload_col)))
    for name in (
        "version", "sni", "user_agent", "chlo_ver", "n_tags", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_q.{name}"))
    return out.drop("_q")
