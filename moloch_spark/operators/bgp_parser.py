"""BGP parser — sixteenth exemplar field extractor
(ref capture/parsers/bgp.c:24-46: 16-byte all-ones marker + message
type name from byte 18; the reference extracts only the type and uses a
periodic queue to force mid-save on long-lived BGP sessions).

Beyond the type we also surface the OPEN message's version / ASN /
hold-time / router-id (RFC 4271 fixed offsets) — the fields an analyst
actually pivots on. Hostile input never throws.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BGP_SCHEMA = (
    "msg_type string, open_version int, open_asn bigint, "
    "open_hold_time int, open_router_id string, parse_error string"
)

_EMPTY = {
    "msg_type": None, "open_version": None, "open_asn": None,
    "open_hold_time": None, "open_router_id": None, "parse_error": None,
}

_MARKER = b"\xff" * 16
# ref bgp.c:32 types[] (1-indexed)
_TYPES = (None, "OPEN", "UPDATE", "NOTIFICATION", "KEEPALIVE")


def parse_bgp(buf: bytes) -> dict:
    """One BGP message -> type (+ OPEN fields) (total function)."""
    out = dict(_EMPTY)
    try:
        if len(buf) < 19 or buf[:16] != _MARKER:
            raise ValueError("no BGP marker")
        t = buf[18]
        if not 0 < t < 5:
            raise ValueError(f"bad message type {t}")
        out["msg_type"] = _TYPES[t]
        if t == 1 and len(buf) >= 29:  # OPEN: ver(1) asn(2) hold(2) rid(4)
            out["open_version"] = buf[19]
            out["open_asn"] = int.from_bytes(buf[20:22], "big")
            out["open_hold_time"] = int.from_bytes(buf[22:24], "big")
            out["open_router_id"] = str(ipaddress.IPv4Address(buf[24:28]))
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_bgp_open(
    *, asn: int = 65001, hold_time: int = 180, router_id: str = "10.0.0.1"
) -> bytes:
    body = (
        bytes([4])
        + asn.to_bytes(2, "big")
        + hold_time.to_bytes(2, "big")
        + ipaddress.IPv4Address(router_id).packed
        + b"\x00"  # no optional params
    )
    total = 19 + len(body)
    return _MARKER + total.to_bytes(2, "big") + b"\x01" + body


def encode_bgp_keepalive() -> bytes:
    return _MARKER + (19).to_bytes(2, "big") + b"\x04"


def encode_bgp_udf(**fixed):
    """(asn_col, rid_num_col) -> OPEN bytes; router-id derives from the
    numeric column so the oracle predicts it (gate-synthesis)."""

    @F.pandas_udf("binary")
    def encode(asn: pd.Series, rid: pd.Series) -> pd.Series:
        out = []
        for a, r in zip(asn, rid):
            r = int(r)
            out.append(
                encode_bgp_open(
                    asn=int(a) & 0xFFFF,
                    hold_time=fixed.get("hold_time", 180),
                    router_id=str(
                        ipaddress.IPv4Address((10 << 24) | (r & 0xFFFFFF))
                    ),
                )
            )
        return pd.Series(out)

    return encode


def parse_bgp_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "bgp_"
) -> DataFrame:
    """Parse a BGP payload column into typed bgp_* field columns."""

    @F.pandas_udf(BGP_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_bgp(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_bgp", parse(F.col(payload_col)))
    for name in (
        "msg_type", "open_version", "open_asn", "open_hold_time",
        "open_router_id", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_bgp.{name}"))
    return out.drop("_bgp")
