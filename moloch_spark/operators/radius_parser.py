"""RADIUS parser — tenth exemplar field extractor
(ref capture/parsers/radius.c:24-90: AVP walk over the 20-byte header —
User-Name (1), Framed-IP-Address (8), Calling-Station-Id (31, the
dashed MAC rendered as lowercase colon-hex), NAS-Identifier-style
endpoint ip from attribute 66 (Tunnel-Server-Endpoint)).

Binary header + AVP TLV walk where each AVP length INCLUDES its own
type/length bytes (min 3). Classification mirrors the reference: the
u16 at offset 2 must equal the datagram length. Hostile input never
throws.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RADIUS_SCHEMA = (
    "code int, user string, mac string, framed_ip string, "
    "endpoint_ip string, parse_error string"
)

_EMPTY = {
    "code": None, "user": None, "mac": None,
    "framed_ip": None, "endpoint_ip": None, "parse_error": None,
}


def parse_radius(buf: bytes) -> dict:
    """RADIUS datagram -> typed AVP fields (total function)."""
    out = dict(_EMPTY)
    try:
        if len(buf) < 20:
            raise ValueError("short datagram")
        if int.from_bytes(buf[2:4], "big") != len(buf):
            raise ValueError("length field != datagram size")
        out["code"] = buf[0]
        off = 20  # code(1) id(1) length(2) authenticator(16)
        while off + 2 < len(buf):
            t = buf[off]
            ln = buf[off + 1]
            if ln < 3:  # AVP length includes type+length bytes
                break
            body = buf[off + 2 : off + ln]
            if len(body) < ln - 2:
                break
            if t == 1:  # User-Name
                out["user"] = body.decode("utf-8", "replace")
            elif t == 8 and len(body) == 4:  # Framed-IP-Address
                out["framed_ip"] = str(ipaddress.IPv4Address(body))
            elif t == 31 and len(body) == 12:
                # Calling-Station-Id as 12 hex chars -> aa:bb:cc:dd:ee:ff
                s = body.decode("ascii", "replace").lower()
                out["mac"] = ":".join(s[i : i + 2] for i in range(0, 12, 2))
            elif t == 66:  # Tunnel-Server-Endpoint (textual ip)
                out["endpoint_ip"] = body.decode("utf-8", "replace")
            off += ln
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def _avp(t: int, body: bytes) -> bytes:
    return bytes([t, len(body) + 2]) + body


def encode_radius(
    *,
    code: int = 1,
    user: str = "alice",
    framed_ip: str = "10.0.0.1",
    mac_hex: str = "aabbcc001122",
    endpoint_ip: str = "192.0.2.1",
) -> bytes:
    """Minimal Access-Request datagram (test/gate synthesis helper)."""
    avps = (
        _avp(1, user.encode())
        + _avp(8, ipaddress.IPv4Address(framed_ip).packed)
        + _avp(31, mac_hex.encode()[:12])
        + _avp(66, endpoint_ip.encode())
    )
    total = 20 + len(avps)
    return (
        bytes([code, 0x42]) + total.to_bytes(2, "big") + b"\x00" * 16 + avps
    )


def encode_radius_udf(**fixed):
    """(user_col, ip_num_col) -> datagram bytes; framed ip and MAC both
    derive from the numeric column so the oracle predicts them
    (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(user: pd.Series, ipnum: pd.Series) -> pd.Series:
        out = []
        for u, n in zip(user, ipnum):
            n = int(n)
            framed = str(ipaddress.IPv4Address((10 << 24) | (n & 0xFFFFFF)))
            mac_hex = f"aabbcc{n & 0xFFFFFF:06x}"
            out.append(
                encode_radius(
                    code=fixed.get("code", 1),
                    user=str(u),
                    framed_ip=framed,
                    mac_hex=mac_hex,
                    endpoint_ip=fixed.get("endpoint_ip", "192.0.2.1"),
                )
            )
        return pd.Series(out)

    return encode


def parse_radius_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "radius_"
) -> DataFrame:
    """Parse a RADIUS payload column into typed radius_* field columns."""

    @F.pandas_udf(RADIUS_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_radius(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_radius", parse(F.col(payload_col)))
    for name in ("code", "user", "mac", "framed_ip", "endpoint_ip", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_radius.{name}"))
    return out.drop("_radius")
