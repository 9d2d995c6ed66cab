"""Oracle TNS connect parser — fifteenth exemplar field extractor
(ref capture/parsers/oracle.c:26-68: CONNECT packet validation — u16
big-endian packet length at [0:2], connect-data length at byte 25 and
offset at byte 27 must sum to the packet length — then HOST= / USER= /
SERVICE_NAME= items pulled from the (KEY=value) connect string,
lowercased).

Same Arrow-batched scan-side shape as the other parsers; hostile input
never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TNS_SCHEMA = (
    "host string, user string, service_name string, parse_error string"
)

_EMPTY = {"host": None, "user": None, "service_name": None, "parse_error": None}


def _item(connect: str, key: str) -> str | None:
    i = connect.find(key)
    if i < 0:
        return None
    j = connect.find(")", i)
    if j <= i + len(key):
        return None
    return connect[i + len(key) : j].lower()


def parse_tns_connect(buf: bytes) -> dict:
    """TNS CONNECT packet -> host/user/service fields (total function)."""
    out = dict(_EMPTY)
    try:
        if len(buf) <= 27:
            raise ValueError("short packet")
        if (buf[0] << 8 | buf[1]) != len(buf):
            raise ValueError("length field != packet size")
        dlen, doff = buf[25], buf[27]
        if dlen + doff != len(buf):
            raise ValueError("connect-data bounds mismatch")
        connect = buf[doff : doff + dlen].decode("utf-8", "replace")
        out["host"] = _item(connect, "HOST=")
        out["user"] = _item(connect, "USER=")
        out["service_name"] = _item(connect, "SERVICE_NAME=")
        if not (out["host"] or out["user"] or out["service_name"]):
            raise ValueError("no connect items")
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_tns_connect(
    *,
    host: str = "db01.example",
    user: str = "scott",
    service: str = "orclpdb",
) -> bytes:
    """Minimal CONNECT packet (test/gate synthesis helper)."""
    connect = (
        f"(DESCRIPTION=(ADDRESS=(HOST={host})(PORT=1521))"
        f"(CONNECT_DATA=(USER={user})(SERVICE_NAME={service})))"
    ).encode()
    doff = 34  # header(8) + connect fields padding up to the data
    total = doff + len(connect)
    if len(connect) > 255 or total > 0xFFFF or doff > 255:
        raise ValueError("connect string too long for the 1-byte fields")
    hdr = bytearray(doff)
    hdr[0], hdr[1] = total >> 8, total & 0xFF
    hdr[4] = 1  # packet type CONNECT
    hdr[25] = len(connect)
    hdr[27] = doff
    return bytes(hdr) + connect


def encode_tns_udf(**fixed):
    """(user_col, service_col) -> CONNECT bytes (gate-synthesis)."""

    @F.pandas_udf("binary")
    def encode(user: pd.Series, service: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_tns_connect(
                    host=fixed.get("host", "db01.example"),
                    user=str(u), service=str(s),
                )
                for u, s in zip(user, service)
            ]
        )

    return encode


def parse_tns_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "tns_"
) -> DataFrame:
    """Parse a TNS payload column into typed tns_* field columns."""

    @F.pandas_udf(TNS_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [
                parse_tns_connect(bytes(v)) if v is not None else dict(_EMPTY)
                for v in col
            ]
        )

    out = df.withColumn("_tns", parse(F.col(payload_col)))
    for name in ("host", "user", "service_name", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_tns.{name}"))
    return out.drop("_tns")
