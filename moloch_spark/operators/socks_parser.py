"""SOCKS 4/4a/5 parser — ninth exemplar field extractor
(ref capture/parsers/socks.c: destination ip/host/port + username from
the client-side handshake; SOCKS4 fixed request with NUL-terminated
user and 4a hostname, SOCKS5 method/auth/CONNECT state machine with
IPv4 / domain / IPv6 address types).

The reference walks both directions of a live TCP session; here the
operator parses the CLIENT stream (requests) — the field surface
(socks.ip, socks.host, socks.port, socks.user) comes entirely from
requests. Hostile input never throws.
"""

from __future__ import annotations

import ipaddress

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOCKS_SCHEMA = (
    "version int, dst_ip string, dst_host string, dst_port int, "
    "user string, parse_error string"
)

_EMPTY = {
    "version": None, "dst_ip": None, "dst_host": None,
    "dst_port": None, "user": None, "parse_error": None,
}


def _parse_socks4(buf: bytes, out: dict) -> None:
    # VN=4 CD=1 port(2) ip(4) user... NUL [host... NUL for 4a]
    if len(buf) < 9 or buf[1] != 1:
        raise ValueError("short/odd SOCKS4 request")
    out["version"] = 4
    out["dst_port"] = int.from_bytes(buf[2:4], "big")
    ip = buf[4:8]
    nul = buf.find(b"\x00", 8)
    if nul < 0:
        raise ValueError("unterminated SOCKS4 user")
    if nul > 8:
        out["user"] = buf[8:nul].decode("utf-8", "replace")
    if ip[:3] == b"\x00\x00\x00" and ip[3] != 0:
        # SOCKS4a: invalid ip 0.0.0.x, hostname follows the user field
        end = buf.find(b"\x00", nul + 1)
        if end < 0:
            raise ValueError("unterminated SOCKS4a host")
        out["dst_host"] = buf[nul + 1 : end].decode("utf-8", "replace").lower()
    else:
        out["dst_ip"] = str(ipaddress.IPv4Address(ip))


def _parse_socks5(buf: bytes, out: dict) -> None:
    out["version"] = 5
    # greeting: VER NMETHODS methods...
    if len(buf) < 2:
        raise ValueError("short SOCKS5 greeting")
    n = buf[1]
    off = 2 + n
    if len(buf) < off:
        raise ValueError("truncated method list")
    # optional username/password auth (RFC 1929), ref USER_REQUEST state
    if off < len(buf) and buf[off] == 1 and off + 2 <= len(buf):
        ulen = buf[off + 1]
        upos = off + 2
        if upos + ulen + 1 <= len(buf):
            plen = buf[upos + ulen]
            if upos + ulen + 1 + plen <= len(buf):
                out["user"] = buf[upos : upos + ulen].decode("utf-8", "replace")
                off = upos + ulen + 1 + plen
    # CONNECT: VER=5 CMD=1 RSV=0 ATYP addr port (ref CONN_REQUEST state)
    if off + 6 > len(buf) or buf[off] != 5 or buf[off + 1] != 1 or buf[off + 2]:
        raise ValueError("no SOCKS5 CONNECT request")
    atyp = buf[off + 3]
    if atyp == 1:  # IPv4
        if off + 10 > len(buf):
            raise ValueError("truncated IPv4 CONNECT")
        out["dst_ip"] = str(ipaddress.IPv4Address(buf[off + 4 : off + 8]))
        out["dst_port"] = int.from_bytes(buf[off + 8 : off + 10], "big")
    elif atyp == 3:  # domain
        hlen = buf[off + 4]
        if off + 5 + hlen + 2 > len(buf):
            raise ValueError("truncated domain CONNECT")
        out["dst_host"] = (
            buf[off + 5 : off + 5 + hlen].decode("utf-8", "replace").lower()
        )
        out["dst_port"] = int.from_bytes(
            buf[off + 5 + hlen : off + 7 + hlen], "big"
        )
    elif atyp == 4:  # IPv6 (ref records port only after data flows; we
        # keep the address too — strictly more informative)
        if off + 22 > len(buf):
            raise ValueError("truncated IPv6 CONNECT")
        out["dst_ip"] = str(ipaddress.IPv6Address(buf[off + 4 : off + 20]))
        out["dst_port"] = int.from_bytes(buf[off + 20 : off + 22], "big")
    else:
        raise ValueError(f"bad ATYP {atyp}")


def parse_socks(buf: bytes) -> dict:
    """Client-side SOCKS stream -> destination + user fields (total)."""
    out = dict(_EMPTY)
    try:
        if not buf:
            raise ValueError("empty")
        if buf[0] == 4:
            _parse_socks4(buf, out)
        elif buf[0] == 5:
            _parse_socks5(buf, out)
        else:
            raise ValueError("not SOCKS")
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_socks5(
    *,
    host: str = "example.com",
    port: int = 443,
    user: str | None = None,
) -> bytes:
    """Client greeting [+ user/pass auth] + domain CONNECT
    (test/gate synthesis helper)."""
    hb = host.encode()[:255]
    msg = b"\x05\x01\x02" if user else b"\x05\x01\x00"
    if user:
        ub = user.encode()[:255]
        msg += b"\x01" + bytes([len(ub)]) + ub + b"\x00"  # empty password
    msg += b"\x05\x01\x00\x03" + bytes([len(hb)]) + hb + port.to_bytes(2, "big")
    return msg


def encode_socks4(
    *, ip: str = "10.1.2.3", port: int = 8080, user: str = "u"
) -> bytes:
    return (
        b"\x04\x01"
        + port.to_bytes(2, "big")
        + ipaddress.IPv4Address(ip).packed
        + user.encode()
        + b"\x00"
    )


def encode_socks5_udf(**fixed):
    """(host_col, port_col) -> stream bytes (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(host: pd.Series, port: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_socks5(
                    host=str(h), port=int(p) & 0xFFFF, user=fixed.get("user")
                )
                for h, p in zip(host, port)
            ]
        )

    return encode


def parse_socks_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "socks_"
) -> DataFrame:
    """Parse a SOCKS payload column into typed socks_* field columns."""

    @F.pandas_udf(SOCKS_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_socks(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_socks", parse(F.col(payload_col)))
    for name in ("version", "dst_ip", "dst_host", "dst_port", "user", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_socks.{name}"))
    return out.drop("_socks")
