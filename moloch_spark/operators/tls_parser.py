"""TLS ClientHello parser + JA3 fingerprint — third exemplar protocol
field extractor (ref capture/parsers/tls.c: hello parse filling
tls.version / tls.cipher / tls.ja3 and the hostname from SNI).

JA3 is the public Salesforce algorithm: md5 over
"version,ciphers,extensions,curves,pointformats" (decimal, dashes
within a field, GREASE values excluded). Byte-level parse over one
Arrow-batched UDF, hostile input never throws — same scan-parallel
shape as dns_parser/http_parser.
"""

from __future__ import annotations

import hashlib
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TLS_SCHEMA = (
    "record_version string, client_version string, sni string, "
    "ciphers array<bigint>, extensions array<bigint>, "
    "alpn array<string>, ja3_string string, ja3 string, parse_error string"
)

_VERSIONS = {0x0301: "TLSv1.0", 0x0302: "TLSv1.1", 0x0303: "TLSv1.2", 0x0304: "TLSv1.3"}

_GREASE = {0x0A0A + 0x1010 * i for i in range(16)}

_EMPTY = {
    "record_version": None, "client_version": None, "sni": None,
    "ciphers": [], "extensions": [], "alpn": [],
    "ja3_string": None, "ja3": None, "parse_error": None,
}


def _ver(v: int) -> str:
    return _VERSIONS.get(v, f"0x{v:04x}")


def parse_client_hello(buf: bytes) -> dict:
    """One TLS record carrying a ClientHello -> field dict + JA3."""
    out = dict(_EMPTY)
    try:
        if len(buf) < 9 or buf[0] != 0x16:
            raise ValueError("not a handshake record")
        out["record_version"] = _ver(struct.unpack(">H", buf[1:3])[0])
        if buf[5] != 0x01:
            raise ValueError("not a ClientHello")
        client_version = struct.unpack(">H", buf[9:11])[0]
        out["client_version"] = _ver(client_version)
        off = 11 + 32  # skip random
        sid_len = buf[off]
        off += 1 + sid_len
        (cs_len,) = struct.unpack(">H", buf[off : off + 2])
        off += 2
        ciphers = [
            struct.unpack(">H", buf[off + i : off + i + 2])[0]
            for i in range(0, cs_len, 2)
        ]
        off += cs_len
        comp_len = buf[off]
        off += 1 + comp_len
        exts, curves, fmts, alpn, sni = [], [], [], [], None
        if off + 2 <= len(buf):
            (ext_total,) = struct.unpack(">H", buf[off : off + 2])
            off += 2
            end = min(off + ext_total, len(buf))
            while off + 4 <= end:
                etype, elen = struct.unpack(">HH", buf[off : off + 4])
                off += 4
                data = buf[off : off + elen]
                if len(data) != elen:
                    raise ValueError("truncated extension")
                off += elen
                exts.append(etype)
                if etype == 0 and len(data) >= 5:  # server_name
                    (nlen,) = struct.unpack(">H", data[3:5])
                    sni = data[5 : 5 + nlen].decode("ascii", "replace")
                elif etype == 10 and len(data) >= 2:  # supported_groups
                    (glen,) = struct.unpack(">H", data[:2])
                    curves = [
                        struct.unpack(">H", data[2 + i : 4 + i])[0]
                        for i in range(0, min(glen, len(data) - 2), 2)
                    ]
                elif etype == 11 and len(data) >= 1:  # ec_point_formats
                    fmts = list(data[1 : 1 + data[0]])
                elif etype == 16 and len(data) >= 2:  # ALPN
                    p = 2
                    while p < len(data):
                        plen = data[p]
                        alpn.append(data[p + 1 : p + 1 + plen].decode("ascii", "replace"))
                        p += 1 + plen
        out["sni"] = sni
        out["ciphers"] = [c for c in ciphers if c not in _GREASE]
        out["extensions"] = [e for e in exts if e not in _GREASE]
        out["alpn"] = alpn
        ja3 = ",".join(
            [
                str(client_version),
                "-".join(str(c) for c in out["ciphers"]),
                "-".join(str(e) for e in out["extensions"]),
                "-".join(str(c) for c in curves if c not in _GREASE),
                "-".join(str(f) for f in fmts),
            ]
        )
        out["ja3_string"] = ja3
        out["ja3"] = hashlib.md5(ja3.encode()).hexdigest()
    except (ValueError, IndexError, struct.error) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_client_hello(
    *,
    version: int = 0x0303,
    ciphers: list[int] = (0x1301, 0x1302, 0x002F),
    sni: str | None = None,
    curves: list[int] = (29, 23),
    point_formats: list[int] = (0,),
    alpn: list[str] = (),
) -> bytes:
    """Minimal ClientHello encoder (test/gate synthesis helper)."""
    exts = b""
    if sni is not None:
        name = sni.encode()
        data = struct.pack(">HBH", len(name) + 3, 0, len(name)) + name
        exts += struct.pack(">HH", 0, len(data)) + data
    gdata = struct.pack(">H", len(curves) * 2) + b"".join(
        struct.pack(">H", c) for c in curves
    )
    exts += struct.pack(">HH", 10, len(gdata)) + gdata
    fdata = bytes([len(point_formats)]) + bytes(point_formats)
    exts += struct.pack(">HH", 11, len(fdata)) + fdata
    if alpn:
        plist = b"".join(bytes([len(p)]) + p.encode() for p in alpn)
        adata = struct.pack(">H", len(plist)) + plist
        exts += struct.pack(">HH", 16, len(adata)) + adata
    body = (
        struct.pack(">H", version)
        + b"\x00" * 32  # random
        + b"\x00"  # session id len
        + struct.pack(">H", len(ciphers) * 2)
        + b"".join(struct.pack(">H", c) for c in ciphers)
        + b"\x01\x00"  # one compression method: null
        + struct.pack(">H", len(exts))
        + exts
    )
    hs = b"\x01" + struct.pack(">I", len(body))[1:] + body
    return b"\x16" + struct.pack(">H", 0x0301) + struct.pack(">H", len(hs)) + hs


def encode_client_hello_udf(**kwargs):
    """Lazy pandas-UDF factory: (sni_col) -> binary ClientHello with the
    given fixed config (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(sni: pd.Series) -> pd.Series:
        return pd.Series([encode_client_hello(sni=str(s), **kwargs) for s in sni])

    return encode


def parse_tls(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    hex_input: bool = False,
    prefix: str = "tls_",
) -> DataFrame:
    """Parse a TLS payload column into typed tls_* field columns."""

    @F.pandas_udf(TLS_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        rows = []
        for v in col:
            if v is None:
                rows.append(parse_client_hello(b""))
            elif hex_input:
                try:
                    rows.append(parse_client_hello(bytes.fromhex(str(v))))
                except ValueError:
                    rows.append(parse_client_hello(b""))
            else:
                rows.append(parse_client_hello(bytes(v)))
        return pd.DataFrame(rows)

    out = df.withColumn("_tls", parse(F.col(payload_col)))
    for name in (
        "record_version", "client_version", "sni", "ciphers", "extensions",
        "alpn", "ja3_string", "ja3", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_tls.{name}"))
    return out.drop("_tls")
