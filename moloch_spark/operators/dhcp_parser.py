"""DHCP (BOOTP) parser — seventh exemplar field extractor
(ref capture/parsers/dhcp.c:33-131: message type from option 53,
hostname from options 12/81, client MAC+OUI from the chaddr field and
option 61, transaction id as lowercase hex).

Binary fixed-header + options TLV walk. Classification mirrors the
reference: op 1/2, >= 256 bytes, magic cookie 63 82 53 63 at offset
236. Same Arrow-batched scan-side shape as the other parsers; hostile
input never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DHCP_SCHEMA = (
    "msg_type string, host string, mac string, oui string, "
    "xid string, parse_error string"
)

_EMPTY = {
    "msg_type": None, "host": None, "mac": None, "oui": None,
    "xid": None, "parse_error": None,
}

# ref dhcp.c:35-53 names[] table (option 53 value -> type name)
_TYPE_NAMES = (
    "", "DISCOVER", "OFFER", "REQUEST", "DECLINE", "ACK", "NAK",
    "RELEASE", "INFORM", "FORCERENEW", "LEASEQUERY", "LEASEUNASSIGNED",
    "LEASEUNKNOWN", "LEASEACTIVE", "BULKLEASEQUERY", "LEASEQUERYDONE",
    "ACTIVELEASEQUERY", "LEASEQUERYSTATUS", "TLS",
)

_MAGIC = b"\x63\x82\x53\x63"


def _mac(b: bytes) -> str:
    return ":".join(f"{x:02x}" for x in b)


def parse_dhcp(buf: bytes) -> dict:
    """BOOTP header + DHCP options -> typed fields (total function)."""
    out = dict(_EMPTY)
    try:
        if len(buf) < 256:
            raise ValueError("short packet")
        if buf[0] not in (1, 2):
            raise ValueError("not BOOTREQUEST/BOOTREPLY")
        if buf[236:240] != _MAGIC:
            raise ValueError("no DHCP magic cookie")
        # ref dhcp.c:63-66: hardware type 1 (ethernet) -> chaddr MAC+OUI
        if buf[1] == 1:
            out["mac"] = _mac(buf[28:34])
            out["oui"] = out["mac"][:8]
        # ref dhcp.c:69-73: xid rendered as bare hex
        out["xid"] = format(int.from_bytes(buf[4:8], "big"), "x")
        off = 240
        while off + 2 <= len(buf):
            t = buf[off]
            if t == 255:  # End option has no length
                break
            if t == 0:  # Pad option has no length either
                off += 1
                continue
            ln = buf[off + 1]
            body = buf[off + 2 : off + 2 + ln]
            if ln == 0 or len(body) < ln:
                break
            if t == 12:  # Host Name (lowercased, ref string_add_lower)
                out["host"] = body.decode("utf-8", "replace").lower()
            elif t == 53 and ln == 1 and body[0] < len(_TYPE_NAMES):
                out["msg_type"] = _TYPE_NAMES[body[0]] or None
            elif t == 61 and ln == 7 and body[0] == 1:
                # Client identifier, hardware type 1 -> MAC overrides chaddr
                out["mac"] = _mac(body[1:7])
                out["oui"] = out["mac"][:8]
            elif t == 81 and ln >= 3 and body[0] == 0:
                # FQDN, encoding 0 only (ref dhcp.c:112-121)
                out["host"] = body[3:].decode("utf-8", "replace").lower()
            off += 2 + ln
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_dhcp(
    *,
    msg_type: int = 1,
    host: str = "client-host",
    mac: bytes = b"\xaa\xbb\xcc\x00\x01\x02",
    xid: int = 0x1234,
) -> bytes:
    """Minimal valid BOOTREQUEST (test/gate synthesis helper)."""
    hdr = bytearray(236)
    hdr[0] = 1  # BOOTREQUEST
    hdr[1] = 1  # ethernet
    hdr[2] = 6  # hlen
    hdr[4:8] = xid.to_bytes(4, "big")
    hdr[28:34] = mac
    opts = bytearray(_MAGIC)
    opts += bytes([53, 1, msg_type])
    hb = host.encode()
    opts += bytes([12, len(hb)]) + hb
    opts += b"\xff"
    pkt = bytes(hdr) + bytes(opts)
    return pkt + b"\x00" * max(0, 300 - len(pkt))  # >= 256 like real traffic


def encode_dhcp_udf(**fixed):
    """(host_col, xid_col) -> packet bytes; MAC derives from xid so the
    oracle can predict it (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(host: pd.Series, xid: pd.Series) -> pd.Series:
        out = []
        for h, x in zip(host, xid):
            x = int(x)
            mac = bytes([0xAA, 0xBB, 0xCC]) + (x & 0xFFFFFF).to_bytes(3, "big")
            out.append(
                encode_dhcp(
                    host=str(h),
                    xid=x,
                    mac=mac,
                    msg_type=fixed.get("msg_type", 1),
                )
            )
        return pd.Series(out)

    return encode


def parse_dhcp_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "dhcp_"
) -> DataFrame:
    """Parse a DHCP payload column into typed dhcp_* field columns."""

    @F.pandas_udf(DHCP_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_dhcp(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_dhcp", parse(F.col(payload_col)))
    for name in ("msg_type", "host", "mac", "oui", "xid", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_dhcp.{name}"))
    return out.drop("_dhcp")
