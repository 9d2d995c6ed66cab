"""DNS protocol parser — the exemplar for the reference's 39 per-protocol
field extractors (ref capture/parsers/dns.c:522-687 dns_parser /
dns_process, plus the tests/pcap/dns-*.test golden expectations).

The reference parses DNS on the capture thread and accumulates
dns.host / dns.ip / dns.opcode / dns.status / dns.query.type fields
onto the session. Spark re-expression: wire-format messages (binary or
hex-string payloads, e.g. `decode_frames(...).payload_hex` of udp/53
traffic) stream through ONE Arrow-batched mapInPandas-style UDF that
does the byte-level parse — pointer-compressed names included — and
returns a typed struct. Parsing is pure per-row compute: it rides the
scan partitions, no shuffle, and at 100 TB parallelizes with the scan
exactly like the C parser parallelizes with capture threads.

Scope: header (id, QR, opcode, rcode), first question (qname, qtype,
qclass), all answer records with A/AAAA rdata as IP strings and
NS/CNAME/PTR/MX rdata as (compressed-)names — the record types the
reference's dns.c extracts into fields.
"""

from __future__ import annotations

import ipaddress
import struct

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RR type names as dns.c's qtype switch exposes them (dns.c:560-610)
QTYPES = {
    1: "A", 2: "NS", 5: "CNAME", 6: "SOA", 12: "PTR", 15: "MX",
    16: "TXT", 28: "AAAA", 33: "SRV", 255: "ANY",
}
QCLASSES = {1: "IN", 3: "CH", 4: "HS", 255: "ANY"}
OPCODES = {0: "QUERY", 1: "IQUERY", 2: "STATUS", 4: "NOTIFY", 5: "UPDATE"}
RCODES = {
    0: "NOERROR", 1: "FORMERR", 2: "SERVFAIL", 3: "NXDOMAIN",
    4: "NOTIMPL", 5: "REFUSED",
}

DNS_SCHEMA = (
    "dns_id bigint, qr boolean, opcode string, rcode string, "
    "qname string, qtype string, qclass string, "
    "answers array<struct<name string, rtype string, ttl bigint, rdata string>>, "
    "parse_error string"
)


def _read_name(buf: bytes, off: int, depth: int = 0) -> tuple[str, int]:
    """Parse a (possibly pointer-compressed) domain name; returns
    (name, next_offset). Compression loops are cut at depth 16 — the
    same defense dns.c applies to hostile packets."""
    if depth > 16:
        raise ValueError("compression loop")
    labels = []
    while True:
        if off >= len(buf):
            raise ValueError("truncated name")
        n = buf[off]
        if n == 0:
            off += 1
            break
        if n & 0xC0 == 0xC0:  # compression pointer
            if off + 1 >= len(buf):
                raise ValueError("truncated pointer")
            ptr = ((n & 0x3F) << 8) | buf[off + 1]
            tail, _ = _read_name(buf, ptr, depth + 1)
            labels.append(tail)
            off += 2
            break
        off += 1
        labels.append(buf[off : off + n].decode("ascii", "replace"))
        off += n
    return ".".join(x for x in labels if x), off


def parse_dns_message(buf: bytes) -> dict:
    """One wire-format DNS message -> field dict (None fields on error,
    with parse_error set — hostile input must never throw)."""
    out = {
        "dns_id": None, "qr": None, "opcode": None, "rcode": None,
        "qname": None, "qtype": None, "qclass": None,
        "answers": [], "parse_error": None,
    }
    try:
        if len(buf) < 12:
            raise ValueError("short header")
        dns_id, flags, qd, an, _ns, _ar = struct.unpack(">HHHHHH", buf[:12])
        out["dns_id"] = dns_id
        out["qr"] = bool(flags >> 15)
        opcode = (flags >> 11) & 0xF
        rcode = flags & 0xF
        out["opcode"] = OPCODES.get(opcode, str(opcode))
        out["rcode"] = RCODES.get(rcode, str(rcode))
        off = 12
        for i in range(qd):
            qname, off = _read_name(buf, off)
            if off + 4 > len(buf):
                raise ValueError("truncated question")
            qtype, qclass = struct.unpack(">HH", buf[off : off + 4])
            off += 4
            if i == 0:  # dns.c keeps the first question's fields
                out["qname"] = qname
                out["qtype"] = QTYPES.get(qtype, str(qtype))
                out["qclass"] = QCLASSES.get(qclass, str(qclass))
        answers = []
        for _ in range(an):
            name, off = _read_name(buf, off)
            if off + 10 > len(buf):
                raise ValueError("truncated answer")
            rtype, _rcls, ttl, rdlen = struct.unpack(">HHIH", buf[off : off + 10])
            off += 10
            rdata_raw = buf[off : off + rdlen]
            if len(rdata_raw) != rdlen:
                raise ValueError("truncated rdata")
            if rtype == 1 and rdlen == 4:
                rdata = str(ipaddress.IPv4Address(rdata_raw))
            elif rtype == 28 and rdlen == 16:
                rdata = str(ipaddress.IPv6Address(rdata_raw))
            elif rtype in (2, 5, 12):  # NS / CNAME / PTR
                if rdlen < 1:
                    raise ValueError("empty name rdata")
                # names legitimately point OUTSIDE rdata via compression,
                # but must CONSUME only rdata bytes — a read running past
                # off+rdlen means the record lied about its length and we
                # would be parsing the next record as rdata
                rdata, name_end = _read_name(buf, off)
                if name_end > off + rdlen:
                    raise ValueError("name rdata overruns rdlen")
            elif rtype == 15 and rdlen >= 3:  # MX: preference + exchange
                pref = struct.unpack(">H", rdata_raw[:2])[0]
                host, name_end = _read_name(buf, off + 2)
                if name_end > off + rdlen:
                    raise ValueError("MX exchange overruns rdlen")
                rdata = f"{pref} {host}"
            else:
                rdata = rdata_raw.hex()
            off += rdlen
            answers.append(
                {"name": name, "rtype": QTYPES.get(rtype, str(rtype)),
                 "ttl": ttl, "rdata": rdata}
            )
        out["answers"] = answers
    except (ValueError, struct.error) as exc:
        out["parse_error"] = str(exc)
    return out


def encode_dns_query(qname: str, *, dns_id: int = 0, qtype: int = 1) -> bytes:
    """Minimal wire-format query encoder (test/gate synthesis helper —
    the parser's golden tests also pin hand-built byte strings)."""
    hdr = struct.pack(">HHHHHH", dns_id, 0x0100, 1, 0, 0, 0)
    name = b"".join(
        bytes([len(l)]) + l.encode("ascii") for l in qname.split(".") if l
    ) + b"\x00"
    return hdr + name + struct.pack(">HH", qtype, 1)


def encode_dns_query_udf():
    """Batch wire-format query encoder UDF: (id_col, qname_col) -> binary,
    id = id % 65536, qtype=A. Built lazily — pandas_udf needs an active
    session to parse its return type. (Gate-synthesis helper — see
    queries_pcap.dns_parse_fields.)"""

    @F.pandas_udf("binary")
    def encode(eid: pd.Series, qname: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_dns_query(str(n), dns_id=int(i) % 65536)
                for i, n in zip(eid, qname)
            ]
        )

    return encode


def parse_dns(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    hex_input: bool = False,
    prefix: str = "dns_",
) -> DataFrame:
    """Parse a DNS payload column (binary, or hex string as produced by
    decode_frames' payload_hex) into typed columns. One Arrow batch in,
    one struct column out, then flattened with a prefix — the
    moloch-field naming (dns.qname -> dns_qname etc.)."""

    @F.pandas_udf(DNS_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        rows = []
        for v in col:
            if v is None:
                rows.append(parse_dns_message(b""))
            elif hex_input:
                try:
                    rows.append(parse_dns_message(bytes.fromhex(str(v))))
                except ValueError:
                    rows.append(parse_dns_message(b""))
            else:
                rows.append(parse_dns_message(bytes(v)))
        return pd.DataFrame(rows)

    out = df.withColumn("_dns", parse(F.col(payload_col)))
    fields = [
        "dns_id", "qr", "opcode", "rcode", "qname", "qtype", "qclass",
        "answers", "parse_error",
    ]
    renames = {
        "dns_id": f"{prefix}id", "qr": f"{prefix}qr",
        "opcode": f"{prefix}opcode", "rcode": f"{prefix}rcode",
        "qname": f"{prefix}qname", "qtype": f"{prefix}qtype",
        "qclass": f"{prefix}qclass", "answers": f"{prefix}answers",
        "parse_error": f"{prefix}error",
    }
    for f_ in fields:
        out = out.withColumn(renames[f_], F.col(f"_dns.{f_}"))
    return out.drop("_dns")
