"""Kerberos v5 parser — twelfth exemplar field extractor
(ref capture/parsers/krb5.c:37-142: AS-REQ / TGS-REQ walk — realm from
KDC-REQ-BODY[2], client/server principals from PrincipalName's
name-string sequence with two components joined by '/'; pvno must be 5,
msg-type 10 or 12).

DER/BER TLV walk over the heimdal k5.asn layout, reusing the X.509
parser's TLV primitive. UDP carries the bare APPLICATION tag; TCP
prefixes a 4-byte length (both accepted). Hostile input never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moloch_spark.operators.x509_parser import _enc, _tlv

KRB5_SCHEMA = (
    "msg_type string, realm string, cname string, sname string, "
    "parse_error string"
)

_EMPTY = {
    "msg_type": None, "realm": None, "cname": None, "sname": None,
    "parse_error": None,
}


def _ctx_fields(body: bytes, max_tag: int) -> dict[int, bytes]:
    """SEQUENCE of context-tagged members -> {ctx_tag: inner_value}."""
    out: dict[int, bytes] = {}
    off = 0
    while off + 2 <= len(body):
        tag, val, off = _tlv(body, off)
        ctx = tag & 0x1F
        if tag & 0xC0 == 0x80 and ctx <= max_tag and ctx not in out:
            out[ctx] = val
    return out


def _principal_name(der: bytes) -> str | None:
    """PrincipalName ::= SEQUENCE { [0] name-type, [1] SEQ OF GeneralString }.
    Components joined with '/' like the reference's 2-part snprintf."""
    tag, seq, _ = _tlv(der, 0)
    if tag != 0x30:
        return None
    members = _ctx_fields(seq, 1)
    if 1 not in members:
        return None
    tag, strs, _ = _tlv(members[1], 0)
    if tag != 0x30:
        return None
    parts = []
    off = 0
    while off + 2 <= len(strs):
        t, v, off = _tlv(strs, off)
        if t in (0x1B, 0x0C):  # GeneralString / UTF8String
            parts.append(v.decode("utf-8", "replace"))
    return "/".join(parts) if parts else None


_MSG_TYPES = {10: "AS-REQ", 12: "TGS-REQ"}


def parse_krb5(buf: bytes) -> dict:
    """KDC-REQ datagram (UDP) or 4-byte-length-prefixed record (TCP)
    -> realm / cname / sname fields (total function)."""
    out = dict(_EMPTY)
    try:
        if len(buf) >= 4 and buf[0] not in (0x6A, 0x6C):
            # TCP framing: u32 record length then the APPLICATION tag
            if int.from_bytes(buf[:4], "big") == len(buf) - 4:
                buf = buf[4:]
        if not buf or buf[0] not in (0x6A, 0x6C):  # APPLICATION 10 / 12
            raise ValueError("not a KDC-REQ")
        _tag, inner, _ = _tlv(buf, 0)
        tag, seq, _ = _tlv(inner, 0)
        if tag != 0x30:
            raise ValueError("KDC-REQ not a SEQUENCE")
        members = _ctx_fields(seq, 4)
        # pvno [1] must be 5, msg-type [2] 10/12 (ref krb5.c:126-134)
        if 1 not in members or 2 not in members:
            raise ValueError("missing pvno/msg-type")
        _t, pvno, _ = _tlv(members[1], 0)
        if not pvno or pvno[-1] != 5:
            raise ValueError("pvno != 5")
        _t, mt, _ = _tlv(members[2], 0)
        msg_type = mt[-1] if mt else 0
        if msg_type not in _MSG_TYPES:
            raise ValueError(f"msg-type {msg_type} not AS-REQ/TGS-REQ")
        out["msg_type"] = _MSG_TYPES[msg_type]
        if 4 not in members:
            return out
        tag, body, _ = _tlv(members[4], 0)  # req-body [4] SEQUENCE
        if tag != 0x30:
            return out
        b = _ctx_fields(body, 11)
        if 2 in b:  # realm [2]
            _t, realm, _ = _tlv(b[2], 0)
            out["realm"] = realm.decode("utf-8", "replace")
        if 1 in b:  # cname [1]
            out["cname"] = _principal_name(b[1])
        if 3 in b:  # sname [3]
            out["sname"] = _principal_name(b[3])
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def _enc_principal(name: str) -> bytes:
    comps = b"".join(_enc(0x1B, p.encode()) for p in name.split("/"))
    return _enc(
        0x30,
        _enc(0xA0, _enc(0x02, b"\x01"))  # name-type 1 (principal)
        + _enc(0xA1, _enc(0x30, comps)),
    )


def encode_as_req(
    *,
    cname: str = "alice",
    realm: str = "EXAMPLE.ORG",
    sname: str = "krbtgt/EXAMPLE.ORG",
    tcp: bool = False,
) -> bytes:
    """Minimal AS-REQ (test/gate synthesis helper)."""
    body = (
        _enc(0xA0, _enc(0x03, b"\x00\x00\x00\x00\x00"))  # kdc-options
        + _enc(0xA1, _enc_principal(cname))
        + _enc(0xA2, _enc(0x1B, realm.encode()))
        + _enc(0xA3, _enc_principal(sname))
        + _enc(0xA7, _enc(0x02, b"\x2a"))  # nonce
        + _enc(0xA8, _enc(0x30, _enc(0x02, b"\x12")))  # etype list
    )
    req = (
        _enc(0xA1, _enc(0x02, b"\x05"))  # pvno 5
        + _enc(0xA2, _enc(0x02, b"\x0a"))  # msg-type AS-REQ
        + _enc(0xA4, _enc(0x30, body))  # req-body
    )
    msg = _enc(0x6A, _enc(0x30, req))
    if tcp:
        return len(msg).to_bytes(4, "big") + msg
    return msg


def encode_krb5_udf(**fixed):
    """(cname_col, realm_col) -> AS-REQ bytes; sname defaults to
    krbtgt/<realm> so the oracle predicts it (gate-synthesis)."""

    @F.pandas_udf("binary")
    def encode(cname: pd.Series, realm: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_as_req(
                    cname=str(c), realm=str(r),
                    sname=fixed.get("sname", f"krbtgt/{r}"),
                    tcp=fixed.get("tcp", False),
                )
                for c, r in zip(cname, realm)
            ]
        )

    return encode


def parse_krb5_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "krb5_"
) -> DataFrame:
    """Parse a Kerberos payload column into typed krb5_* field columns."""

    @F.pandas_udf(KRB5_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_krb5(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_krb5", parse(F.col(payload_col)))
    for name in ("msg_type", "realm", "cname", "sname", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_krb5.{name}"))
    return out.drop("_krb5")
