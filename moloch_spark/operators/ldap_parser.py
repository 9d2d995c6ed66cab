"""LDAP parser — eleventh exemplar field extractor
(ref capture/parsers/ldap.c:27-93: BindRequest walk over the BER
envelope — messageID, protocolOp; bind name with the <ROOT> sentinel
for empty DNs; auth type from the credentials tag, including the
Wireshark-derived NTLMSSP labels).

Reuses the DER TLV walker from the X.509 parser (same BER subset).
Hostile input never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moloch_spark.operators.x509_parser import _enc, _tlv

LDAP_SCHEMA = (
    "msg_id bigint, bind_name string, auth_type string, parse_error string"
)

_EMPTY = {
    "msg_id": None, "bind_name": None, "auth_type": None, "parse_error": None,
}

# ref ldap.c:71-90: credentials tag -> auth type label
_AUTH_BY_TAG = {3: "sasl", 10: "ntlmsspNegotiate", 11: "ntlmsspAuth"}


def parse_ldap(buf: bytes) -> dict:
    """LDAPMessage stream -> BindRequest fields (total function).
    Non-bind protocol ops classify as LDAP but contribute no fields,
    matching the reference (it only extracts from protocolOp 0)."""
    out = dict(_EMPTY)
    try:
        off = 0
        saw_message = False
        while off + 2 <= len(buf):
            tag, msg, off = _tlv(buf, off)
            if tag != 0x30:
                break
            # messageID: universal primitive INTEGER (ref itag != 2 check)
            itag, mid, ioff = _tlv(msg, 0)
            if itag != 0x02:
                break
            saw_message = True
            # protocolOp: application-class tag 0x60 + opcode
            ptag, op_body, _ = _tlv(msg, ioff)
            if ptag & 0xC0 != 0x40 or (ptag & 0x1F) > 25:
                break
            if ptag & 0x1F == 0:  # BindRequest
                out["msg_id"] = int.from_bytes(mid, "big")
                voff = 0
                _vt, _ver, voff = _tlv(op_body, voff)  # version
                _nt, name, voff = _tlv(op_body, voff)  # name
                out["bind_name"] = (
                    name.decode("utf-8", "replace") if name else "<ROOT>"
                )
                atag, auth, _ = _tlv(op_body, voff)  # authentication
                ctx = atag & 0x1F
                if ctx == 0:
                    out["auth_type"] = "simple" if auth else "none"
                else:
                    out["auth_type"] = _AUTH_BY_TAG.get(ctx, str(ctx))
        if not saw_message:
            raise ValueError("no LDAPMessage")
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def encode_ldap_bind(
    *,
    msg_id: int = 1,
    name: str = "cn=admin,dc=example,dc=com",
    password: str | None = "secret",
) -> bytes:
    """BindRequest LDAPMessage (test/gate synthesis helper).
    password None -> anonymous simple bind (empty credentials)."""
    cred = (password or "").encode()
    op = (
        _enc(0x02, b"\x03")  # version 3
        + _enc(0x04, name.encode())
        + _enc(0x80, cred)  # simple auth, context tag 0
    )
    body = _enc(0x02, msg_id.to_bytes((msg_id.bit_length() + 7) // 8 or 1, "big"))
    body += _enc(0x60, op)
    return _enc(0x30, body)


def encode_ldap_udf(**fixed):
    """(name_col, msgid_col) -> BindRequest bytes (gate-synthesis)."""

    @F.pandas_udf("binary")
    def encode(name: pd.Series, msgid: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_ldap_bind(
                    msg_id=int(m), name=str(n),
                    password=fixed.get("password", "secret"),
                )
                for n, m in zip(name, msgid)
            ]
        )

    return encode


def parse_ldap_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "ldap_"
) -> DataFrame:
    """Parse an LDAP payload column into typed ldap_* field columns."""

    @F.pandas_udf(LDAP_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_ldap(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_ldap", parse(F.col(payload_col)))
    for name in ("msg_id", "bind_name", "auth_type", "parse_error"):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_ldap.{name}"))
    return out.drop("_ldap")
