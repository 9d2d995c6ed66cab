"""X.509 certificate field extraction — the certsinfo surface
(ref capture/parsers/certs.c + capture/field.c certsinfo_add: moloch
fills cert.serial / cert.issuer.cn / cert.subject.cn / cert.alt /
cert.notbefore / cert.notafter / cert.hash per TLS session).

Pure DER TLV walking — serial, issuer/subject CN+O, validity times,
subjectAltName DNS entries, md5 digest — no crypto library required
(we extract identity fields, we do not verify signatures). Arrow-batched
like the other parsers; hostile input never throws.
"""

from __future__ import annotations

import datetime as dt
import hashlib

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

X509_SCHEMA = (
    "serial string, issuer_cn string, issuer_org string, "
    "subject_cn string, subject_org string, "
    "not_before timestamp, not_after timestamp, "
    "alt_names array<string>, digest_md5 string, parse_error string"
)

_OID_CN = bytes.fromhex("550403")  # 2.5.4.3 commonName
_OID_O = bytes.fromhex("55040a")  # 2.5.4.10 organizationName
_OID_SAN = bytes.fromhex("551d11")  # 2.5.29.17 subjectAltName

_EMPTY = {
    "serial": None, "issuer_cn": None, "issuer_org": None,
    "subject_cn": None, "subject_org": None,
    "not_before": None, "not_after": None,
    "alt_names": [], "digest_md5": None, "parse_error": None,
}


def _tlv(buf: bytes, off: int) -> tuple[int, bytes, int]:
    """One DER TLV at off -> (tag, value, next_offset)."""
    if off + 2 > len(buf):
        raise ValueError("truncated TLV header")
    tag = buf[off]
    ln = buf[off + 1]
    off += 2
    if ln & 0x80:
        n = ln & 0x7F
        if n == 0 or n > 4 or off + n > len(buf):
            raise ValueError("bad long-form length")
        ln = int.from_bytes(buf[off : off + n], "big")
        off += n
    if off + ln > len(buf):
        raise ValueError("truncated TLV value")
    return tag, buf[off : off + ln], off + ln


def _walk_name(name_der: bytes) -> dict[bytes, str]:
    """RDNSequence -> {oid_bytes: string_value} (first value per OID)."""
    out: dict[bytes, str] = {}
    off = 0
    while off < len(name_der):
        _tag, rdn_set, off = _tlv(name_der, off)  # SET
        soff = 0
        while soff < len(rdn_set):
            _t2, atv, soff = _tlv(rdn_set, soff)  # SEQ { OID, value }
            t3, oid, voff = _tlv(atv, 0)
            if t3 != 0x06:
                continue
            _t4, val, _ = _tlv(atv, voff)
            out.setdefault(bytes(oid), val.decode("utf-8", "replace"))
    return out


def _parse_time(tag: int, val: bytes) -> dt.datetime:
    s = val.decode("ascii")
    if tag == 0x17:  # UTCTime YYMMDDHHMMSSZ
        yy = int(s[:2])
        year = 2000 + yy if yy < 50 else 1900 + yy
        s = f"{year}{s[2:]}"
    return dt.datetime.strptime(s.rstrip("Z"), "%Y%m%d%H%M%S")


def parse_certificate(der: bytes) -> dict:
    """One DER certificate -> certsinfo field dict."""
    out = dict(_EMPTY)
    try:
        _tag, cert, _ = _tlv(der, 0)  # Certificate SEQUENCE
        tag, tbs, _ = _tlv(cert, 0)  # tbsCertificate
        off = 0
        tag, first, noff = _tlv(tbs, off)
        if tag == 0xA0:  # explicit version present
            off = noff
            tag, first, noff = _tlv(tbs, off)
        if tag != 0x02:
            raise ValueError("no serialNumber")
        ser = first[1:] if len(first) > 1 and first[0] == 0 else first  # DER sign pad
        out["serial"] = ser.hex()
        off = noff
        _tag, _sigalg, off = _tlv(tbs, off)  # signature AlgorithmIdentifier
        _tag, issuer, off = _tlv(tbs, off)
        iss = _walk_name(issuer)
        out["issuer_cn"] = iss.get(_OID_CN)
        out["issuer_org"] = iss.get(_OID_O)
        _tag, validity, off = _tlv(tbs, off)
        t1, nb, v2 = _tlv(validity, 0)
        t2, na, _ = _tlv(validity, v2)
        out["not_before"] = _parse_time(t1, nb)
        out["not_after"] = _parse_time(t2, na)
        _tag, subject, off = _tlv(tbs, off)
        sub = _walk_name(subject)
        out["subject_cn"] = sub.get(_OID_CN)
        out["subject_org"] = sub.get(_OID_O)
        # optional trailing fields: spki, [1]/[2] unique ids, [3] extensions
        alt: list[str] = []
        while off < len(tbs):
            tag, val, off = _tlv(tbs, off)
            if tag != 0xA3:
                continue
            _t, exts, _ = _tlv(val, 0)  # SEQUENCE OF Extension
            eoff = 0
            while eoff < len(exts):
                _te, ext, eoff = _tlv(exts, eoff)
                to, oid, o2 = _tlv(ext, 0)
                if to != 0x06 or bytes(oid) != _OID_SAN:
                    continue
                tn, nxt, o3 = _tlv(ext, o2)
                if tn == 0x01:  # skip optional critical BOOLEAN
                    tn, nxt, o3 = _tlv(ext, o3)
                _to, names, _ = _tlv(nxt, 0)  # OCTET STRING wraps GeneralNames
                noff2 = 0
                while noff2 < len(names):
                    tg, gname, noff2 = _tlv(names, noff2)
                    if tg == 0x82:  # dNSName [2] IA5String
                        alt.append(gname.decode("ascii", "replace"))
        out["alt_names"] = alt
        out["digest_md5"] = hashlib.md5(der).hexdigest()
    except (ValueError, IndexError, UnicodeDecodeError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


def parse_x509(
    df: DataFrame,
    *,
    cert_col: str = "cert_der",
    prefix: str = "cert_",
) -> DataFrame:
    """Parse a DER-certificate binary column into typed cert_* columns."""

    @F.pandas_udf(X509_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_certificate(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_x509", parse(F.col(cert_col)))
    for name in (
        "serial", "issuer_cn", "issuer_org", "subject_cn", "subject_org",
        "not_before", "not_after", "alt_names", "digest_md5", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_x509.{name}"))
    return out.drop("_x509")


def encode_certificate_udf(**fixed):
    """Lazy pandas-UDF factory: (doc_id_col) -> DER cert with
    serial/subject/SAN derived from the id (gate-synthesis helper)."""

    @F.pandas_udf("binary")
    def encode(doc_id: pd.Series) -> pd.Series:
        return pd.Series(
            [
                encode_certificate(
                    serial=int(i),
                    subject_cn=f"doc{i}.example.com",
                    alt_names=(f"doc{i}.example.com", f"www.doc{i}.example.com"),
                    **fixed,
                )
                for i in doc_id
            ]
        )

    return encode


# ---------------------------------------------------------------------------
# DER encoder (test/gate synthesis helper)
# ---------------------------------------------------------------------------


def _enc(tag: int, val: bytes) -> bytes:
    n = len(val)
    if n < 0x80:
        return bytes([tag, n]) + val
    nb = (n.bit_length() + 7) // 8
    return bytes([tag, 0x80 | nb]) + n.to_bytes(nb, "big") + val


def _enc_name(cn: str, org: str | None = None) -> bytes:
    rdns = b""
    for oid, v in ((_OID_CN, cn), (_OID_O, org)):
        if v is None:
            continue
        atv = _enc(0x30, _enc(0x06, oid) + _enc(0x0C, v.encode()))
        rdns += _enc(0x31, atv)
    return _enc(0x30, rdns)


def encode_certificate(
    *,
    serial: int = 0x1234,
    issuer_cn: str = "Test CA",
    subject_cn: str = "example.com",
    subject_org: str | None = None,
    not_before: str = "240101000000",
    not_after: str = "260101000000",
    alt_names: tuple[str, ...] = (),
) -> bytes:
    """Minimal unsigned DER certificate for tests/gates."""
    ser = serial.to_bytes((serial.bit_length() + 8) // 8 or 1, "big")
    sigalg = _enc(0x30, _enc(0x06, bytes.fromhex("2a864886f70d01010b")))
    validity = _enc(0x30, _enc(0x17, (not_before + "Z").encode()) + _enc(0x17, (not_after + "Z").encode()))
    spki = _enc(0x30, sigalg + _enc(0x03, b"\x00\x00"))
    tbs_parts = [
        _enc(0xA0, _enc(0x02, b"\x02")),  # version v3
        _enc(0x02, ser),
        sigalg,
        _enc_name(issuer_cn),
        validity,
        _enc_name(subject_cn, subject_org),
        spki,
    ]
    if alt_names:
        gnames = b"".join(_enc(0x82, n.encode()) for n in alt_names)
        san_ext = _enc(
            0x30, _enc(0x06, _OID_SAN) + _enc(0x04, _enc(0x30, gnames))
        )
        tbs_parts.append(_enc(0xA3, _enc(0x30, san_ext)))
    tbs = _enc(0x30, b"".join(tbs_parts))
    return _enc(0x30, tbs + sigalg + _enc(0x03, b"\x00\x00"))
