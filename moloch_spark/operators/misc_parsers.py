"""Remaining field-bearing parser scraps — ISIS PDU type, TDS login
user, RDP cookie user, DTLS server certificates — completing the
reference's field-extraction surface beyond the nineteen archetype
exemplars.

Reference parity:
- ISIS PDU-type labels: capture/parsers/isis.c:34-82 (byte 21 of the
  raw frame, the common-header PDU type).
- TDS 4.2 pre-login user: capture/parsers/tds.c:38-53,79-80 (classify
  magic 02 00 02 00 00 00 01 00, user at login-packet offset 39 with
  length byte at 69, lowercased, emitted once >=598 bytes buffered).
- RDP cookie user: capture/parsers/misc.c:22-33 (TPKT+X.224 CR with
  "Cookie: mstshash=" at offset 11, user to CRLF, lowercased).
- DTLS certificates: capture/parsers/dtls.c:101-257,259-323 (record
  type 22 walk, handshake type 11 Certificate, 3-byte chain/cert
  lengths, DER -> the same certsinfo fields as the TLS path; fragmented
  handshake messages skipped exactly like the reference).

All total functions: hostile input -> None/[] rather than raising.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from moloch_spark.operators.x509_parser import parse_certificate

_ISIS_TYPES = {
    15: "lan-l1-hello", 16: "lan-l2-hello", 17: "p2p-hello",
    18: "l1-lsp", 20: "l2-lsp", 24: "l1-csnp", 25: "l2-csnp",
    26: "l1-psnp", 27: "l2-psnp",
}


def isis_pdu_type(frame: bytes) -> str:
    """Raw frame -> ISIS PDU-type label (ref isis.c:41-80, including
    the err-len / unk-N fallbacks)."""
    if frame is None or len(frame) < 22:
        return f"err-len-{0 if frame is None else len(frame)}"
    t = frame[21]
    return _ISIS_TYPES.get(t, f"unk-{t}")


_TDS_MAGIC = b"\x02\x00\x02\x00\x00\x00\x01\x00"


def tds_login_user(stream: bytes) -> str | None:
    """TDS 4.2 client stream -> login user (ref tds.c: classify magic,
    then user at offset 39 / length byte 69 once 598 bytes arrive)."""
    if (
        not stream
        or len(stream) < 599
        or stream[: len(_TDS_MAGIC)] != _TDS_MAGIC
    ):
        return None
    ulen = stream[69]
    if ulen == 0 or 39 + ulen > len(stream):
        return None
    return stream[39 : 39 + ulen].decode("utf-8", "replace").rstrip("\x00").lower()


def rdp_cookie_user(stream: bytes) -> str | None:
    """TPKT/X.224 Connection Request -> mstshash cookie user
    (ref misc.c:22-33)."""
    if not stream or len(stream) <= 30:
        return None
    if not (stream[3] <= len(stream) and stream[4] == stream[3] - 5 and stream[5] == 0xE0):
        return None
    if stream[11:28] != b"Cookie: mstshash=":
        return None
    end = stream.find(b"\r\n", 28)
    if end < 0:
        return None
    return stream[28:end].decode("utf-8", "replace").lower()


def dtls_certificates(payload: bytes) -> list[dict]:
    """DTLS handshake datagram(s) -> parsed server certificates
    (ref dtls.c:259-323 record walk + 101-257 chain walk)."""
    out: list[dict] = []
    if not payload or payload[0] != 22:
        return out
    pos = 0
    n = len(payload)
    while pos + 13 <= n:
        # record: type(1) version(2) epoch(2) seq(6) length(2)
        tlen = int.from_bytes(payload[pos + 11 : pos + 13], "big")
        frag = payload[pos + 13 : pos + 13 + tlen]
        if len(frag) < tlen:
            break
        pos += 13 + tlen
        mp = 0
        while mp + 12 <= len(frag):
            htype = frag[mp]
            hlen = int.from_bytes(frag[mp + 1 : mp + 4], "big")
            frame_off = int.from_bytes(frag[mp + 6 : mp + 9], "big")
            mp += 12
            if frame_off != 0:  # fragmented: skipped like the reference
                mp += hlen
                continue
            if hlen > len(frag) - mp:
                break
            if htype == 11:  # Certificate
                body = frag[mp : mp + hlen]
                cp = 3  # skip 3-byte chain length
                while cp + 3 <= len(body):
                    clen = int.from_bytes(body[cp : cp + 3], "big")
                    der = body[cp + 3 : cp + 3 + clen]
                    if len(der) < clen:
                        break
                    try:
                        out.append(parse_certificate(der))
                    except (ValueError, IndexError):
                        break  # bad cert aborts the chain (ref bad_cert)
                    cp += 3 + clen
            mp += hlen
    return out


def encode_dtls_certificate_msg(ders: list[bytes]) -> bytes:
    """DER certs -> one DTLS record carrying a Certificate handshake
    message (test/gate synthesis helper)."""
    chain = b"".join(len(d).to_bytes(3, "big") + d for d in ders)
    body = len(chain).to_bytes(3, "big") + chain
    hs = (
        bytes([11]) + len(body).to_bytes(3, "big")
        + (0).to_bytes(2, "big")          # msgSeq
        + (0).to_bytes(3, "big")          # fragOffset
        + len(body).to_bytes(3, "big")    # fragLength
        + body
    )
    return (
        bytes([22]) + b"\xfe\xfd" + (0).to_bytes(2, "big")
        + (0).to_bytes(6, "big") + len(hs).to_bytes(2, "big") + hs
    )


def encode_tds_login(*, user: str) -> bytes:
    """Minimal TDS 4.2 login stream matching the parser's offsets."""
    buf = bytearray(600)
    buf[: len(_TDS_MAGIC)] = _TDS_MAGIC
    ub = user.encode()[:30]
    buf[39 : 39 + len(ub)] = ub
    buf[69] = len(ub)
    return bytes(buf)


def encode_rdp_request(*, user: str) -> bytes:
    """TPKT + X.224 CR with an mstshash cookie."""
    cookie = b"Cookie: mstshash=" + user.encode() + b"\r\n"
    x224_len = 6 + len(cookie)
    tpkt_len = 11 + len(cookie)
    buf = bytearray(11)
    buf[0] = 3
    buf[3] = min(tpkt_len, 255)
    buf[4] = buf[3] - 5
    buf[5] = 0xE0
    return bytes(buf) + cookie + b"\x00" * 4


def misc_users_udf():
    """(tds_stream, rdp_stream) -> struct(tds_user, rdp_user)."""

    @F.pandas_udf("tds_user string, rdp_user string")
    def parse(tds: pd.Series, rdp: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tds_user": [
                    tds_login_user(bytes(v)) if v is not None else None for v in tds
                ],
                "rdp_user": [
                    rdp_cookie_user(bytes(v)) if v is not None else None for v in rdp
                ],
            }
        )

    return parse


def parse_misc_df(
    df: DataFrame, *, tds_col: str = "tds_payload", rdp_col: str = "rdp_payload"
) -> DataFrame:
    out = df.withColumn("_m", misc_users_udf()(F.col(tds_col), F.col(rdp_col)))
    return (
        out.withColumn("tds_user", F.col("_m.tds_user"))
        .withColumn("rdp_user", F.col("_m.rdp_user"))
        .drop("_m")
    )


def encode_misc_udf():
    """doc_id -> struct(tds, rdp) synthesized login payloads
    (gate-synthesis helper)."""

    @F.pandas_udf("tds binary, rdp binary")
    def synth(doc_id: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tds": [encode_tds_login(user=f"SA_User{d}") for d in doc_id],
                "rdp": [encode_rdp_request(user=f"Desk{d % 100}") for d in doc_id],
            }
        )

    return synth
