"""SMB1/SMB2 parser — nineteenth exemplar field extractor
(ref capture/parsers/smb.c: NetBIOS-framed stream walk extracting
smb.share, smb.fn, smb.user, smb.domain, smb.host, smb.os, smb.ver).

Field surface mirrors the reference exactly (smb.c:599-650):
- SMB1 (\\xffSMB) requests: SESSION_SETUP_ANDX 0x73 (wordcount 13 ->
  NUL-split user/domain/os/ver, smb.c:200-235; wordcount 12 -> NTLMSSP
  AUTHENTICATE security blob -> domain/user/host, smb.c:84-148),
  TREE_CONNECT_ANDX 0x75 -> share (smb.c:306-326), NT_CREATE_ANDX
  0xa2 / OPEN_ANDX 0x2d / DELETE 0x06 -> filename (smb.c:283-305).
- SMB2 (\\xfeSMB) requests: TREE_CONNECT 0x03 -> share path,
  CREATE 0x05 -> filename (smb.c:382-475), both UCS-2LE.

The reference walks both live TCP directions with carry-over buffers;
here the operator parses the already-reassembled CLIENT stream (the
request side carries the whole field surface — replies are skipped by
the reference too via SMB1_FLAGS_REPLY / SMB2_FLAGS_SERVER_TO_REDIR).
Hostile input never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SMB_SCHEMA = (
    "versions array<string>, shares array<string>, filenames array<string>, "
    "user string, domain string, host string, os string, ver string, "
    "parse_error string"
)

_EMPTY = {
    "versions": [], "shares": [], "filenames": [],
    "user": None, "domain": None, "host": None, "os": None, "ver": None,
    "parse_error": None,
}

SMB1_FLAGS_REPLY = 0x80
SMB1_FLAGS2_UNICODE = 0x8000
SMB2_FLAGS_SERVER_TO_REDIR = 0x00000001


def _decode(buf: bytes, unicode_: bool) -> str:
    if unicode_:
        return buf.decode("utf-16-le", "replace").rstrip("\x00")
    return buf.decode("utf-8", "replace").rstrip("\x00")


def _asn_tlv(buf: bytes, pos: int):
    """Minimal DER TLV read -> (tag_number, value_bytes, next_pos).
    Mirrors moloch_parsers_asn_get_tlv (ref capture/parsers.c)."""
    if pos + 2 > len(buf):
        raise ValueError("short TLV")
    tag = buf[pos] & 0x1F
    pos += 1
    if tag == 0x1F:
        raise ValueError("long-form tag unsupported")
    ln = buf[pos]
    pos += 1
    if ln & 0x80:
        n = ln & 0x7F
        if n > 4 or pos + n > len(buf):
            raise ValueError("bad TLV length")
        ln = int.from_bytes(buf[pos : pos + n], "big")
        pos += n
    if pos + ln > len(buf):
        raise ValueError("TLV overruns buffer")
    return tag, buf[pos : pos + ln], pos + ln


def _security_blob(blob: bytes, out: dict) -> None:
    """SPNEGO-wrapped NTLMSSP AUTHENTICATE -> domain/user/host
    (ref smb.c:84-148, [MS-NLMP] 2.2.1.3)."""
    value = blob
    for want in (1, 16, 2):  # negTokenResp -> SEQUENCE -> responseToken
        tag, value, _ = _asn_tlv(value, 0)
        if tag != want:
            raise ValueError(f"SPNEGO tag {tag} != {want}")
    tag, value, _ = _asn_tlv(value, 0)
    if tag != 4 or not value.startswith(b"NTLMSSP\x00"):
        raise ValueError("no NTLMSSP token")
    if len(value) < 12 or int.from_bytes(value[8:12], "little") != 3:
        return  # not AUTHENTICATE
    pos = 12
    fields = []
    for _ in range(6):  # LM, NT, domain, user, host, sessionkey
        if pos + 8 > len(value):
            raise ValueError("short NTLMSSP field row")
        ln = int.from_bytes(value[pos : pos + 2], "little")
        off = int.from_bytes(value[pos + 4 : pos + 8], "little")
        if off + ln > len(value):
            raise ValueError("bad NTLMSSP offsets")
        fields.append(value[off : off + ln])
        pos += 8
    for idx, key in ((2, "domain"), (3, "user"), (4, "host")):
        if fields[idx] and out[key] is None:
            out[key] = _decode(fields[idx], True)


def _smb1_pdu(pdu: bytes, out: dict) -> None:
    """One SMB1 message (starting at \\xffSMB) — requests only."""
    if len(pdu) < 32:
        raise ValueError("short SMB1 header")
    cmd = pdu[4]
    flags = pdu[9]
    flags2 = int.from_bytes(pdu[10:12], "little")
    uni = bool(flags2 & SMB1_FLAGS2_UNICODE)
    if flags & SMB1_FLAGS_REPLY:
        return
    body = pdu[32:]
    if not body:
        return
    wordcount = body[0]
    if cmd in (0x06, 0x2D, 0xA2):  # DELETE / OPEN_ANDX / NT_CREATE_ANDX
        # skip words + bytecount(2) + (the reference's fixed +1 pad)
        p = 1 + wordcount * 2 + 3
        if p < len(body):
            name = _decode(body[p:], uni)
            if name:
                out["filenames"].append(name)
    elif cmd == 0x75:  # TREE_CONNECT_ANDX ([MS-CIFS] 2.2.4.55: words =
        # AndXCommand(1) AndXReserved(1) AndXOffset(2) Flags(2)
        # PasswordLength(2) -> passlength at body[7:9] LE, ByteCount(2),
        # password, then the 2-byte-aligned path. The reference's
        # smb.c:306-326 walk reads two bytes early with a big-endian
        # import — correct only by accident when Flags' high byte is 0
        # and the password is short; we follow the wire layout.)
        if len(body) < 11:
            raise ValueError("short tree connect")
        passlength = int.from_bytes(body[7:9], "little")
        p = 11 + passlength
        if uni and (32 + p) % 2:
            p += 1
        if p < len(body):
            share = _decode(body[p:], uni)
            if share:
                out["shares"].append(share)
    elif cmd == 0x73:  # SESSION_SETUP_ANDX
        if wordcount == 12:  # NTLMSSP path (smb.c:334-354)
            if len(body) < 17:
                raise ValueError("short setup12")
            securitylen = int.from_bytes(body[15:17], "little")
            p = 1 + 14 + 2 + 10  # words prefix + seclen field + rest
            if p + securitylen > len(body):
                raise ValueError("security blob overrun")
            _security_blob(body[p : p + securitylen], out)
            p += securitylen
            p += 0 if ((32 + p) % 2 == 0) else 1
            parts = _split_nuls(body[p:], uni, 3)
            for val, key in zip(parts, ("os", "ver", "domain")):
                if val and out[key] is None:
                    out[key] = val
        elif wordcount == 13:  # plain user/domain/os/ver (smb.c:355-371)
            if len(body) < 19:
                raise ValueError("short setup13")
            ansipw = int.from_bytes(body[15:17], "little")
            upw = int.from_bytes(body[17:19], "little")
            p = 1 + 14 + 4 + 10 + ansipw + upw
            p += 0 if ((32 + p) % 2 == 0) else 1
            parts = _split_nuls(body[p:], uni, 4)
            for val, key in zip(parts, ("user", "domain", "os", "ver")):
                if val and out[key] is None:
                    out[key] = val


def _split_nuls(buf: bytes, unicode_: bool, n: int) -> list:
    """NUL-split the trailing string block (ref smb1_str_null_split)."""
    text = _decode(buf, unicode_) if unicode_ else buf.decode("utf-8", "replace")
    parts = text.split("\x00")
    return (parts + [""] * n)[:n]


def _smb2_pdu(pdu: bytes, out: dict) -> None:
    """One SMB2 message (starting at \\xfeSMB) — requests only."""
    if len(pdu) < 64:
        raise ValueError("short SMB2 header")
    cmd = int.from_bytes(pdu[12:14], "little")
    flags = int.from_bytes(pdu[16:20], "little")
    if flags & SMB2_FLAGS_SERVER_TO_REDIR:
        return
    body = pdu[64:]
    if cmd == 0x03:  # TREE_CONNECT: StructureSize(2) Rsvd(2) PathOff(2) PathLen(2)
        if len(body) < 8:
            raise ValueError("short SMB2 tree connect")
        pathoffset = int.from_bytes(body[4:6], "little") - 64
        pathlen = int.from_bytes(body[6:8], "little")
        if pathoffset < 0 or pathoffset + pathlen > len(body):
            raise ValueError("bad SMB2 path offsets")
        share = _decode(body[pathoffset : pathoffset + pathlen], True)
        if share:
            out["shares"].append(share)
    elif cmd == 0x05:  # CREATE: NameOffset at +44, NameLength at +46
        if len(body) < 48:
            raise ValueError("short SMB2 create")
        nameoffset = int.from_bytes(body[44:46], "little") - 64
        namelen = int.from_bytes(body[46:48], "little")
        if nameoffset < 0 or nameoffset + namelen > len(body):
            raise ValueError("bad SMB2 name offsets")
        name = _decode(body[nameoffset : nameoffset + namelen], True)
        if name:
            out["filenames"].append(name)


MAX_SMB_MESSAGES = 512  # DoS bound on the NetBIOS walk; flagged when hit
MAX_SMB2_CHAIN = 64  # DoS bound on one message's compound chain; flagged


def parse_smb(buf: bytes) -> dict:
    """NetBIOS-framed client stream -> smb.* fields (total function).
    Fields extracted before a malformed/truncated tail are KEPT (a
    capture-cut final message is the norm for long sessions); the error
    is recorded alongside them in parse_error."""
    out = {k: (list(v) if isinstance(v, list) else v) for k, v in _EMPTY.items()}
    try:
        if not buf:
            raise ValueError("empty")
        pos = 0
        seen = 0
        while pos + 4 <= len(buf):
            if seen >= MAX_SMB_MESSAGES:
                raise ValueError(f"message cap {MAX_SMB_MESSAGES} reached")
            # NetBIOS session message: type(1)=0x00, 3-byte length
            if buf[pos] != 0x00:
                raise ValueError("not a NetBIOS session message")
            msglen = int.from_bytes(buf[pos + 1 : pos + 4], "big")
            pdu = buf[pos + 4 : pos + 4 + msglen]
            if len(pdu) < msglen:
                raise ValueError("truncated NetBIOS message")
            if pdu[:4] == b"\xffSMB":
                out["versions"].append("1")
                _smb1_pdu(pdu, out)
            elif pdu[:4] == b"\xfeSMB":
                out["versions"].append("2")
                # SMB2 compounding: NextCommand (hdr[20:24]) chains
                # multiple request PDUs inside one transport message.
                # Each chained PDU is parsed BOUNDED to its NextCommand
                # span so a hostile name/path length can't read into the
                # next PDU; truncation and malformed chains are flagged
                # (fields parsed so far are kept by the outer handler).
                off = 0
                for i in range(MAX_SMB2_CHAIN):
                    rest = pdu[off:]
                    if rest[:4] != b"\xfeSMB":
                        break
                    if len(rest) < 64:
                        raise ValueError("short chained SMB2 header")
                    nxt = int.from_bytes(rest[20:24], "little")
                    if nxt == 0:
                        _smb2_pdu(rest, out)
                        break
                    if nxt < 64 or nxt % 8 or off + nxt > len(pdu):
                        raise ValueError("bad SMB2 NextCommand")
                    _smb2_pdu(rest[:nxt], out)
                    off += nxt
                    if i == MAX_SMB2_CHAIN - 1:
                        raise ValueError(
                            f"SMB2 compound cap {MAX_SMB2_CHAIN} reached"
                        )
            else:
                raise ValueError("no SMB magic")
            pos += 4 + msglen
            seen += 1
    except (ValueError, IndexError) as exc:
        # keep whatever was already extracted; just flag the error
        out["parse_error"] = str(exc)[:120]
    # set semantics like the reference's termfields, deterministic order
    for key in ("versions", "shares", "filenames"):
        out[key] = sorted(set(out[key]))
    return out


# ---------------------------------------------------------------------------
# wire synthesis (tests + oracle gate)
# ---------------------------------------------------------------------------


def _netbios(pdu: bytes) -> bytes:
    return b"\x00" + len(pdu).to_bytes(3, "big") + pdu


def _smb1_header(cmd: int, flags2: int = SMB1_FLAGS2_UNICODE) -> bytes:
    return (
        b"\xffSMB"
        + bytes([cmd])
        + b"\x00" * 4          # status
        + b"\x00"              # flags (request)
        + flags2.to_bytes(2, "little")
        + b"\x00" * 20
    )


def encode_smb1_session_setup(
    *, user: str, domain: str, os_name: str = "Unix", ver: str = "Samba",
    unicode_: bool = True,
) -> bytes:
    """SESSION_SETUP_ANDX wordcount-13 request (plain auth path)."""
    flags2 = SMB1_FLAGS2_UNICODE if unicode_ else 0
    enc = (lambda s: s.encode("utf-16-le")) if unicode_ else (lambda s: s.encode())
    words = b"\x00" * 14 + (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
    body = bytes([13]) + words + b"\x00" * 10
    pad = b"" if (32 + 1 + len(words) + 10) % 2 == 0 else b"\x00"
    strings = b"\x00".join(enc(s) for s in (user, domain, os_name, ver)) + b"\x00"
    if unicode_:
        strings = (
            enc(user) + b"\x00\x00" + enc(domain) + b"\x00\x00"
            + enc(os_name) + b"\x00\x00" + enc(ver) + b"\x00\x00"
        )
    pdu = _smb1_header(0x73, flags2) + body + pad + strings
    return _netbios(pdu)


def encode_ntlmssp_setup(*, user: str, domain: str, host: str) -> bytes:
    """SESSION_SETUP_ANDX wordcount-12 with SPNEGO/NTLMSSP AUTHENTICATE."""
    fields = [b"", b"", domain.encode("utf-16-le"),
              user.encode("utf-16-le"), host.encode("utf-16-le"), b""]
    payload_off = 12 + 6 * 8
    rows, blob_payload = b"", b""
    for fb in fields:
        rows += (
            len(fb).to_bytes(2, "little") + len(fb).to_bytes(2, "little")
            + (payload_off + len(blob_payload)).to_bytes(4, "little")
        )
        blob_payload += fb
    ntlm = b"NTLMSSP\x00" + (3).to_bytes(4, "little") + rows + blob_payload

    def tlv(tag_byte: int, value: bytes) -> bytes:
        if len(value) < 0x80:
            return bytes([tag_byte, len(value)]) + value
        lb = len(value).to_bytes(2, "big")
        return bytes([tag_byte, 0x82]) + lb + value

    blob = tlv(0xA1, tlv(0x30, tlv(0xA2, tlv(0x04, ntlm))))
    words = b"\x00" * 14 + len(blob).to_bytes(2, "little")
    body = bytes([12]) + words + b"\x00" * 10
    p = 1 + 14 + 2 + 10 + len(blob)
    pad = b"" if (32 + p) % 2 == 0 else b"\x00"
    pdu = _smb1_header(0x73) + body + blob + pad
    return _netbios(pdu)


def encode_smb1_tree_connect(*, share: str, unicode_: bool = True) -> bytes:
    """[MS-CIFS] 2.2.4.55 request: wordcount=4, AndX(4B), Flags(2),
    PasswordLength(2 LE), ByteCount(2), password, [align pad], path."""
    flags2 = SMB1_FLAGS2_UNICODE if unicode_ else 0
    passlen = 1
    body = bytes([4])                          # wordcount
    body += b"\xff\x00" + (0).to_bytes(2, "little")  # AndX cmd/res/offset
    body += (0x0008).to_bytes(2, "little")     # Flags (TREE_CONNECT_ANDX_EXT)
    body += passlen.to_bytes(2, "little")      # PasswordLength at body[7:9]
    body += (0).to_bytes(2, "little")          # ByteCount (unused by parser)
    body += b"\x00" * passlen                  # password
    p = 11 + passlen
    if unicode_ and (32 + p) % 2:
        body += b"\x00"
    body += share.encode("utf-16-le") if unicode_ else share.encode()
    body += b"\x00\x00" if unicode_ else b"\x00"
    return _netbios(_smb1_header(0x75, flags2) + body)


def _smb2_header(cmd: int) -> bytes:
    return (
        b"\xfeSMB"
        + (64).to_bytes(2, "little")   # StructureSize
        + b"\x00" * 6                  # CreditCharge + Status
        + cmd.to_bytes(2, "little")
        + b"\x00" * 2                  # Credits
        + (0).to_bytes(4, "little")    # Flags (request)
        + b"\x00" * 44
    )


def encode_smb2_tree_connect(*, share: str) -> bytes:
    sb = share.encode("utf-16-le")
    body = (9).to_bytes(2, "little") + b"\x00\x00"
    body += (64 + 8).to_bytes(2, "little") + len(sb).to_bytes(2, "little") + sb
    return _netbios(_smb2_header(0x03) + body)


def encode_smb2_create(*, filename: str) -> bytes:
    nb = filename.encode("utf-16-le")
    body = bytearray(48)
    body[0:2] = (57).to_bytes(2, "little")
    body[44:46] = (64 + 48).to_bytes(2, "little")
    body[46:48] = len(nb).to_bytes(2, "little")
    return _netbios(_smb2_header(0x05) + bytes(body) + nb)


def encode_smb2_compound(*pdus: bytes) -> bytes:
    """Chain request PDUs (stripped of their NetBIOS prefixes) into ONE
    NetBIOS message via NextCommand, 8-byte aligned per [MS-SMB2]."""
    chained = b""
    bodies = [p[4:] for p in pdus]  # drop each 4-byte NetBIOS prefix
    for i, body in enumerate(bodies):
        if i < len(bodies) - 1:
            pad = (-len(body)) % 8
            body = bytearray(body + b"\x00" * pad)
            body[20:24] = len(body).to_bytes(4, "little")  # NextCommand
            body = bytes(body)
        chained += body
    return _netbios(chained)


def encode_smb_stream_udf():
    """(user, domain, share, filename) -> NetBIOS client stream
    (gate-synthesis helper: SMB1 session setup + SMB2 tree+create)."""

    @F.pandas_udf("binary")
    def encode(
        user: pd.Series, domain: pd.Series, share: pd.Series, fn: pd.Series
    ) -> pd.Series:
        return pd.Series(
            [
                encode_smb1_session_setup(user=str(u), domain=str(d))
                + encode_smb2_tree_connect(share=str(s))
                + encode_smb2_create(filename=str(f))
                for u, d, s, f in zip(user, domain, share, fn)
            ]
        )

    return encode


def parse_smb_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "smb_"
) -> DataFrame:
    """Parse an SMB client-stream column into typed smb_* field columns."""

    @F.pandas_udf(SMB_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [
                parse_smb(bytes(v)) if v is not None
                else {**_EMPTY, "versions": [], "shares": [], "filenames": []}
                for v in col
            ]
        )

    out = df.withColumn("_smb", parse(F.col(payload_col)))
    for name in (
        "versions", "shares", "filenames",
        "user", "domain", "host", "os", "ver", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_smb.{name}"))
    return out.drop("_smb")
