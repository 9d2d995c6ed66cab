"""HTTP/2 parser — seventeenth exemplar field extractor
(ref capture/parsers/http2.c:24-200: frame walk + header inflation into
the http.* field surface — method, path, authority, user-agent,
status). The reference delegates header decompression to nghttp2; here
HPACK (RFC 7541) is implemented natively: prefix-integer coding, the
61-entry static table, a size-bounded dynamic table with eviction, and
the full RFC Huffman code (Appendix B constants embedded below).

Frame walk: 9-byte header (len24 type8 flags8 stream32) after the
optional client connection preface; HEADERS (+CONTINUATION) payloads
are concatenated per stream until END_HEADERS, then decoded through the
connection-level HPACK context in frame order — state the reference
also keeps per direction.

Same Arrow-batched scan-side shape as the other parsers; hostile input
never throws.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# RFC 7541 Appendix B: symbol -> (code, nbits), 0..255 + EOS(256)
_HUFF_PAIRS = (
    "1ff8/13,7fffd8/23,fffffe2/28,fffffe3/28,fffffe4/28,fffffe5/28,fffffe"
    "6/28,fffffe7/28,fffffe8/28,ffffea/24,3ffffffc/30,fffffe9/28,fffffea/"
    "28,3ffffffd/30,fffffeb/28,fffffec/28,fffffed/28,fffffee/28,fffffef/2"
    "8,ffffff0/28,ffffff1/28,ffffff2/28,3ffffffe/30,ffffff3/28,ffffff4/28"
    ",ffffff5/28,ffffff6/28,ffffff7/28,ffffff8/28,ffffff9/28,ffffffa/28,f"
    "fffffb/28,14/6,3f8/10,3f9/10,ffa/12,1ff9/13,15/6,f8/8,7fa/11,3fa/10,"
    "3fb/10,f9/8,7fb/11,fa/8,16/6,17/6,18/6,0/5,1/5,2/5,19/6,1a/6,1b/6,1c"
    "/6,1d/6,1e/6,1f/6,5c/7,fb/8,7ffc/15,20/6,ffb/12,3fc/10,1ffa/13,21/6,"
    "5d/7,5e/7,5f/7,60/7,61/7,62/7,63/7,64/7,65/7,66/7,67/7,68/7,69/7,6a/"
    "7,6b/7,6c/7,6d/7,6e/7,6f/7,70/7,71/7,72/7,fc/8,73/7,fd/8,1ffb/13,7ff"
    "f0/19,1ffc/13,3ffc/14,22/6,7ffd/15,3/5,23/6,4/5,24/6,5/5,25/6,26/6,2"
    "7/6,6/5,74/7,75/7,28/6,29/6,2a/6,7/5,2b/6,76/7,2c/6,8/5,9/5,2d/6,77/"
    "7,78/7,79/7,7a/7,7b/7,7ffe/15,7fc/11,3ffd/14,1ffd/13,ffffffc/28,fffe"
    "6/20,3fffd2/22,fffe7/20,fffe8/20,3fffd3/22,3fffd4/22,3fffd5/22,7fffd"
    "9/23,3fffd6/22,7fffda/23,7fffdb/23,7fffdc/23,7fffdd/23,7fffde/23,fff"
    "feb/24,7fffdf/23,ffffec/24,ffffed/24,3fffd7/22,7fffe0/23,ffffee/24,7"
    "fffe1/23,7fffe2/23,7fffe3/23,7fffe4/23,1fffdc/21,3fffd8/22,7fffe5/23"
    ",3fffd9/22,7fffe6/23,7fffe7/23,ffffef/24,3fffda/22,1fffdd/21,fffe9/2"
    "0,3fffdb/22,3fffdc/22,7fffe8/23,7fffe9/23,1fffde/21,7fffea/23,3fffdd"
    "/22,3fffde/22,fffff0/24,1fffdf/21,3fffdf/22,7fffeb/23,7fffec/23,1fff"
    "e0/21,1fffe1/21,3fffe0/22,1fffe2/21,7fffed/23,3fffe1/22,7fffee/23,7f"
    "ffef/23,fffea/20,3fffe2/22,3fffe3/22,3fffe4/22,7ffff0/23,3fffe5/22,3"
    "fffe6/22,7ffff1/23,3ffffe0/26,3ffffe1/26,fffeb/20,7fff1/19,3fffe7/22"
    ",7ffff2/23,3fffe8/22,1ffffec/25,3ffffe2/26,3ffffe3/26,3ffffe4/26,7ff"
    "ffde/27,7ffffdf/27,3ffffe5/26,fffff1/24,1ffffed/25,7fff2/19,1fffe3/2"
    "1,3ffffe6/26,7ffffe0/27,7ffffe1/27,3ffffe7/26,7ffffe2/27,fffff2/24,1"
    "fffe4/21,1fffe5/21,3ffffe8/26,3ffffe9/26,ffffffd/28,7ffffe3/27,7ffff"
    "e4/27,7ffffe5/27,fffec/20,fffff3/24,fffed/20,1fffe6/21,3fffe9/22,1ff"
    "fe7/21,1fffe8/21,7ffff3/23,3fffea/22,3fffeb/22,1ffffee/25,1ffffef/25"
    ",fffff4/24,fffff5/24,3ffffea/26,7ffff4/23,3ffffeb/26,7ffffe6/27,3fff"
    "fec/26,3ffffed/26,7ffffe7/27,7ffffe8/27,7ffffe9/27,7ffffea/27,7ffffe"
    "b/27,ffffffe/28,7ffffec/27,7ffffed/27,7ffffee/27,7ffffef/27,7fffff0/"
    "27,3ffffee/26,3fffffff/30"
)

# RFC 7541 Appendix A static table (1-indexed, 61 entries)
_STATIC_RAW = (
    ":authority=;:method=GET;:method=POST;:path=/;:path=/index.html;:sche"
    "me=http;:scheme=https;:status=200;:status=204;:status=206;:status=30"
    "4;:status=400;:status=404;:status=500;accept-charset=;accept-encodin"
    "g=gzip, deflate;accept-language=;accept-ranges=;accept=;access-contr"
    "ol-allow-origin=;age=;allow=;authorization=;cache-control=;content-d"
    "isposition=;content-encoding=;content-language=;content-length=;cont"
    "ent-location=;content-range=;content-type=;cookie=;date=;etag=;expec"
    "t=;expires=;from=;host=;if-match=;if-modified-since=;if-none-match=;"
    "if-range=;if-unmodified-since=;last-modified=;link=;location=;max-fo"
    "rwards=;proxy-authenticate=;proxy-authorization=;range=;referer=;ref"
    "resh=;retry-after=;server=;set-cookie=;strict-transport-security=;tr"
    "ansfer-encoding=;user-agent=;vary=;via=;www-authenticate="
)

_HUFF = [
    (int(c, 16), int(n))
    for c, n in (p.split("/") for p in _HUFF_PAIRS.split(","))
]
# decode map: (nbits, code) -> symbol
_HUFF_DECODE = {(n, c): sym for sym, (c, n) in enumerate(_HUFF)}
_STATIC = [tuple(row.split("=", 1)) for row in _STATIC_RAW.split(";")]

PREFACE = b"PRI * HTTP/2.0\r\n\r\nSM\r\n\r\n"

_FRAME_TYPES = (
    "DATA", "HEADERS", "PRIORITY", "RST_STREAM", "SETTINGS",
    "PUSH_PROMISE", "PING", "GOAWAY", "WINDOW_UPDATE", "CONTINUATION",
)


def huffman_decode(data: bytes) -> bytes:
    """RFC 7541 Huffman string decode. Trailing bits must be a prefix
    of EOS (all ones, <= 7 bits)."""
    out = bytearray()
    code = 0
    nbits = 0
    for byte in data:
        for shift in range(7, -1, -1):
            code = (code << 1) | ((byte >> shift) & 1)
            nbits += 1
            sym = _HUFF_DECODE.get((nbits, code))
            if sym is not None:
                if sym == 256:
                    raise ValueError("EOS symbol in huffman stream")
                out.append(sym)
                code = 0
                nbits = 0
            elif nbits > 30:
                raise ValueError("huffman code overrun")
    if nbits > 7 or code != (1 << nbits) - 1:
        raise ValueError("bad huffman padding")
    return bytes(out)


def huffman_encode(data: bytes) -> bytes:
    """Encoder counterpart (tests/gate synthesis)."""
    acc = 0
    nbits = 0
    out = bytearray()
    for b in data:
        code, n = _HUFF[b]
        acc = (acc << n) | code
        nbits += n
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits:
        pad = 8 - nbits
        out.append(((acc << pad) | ((1 << pad) - 1)) & 0xFF)
    return bytes(out)


def _read_int(buf: bytes, pos: int, prefix: int) -> tuple[int, int]:
    """HPACK prefix-integer decode -> (value, next_pos)."""
    mask = (1 << prefix) - 1
    v = buf[pos] & mask
    pos += 1
    if v < mask:
        return v, pos
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated integer")
        b = buf[pos]
        pos += 1
        v += (b & 0x7F) << shift
        shift += 7
        if not b & 0x80:
            return v, pos
        if shift > 28:
            raise ValueError("integer overflow")


def _read_string(buf: bytes, pos: int) -> tuple[str, int]:
    if pos >= len(buf):
        raise ValueError("truncated string")
    huff = bool(buf[pos] & 0x80)
    ln, pos = _read_int(buf, pos, 7)
    raw = buf[pos : pos + ln]
    if len(raw) < ln:
        raise ValueError("truncated string body")
    pos += ln
    data = huffman_decode(raw) if huff else raw
    return data.decode("utf-8", "replace"), pos


class HpackDecoder:
    """Connection-level HPACK context: static + dynamic table."""

    def __init__(self, max_size: int = 4096) -> None:
        self.dynamic: list[tuple[str, str]] = []
        self.size = 0
        self.max_size = max_size

    def _entry(self, index: int) -> tuple[str, str]:
        if index == 0:
            raise ValueError("index 0")
        if index <= len(_STATIC):
            return _STATIC[index - 1]
        d = index - len(_STATIC) - 1
        if d >= len(self.dynamic):
            raise ValueError(f"index {index} beyond tables")
        return self.dynamic[d]

    def _add(self, name: str, value: str) -> None:
        self.dynamic.insert(0, (name, value))
        self.size += len(name) + len(value) + 32
        while self.size > self.max_size and self.dynamic:
            n, v = self.dynamic.pop()
            self.size -= len(n) + len(v) + 32

    def decode(self, block: bytes) -> list[tuple[str, str]]:
        out: list[tuple[str, str]] = []
        pos = 0
        while pos < len(block):
            b = block[pos]
            if b & 0x80:  # indexed
                idx, pos = _read_int(block, pos, 7)
                out.append(self._entry(idx))
            elif b & 0x40:  # literal, incremental indexing
                idx, pos = _read_int(block, pos, 6)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, pos = _read_string(block, pos)
                value, pos = _read_string(block, pos)
                self._add(name, value)
                out.append((name, value))
            elif b & 0x20:  # dynamic table size update
                sz, pos = _read_int(block, pos, 5)
                self.max_size = sz
                while self.size > self.max_size and self.dynamic:
                    n, v = self.dynamic.pop()
                    self.size -= len(n) + len(v) + 32
            else:  # literal without/never indexing (0000/0001 prefix)
                idx, pos = _read_int(block, pos, 4)
                name = self._entry(idx)[0] if idx else None
                if name is None:
                    name, pos = _read_string(block, pos)
                value, pos = _read_string(block, pos)
                out.append((name, value))
        return out


HTTP2_SCHEMA = (
    "method string, path string, authority string, scheme string, "
    "user_agent string, status string, frame_types array<string>, "
    "n_streams int, parse_error string"
)

_EMPTY = {
    "method": None, "path": None, "authority": None, "scheme": None,
    "user_agent": None, "status": None, "frame_types": [],
    "n_streams": 0, "parse_error": None,
}

_WANTED = {
    ":method": "method", ":path": "path", ":authority": "authority",
    ":scheme": "scheme", "user-agent": "user_agent", ":status": "status",
}


def parse_http2(buf: bytes) -> dict:
    """One direction of an HTTP/2 connection -> first-request fields +
    per-frame bookkeeping (total function)."""
    out = dict(_EMPTY)
    try:
        pos = 0
        if buf.startswith(PREFACE):
            pos = len(PREFACE)
        elif not (len(buf) >= 9 and buf[3] in (1, 4)):
            # without a preface, require the stream to open with a
            # HEADERS or SETTINGS frame (server direction)
            raise ValueError("no HTTP/2 preface or initial frame")
        decoder = HpackDecoder()
        frame_types: list[str] = []
        streams: set[int] = set()
        pending: dict[int, bytearray] = {}
        fields: dict[str, str] = {}
        while pos + 9 <= len(buf):
            ln = int.from_bytes(buf[pos : pos + 3], "big")
            ftype = buf[pos + 3]
            flags = buf[pos + 4]
            stream = int.from_bytes(buf[pos + 5 : pos + 9], "big") & 0x7FFFFFFF
            payload = buf[pos + 9 : pos + 9 + ln]
            if len(payload) < ln:
                raise ValueError("truncated frame")
            pos += 9 + ln
            frame_types.append(
                _FRAME_TYPES[ftype] if ftype < len(_FRAME_TYPES) else str(ftype)
            )
            if stream:
                streams.add(stream)
            if ftype in (1, 9):  # HEADERS / CONTINUATION
                body = payload
                if ftype == 1:
                    if flags & 0x08:  # PADDED
                        pad = body[0]
                        body = body[1 : len(body) - pad]
                    if flags & 0x20:  # PRIORITY
                        body = body[5:]
                pending.setdefault(stream, bytearray()).extend(body)
                if flags & 0x04:  # END_HEADERS
                    for name, value in decoder.decode(bytes(pending.pop(stream))):
                        key = _WANTED.get(name)
                        if key and key not in fields:
                            fields[key] = value
        out.update(fields)
        out["frame_types"] = frame_types
        out["n_streams"] = len(streams)
        if not frame_types:
            raise ValueError("no frames")
    except (ValueError, IndexError) as exc:
        out = dict(_EMPTY)
        out["parse_error"] = str(exc)[:120]
    return out


# ---------------------------------------------------------------------------
# encoder (tests / gate synthesis)
# ---------------------------------------------------------------------------


def _enc_int(value: int, prefix: int, top: int) -> bytes:
    mask = (1 << prefix) - 1
    if value < mask:
        return bytes([top | value])
    out = bytearray([top | mask])
    value -= mask
    while value >= 0x80:
        out.append(0x80 | (value & 0x7F))
        value >>= 7
    out.append(value)
    return bytes(out)


def _enc_string(s: str, *, huffman: bool) -> bytes:
    raw = s.encode()
    if huffman:
        enc = huffman_encode(raw)
        return _enc_int(len(enc), 7, 0x80) + enc
    return _enc_int(len(raw), 7, 0x00) + raw


def _frame(ftype: int, flags: int, stream: int, payload: bytes) -> bytes:
    return (
        len(payload).to_bytes(3, "big")
        + bytes([ftype, flags])
        + stream.to_bytes(4, "big")
        + payload
    )


def encode_http2_request(
    *,
    method: str = "GET",
    path: str = "/",
    authority: str = "example.com",
    user_agent: str = "client/1.0",
    huffman: bool = False,
    stream: int = 1,
) -> bytes:
    """Client preface + SETTINGS + one HEADERS frame, all header values
    as literals with incremental indexing (name via static index where
    one exists)."""
    block = b""
    for idx, value in ((2, method), (4, path), (1, authority), (6, "http")):
        block += _enc_int(idx, 6, 0x40) + _enc_string(value, huffman=huffman)
    block += _enc_int(58, 6, 0x40) + _enc_string(user_agent, huffman=huffman)
    return (
        PREFACE
        + _frame(4, 0, 0, b"")  # empty SETTINGS
        + _frame(1, 0x04 | 0x01, stream, block)  # END_HEADERS|END_STREAM
    )


def encode_http2_udf(**fixed):
    """(path_col, authority_col) -> connection bytes; rows with even
    ids Huffman-encode their strings (gate proves both paths)."""

    @F.pandas_udf("binary")
    def encode(path: pd.Series, authority: pd.Series) -> pd.Series:
        out = []
        for i, (p, a) in enumerate(zip(path, authority)):
            out.append(
                encode_http2_request(
                    method=fixed.get("method", "GET"),
                    path=str(p), authority=str(a),
                    user_agent=fixed.get("user_agent", "client/1.0"),
                    huffman=bool(int(str(p).rsplit("/", 1)[-1] or 0) % 2 == 0)
                    if fixed.get("huffman") is None else fixed["huffman"],
                )
            )
        return pd.Series(out)

    return encode


def parse_http2_df(
    df: DataFrame, *, payload_col: str = "payload", prefix: str = "h2_"
) -> DataFrame:
    """Parse an HTTP/2 payload column into typed h2_* field columns."""

    @F.pandas_udf(HTTP2_SCHEMA)
    def parse(col: pd.Series) -> pd.DataFrame:
        return pd.DataFrame(
            [parse_http2(bytes(v)) if v is not None else dict(_EMPTY) for v in col]
        )

    out = df.withColumn("_h2", parse(F.col(payload_col)))
    for name in (
        "method", "path", "authority", "scheme", "user_agent", "status",
        "frame_types", "n_streams", "parse_error",
    ):
        out = out.withColumn(f"{prefix}{name}", F.col(f"_h2.{name}"))
    return out.drop("_h2")
