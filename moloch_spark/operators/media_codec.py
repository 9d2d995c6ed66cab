"""Pure-stdlib image/video codecs for the multimodal pipeline.

No PIL/opencv/ffmpeg in the container — but PNG needs only zlib (stdlib)
plus the five scanline filters, BMP is raw rows, and Y4M (YUV4MPEG2, the
uncompressed interchange format used by ffmpeg/x264) is a textual header
in front of raw frames. Implementing them here makes decode / resize /
frame-sample REAL operators instead of honest stubs.

Scale note: these run inside Arrow-batched mapInPandas workers, one
image per call, numpy row ops inside. For production-grade throughput on
codec-heavy corpora you would swap a C codec into the same mapInPandas
seam; the Spark-side plumbing (schema, partitioning, batch shape) is
identical either way — which is the part that matters at 100 TB.

Reference parity: moloch stores media as opaque payload bytes and leaves
decode to the viewer (SURVEY §1.1); the LLM-pipeline mandate adds real
decode/feature/resize/frame-sample on top.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (bit depth 8 only)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(data: bytes) -> np.ndarray:
    """Decode a non-interlaced 8-bit PNG (gray / RGB / gray+alpha / RGBA)
    to an (H, W, C) uint8 array. Raises ValueError on anything else —
    callers in the Spark operators catch and emit NULLs."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    off = 8
    width = height = None
    channels = None
    idat = bytearray()
    while off + 8 <= len(data):
        (length,) = struct.unpack(">I", data[off : off + 4])
        ctype = data[off + 4 : off + 8]
        body = data[off + 8 : off + 8 + length]
        if len(body) < length:
            raise ValueError("truncated chunk")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG depth/color {depth}/{color}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
        off += 12 + length  # len + type + body + crc
    if width is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("bad decompressed size")
    out = np.empty((height, stride), dtype=np.uint8)
    bpp = channels
    prev = np.zeros(stride, dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        row = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos + 1).copy()
        pos += stride + 1
        if ftype == 0:  # None
            pass
        elif ftype == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            for lane in range(bpp):
                row[lane::bpp] = np.cumsum(row[lane::bpp], dtype=np.uint64) & 0xFF
        elif ftype == 2:  # Up
            row = (row.astype(np.uint16) + prev) & 0xFF
            row = row.astype(np.uint8)
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = int(row[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                row[x] = (int(row[x]) + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"bad filter {ftype}")
        out[y] = row
        prev = out[y]
    return out.reshape(height, width, channels)


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, *, level: int = 6) -> bytes:
    """Encode an (H, W) or (H, W, C) uint8 array as a valid PNG
    (filter 0 rows — simple, universally decodable)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color = {1: 0, 3: 2, 2: 4, 4: 6}.get(c)
    if color is None:
        raise ValueError(f"unsupported channel count {c}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    stride_rows = np.ascontiguousarray(arr, dtype=np.uint8).reshape(h, w * c)
    raw = b"".join(b"\x00" + stride_rows[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, level))
        + _chunk(b"IEND", b"")
    )


def bmp_decode(data: bytes) -> np.ndarray:
    """Decode an uncompressed 24-bit BI_RGB BMP to (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM" or len(data) < 54:
        raise ValueError("not a BMP")
    (pix_off,) = struct.unpack("<I", data[10:14])
    (hdr_sz,) = struct.unpack("<I", data[14:18])
    if hdr_sz < 40:
        raise ValueError("BMP core header unsupported")
    w, h = struct.unpack("<ii", data[18:26])
    planes, bpp = struct.unpack("<HH", data[26:30])
    (compression,) = struct.unpack("<I", data[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP bpp/compression {bpp}/{compression}")
    bottom_up = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    need = pix_off + row_bytes * h
    if len(data) < need:
        raise ValueError("truncated BMP")
    rows = np.frombuffer(data, dtype=np.uint8, count=row_bytes * h, offset=pix_off)
    rows = rows.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    if bottom_up:
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR -> RGB


def resize_nearest(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Nearest-neighbor resample to (th, tw) via index mapping."""
    h, w = arr.shape[:2]
    ys = np.minimum((np.arange(th) + 0.5) * h / th, h - 1).astype(np.int64)
    xs = np.minimum((np.arange(tw) + 0.5) * w / tw, w - 1).astype(np.int64)
    return arr[ys][:, xs]


def resize_bilinear(arr: np.ndarray, tw: int, th: int) -> np.ndarray:
    """Bilinear resample to (th, tw); edge-clamped sample positions."""
    h, w = arr.shape[:2]
    squeeze = arr.ndim == 2
    if squeeze:
        arr = arr[:, :, None]
    fy = np.clip((np.arange(th) + 0.5) * h / th - 0.5, 0, h - 1)
    fx = np.clip((np.arange(tw) + 0.5) * w / tw - 0.5, 0, w - 1)
    y0 = np.floor(fy).astype(np.int64)
    x0 = np.floor(fx).astype(np.int64)
    y1 = np.minimum(y0 + 1, h - 1)
    x1 = np.minimum(x0 + 1, w - 1)
    wy = (fy - y0)[:, None, None]
    wx = (fx - x0)[None, :, None]
    a = arr[y0][:, x0].astype(np.float64)
    b = arr[y0][:, x1].astype(np.float64)
    c = arr[y1][:, x0].astype(np.float64)
    d = arr[y1][:, x1].astype(np.float64)
    top = a * (1 - wx) + b * wx
    bot = c * (1 - wx) + d * wx
    out = np.clip(np.rint(top * (1 - wy) + bot * wy), 0, 255).astype(np.uint8)
    return out[:, :, 0] if squeeze else out


# ---------------------------------------------------------------------------
# Y4M (YUV4MPEG2): uncompressed video interchange.  Header line
# "YUV4MPEG2 W<w> H<h> F<n>:<d> ... [C<space>]\n", then per frame
# "FRAME[ params]\n" + raw planar YUV bytes.
# ---------------------------------------------------------------------------

_Y4M_MAGIC = b"YUV4MPEG2"

# chroma tag -> bytes per pixel numerator/denominator of the two chroma
# planes combined (luma is always w*h)
_Y4M_CHROMA = {
    "420": (1, 2),  # two (w/2 x h/2) planes => w*h/2 extra
    "420jpeg": (1, 2),
    "420mpeg2": (1, 2),
    "420paldv": (1, 2),
    "422": (1, 1),  # two (w/2 x h) planes => w*h extra
    "444": (2, 1),  # two full planes
    "mono": (0, 1),
}


def y4m_parse_header(data: bytes) -> tuple[int, int, str, int]:
    """Return (width, height, chroma_tag, header_end_offset)."""
    nl = data.find(b"\n")
    if nl < 0 or not data.startswith(_Y4M_MAGIC):
        raise ValueError("not a Y4M stream")
    w = h = None
    chroma = "420"
    for tok in data[len(_Y4M_MAGIC) : nl].split(b" "):
        if not tok:
            continue
        tag, val = tok[:1], tok[1:].decode("ascii", "replace")
        if tag == b"W":
            w = int(val)
        elif tag == b"H":
            h = int(val)
        elif tag == b"C":
            chroma = val
    if not w or not h:
        raise ValueError("Y4M missing W/H")
    if chroma not in _Y4M_CHROMA:
        raise ValueError(f"unsupported chroma {chroma}")
    return w, h, chroma, nl + 1


def y4m_frame_size(w: int, h: int, chroma: str) -> int:
    num, den = _Y4M_CHROMA[chroma]
    return w * h + (w * h * num) // den


def y4m_iter_frames(data: bytes):
    """Yield (frame_index, luma_plane_bytes, frame_bytes) for each frame.
    Luma is the first w*h bytes of the frame (all supported layouts)."""
    w, h, chroma, off = y4m_parse_header(data)
    fsize = y4m_frame_size(w, h, chroma)
    idx = 0
    n = len(data)
    while off < n:
        nl = data.find(b"\n", off)
        if nl < 0 or data[off : off + 5] != b"FRAME":
            raise ValueError(f"bad FRAME marker at {off}")
        start = nl + 1
        frame = data[start : start + fsize]
        if len(frame) < fsize:
            raise ValueError("truncated frame")
        yield idx, frame[: w * h], frame
        off = start + fsize
        idx += 1


def y4m_encode(frames: list[np.ndarray], *, chroma_value: int = 128) -> bytes:
    """Encode grayscale (H, W) uint8 frames as a C420 Y4M stream with
    constant chroma — enough to round-trip the sampling path in tests."""
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape
    if w % 2 or h % 2:
        raise ValueError("C420 needs even dims")
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C420\n".encode()
    cpl = bytes([chroma_value]) * ((w // 2) * (h // 2))
    parts = [head]
    for f in frames:
        if f.shape != (h, w):
            raise ValueError("frame size mismatch")
        parts.append(b"FRAME\n")
        parts.append(np.ascontiguousarray(f, dtype=np.uint8).tobytes())
        parts.append(cpl)
        parts.append(cpl)
    return b"".join(parts)


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE): PCM audio container — chunked layout, pure struct.
# Completes the modality triple: PNG/BMP images, Y4M video, WAV audio.
# ---------------------------------------------------------------------------


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Decode a 16-bit PCM WAV to (sample_rate, (n, channels) int16).
    Raises ValueError on non-PCM / non-16-bit / malformed chunks."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE file")
    off = 12
    rate = channels = None
    pcm = None
    while off + 8 <= len(data):
        cid = data[off : off + 4]
        (clen,) = struct.unpack("<I", data[off + 4 : off + 8])
        body = data[off + 8 : off + 8 + clen]
        if cid == b"fmt ":
            if len(body) < 16:
                raise ValueError("short fmt chunk")
            fmt, channels, rate = struct.unpack("<HHI", body[:8])
            bits = struct.unpack("<H", body[14:16])[0]
            if fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV fmt/bits {fmt}/{bits}")
        elif cid == b"data":
            if len(body) < clen:
                raise ValueError("truncated data chunk")
            pcm = body
        off += 8 + clen + (clen & 1)  # chunks are word-aligned
    if rate is None or pcm is None or not channels:
        raise ValueError("missing fmt/data chunk")
    n = len(pcm) // (2 * channels)
    samples = np.frombuffer(pcm, dtype="<i2", count=n * channels)
    return rate, samples.reshape(n, channels)


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """Encode (n,) or (n, channels) int16 samples as 16-bit PCM WAV."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, channels = samples.shape
    pcm = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, channels, rate, rate * channels * 2, channels * 2, 16
    )
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def audio_decimate(samples: np.ndarray, every_n: int) -> np.ndarray:
    """Keep every Nth sample — the audio analog of frame sampling.
    (A production resampler would low-pass first; the plumbing and
    rate bookkeeping are identical.)"""
    if every_n < 1:
        raise ValueError("every_n must be >= 1")
    return samples[::every_n]


# ---------------------------------------------------------------------------
# GIF (87a/89a): LZW decode, first frame, global/local palette, interlace
# ---------------------------------------------------------------------------

_GIF_SIGS = (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes) -> bytes:
    """GIF-variant LZW: LSB-first bit packing, growing code size (max
    12 bits), clear/end control codes."""
    clear = 1 << min_code_size
    end = clear + 1
    big = int.from_bytes(data, "little")
    total_bits = len(data) * 8
    bitpos = 0
    code_size = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    prev: int | None = None
    while bitpos + code_size <= total_bits:
        code = (big >> bitpos) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = table[: clear + 2]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if prev is None:
            if code >= len(table):
                raise ValueError("LZW: first code out of range")
            out += table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = table[prev] + table[prev][:1]
            else:
                raise ValueError("LZW: code out of range")
            out += entry
            # deferred-clear semantics: encoders may stop growing the
            # table at 4096 without emitting CLEAR; adding past that
            # desynchronizes the code space and rejects valid GIFs
            if len(table) < 4096:
                table.append(table[prev] + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        prev = code
    return bytes(out)


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real LZW encoder (string-table variant) — the round-trip oracle
    for _lzw_decode in tests and the producer for gif_encode."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    out_bits: list[tuple[int, int]] = [(clear, code_size)]
    w = b""
    for ch in indices:
        wc = w + bytes([ch])
        if wc in table:
            w = wc
            continue
        out_bits.append((table[w], code_size))
        table[wc] = next_code
        next_code += 1
        if next_code - 1 == (1 << code_size) and code_size < 12:
            code_size += 1
        if next_code == (1 << 12):  # table full: reset
            out_bits.append((clear, code_size))
            table = {bytes([i]): i for i in range(clear)}
            next_code = end + 1
            code_size = min_code_size + 1
        w = bytes([ch])
    if w:
        out_bits.append((table[w], code_size))
    out_bits.append((end, code_size))
    acc = 0
    nbits = 0
    buf = bytearray()
    for code, cs in out_bits:
        acc |= code << nbits
        nbits += cs
        while nbits >= 8:
            buf.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        buf.append(acc & 0xFF)
    return bytes(buf)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def gif_decode(data: bytes) -> np.ndarray:
    """First image frame of a GIF -> HxWx3 uint8 RGB array.
    Raises ValueError on malformed input; callers catch -> NULL row."""
    if data[:6] not in _GIF_SIGS or len(data) < 13:
        raise ValueError("not a GIF")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = data[pos : pos + 3 * n]
        if len(gct) < 3 * n:
            raise ValueError("truncated global color table")
        pos += 3 * n
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(data) and data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            if pos + 10 > len(data):
                raise ValueError("truncated image descriptor")
            _ix, _iy, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            pal = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                pal = data[pos : pos + 3 * n]
                if len(pal) < 3 * n:
                    raise ValueError("truncated local color table")
                pos += 3 * n
            if pal is None:
                raise ValueError("no color table")
            if pos >= len(data):
                raise ValueError("missing LZW data")
            mcs = data[pos]
            pos += 1
            if not 2 <= mcs <= 11:
                raise ValueError("bad LZW min code size")
            stream = bytearray()
            while pos < len(data) and data[pos] != 0:
                ln = data[pos]
                stream += data[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = _lzw_decode(mcs, bytes(stream))
            if len(idx) < iw * ih:
                raise ValueError("short pixel data")
            arr = np.frombuffer(idx[: iw * ih], dtype=np.uint8).reshape(ih, iw)
            if ipacked & 0x40:  # interlaced: reorder rows
                out = np.empty_like(arr)
                src = 0
                for start, step in _GIF_INTERLACE_PASSES:
                    for row in range(start, ih, step):
                        out[row] = arr[src]
                        src += 1
                arr = out
            palette = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 3)
            if int(arr.max(initial=0)) >= len(palette):
                raise ValueError("palette index out of range")
            return palette[arr]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("no image frame")


def gif_encode(arr: np.ndarray, *, interlace: bool = False) -> bytes:
    """HxWx3 RGB -> single-frame GIF89a (palette built from the image;
    must have <= 256 distinct colors). Test/synthesis helper."""
    h, w_, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("gif_encode needs <= 256 distinct colors")
    depth = max(1, (len(colors) - 1).bit_length())
    n = 1 << depth
    pal = np.zeros((n, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w_)
    ipacked = 0
    if interlace:
        ipacked |= 0x40
        rows = []
        for start, step in _GIF_INTERLACE_PASSES:
            rows.extend(range(start, h, step))
        idx = idx[rows]
    mcs = max(2, depth)
    lzw = _lzw_encode(mcs, idx.tobytes())
    blocks = bytearray()
    for off in range(0, len(lzw), 255):
        chunk = lzw[off : off + 255]
        blocks += bytes([len(chunk)]) + chunk
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w_, h, 0x80 | (depth - 1), 0, 0)
        + pal.tobytes()
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, w_, h, ipacked)
        + bytes([mcs]) + bytes(blocks) + b"\x00"
        + b"\x3b"
    )


# ---------------------------------------------------------------------------
# JPEG baseline (SOF0): Huffman + DQT + IDCT + YCbCr, pure numpy
# ---------------------------------------------------------------------------

_ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10, 17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# 8x8 DCT-II basis (orthonormal): block = C @ coef @ C.T for the inverse
_DCT_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _DCT_C[_n, _k] = np.cos((2 * _n + 1) * _k * np.pi / 16) * (
            np.sqrt(1 / 8) if _k == 0 else np.sqrt(2 / 8)
        )


class _BitReader:
    """MSB-first reader over the de-stuffed entropy stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG: entropy stream exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        if self.bit:
            self.bit = 0
            self.pos += 1


def _huff_table(bits: list[int], values: bytes) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical JPEG assignment."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = values[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("JPEG: bad Huffman code")


def _extend(v: int, s: int) -> int:
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def jpeg_decode(data: bytes) -> np.ndarray:
    """Baseline JFIF (SOF0, 8-bit, 1 or 3 components, any sampling
    factors, restart markers) -> HxWx3 uint8 RGB (gray replicated).
    Raises ValueError on unsupported/malformed input."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart = 0
    pos = 2
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG: marker expected")
        marker = data[pos + 1]
        seg_len = int.from_bytes(data[pos + 2 : pos + 4], "big")
        body = data[pos + 4 : pos + 2 + seg_len]
        pos += 2 + seg_len
        if marker == 0xDB:  # DQT
            o = 0
            while o < len(body):
                prec, tid = body[o] >> 4, body[o] & 0xF
                o += 1
                n = 64 * (2 if prec else 1)
                raw = body[o : o + n]
                o += n
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int32)
                    if prec
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int32)
                )
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = vals
                qt[tid] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            o = 0
            while o < len(body):
                cls, tid = body[o] >> 4, body[o] & 0xF
                bits = list(body[o + 1 : o + 17])
                nval = sum(bits)
                values = body[o + 17 : o + 17 + nval]
                (huff_dc if cls == 0 else huff_ac)[tid] = _huff_table(bits, values)
                o += 17 + nval
        elif marker == 0xC0:  # SOF0 baseline
            h, w = int.from_bytes(body[1:3], "big"), int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for i in range(ncomp):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "q": qid})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7):
            raise ValueError("JPEG: only baseline SOF0 supported")
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[:2], "big")
        elif marker == 0xDA:  # SOS -> entropy-coded data follows
            if frame is None:
                raise ValueError("JPEG: SOS before SOF")
            ns = body[0]
            scan_map = {}
            for i in range(ns):
                cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
                scan_map[cid] = (tabs >> 4, tabs & 0xF)
            return _jpeg_scan(data, pos, frame, scan_map, qt, huff_dc, huff_ac, restart)
        elif marker == 0xD9:
            break
        # APPn/COM/etc: skipped via seg_len
    raise ValueError("JPEG: no scan found")


def _jpeg_scan(data, pos, frame, scan_map, qt, huff_dc, huff_ac, restart):
    # de-stuff entropy stream (FF00 -> FF), stop at EOI, strip RSTn
    stream = bytearray()
    rst_marks = []  # stream offsets where a restart marker sat
    i = pos
    while i < len(data) - 1:
        b = data[i]
        if b == 0xFF:
            nxt = data[i + 1]
            if nxt == 0x00:
                stream.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                rst_marks.append(len(stream))
                i += 2
                continue
            break  # EOI or next marker
        stream.append(b)
        i += 1
    reader = _BitReader(bytes(stream))
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    pred = [0] * len(comps)
    rst_iter = iter(rst_marks)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align()
                nxt = next(rst_iter, None)
                if nxt is not None and reader.pos != nxt:
                    reader.pos, reader.bit = nxt, 0
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = scan_map[c["id"]]
                q = qt[c["q"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        s = _huff_decode(reader, huff_dc[dct])
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        pred[ci] += diff
                        coef = np.zeros(64, dtype=np.int64)
                        coef[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, huff_ac[act])
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG: AC index overflow")
                            coef[_ZIGZAG[k]] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = coef.reshape(8, 8) * q
                        pix = _DCT_C @ block @ _DCT_C.T + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = pix
            mcu_count += 1
    # upsample to full resolution (nearest) and crop
    full = []
    for c, p in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        up = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(up[:h, :w])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)


# standard Annex K tables (ITU T.81) — luminance/chrominance quant at Q50
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,  12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,  14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68,109,103, 77,  24, 35, 55, 64, 81,104,113, 92,
    49, 64, 78, 87,103,121,120,101,  72, 92, 95, 98,112,100,103, 99,
]).reshape(8, 8)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,  18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,  47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,  99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)
_DC_LUM_BITS = [0,1,5,1,1,1,1,1,1,0,0,0,0,0,0,0]
_DC_LUM_VALS = bytes(range(12))
_DC_CHR_BITS = [0,3,1,1,1,1,1,1,1,1,1,0,0,0,0,0]
_DC_CHR_VALS = bytes(range(12))
_AC_LUM_BITS = [0,2,1,3,3,2,4,3,5,5,4,4,0,0,1,0x7d]
_AC_LUM_VALS = bytes([
    0x01,0x02,0x03,0x00,0x04,0x11,0x05,0x12,0x21,0x31,0x41,0x06,0x13,0x51,0x61,
    0x07,0x22,0x71,0x14,0x32,0x81,0x91,0xa1,0x08,0x23,0x42,0xb1,0xc1,0x15,0x52,
    0xd1,0xf0,0x24,0x33,0x62,0x72,0x82,0x09,0x0a,0x16,0x17,0x18,0x19,0x1a,0x25,
    0x26,0x27,0x28,0x29,0x2a,0x34,0x35,0x36,0x37,0x38,0x39,0x3a,0x43,0x44,0x45,
    0x46,0x47,0x48,0x49,0x4a,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5a,0x63,0x64,
    0x65,0x66,0x67,0x68,0x69,0x6a,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7a,0x83,
    0x84,0x85,0x86,0x87,0x88,0x89,0x8a,0x92,0x93,0x94,0x95,0x96,0x97,0x98,0x99,
    0x9a,0xa2,0xa3,0xa4,0xa5,0xa6,0xa7,0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,0xb5,0xb6,
    0xb7,0xb8,0xb9,0xba,0xc2,0xc3,0xc4,0xc5,0xc6,0xc7,0xc8,0xc9,0xca,0xd2,0xd3,
    0xd4,0xd5,0xd6,0xd7,0xd8,0xd9,0xda,0xe1,0xe2,0xe3,0xe4,0xe5,0xe6,0xe7,0xe8,
    0xe9,0xea,0xf1,0xf2,0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,0xf9,0xfa,
])
_AC_CHR_BITS = [0,2,1,2,4,4,3,4,7,5,4,4,0,1,2,0x77]
_AC_CHR_VALS = bytes([
    0x00,0x01,0x02,0x03,0x11,0x04,0x05,0x21,0x31,0x06,0x12,0x41,0x51,0x07,0x61,
    0x71,0x13,0x22,0x32,0x81,0x08,0x14,0x42,0x91,0xa1,0xb1,0xc1,0x09,0x23,0x33,
    0x52,0xf0,0x15,0x62,0x72,0xd1,0x0a,0x16,0x24,0x34,0xe1,0x25,0xf1,0x17,0x18,
    0x19,0x1a,0x26,0x27,0x28,0x29,0x2a,0x35,0x36,0x37,0x38,0x39,0x3a,0x43,0x44,
    0x45,0x46,0x47,0x48,0x49,0x4a,0x53,0x54,0x55,0x56,0x57,0x58,0x59,0x5a,0x63,
    0x64,0x65,0x66,0x67,0x68,0x69,0x6a,0x73,0x74,0x75,0x76,0x77,0x78,0x79,0x7a,
    0x82,0x83,0x84,0x85,0x86,0x87,0x88,0x89,0x8a,0x92,0x93,0x94,0x95,0x96,0x97,
    0x98,0x99,0x9a,0xa2,0xa3,0xa4,0xa5,0xa6,0xa7,0xa8,0xa9,0xaa,0xb2,0xb3,0xb4,
    0xb5,0xb6,0xb7,0xb8,0xb9,0xba,0xc2,0xc3,0xc4,0xc5,0xc6,0xc7,0xc8,0xc9,0xca,
    0xd2,0xd3,0xd4,0xd5,0xd6,0xd7,0xd8,0xd9,0xda,0xe2,0xe3,0xe4,0xe5,0xe6,0xe7,
    0xe8,0xe9,0xea,0xf2,0xf3,0xf4,0xf5,0xf6,0xf7,0xf8,0xf9,0xfa,
])


def _huff_encode_table(bits, values):
    """symbol -> (code, length)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.buf.append(self.acc)
                if self.acc == 0xFF:
                    self.buf.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> bytes:
        if self.n:
            self.acc <<= 8 - self.n
            self.acc |= (1 << (8 - self.n)) - 1  # pad with 1s
            self.buf.append(self.acc)
            if self.acc == 0xFF:
                self.buf.append(0x00)
        return bytes(self.buf)


def _mag(v: int) -> tuple[int, int]:
    """(size, receive-bits) for a signed coefficient."""
    if v == 0:
        return 0, 0
    s = abs(v).bit_length()
    return s, v if v >= 0 else v + (1 << s) - 1


def _encode_block(wtr, block, q, dct_t, act_t, pred, ci):
    coef = _DCT_C.T @ block @ _DCT_C
    qc = np.round(coef / q).astype(np.int64)
    zz = qc.flatten()[_ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    s, bits_v = _mag(diff)
    code, ln = dct_t[s]
    wtr.write(code, ln)
    if s:
        wtr.write(bits_v, s)
    run = 0
    last_nz = max(np.nonzero(zz)[0]) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = act_t[0xF0]  # ZRL
            wtr.write(code, ln)
            run -= 16
        s, bits_v = _mag(v)
        code, ln = act_t[(run << 4) | s]
        wtr.write(code, ln)
        wtr.write(bits_v, s)
        run = 0
    if last_nz < 63:
        code, ln = act_t[0x00]  # EOB
        wtr.write(code, ln)


def jpeg_encode(
    arr: np.ndarray, *, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """HxWx3 RGB -> baseline JFIF (SOF0, Annex K tables; 4:4:4 or
    4:2:0 when subsample=True; optional DRI/RSTn restart markers).
    Lossy; pairs with jpeg_decode for tolerance round-trip tests."""
    h, w_, _ = arr.shape
    rgb = arr.astype(np.float64)
    y = 0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2]
    cb = -0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] + 0.5 * rgb[..., 2] + 128
    cr = 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] - 0.081312 * rgb[..., 2] + 128
    mcu = 16 if subsample else 8
    ph, pw = -(-h // mcu) * mcu, -(-w_ // mcu) * mcu

    def pad_plane(p, tgt_h, tgt_w):
        pad = np.empty((tgt_h, tgt_w))
        sh, sw = p.shape
        pad[:sh, :sw] = p
        pad[sh:, :sw] = p[sh - 1 : sh, :]
        pad[:, sw:] = pad[:, sw - 1 : sw]
        return pad - 128.0

    yp = pad_plane(y, ph, pw)
    if subsample:
        # 2x2 box-average chroma on the even-cropped region, then pad
        def down2(pl):
            if pl.shape[0] < 2 or pl.shape[1] < 2:
                return pl
            eh, ew = pl.shape[0] & ~1, pl.shape[1] & ~1
            return pl[:eh, :ew].reshape(eh // 2, 2, ew // 2, 2).mean(axis=(1, 3))

        cbp = pad_plane(down2(cb), ph // 2, pw // 2)
        crp = pad_plane(down2(cr), ph // 2, pw // 2)
    else:
        cbp, crp = pad_plane(cb, ph, pw), pad_plane(cr, ph, pw)
    dc_lum = _huff_encode_table(_DC_LUM_BITS, _DC_LUM_VALS)
    ac_lum = _huff_encode_table(_AC_LUM_BITS, _AC_LUM_VALS)
    dc_chr = _huff_encode_table(_DC_CHR_BITS, _DC_CHR_VALS)
    ac_chr = _huff_encode_table(_AC_CHR_BITS, _AC_CHR_VALS)
    wtr = _BitWriter()
    pred = [0, 0, 0]
    scan_parts: list[bytes] = []
    mcu_count = 0
    rst_n = 0
    for by in range(ph // mcu):
        for bx in range(pw // mcu):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                scan_parts.append(wtr.flush())
                scan_parts.append(bytes([0xFF, 0xD0 + rst_n % 8]))
                rst_n += 1
                wtr = _BitWriter()
                pred = [0, 0, 0]
            mcu_count += 1
            if subsample:
                for sy in range(2):
                    for sx in range(2):
                        y0, x0 = by * 16 + sy * 8, bx * 16 + sx * 8
                        _encode_block(wtr, yp[y0:y0+8, x0:x0+8], _Q_LUM, dc_lum, ac_lum, pred, 0)
                _encode_block(wtr, cbp[by*8:by*8+8, bx*8:bx*8+8], _Q_CHR, dc_chr, ac_chr, pred, 1)
                _encode_block(wtr, crp[by*8:by*8+8, bx*8:bx*8+8], _Q_CHR, dc_chr, ac_chr, pred, 2)
            else:
                for plane, q, dt, at, ci in (
                    (yp, _Q_LUM, dc_lum, ac_lum, 0),
                    (cbp, _Q_CHR, dc_chr, ac_chr, 1),
                    (crp, _Q_CHR, dc_chr, ac_chr, 2),
                ):
                    _encode_block(
                        wtr, plane[by*8:by*8+8, bx*8:bx*8+8], q, dt, at, pred, ci
                    )
    scan_parts.append(wtr.flush())
    scan = b"".join(scan_parts)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    def dqt(tid: int, q: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tid]) + bytes(int(x) for x in q.flatten()[_ZIGZAG]))

    def dht(cls: int, tid: int, bits, values) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + values)

    ysamp = 0x22 if subsample else 0x11
    sof = seg(
        0xC0,
        b"\x08" + h.to_bytes(2, "big") + w_.to_bytes(2, "big") + b"\x03"
        + bytes([1, ysamp, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1]),
    )
    sos = seg(0xDA, b"\x03" + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + b"\x00\x3f\x00")
    dri = (
        seg(0xDD, restart_interval.to_bytes(2, "big")) if restart_interval else b""
    )
    return (
        b"\xff\xd8"
        + dqt(0, _Q_LUM) + dqt(1, _Q_CHR)
        + dht(0, 0, _DC_LUM_BITS, _DC_LUM_VALS)
        + dht(1, 0, _AC_LUM_BITS, _AC_LUM_VALS)
        + dht(0, 1, _DC_CHR_BITS, _DC_CHR_VALS)
        + dht(1, 1, _AC_CHR_BITS, _AC_CHR_VALS)
        + sof + dri + sos + scan + b"\xff\xd9"
    )
