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
