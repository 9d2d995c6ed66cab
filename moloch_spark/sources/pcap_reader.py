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
file's bytes to one task; `mapInPandas` parses records Arrow-batched.

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


def read_pcap(spark: SparkSession, path: str) -> DataFrame:
    """Packet-level DataFrame over a pcap file/glob/directory.

    One output row per captured packet; `data` is the raw (possibly
    snap-truncated) frame, `orig_len` the on-the-wire size. Feed
    `lower(hex(data))` into operators.packets.* (classification,
    first-N capture, reassembly) — the same columns the fixtures
    provide pre-parsed.
    """
    files = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                rows.extend(parse_pcap_bytes(p, bytes(content)))
            yield pd.DataFrame(rows, columns=_COLS)

    return files.select("path", "content").mapInPandas(parse, PCAP_SCHEMA)
