"""PCAP export: parse the synthesized bytes back with struct and check
them against an independent Python implementation of the libpcap format
(not against our own hex builders)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from moloch_spark.operators.pcap_export import (
    gap_encode_positions,
    packet_positions,
    pcap_export,
)

ROWS = [
    # session, ts_us, event_id, payload(bytes)
    ("a", 1_700_000_000_123_456, 1, b"hello"),
    ("a", 1_700_000_001_000_001, 2, b""),
    ("a", 1_700_000_002_500_000, 3, b"\x00\xffbin"),
    ("b", 1_700_000_000_000_009, 4, b"x" * 70000),  # > snaplen
]


@pytest.fixture(scope="module")
def pkts(spark):
    return spark.createDataFrame(
        [(s, t, e, p.hex()) for s, t, e, p in ROWS],
        ["session_id", "ts_us", "event_id", "payload_hex"],
    )


def parse_pcap(blob: bytes):
    magic, vmaj, vmin, tz, sig, snap, net = struct.unpack("<IHHiIII", blob[:24])
    assert magic == 0xA1B2C3D4 and (vmaj, vmin) == (2, 4)
    assert snap == 65535 and net == 1
    out, off = [], 24
    while off < len(blob):
        sec, usec, incl, orig = struct.unpack("<IIII", blob[off : off + 16])
        out.append((sec, usec, incl, orig, blob[off + 16 : off + 16 + incl]))
        off += 16 + incl
    assert off == len(blob)
    return out

def test_pcap_roundtrip(spark, pkts):
    got = {r.session_id: r for r in pcap_export(pkts).collect()}
    a = parse_pcap(bytes(got["a"].pcap))
    assert got["a"].packets == 3 and got["a"].pcap_len == len(bytes(got["a"].pcap))
    for (sec, usec, incl, orig, data), (_, ts, _, pay) in zip(a, ROWS[:3]):
        assert sec == ts // 1_000_000 and usec == ts % 1_000_000
        assert incl == orig == len(pay) and data == pay

    # snaplen: incl capped at 65535, orig keeps the true size
    b = parse_pcap(bytes(got["b"].pcap))
    sec, usec, incl, orig, data = b[0]
    assert incl == 65535 and orig == 70000 and data == b"x" * 65535


def test_packet_positions_and_gap_encoding(spark, pkts):
    # session a packets in one file, session b in another
    with_file = pkts.withColumn(
        "file_num", F.when(F.col("session_id") == "a", 7).otherwise(9)
    )
    pos = packet_positions(with_file)
    rows = {r.event_id: r for r in pos.collect()}
    # file 7: offsets accumulate 24 -> +16+5 -> +16+0
    assert rows[1].file_offset == 24
    assert rows[2].file_offset == 24 + 16 + 5
    assert rows[3].file_offset == 24 + 16 + 5 + 16
    assert rows[4].file_offset == 24

    enc = {
        r.session_id: r.packet_pos
        for r in gap_encode_positions(pos).collect()
    }
    # [-file, first_offset, deltas...] per capture/db.c gap encoding
    assert enc["a"] == [-7, 24, 21, 16]
    assert enc["b"] == [-9, 24]


def test_gap_encoding_file_switch(spark):
    df = spark.createDataFrame(
        [
            ("s", 1, 1, 3, 24),
            ("s", 2, 2, 3, 100),
            ("s", 3, 3, 4, 24),
            ("s", 4, 4, 4, 60),
        ],
        ["session_id", "ts_us", "event_id", "file_num", "file_offset"],
    )
    enc = gap_encode_positions(df).collect()[0].packet_pos
    assert enc == [-3, 24, 76, -4, 24, 36]


def test_packet_blob_store_rotation(spark, pkts, tmp_path):
    import glob
    import os

    from moloch_spark.sources.pcap_store import (
        read_packet_blobs,
        write_packet_blobs,
    )

    df = pkts.withColumn("ts", F.timestamp_micros(F.col("ts_us"))).withColumn(
        "payload", F.unhex("payload_hex")
    )
    path = str(tmp_path / "blobs")
    write_packet_blobs(df, path, mode="overwrite", max_records_per_file=2)
    # 4 packets, same day, cap 2/file -> at least 2 rotated files
    day_dirs = glob.glob(os.path.join(path, "capture_day=*"))
    assert len(day_dirs) == 1
    files = glob.glob(os.path.join(day_dirs[0], "*.parquet"))
    assert len(files) >= 2

    back = read_packet_blobs(spark, path)
    assert back.count() == 4
    got = {r.event_id: bytes(r.payload) for r in back.collect()}
    assert got[1] == b"hello" and got[3] == b"\x00\xffbin"

    # partition pruning: day filter must reach PartitionFilters, not the scan
    day = os.path.basename(day_dirs[0]).split("=")[1]
    pruned = read_packet_blobs(spark, path, days=[day])
    assert pruned.count() == 4
    assert read_packet_blobs(spark, path, days=["1999-01-01"]).count() == 0


def test_pcap_reader_roundtrip(spark, pkts, tmp_path):
    """export -> real .pcap files on disk -> read_pcap: full cycle."""
    from moloch_spark.sources.pcap_reader import parse_pcap_bytes, read_pcap

    d = tmp_path / "pcaps"
    d.mkdir()
    for r in pcap_export(pkts).collect():
        (d / f"{r.session_id}.pcap").write_bytes(bytes(r.pcap))

    back = read_pcap(spark, str(d)).collect()
    by_file = {}
    for r in back:
        by_file.setdefault(r.path.rsplit("/", 1)[-1], []).append(r)
    a = sorted(by_file["a.pcap"], key=lambda r: r.pkt_index)
    assert [bytes(r.data) for r in a] == [p for _, _, _, p in ROWS[:3]]
    assert [r.ts_us for r in a] == [t for _, t, _, _ in ROWS[:3]]
    assert all(r.linktype == 1 for r in back)
    # snaplen truncation survives: incl 65535, orig keeps true size
    (b,) = by_file["b.pcap"]
    assert b.incl_len == 65535 and b.orig_len == 70000

    # other byte orders / nanosecond resolution parse identically
    blob = (d / "a.pcap").read_bytes()
    import struct as s

    be = s.pack(">IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    nano = s.pack("<IHHiIII", 0xA1B23C4D, 2, 4, 0, 0, 65535, 1)
    for hdr, mult in [(be, 1), (nano, 1000)]:
        recs = b""
        for _, ts, _, pay in ROWS[:2]:
            fmt = ">IIII" if hdr is be else "<IIII"
            recs += s.pack(fmt, ts // 1_000_000, (ts % 1_000_000) * mult, len(pay), len(pay)) + pay
        out = list(parse_pcap_bytes("x", hdr + recs))
        assert [o[2] for o in out] == [ROWS[0][1], ROWS[1][1]]

    # truncated tail record is dropped, not an error
    cut = list(parse_pcap_bytes("y", blob[:-2]))
    assert len(cut) == 2


def test_read_pcapng_round_trip(spark, tmp_path):
    """pcapng (SHB/IDB/EPB) reads through the same read_pcap surface,
    including a non-default if_tsresol (milliseconds)."""
    from moloch_spark.sources.pcap_reader import encode_pcapng, read_pcap

    frame = b"\xaa" * 6 + b"\xbb" * 6 + b"\x08\x00" + b"E" + b"\x00" * 27
    recs = [(1_700_000_000_000_000 + i * 1000, frame + bytes([i])) for i in range(9)]
    (tmp_path / "a.pcapng").write_bytes(encode_pcapng(recs))
    (tmp_path / "b.pcapng").write_bytes(encode_pcapng(recs, tsresol_us=False))
    rows = (
        read_pcap(spark, str(tmp_path / "*.pcapng"))
        .orderBy("path", "pkt_index")
        .collect()
    )
    assert len(rows) == 18
    a = [r for r in rows if r.path.endswith("a.pcapng")]
    assert [r.ts_us for r in a] == [t for t, _ in recs]
    assert all(bytes(r.data) == d for r, (_, d) in zip(a, recs))
    b = [r for r in rows if r.path.endswith("b.pcapng")]
    assert [r.ts_us for r in b] == [(t // 1000) * 1000 for t, _ in recs]


def test_read_pcapng_hostile():
    from moloch_spark.sources.pcap_reader import (
        encode_pcapng,
        parse_capture_columns,
    )

    blob = encode_pcapng([(123, b"x" * 40), (456, b"y" * 40)])
    # truncated tail block: earlier complete records survive, no raise
    kept = [
        t
        for c in parse_capture_columns("t", blob[: len(blob) - 6])
        for t in c["ts_us"]
    ]
    assert kept == [123]
    # truncated before any packet: zero records, no raise
    assert sum(
        len(c["ts_us"]) for c in parse_capture_columns("t", blob[:41])
    ) == 0


def test_pcapng_spb_snaplen_and_short_idb():
    """SPB captured length = min(orig_len, IDB SnapLen): block padding
    must never leak into data when the packet was snap-truncated; and a
    truncated IDB stops the walk instead of raising struct.error."""
    import struct

    from moloch_spark.sources.pcap_reader import parse_capture_columns

    def block(btype, body):
        pad = (-len(body)) % 4
        blen = 12 + len(body) + pad
        return (
            struct.pack("<II", btype, blen) + body + b"\0" * pad
            + struct.pack("<I", blen)
        )

    shb = block(
        0x0A0D0D0A,
        struct.pack("<IHHq", 0x1A2B3C4D, 1, 0, -1),
    )
    idb = block(0x00000001, struct.pack("<HHI", 1, 0, 6))  # SnapLen 6
    # SPB: orig 10 bytes, 6 captured (snapped) + 2 block-pad bytes
    spb = block(0x00000003, struct.pack("<I", 10) + b"ABCDEF")
    cols = list(parse_capture_columns("t", shb + idb + spb))
    (c,) = cols
    assert list(c["incl_len"]) == [6]
    assert list(c["orig_len"]) == [10]
    assert [bytes(d) for d in c["data"]] == [b"ABCDEF"]

    # hostile: IDB body shorter than 8 bytes -> graceful stop, no packets
    short_idb = block(0x00000001, b"\x01")
    assert (
        sum(len(c["ts_us"]) for c in parse_capture_columns("t", shb + short_idb + spb))
        == 0
    )


def test_pcapng_big_endian_section():
    """A big-endian section (BOM bytes 1A 2B 3C 4D on disk, per the
    pcapng spec) must parse with '>' unpacking — guards the byte-order
    mapping that was silently swapped until round 3."""
    import struct

    from moloch_spark.sources.pcap_reader import parse_capture_columns

    def block(btype, body, endian):
        pad = (-len(body)) % 4
        blen = 12 + len(body) + pad
        return (
            struct.pack(endian + "II", btype, blen) + body + b"\0" * pad
            + struct.pack(endian + "I", blen)
        )

    for endian, bom in ((">", b"\x1a\x2b\x3c\x4d"), ("<", b"\x4d\x3c\x2b\x1a")):
        shb = block(
            0x0A0D0D0A,
            bom + struct.pack(endian + "HHq", 1, 0, -1),
            endian,
        )
        idb = block(0x00000001, struct.pack(endian + "HHI", 1, 0, 0), endian)
        frame = b"\xaa" * 24
        epb = block(
            0x00000006,
            struct.pack(endian + "IIIII", 0, 0, 123_000_000, len(frame), len(frame))
            + frame,
            endian,
        )
        cols = list(parse_capture_columns("t", shb + idb + epb))
        (c,) = cols
        assert list(c["incl_len"]) == [24], endian
        assert list(c["ts_us"]) == [123_000_000], endian
        assert [bytes(d) for d in c["data"]] == [frame], endian
