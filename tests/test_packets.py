"""Packet-layer operator tests: community-id against an independent
Python implementation, reassembly ordering/gap tags, firstBytes,
classification dispatch."""

from __future__ import annotations

import base64
import hashlib
import struct

from pyspark.sql import functions as F

from moloch_spark.operators.packets import (
    classify_protocol,
    community_id_v1,
    first_bytes,
    reassemble_tcp,
)


def ref_community_id(ip1, p1, ip2, p2, proto, seed=0):
    """Independent reference implementation (community-id v1 spec)."""
    a = (ip1, p1)
    b = (ip2, p2)
    lo, hi = (a, b) if a <= b else (b, a)
    buf = struct.pack("!H", seed)
    buf += struct.pack("!I", lo[0]) + struct.pack("!I", hi[0])
    buf += struct.pack("!BB", proto, 0)
    buf += struct.pack("!H", lo[1]) + struct.pack("!H", hi[1])
    return "1:" + base64.b64encode(hashlib.sha1(buf).digest()).decode()


def ip(s):
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


def test_community_id(spark):
    rows = [
        (1, ip("1.2.3.4"), 1122, ip("5.6.7.8"), 3344, 6),
        (2, ip("5.6.7.8"), 3344, ip("1.2.3.4"), 1122, 6),  # reversed dir
        (3, ip("10.0.0.1"), 53, ip("10.0.0.2"), 33000, 17),
        (4, ip("192.168.1.1"), 0, ip("192.168.1.1"), 0, 1),  # same endpoint
    ]
    df = spark.createDataFrame(
        rows, "id int, ip1 long, p1 int, ip2 long, p2 int, proto int"
    )
    out = {
        r.id: r.cid
        for r in df.select(
            "id",
            community_id_v1(
                F.col("ip1"), F.col("p1"), F.col("ip2"), F.col("p2"), F.col("proto")
            ).alias("cid"),
        ).collect()
    }
    for rid, ip1, p1, ip2, p2, proto in rows:
        assert out[rid] == ref_community_id(ip1, p1, ip2, p2, proto), rid
    # direction-normalized: both directions hash identically
    assert out[1] == out[2]


def test_reassembly(spark):
    rows = [
        ("s1", 100, "hel", 0),
        ("s1", 103, "lo ", 1),   # arrives later but in-seq
        ("s1", 106, "world", 2),
        ("s2", 10, "abc", 0),
        ("s2", 20, "xyz", 1),    # gap: 10+3=13 < 20
        ("s3", 5, "b", 1),       # out of order arrival (seq 5 after... )
        ("s3", 1, "aaaa", 0),
    ]
    df = spark.createDataFrame(rows, "session_id string, tcp_seq long, payload string, arrival int")
    out = {r.session_id: r for r in reassemble_tcp(df).collect()}
    assert out["s1"].payload == "hello world"
    assert not out["s1"].acked_unseen_segment
    assert out["s2"].acked_unseen_segment
    assert out["s2"].payload == "abcxyz"
    assert out["s3"].payload == "aaaab"
    assert out["s3"].out_of_order  # seq 5 arrived before seq 1
    assert out["s1"].segments == 3


def test_first_bytes(spark):
    rows = [
        ("s1", 0, 100, "GET /index.html"),
        ("s1", 0, 200, "later"),
        ("s1", 1, 150, "HTTP/1.1 200 OK"),
    ]
    df = spark.createDataFrame(rows, "session_id string, direction int, tcp_seq long, payload string")
    r = first_bytes(df).collect()[0]
    assert bytes.fromhex(r.src_payload8) == b"GET /ind"
    assert bytes.fromhex(r.dst_payload8) == b"HTTP/1.1"


def test_classify(spark):
    rows = [
        (1, 9999, "GET / HTT"),
        (2, 22, "SSH-2.0-x"),
        (3, 443, "\x16\x03\x01\x02"),
        (4, 53, "\x00\x01\x00"),
        (5, 12345, "????"),
        (6, 8080, "junk"),
        (7, 51822, "\xc3\x00\x00\x00\x01\x08"),  # QUIC v1 long header
    ]
    df = spark.createDataFrame(rows, "id int, port int, prefix string")
    out = {
        r.id: r.proto
        for r in df.select(
            "id", classify_protocol(F.col("port"), F.col("prefix")).alias("proto")
        ).collect()
    }
    assert out == {1: "http", 2: "ssh", 3: "tls", 4: "dns", 5: "unknown",
                   6: "http", 7: "quic"}


def test_tcp_handshake_rtt(spark):
    from moloch_spark.operators.packets import tcp_handshake_rtt

    rows = [
        # full handshake: SYN at 100, SYN-ACK at 250, ACK at 300
        ("s1", 100, 0x02), ("s1", 250, 0x12), ("s1", 300, 0x10),
        # stray ACK BEFORE the syn-ack (port reuse / out-of-order capture)
        # must not drive the delay negative
        ("s1", 150, 0x10),
        ("s1", 400, 0x18),  # data (PSH-ACK) must not disturb ACK-min... (0x18&0x12==0x10)
        # half-open: SYN only
        ("s2", 500, 0x02),
        # mid-capture: data only, no SYN at all
        ("s3", 900, 0x10),
    ]
    df = spark.createDataFrame(rows, "session_id string, ts_us long, tcp_flags int")
    out = {r.session_id: r for r in tcp_handshake_rtt(df).collect()}
    assert out["s1"].init_rtt_us == 150
    assert out["s1"].ack_delay_us == 50
    assert out["s1"].tags == []
    assert out["s2"].tags == ["no-syn-ack"] and out["s2"].init_rtt_us is None
    assert out["s3"].tags == ["no-syn"]
