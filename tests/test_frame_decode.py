"""Frame decode: build Ethernet/IP/TCP/UDP frames with Python struct
(independent of the hex-domain Spark implementation), ship them through
a real pcap file + read_pcap, and check every decoded column."""

from __future__ import annotations

import struct

import pytest

from moloch_spark.operators.frame_decode import decode_frames
from moloch_spark.operators.packets import classify_protocol
from moloch_spark.sources.pcap_reader import read_pcap

import pyspark.sql.functions as F

MAC = bytes(6)


def eth(ethertype: int, payload: bytes, vlans: list[int] | None = None) -> bytes:
    hdr = MAC + MAC
    for tag in vlans or []:
        hdr += struct.pack(">HH", 0x8100, tag)
    return hdr + struct.pack(">H", ethertype) + payload


def ip4(proto: int, src: str, dst: str, payload: bytes, opts: bytes = b"") -> bytes:
    assert len(opts) % 4 == 0
    ihl = 5 + len(opts) // 4
    tot = ihl * 4 + len(payload)
    src_b = bytes(int(x) for x in src.split("."))
    dst_b = bytes(int(x) for x in dst.split("."))
    hdr = struct.pack(
        ">BBHHHBBH", (4 << 4) | ihl, 0, tot, 1, 0, 64, proto, 0
    ) + src_b + dst_b + opts
    return hdr + payload


def ip6(proto: int, src16: bytes, dst16: bytes, payload: bytes) -> bytes:
    hdr = struct.pack(">IHBB", 6 << 28, len(payload), proto, 64) + src16 + dst16
    return hdr + payload


def tcp(sport: int, dport: int, seq: int, flags: int, payload: bytes,
        opts: bytes = b"") -> bytes:
    assert len(opts) % 4 == 0
    doff = 5 + len(opts) // 4
    hdr = struct.pack(
        ">HHIIBBHHH", sport, dport, seq, 0, doff << 4, flags, 8192, 0, 0
    ) + opts
    return hdr + payload


def udp(sport: int, dport: int, payload: bytes) -> bytes:
    return struct.pack(">HHHH", sport, dport, 8 + len(payload), 0) + payload


FRAMES = [
    # 0: plain v4 TCP http
    eth(0x0800, ip4(6, "10.1.2.3", "192.0.2.9",
                    tcp(49152, 80, 1000, 0x18, b"GET / HTTP/1.1"))),
    # 1: single-VLAN v4 UDP dns
    eth(0x0800, ip4(17, "172.16.0.1", "8.8.8.8", udp(5353, 53, b"\x12\x34")),
        vlans=[42]),
    # 2: double-VLAN v4 TCP with IP options + TCP options
    eth(0x0800, ip4(6, "10.0.0.1", "10.0.0.2",
                    tcp(1234, 22, 7, 0x02, b"SSH-2.0", opts=b"\x01" * 8),
                    opts=b"\x00" * 4),
        vlans=[1, 2]),
    # 3: v6 TCP
    eth(0x86DD, ip6(6, bytes.fromhex("20010db8" + "00" * 12),
                    bytes.fromhex("20010db8" + "00" * 11 + "01"),
                    tcp(443, 443, 99, 0x10, b"\x16\x03\x01"))),
    # 4: ARP (non-IP)
    eth(0x0806, b"\x00\x01\x08\x00\x06\x04\x00\x01" + bytes(20)),
    # 5: v4 ICMP echo request (type 8, code 0)
    eth(0x0800, ip4(1, "10.9.9.9", "10.9.9.1",
                    struct.pack(">BBHHH", 8, 0, 0, 77, 1) + b"ping")),
    # 6: v6 ICMPv6 neighbor solicitation (type 135, code 0)
    eth(0x86DD, ip6(58, bytes.fromhex("fe80" + "00" * 14),
                    bytes.fromhex("ff02" + "00" * 13 + "01"),
                    struct.pack(">BBH", 135, 0, 0) + bytes(20))),
]


@pytest.fixture(scope="module")
def decoded(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("pcap")
    blob = struct.pack("<IHHiIII", 0xA1B2C3D4, 2, 4, 0, 0, 65535, 1)
    for i, fr in enumerate(FRAMES):
        blob += struct.pack("<IIII", 1_700_000_000 + i, i, len(fr), len(fr)) + fr
    (d / "t.pcap").write_bytes(blob)
    rows = decode_frames(read_pcap(spark, str(d))).collect()
    return {r.pkt_index: r for r in rows}


def test_v4_tcp(decoded):
    r = decoded[0]
    assert (r.eth_type, r.src_ip, r.dst_ip) == ("0800", "10.1.2.3", "192.0.2.9")
    assert (r.ip_protocol, r.src_port, r.dst_port) == (6, 49152, 80)
    assert (r.tcp_seq, r.tcp_flags) == (1000, 0x18)
    assert bytes.fromhex(r.payload_hex) == b"GET / HTTP/1.1"


def test_vlan_udp(decoded):
    r = decoded[1]
    assert (r.eth_type, r.src_ip, r.dst_ip) == ("0800", "172.16.0.1", "8.8.8.8")
    assert (r.ip_protocol, r.src_port, r.dst_port) == (17, 5353, 53)
    assert r.tcp_seq is None and r.tcp_flags is None
    assert bytes.fromhex(r.payload_hex) == b"\x12\x34"


def test_double_vlan_options(decoded):
    r = decoded[2]
    assert (r.src_ip, r.dst_ip, r.dst_port) == ("10.0.0.1", "10.0.0.2", 22)
    assert r.tcp_seq == 7 and r.tcp_flags == 0x02
    assert bytes.fromhex(r.payload_hex) == b"SSH-2.0"


def test_v6_tcp(decoded):
    r = decoded[3]
    assert r.eth_type == "86dd" and r.ip_protocol == 6
    assert r.src_ip == "2001:0db8:0000:0000:0000:0000:0000:0000"
    assert r.dst_ip == "2001:0db8:0000:0000:0000:0000:0000:0001"
    assert (r.src_port, r.dst_port) == (443, 443)
    assert bytes.fromhex(r.payload_hex) == b"\x16\x03\x01"


def test_non_ip(decoded):
    r = decoded[4]
    assert r.eth_type == "0806"
    assert r.src_ip is None and r.ip_protocol is None and r.src_port is None
    assert r.payload_hex is None


def test_classify_over_decoded(spark, decoded):
    df = spark.createDataFrame(
        [(r.dst_port, bytes.fromhex(r.payload_hex).decode("latin1"))
         for r in decoded.values() if r.dst_port is not None],
        ["port", "prefix"],
    )
    out = [
        r.proto
        for r in df.select(
            classify_protocol(F.col("port"), F.col("prefix")).alias("proto")
        ).collect()
    ]
    assert sorted(out) == ["dns", "http", "ssh", "tls"]


def test_v6_ip_roundtrips_expression_domain(decoded):
    # the grouped form must land in the same canonical hex the
    # expression compiler uses for v6 predicates
    from pyspark.sql import SparkSession

    from moloch_spark.expr.compiler import ip6_str_to_hex

    spark = SparkSession.getActiveSession()
    df = spark.createDataFrame([(decoded[3].src_ip,)], ["ip"])
    (hexed,) = df.select(ip6_str_to_hex(F.col("ip")).alias("h")).collect()
    assert hexed.h == "20010db8" + "0" * 24


def test_icmp_type_code(decoded):
    r = decoded[5]
    assert r.ip_protocol == 1
    assert (r.icmp_type, r.icmp_code) == (8, 0)
    assert r.src_port is None and r.dst_port is None
    r6 = decoded[6]
    assert r6.ip_protocol == 58
    assert (r6.icmp_type, r6.icmp_code) == (135, 0)
    # non-ICMP rows keep NULLs
    assert decoded[0].icmp_type is None
