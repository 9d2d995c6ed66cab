"""Tunnel decapsulation gates: GRE / ERSPAN / VXLAN / GTP / MPLS / PPPoE
(ref capture/parsers/{gre,erspan,mpls}.c, capture/packet.c:600-860).

All cases ride ONE Spark job: frames are built host-side, decoded in a
single collect, and asserted per-row (the 3-layer decap plan is big, so
one codegen compile amortizes across every case)."""

from __future__ import annotations

import struct

import pytest
from pyspark.sql import functions as F

from moloch_spark.operators.frame_decode import decapsulate_frames, decode_frames


def _ipv4(src: str, dst: str, proto: int, payload: bytes) -> bytes:
    sa = bytes(int(x) for x in src.split("."))
    da = bytes(int(x) for x in dst.split("."))
    total = 20 + len(payload)
    return (
        bytes([0x45, 0]) + total.to_bytes(2, "big") + b"\x00\x00\x00\x00"
        + bytes([64, proto]) + b"\x00\x00" + sa + da + payload
    )


def _udp(sport: int, dport: int, payload: bytes) -> bytes:
    return (
        sport.to_bytes(2, "big") + dport.to_bytes(2, "big")
        + (8 + len(payload)).to_bytes(2, "big") + b"\x00\x00" + payload
    )


def _eth(ethertype: int, payload: bytes) -> bytes:
    return b"\xaa" * 6 + b"\xbb" * 6 + ethertype.to_bytes(2, "big") + payload


INNER = _eth(0x0800, _ipv4("10.0.0.1", "10.0.0.2", 17, _udp(1234, 53, b"hi")))
_INNER_IP = INNER[14:]


def _cases() -> list[tuple[str, bytes, list[str] | None]]:
    """(name, frame, expected tunnels; None = outer tuple expected)."""
    lbl1 = struct.pack(">I", (100 << 12) | (0 << 8) | 64)   # S=0
    lbl2 = struct.pack(">I", (200 << 12) | (1 << 8) | 64)   # S=1
    erspan = b"\x10\x00\x00\x00\x00\x00\x00\x00" + INNER
    pppoe = (
        b"\x11\x00\x00\x01" + (2 + len(_INNER_IP)).to_bytes(2, "big")
        + b"\x00\x21" + _INNER_IP
    )
    gtp = (
        b"\x30\xff" + len(_INNER_IP).to_bytes(2, "big")
        + b"\x00\x00\x00\x01" + _INNER_IP
    )
    vxlan = b"\x08\x00\x00\x00\x00\x00\x2a\x00" + INNER
    outer = lambda payload: _eth(0x0800, _ipv4("1.1.1.1", "2.2.2.2", 47, payload))
    return [
        ("plain", INNER, []),
        ("gre_ipv4", outer(b"\x00\x00\x08\x00" + _INNER_IP), ["gre"]),
        # K+S flags add 8 header bytes
        ("gre_key_seq", outer(b"\x30\x00\x08\x00" + b"\x00" * 8 + _INNER_IP), ["gre"]),
        # R flag -> routing SREs -> bail to the outer tuple
        ("gre_routing", outer(b"\x40\x00\x08\x00" + b"\x00" * 4 + _INNER_IP), None),
        ("gre_teb", outer(b"\x00\x00\x65\x58" + INNER), ["gre"]),
        ("gre_erspan", outer(b"\x00\x00\x88\xbe" + erspan), ["gre", "erspan"]),
        (
            "vxlan",
            _eth(0x0800, _ipv4("1.1.1.1", "2.2.2.2", 17, _udp(5555, 4789, vxlan))),
            ["vxlan"],
        ),
        (
            "gtp_u",
            _eth(0x0800, _ipv4("1.1.1.1", "2.2.2.2", 17, _udp(2152, 2152, gtp))),
            ["gtp"],
        ),
        ("mpls_two_labels", _eth(0x8847, lbl1 + lbl2 + _INNER_IP), ["mpls"]),
        ("pppoe_session", _eth(0x8864, pppoe), ["pppoe"]),
        (
            "vlan_tagged_gre",
            b"\xaa" * 6 + b"\xbb" * 6 + b"\x81\x00\x00\x2a" + b"\x08\x00"
            + _ipv4("1.1.1.1", "2.2.2.2", 47, b"\x00\x00\x08\x00" + _INNER_IP),
            ["gre"],
        ),
    ]


def test_tunnel_decap_matrix(spark):
    cases = _cases()
    hostile = [b"", b"\x00" * 10, b"\xff" * 14, INNER[:20]]
    frames = [(n, f) for n, f, _ in cases] + [
        (f"hostile{i}", f) for i, f in enumerate(hostile)
    ]
    df = spark.createDataFrame(frames, "name string, data binary")
    rows = {
        r.name: r
        for r in decode_frames(decapsulate_frames(df), hex_col="frame_hex")
        .select("name", "tunnels", "src_ip", "dst_ip", "ip_protocol",
                "src_port", "dst_port")
        .collect()
    }
    assert len(rows) == len(frames)  # hostile rows decode without throwing
    for name, _frame, tunnels in cases:
        row = rows[name]
        if tunnels is None:  # bail case: outer tuple reported, no tunnel
            assert row.tunnels == [], name
            assert row.src_ip == "1.1.1.1", name
            continue
        assert row.tunnels == tunnels, name
        assert (row.src_ip, row.dst_ip) == ("10.0.0.1", "10.0.0.2"), name
        assert (row.ip_protocol, row.src_port, row.dst_port) == (17, 1234, 53), name


def test_sctp_ports_and_esp_null_ports(spark):
    """SCTP shares the port layout (ref parsers/sctp.c keying); ESP keys
    on addresses alone so ports stay NULL (ref parsers/esp.c:37-43)."""
    from moloch_spark.operators.frame_decode import decode_frames

    sctp = (
        (9999).to_bytes(2, "big") + (80).to_bytes(2, "big")
        + b"\x00" * 8 + b"\x03\x00\x00\x04"  # vtag+cksum, one chunk hdr
    )
    esp = (0xDEADBEEF).to_bytes(4, "big") + (1).to_bytes(4, "big")
    frames = [
        ("sctp", _eth(0x0800, _ipv4("10.0.0.1", "10.0.0.2", 132, sctp))),
        ("esp", _eth(0x0800, _ipv4("10.0.0.1", "10.0.0.2", 50, esp))),
    ]
    df = spark.createDataFrame(frames, "name string, data binary")
    rows = {r.name: r for r in decode_frames(df).collect()}
    assert (rows["sctp"].src_port, rows["sctp"].dst_port) == (9999, 80)
    assert rows["sctp"].ip_protocol == 132
    assert rows["esp"].src_port is None and rows["esp"].dst_port is None
    assert rows["esp"].ip_protocol == 50
