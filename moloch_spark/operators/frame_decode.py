"""Ethernet/IPv4/IPv6/TCP/UDP frame decode, JVM-side (no UDF).

The reference decodes frames natively on the capture path
(capture/packet.c: moloch_packet_ether, moloch_packet_ip4/ip6,
VLAN/802.1Q unwrap). Spark re-expression: everything happens in the
HEX-STRING domain — `lower(hex(data))` once, then fixed/derived
`substr` slices + `conv` for numbers. These compile into whole-stage
codegen (no Python, no per-row allocation beyond the hex string), so
frame decode runs at scan speed over a 100 TB packet store; combined
with sources.pcap_reader this is the full ingest path:

    read_pcap -> decode_frames -> classify/community_id/sessionize

Scope (matching what downstream operators consume): up to two VLAN
tags, IPv4 with options (IHL honored), IPv6 fixed header, TCP (ports,
seq, flags, data-offset) and UDP. Fragments, tunnels and exotic L2 are
left to the edge-ETL tier per SURVEY §7 — same cut as the fixtures.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

ETH_HDR_HEX = 28  # 6B dst + 6B src + 2B ethertype, in hex chars
VLAN_TAG_HEX = 8  # 4B 802.1Q tag


def _num(hexs: Column) -> Column:
    return F.conv(hexs, 16, 10).cast("long")


def _dotted_v4(hexs: Column) -> Column:
    """8 hex chars -> dotted quad."""
    return F.concat_ws(
        ".",
        _num(hexs.substr(1, 2)),
        _num(hexs.substr(3, 2)),
        _num(hexs.substr(5, 2)),
        _num(hexs.substr(7, 2)),
    )


def _grouped_v6(hexs: Column) -> Column:
    """32 hex chars -> full 8-group colon form (uncompressed lowercase;
    round-trips through expr.iputil / ip6_str_to_hex exactly)."""
    return F.concat_ws(
        ":", *[hexs.substr(1 + 4 * i, 4) for i in range(8)]
    )


def decode_frames(
    df: DataFrame,
    *,
    data_col: str = "data",
) -> DataFrame:
    """Add 5-tuple + L4 columns decoded from raw Ethernet frames.

    Output columns: eth_type (hex string after VLAN unwrap), src_ip,
    dst_ip (dotted v4 / grouped v6 / NULL for non-IP), ip_protocol
    (long; 6 tcp, 17 udp, 1 icmp, ...), src_port, dst_port (NULL when
    not TCP/UDP), tcp_seq, tcp_flags (NULL unless TCP), payload_hex
    (L4 payload). All derived column-at-a-time; Catalyst folds the
    when() chains and the whole decode stays in one codegen stage.
    """
    hx = F.lower(F.hex(F.col(data_col)))

    def sub(pos: Column, n: int) -> Column:
        # Column.substr requires both args the same type
        return hx.substr(pos, F.lit(n))

    # -- L2: ethertype with up to two 802.1Q/802.1ad tags unwrapped
    t0 = hx.substr(25, 4)
    tagged0 = t0.isin("8100", "88a8", "9100")
    t1 = hx.substr(25 + VLAN_TAG_HEX, 4)
    tagged1 = tagged0 & t1.isin("8100", "88a8", "9100")
    # hex-char offset (0-based) where the L3 header starts
    l3o = (
        F.when(tagged1, ETH_HDR_HEX + 2 * VLAN_TAG_HEX)
        .when(tagged0, ETH_HDR_HEX + VLAN_TAG_HEX)
        .otherwise(ETH_HDR_HEX)
    )
    eth_type = (
        F.when(tagged1, sub(l3o - 3, 4))
        .when(tagged0, sub(l3o - 3, 4))
        .otherwise(t0)
    )

    is_v4 = eth_type == "0800"
    is_v6 = eth_type == "86dd"

    # -- IPv4: IHL-aware, options honored
    ihl_words = _num(sub(l3o + 2, 1))
    v4_l4o = l3o + ihl_words * 8
    v4_proto = _num(sub(l3o + 19, 2))
    v4_src = _dotted_v4(sub(l3o + 25, 8))
    v4_dst = _dotted_v4(sub(l3o + 33, 8))

    # -- IPv6: fixed 40-byte header (extension headers -> edge ETL)
    v6_l4o = l3o + 80
    v6_proto = _num(sub(l3o + 13, 2))
    v6_src = _grouped_v6(sub(l3o + 17, 32))
    v6_dst = _grouped_v6(sub(l3o + 49, 32))

    l4o = F.when(is_v4, v4_l4o).when(is_v6, v6_l4o)
    proto = F.when(is_v4, v4_proto).when(is_v6, v6_proto)
    is_tcp = proto == 6
    is_udp = proto == 17

    sport = F.when(is_tcp | is_udp, _num(sub(l4o + 1, 4)))
    dport = F.when(is_tcp | is_udp, _num(sub(l4o + 5, 4)))
    tcp_seq = F.when(is_tcp, _num(sub(l4o + 9, 8)))
    tcp_flags = F.when(is_tcp, _num(sub(l4o + 27, 2)))
    tcp_doff = _num(sub(l4o + 25, 1))  # data offset, 32-bit words
    pay_off = (
        F.when(is_tcp, l4o + tcp_doff * 8)
        .when(is_udp, l4o + 16)
        .otherwise(l4o)
    )
    payload_hex = F.when(
        proto.isNotNull(), hx.substr(pay_off + 1, F.lit(1 << 30))
    )
    # ICMP / ICMPv6 (proto 1 / 58): type+code are the first two payload
    # bytes (ref capture/parsers/icmp.c:110-111)
    is_icmp = (proto == 1) | (proto == 58)
    icmp_type = F.when(is_icmp, _num(sub(l4o + 1, 2)))
    icmp_code = F.when(is_icmp, _num(sub(l4o + 3, 2)))

    return (
        df.withColumn("eth_type", eth_type)
        .withColumn("src_ip", F.when(is_v4, v4_src).when(is_v6, v6_src))
        .withColumn("dst_ip", F.when(is_v4, v4_dst).when(is_v6, v6_dst))
        .withColumn("ip_protocol", proto)
        .withColumn("src_port", sport)
        .withColumn("dst_port", dport)
        .withColumn("tcp_seq", tcp_seq)
        .withColumn("tcp_flags", tcp_flags)
        .withColumn("icmp_type", icmp_type)
        .withColumn("icmp_code", icmp_code)
        .withColumn("payload_hex", payload_hex)
    )
