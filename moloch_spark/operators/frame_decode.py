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
seq, flags, data-offset) and UDP. Tunnels are unwrapped first by
decapsulate_frames (GRE / ERSPAN / VXLAN / GTP / MPLS / PPPoE — the
reference's capture/parsers/{gre,erspan,mpls}.c + packet.c VXLAN/GTP
paths), also hex-domain codegen. Fragments and exotic L2 are left to
the edge-ETL tier per SURVEY §7 — same cut as the fixtures.
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


def _l2_walk(hx: Column):
    """(l3o, eth_type) after unwrapping up to two 802.1Q/802.1ad tags.
    l3o is the 0-based hex-char offset where the L3 header starts."""
    t0 = hx.substr(25, 4)
    tagged0 = t0.isin("8100", "88a8", "9100")
    t1 = hx.substr(25 + VLAN_TAG_HEX, 4)
    tagged1 = tagged0 & t1.isin("8100", "88a8", "9100")
    l3o = (
        F.when(tagged1, ETH_HDR_HEX + 2 * VLAN_TAG_HEX)
        .when(tagged0, ETH_HDR_HEX + VLAN_TAG_HEX)
        .otherwise(ETH_HDR_HEX)
    )
    eth_type = (
        F.when(tagged1, hx.substr(l3o - 3, F.lit(4)))
        .when(tagged0, hx.substr(l3o - 3, F.lit(4)))
        .otherwise(t0)
    )
    return l3o, eth_type


_BIG = 1 << 30
_ZERO_MACS = "0" * 24  # 12 zero bytes standing in for dst+src MAC


def _pseudo_eth(hx: Column, off0: Column, eth_type) -> Column:
    """Wrap an inner L3 payload (starting at 0-based hex offset off0)
    in a synthetic Ethernet header so the next decode pass can walk it."""
    et = eth_type if isinstance(eth_type, Column) else F.lit(eth_type)
    return F.concat(F.lit(_ZERO_MACS), et, hx.substr(off0 + 1, F.lit(_BIG)))


def _strip_one_tunnel(hx: Column) -> tuple[Column, Column]:
    """One tunnel layer -> (label, inner_frame_hex); label NULL when the
    frame isn't a supported tunnel (then inner is undefined/ignored).

    Mirrors the reference's dispatch: ethertype cbs for MPLS 0x8847 /
    ERSPAN 0x88be (capture/parsers/mpls.c, erspan.c), PPPoE session
    0x8864, the GRE ip-protocol cb (parsers/gre.c:29-83 flag-driven
    header walk; routing SREs bail like the BSB error path), and the
    UDP port probes for GTP/VXLAN (packet.c:840-855)."""
    l3o, eth_type = _l2_walk(hx)

    def sub(pos: Column, n: int) -> Column:
        return hx.substr(pos, F.lit(n))

    # ---- MPLS label-stack pop (bounded depth, S-bit terminated)
    mpls_cases = []
    for i in range(5):
        start = l3o + 8 * i
        s_bit = _num(sub(start + 6, 1)).bitwiseAND(F.lit(1)) == 1
        nib = sub(start + 9, 1)
        inner = (
            F.when(nib == "4", _pseudo_eth(hx, start + 8, "0800"))
            .when(nib == "6", _pseudo_eth(hx, start + 8, "86dd"))
        )
        mpls_cases.append((s_bit, inner))
    mpls_inner = F.lit(None).cast("string")
    for s_bit, inner in reversed(mpls_cases):
        mpls_inner = F.when(s_bit, inner).otherwise(mpls_inner)

    # ---- PPPoE session stage (ver/type 0x11, code 0x00, 6B hdr + PPP proto)
    ppp_proto = sub(l3o + 13, 4)
    pppoe_ok = (sub(l3o + 1, 2) == "11") & (sub(l3o + 3, 2) == "00")
    pppoe_inner = (
        F.when(ppp_proto == "0021", _pseudo_eth(hx, l3o + 16, "0800"))
        .when(ppp_proto == "0057", _pseudo_eth(hx, l3o + 16, "86dd"))
    )

    # ---- ERSPAN type II (version nibble 1, 8B header, inner Ethernet)
    erspan_ok = sub(l3o + 1, 1) == "1"
    erspan_inner = hx.substr(l3o + 16 + 1, F.lit(_BIG))

    # ---- IP layer (for GRE / VXLAN / GTP the outer must be IP)
    is_v4 = eth_type == "0800"
    is_v6 = eth_type == "86dd"
    ihl_words = _num(sub(l3o + 2, 1))
    l4o = F.when(is_v4, l3o + ihl_words * 8).when(is_v6, l3o + 80)
    proto = F.when(is_v4, _num(sub(l3o + 19, 2))).when(is_v6, _num(sub(l3o + 13, 2)))

    # ---- GRE (ip proto 47): flag-driven header length, then ethertype
    fv = _num(sub(l4o + 1, 4))
    gre_type = sub(l4o + 5, 4)
    has_r = fv.bitwiseAND(F.lit(0x4000)) != 0  # routing SREs: bail
    gre_len = (
        F.lit(4)
        + F.when(fv.bitwiseAND(F.lit(0xC000)) != 0, 4).otherwise(0)
        + F.when(fv.bitwiseAND(F.lit(0x2000)) != 0, 4).otherwise(0)
        + F.when(fv.bitwiseAND(F.lit(0x1000)) != 0, 4).otherwise(0)
        + F.when(fv.bitwiseAND(F.lit(0x0080)) != 0, 4).otherwise(0)
    )
    gre_off = l4o + gre_len * 2
    gre_inner = (
        F.when(gre_type == "0800", _pseudo_eth(hx, gre_off, "0800"))
        .when(gre_type == "86dd", _pseudo_eth(hx, gre_off, "86dd"))
        .when(gre_type == "6558", hx.substr(gre_off + 1, F.lit(_BIG)))
        .when(gre_type == "88be", _pseudo_eth(hx, gre_off, "88be"))
    )

    # ---- UDP-carried tunnels
    is_udp = proto == 17
    dport = _num(sub(l4o + 5, 4))
    vxlan_ok = is_udp & (dport == 4789) & (sub(l4o + 17, 2) == "08")
    vxlan_inner = hx.substr(l4o + 16 + 16 + 1, F.lit(_BIG))
    gtp_flags = _num(sub(l4o + 17, 2))
    gtp_ok = (
        is_udp
        & (dport == 2152)
        & (sub(l4o + 17, 1) == "3")
        & (sub(l4o + 19, 2) == "ff")
        & (gtp_flags.bitwiseAND(F.lit(7)) == 0)  # ext headers: bail
    )
    gtp_nib = sub(l4o + 33, 1)
    gtp_inner = (
        F.when(gtp_nib == "4", _pseudo_eth(hx, l4o + 32, "0800"))
        .when(gtp_nib == "6", _pseudo_eth(hx, l4o + 32, "86dd"))
    )

    label = (
        F.when((eth_type == "8847") & mpls_inner.isNotNull(), "mpls")
        .when((eth_type == "8864") & pppoe_ok & pppoe_inner.isNotNull(), "pppoe")
        .when((eth_type == "88be") & erspan_ok, "erspan")
        .when((proto == 47) & ~has_r & gre_inner.isNotNull(), "gre")
        .when(vxlan_ok, "vxlan")
        .when(gtp_ok & gtp_inner.isNotNull(), "gtp")
    )
    inner = (
        F.when(eth_type == "8847", mpls_inner)
        .when(eth_type == "8864", pppoe_inner)
        .when(eth_type == "88be", erspan_inner)
        .when(proto == 47, gre_inner)
        .when(vxlan_ok, vxlan_inner)
        .otherwise(gtp_inner)
    )
    return label, inner


def decapsulate_frames(
    df: DataFrame,
    *,
    data_col: str = "data",
    max_layers: int = 3,
    frame_hex_col: str = "frame_hex",
    tunnels_col: str = "tunnels",
) -> DataFrame:
    """Unwrap up to ``max_layers`` tunnel layers, producing
    ``frame_hex`` (the innermost Ethernet frame, hex) and ``tunnels``
    (outer-to-inner labels, e.g. ['gre','erspan'] — the reference's
    packet->tunnel flag set rendered as session protocols,
    capture/packet.c:333-366). Non-tunnel frames pass through with an
    empty tunnels array.

    Each layer is one projection of codegen hex built-ins; layers are
    materialized as separate columns so Catalyst doesn't re-inline the
    (expensive, many-reference) previous layer's expression."""
    out = df.withColumn(frame_hex_col, F.lower(F.hex(F.col(data_col))))
    out = out.withColumn(tunnels_col, F.array().cast("array<string>"))
    for i in range(max_layers):
        lbl_col, inner_col = f"_decap_lbl{i}", f"_decap_in{i}"
        label, inner = _strip_one_tunnel(F.col(frame_hex_col))
        out = out.withColumn(lbl_col, label).withColumn(inner_col, inner)
        out = out.withColumn(
            frame_hex_col,
            F.when(F.col(lbl_col).isNotNull(), F.col(inner_col)).otherwise(
                F.col(frame_hex_col)
            ),
        ).withColumn(
            tunnels_col,
            F.when(
                F.col(lbl_col).isNotNull(),
                F.array_append(F.col(tunnels_col), F.col(lbl_col)),
            ).otherwise(F.col(tunnels_col)),
        )
        out = out.drop(lbl_col, inner_col)
    return out


def decode_frames(
    df: DataFrame,
    *,
    data_col: str = "data",
    hex_col: str | None = None,
) -> DataFrame:
    """Add 5-tuple + L4 columns decoded from raw Ethernet frames.

    Output columns: eth_type (hex string after VLAN unwrap), src_ip,
    dst_ip (dotted v4 / grouped v6 / NULL for non-IP), ip_protocol
    (long; 6 tcp, 17 udp, 1 icmp, ...), src_port, dst_port (NULL when
    not TCP/UDP), tcp_seq, tcp_flags (NULL unless TCP), payload_hex
    (L4 payload). All derived column-at-a-time; Catalyst folds the
    when() chains and the whole decode stays in one codegen stage.
    """
    hx = F.col(hex_col) if hex_col else F.lower(F.hex(F.col(data_col)))

    def sub(pos: Column, n: int) -> Column:
        # Column.substr requires both args the same type
        return hx.substr(pos, F.lit(n))

    # -- L2: ethertype with up to two 802.1Q/802.1ad tags unwrapped
    l3o, eth_type = _l2_walk(hx)

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
    # SCTP (proto 132) shares the src/dst port layout; the reference
    # keys its sessions on those ports (capture/parsers/sctp.c). ESP
    # (proto 50) deliberately keys on addresses alone with zero ports
    # (capture/parsers/esp.c:37-43), so its ports stay NULL here too.
    is_sctp = proto == 132

    sport = F.when(is_tcp | is_udp | is_sctp, _num(sub(l4o + 1, 4)))
    dport = F.when(is_tcp | is_udp | is_sctp, _num(sub(l4o + 5, 4)))
    tcp_seq = F.when(is_tcp, _num(sub(l4o + 9, 8)))
    tcp_flags = F.when(is_tcp, _num(sub(l4o + 27, 2)))
    tcp_doff = _num(sub(l4o + 25, 1))  # data offset, 32-bit words
    pay_off = (
        F.when(is_tcp, l4o + tcp_doff * 8)
        .when(is_udp, l4o + 16)
        .when(is_sctp, l4o + 24)  # 12B common header -> first chunk
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
