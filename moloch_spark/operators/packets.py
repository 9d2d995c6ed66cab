"""Packet-layer operators: community-id, TCP reassembly, payload
prefixes, protocol classification.

Reference analogs:
  * community-id v1 flow hash (capture/db.c moloch_db_community_id):
    "1:" + base64(sha1(seed_be16 || ip_lo || ip_hi || proto || 0x00 ||
    port_lo_be16 || port_hi_be16)) with endpoints ordered by (ip, port).
  * TCP stream reassembly: seq-number ordering with OOO buffering and
    gap tags (capture/parsers/tcp.c:79-260) — here a sort within the
    session group plus gap detection.
  * first-N payload capture (firstBytes, capture/db.c:675-689).
  * protocol classification: per-port + magic-byte prefix dispatch
    (capture/parsers.c:898-1160) — a CASE over (port, prefix).

All JVM-side column expressions — community-id is sha1+base64 built-ins,
reassembly is array_sort + aggregate, classification is when() chains —
so the packet layer rides whole-stage codegen at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _be_bytes(col: Column, width_bytes: int) -> Column:
    """Unsigned int -> fixed-width big-endian binary."""
    return F.unhex(F.lpad(F.hex(col.cast("long")), width_bytes * 2, "0"))


def community_id_v1(
    ip1_num: Column,
    port1: Column,
    ip2_num: Column,
    port2: Column,
    proto: Column,
    *,
    seed: int = 0,
) -> Column:
    """Community ID v1 for v4 flows, from numeric ips. Endpoint order:
    lower (ip, port) first — the direction-normalized flow identity."""
    flip = (ip1_num > ip2_num) | ((ip1_num == ip2_num) & (port1 > port2))
    lo_ip = F.when(flip, ip2_num).otherwise(ip1_num)
    hi_ip = F.when(flip, ip1_num).otherwise(ip2_num)
    lo_port = F.when(flip, port2).otherwise(port1)
    hi_port = F.when(flip, port1).otherwise(port2)
    payload = F.concat(
        F.unhex(F.lit(f"{seed:04x}")),
        _be_bytes(lo_ip, 4),
        _be_bytes(hi_ip, 4),
        _be_bytes(proto, 1),
        F.unhex(F.lit("00")),
        _be_bytes(lo_port, 2),
        _be_bytes(hi_port, 2),
    )
    return F.concat(F.lit("1:"), F.base64(F.unhex(F.sha1(payload))))


def reassemble_tcp(
    df: DataFrame,
    *,
    session_col: str = "session_id",
    seq_col: str = "tcp_seq",
    payload_col: str = "payload",
) -> DataFrame:
    """Order segments by sequence number within each session and
    concatenate; flag gaps (acked-unseen-segment) and out-of-order
    arrival (parsers/tcp.c tags). One shuffle on the session key."""
    seg = F.struct(F.col(seq_col).alias("seq"), F.col(payload_col).alias("data"))
    grouped = df.groupBy(session_col).agg(
        F.array_sort(F.collect_list(seg)).alias("segs"),
        # arrival order vs seq order: any inversion = out-of-order
        F.collect_list(F.col(seq_col)).alias("arrival"),
    )
    segs = F.col("segs")
    data = F.aggregate(segs, F.lit(""), lambda acc, s: F.concat(acc, s["data"]))
    # gap: next segment starts past previous seq + payload length
    pairs = F.arrays_zip(F.slice(segs, 1, F.size(segs) - 1), F.slice(segs, 2, F.size(segs) - 1))
    has_gap = F.when(
        F.size(segs) > 1,
        F.exists(
            pairs, lambda p: p["1"]["seq"] > p["0"]["seq"] + F.length(p["0"]["data"])
        ),
    ).otherwise(F.lit(False))
    arrival = F.col("arrival")
    ooo_pairs = F.arrays_zip(
        F.slice(arrival, 1, F.size(arrival) - 1), F.slice(arrival, 2, F.size(arrival) - 1)
    )
    out_of_order = F.when(
        F.size(arrival) > 1, F.exists(ooo_pairs, lambda p: p["1"] < p["0"])
    ).otherwise(F.lit(False))
    return grouped.select(
        F.col(session_col),
        data.alias("payload"),
        F.size(segs).cast("long").alias("segments"),
        has_gap.alias("acked_unseen_segment"),
        out_of_order.alias("out_of_order"),
    )


def first_bytes(
    df: DataFrame,
    *,
    session_col: str = "session_id",
    dir_col: str = "direction",
    seq_col: str = "tcp_seq",
    payload_col: str = "payload",
    n: int = 8,
) -> DataFrame:
    """srcPayload8/dstPayload8: first n payload bytes per direction
    (earliest segment's prefix), as hex."""
    first_src = F.min_by(
        F.col(payload_col), F.when(F.col(dir_col) == 0, F.col(seq_col))
    )
    first_dst = F.min_by(
        F.col(payload_col), F.when(F.col(dir_col) == 1, F.col(seq_col))
    )
    return df.groupBy(session_col).agg(
        F.lower(F.hex(F.encode(F.substring(first_src, 1, n), "UTF-8"))).alias(
            "src_payload8"
        ),
        F.lower(F.hex(F.encode(F.substring(first_dst, 1, n), "UTF-8"))).alias(
            "dst_payload8"
        ),
    )


def reassemble_fragments(
    df: DataFrame,
    *,
    frag_key_cols: list[str] = ("src_ip", "dst_ip", "frag_id"),
    offset_col: str = "frag_offset",
    payload_col: str = "payload",
    more_col: str = "more_fragments",
) -> DataFrame:
    """IP fragment reassembly (capture/packet.c:474-634): group by the
    fragment key, order by offset, concatenate; a datagram is complete
    when offsets tile without holes and the final fragment has MF=0."""
    keys = [F.col(c) for c in frag_key_cols]
    frag = F.struct(
        F.col(offset_col).alias("off"),
        F.col(payload_col).alias("data"),
        F.col(more_col).alias("mf"),
    )
    grouped = df.groupBy(*keys).agg(F.array_sort(F.collect_list(frag)).alias("frags"))
    frags = F.col("frags")
    data = F.aggregate(frags, F.lit(""), lambda acc, s: F.concat(acc, s["data"]))
    pairs = F.arrays_zip(
        F.slice(frags, 1, F.size(frags) - 1), F.slice(frags, 2, F.size(frags) - 1)
    )
    no_holes = F.when(
        F.size(frags) > 1,
        ~F.exists(
            pairs, lambda p: p["1"]["off"] != p["0"]["off"] + F.length(p["0"]["data"])
        ),
    ).otherwise(F.lit(True))
    starts_at_zero = F.element_at(frags, 1)["off"] == 0
    last_not_mf = ~F.element_at(frags, -1)["mf"]
    return grouped.select(
        *keys,
        data.alias("payload"),
        (no_holes & starts_at_zero & last_not_mf).alias("complete"),
        F.size(frags).cast("long").alias("fragments"),
    )


# port -> protocol fallbacks (subset of the reference's port classifiers)
_PORT_PROTO = {
    80: "http", 8080: "http", 443: "tls", 53: "dns", 22: "ssh",
    25: "smtp", 110: "pop3", 143: "imap", 3306: "mysql", 5432: "postgresql",
}


def classify_protocol(
    port: Column,
    payload_prefix: Column,
) -> Column:
    """Magic-byte prefix dispatch first (parsers.c prefix tables), then
    per-port fallback — a when() chain the optimizer folds into codegen."""
    p = payload_prefix
    out = (
        F.when(p.startswith("GET ") | p.startswith("POST") | p.startswith("HTTP"), "http")
        .when(p.startswith("SSH-"), "ssh")
        .when(p.startswith("\x16\x03"), "tls")
        .when(p.startswith("EHLO") | p.startswith("HELO"), "smtp")
        # IETF QUIC v1 long header: version field 0x00000001 right after
        # the flags byte (quic.c registers the analogous UDP classify;
        # the v1 Initial itself is openable — operators/quic_crypto)
        .when(F.substring(p, 2, 4) == "\x00\x00\x00\x01", "quic")
    )
    for prt, proto in _PORT_PROTO.items():
        out = out.when(port == prt, proto)
    return out.otherwise("unknown")


def tcp_handshake_rtt(
    df: DataFrame,
    *,
    session_col: str = "session_id",
    ts_col: str = "ts_us",
    flags_col: str = "tcp_flags",
) -> DataFrame:
    """SYN / SYN-ACK / ACK handshake timing per session
    (parsers/tcp.c synTime/ackTime: initRTT = synAck - syn, ack delay =
    firstAck - synAck) plus the reference's `no-syn-ack` /
    `no-syn` tags for half-open or mid-capture sessions.

    Pure conditional aggregation (min over flag-filtered timestamps):
    one shuffle on the session key, codegen end to end — the timing
    math costs nothing beyond the sessionization pass it rides.
    """
    fl = F.col(flags_col)
    syn_ack_bits = fl.bitwiseAND(F.lit(0x12))
    ts = F.col(ts_col)
    base = df.groupBy(session_col).agg(
        F.min(F.when(syn_ack_bits == 0x02, ts)).alias("syn_us"),
        F.min(F.when(syn_ack_bits == 0x12, ts)).alias("synack_us"),
    )
    # ack = first ACK AFTER the syn-ack (tcp.c semantics) — a stray ACK
    # captured before it (port reuse, out-of-order capture) must not
    # produce a negative delay, so the ACK min is conditioned on the
    # already-aggregated synack time via a same-key join (one shuffle
    # each side on the session key, no extra exchange shape)
    acks = (
        df.filter(syn_ack_bits == 0x10)
        .join(base.select(session_col, "synack_us"), session_col)
        .filter(ts >= F.col("synack_us"))
        .groupBy(session_col)
        .agg(F.min(ts).alias("ack_us"))
    )
    grouped = base.join(acks, session_col, "left")
    return grouped.select(
        session_col,
        "syn_us",
        "synack_us",
        (F.col("synack_us") - F.col("syn_us")).alias("init_rtt_us"),
        (F.col("ack_us") - F.col("synack_us")).alias("ack_delay_us"),
        F.filter(
            F.array(
                F.when(F.col("syn_us").isNull(), F.lit("no-syn")),
                F.when(
                    F.col("syn_us").isNotNull() & F.col("synack_us").isNull(),
                    F.lit("no-syn-ack"),
                ),
            ),
            lambda x: x.isNotNull(),
        ).alias("tags"),
    )
