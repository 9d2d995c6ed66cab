"""PCAP export + packetPos bookkeeping, all JVM-side (no UDF).

The reference stores per-session `packetPos` — gap-encoded byte offsets
into rotated capture files (capture/db.c:848-850: a negative value
switches to file -v, positives are offset deltas) — and the viewer's
sessions API stitches those ranges back into a downloadable pcap stream
(viewer/apiSessions.js:836-958: global header + per-packet record
headers).

Spark re-expression: packets live in a parquet blob store (day
partitions = rotated files); byte synthesis happens in the HEX-STRING
domain with built-ins only (lpad/substr/concat compile into whole-stage
codegen), converted to binary once at the end with unhex. Fixed-width
little-endian hex is cheap to build by byte-pair reversal and — unlike a
Python UDF — keeps the export path vectorized for a 100 TB store.

Layout of a libpcap (v2.4) stream:
    global header (24 B)  magic d4c3b2a1, ver 2.4, snaplen, linktype
    per packet (16 B + incl_len)  LE32 ts_sec, ts_usec, incl_len, orig_len
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# written little-endian: magic 0xa1b2c3d4, v2.4, tz 0, sigfigs 0,
# snaplen 65535, linktype 1 (Ethernet)
GLOBAL_HEADER_HEX = "d4c3b2a1" + "0200" + "0400" + "0" * 16 + "ffff0000" + "01000000"
GLOBAL_HEADER_LEN = 24
RECORD_HEADER_LEN = 16


def le32_hex(col: Column) -> Column:
    """Unsigned 32-bit value -> 8 lowercase hex chars, little-endian,
    by byte-pair reversal of the big-endian hex form."""
    h = F.lpad(F.lower(F.hex(col.cast("long"))), 8, "0")
    return F.concat(
        h.substr(7, 2), h.substr(5, 2), h.substr(3, 2), h.substr(1, 2)
    )


def pcap_record_hex(
    ts_col: Column, payload_hex: Column, *, snaplen: int = 65535
) -> Column:
    """One libpcap record (header + payload) as a hex string.

    ts_col must be epoch MICROSECONDS (long). Truncation at snaplen
    keeps orig_len at the true size, exactly like a capture snap.
    """
    orig_len = (F.length(payload_hex) / 2).cast("long")
    incl_len = F.least(orig_len, F.lit(snaplen))
    return F.concat(
        le32_hex(ts_col / 1_000_000),
        le32_hex(ts_col % 1_000_000),
        le32_hex(incl_len),
        le32_hex(orig_len),
        payload_hex.substr(F.lit(1), incl_len * 2),
    )


def pcap_export(
    packets: DataFrame,
    *,
    session_col: str = "session_id",
    ts_us_col: str = "ts_us",
    payload_hex_col: str = "payload_hex",
    order_col: str = "event_id",
    snaplen: int = 65535,
) -> DataFrame:
    """Per-session pcap blob: global header + records in (ts, order)
    order. One shuffle (the per-session agg); record synthesis and the
    final unhex are scan-side expressions.

    Output: (session_col, packets, pcap_len, pcap) with `pcap` binary.
    """
    rec = pcap_record_hex(
        F.col(ts_us_col), F.col(payload_hex_col), snaplen=snaplen
    )
    per_pkt = packets.select(
        F.col(session_col),
        F.struct(
            F.col(ts_us_col).alias("ts_us"),
            F.col(order_col).alias("ord"),
            rec.alias("rec"),
        ).alias("p"),
    )
    agg = per_pkt.groupBy(session_col).agg(
        F.count(F.lit(1)).alias("packets"),
        F.sort_array(F.collect_list("p")).alias("ps"),
    )
    body = F.array_join(F.transform(F.col("ps"), lambda p: p["rec"]), "")
    hex_stream = F.concat(F.lit(GLOBAL_HEADER_HEX), body)
    return agg.select(
        F.col(session_col),
        F.col("packets"),
        (F.length(hex_stream) / 2).cast("long").alias("pcap_len"),
        F.unhex(hex_stream).alias("pcap"),
    )


def packet_positions(
    packets: DataFrame,
    *,
    file_col: str = "file_num",
    ts_us_col: str = "ts_us",
    payload_hex_col: str = "payload_hex",
    order_col: str = "event_id",
    snaplen: int = 65535,
) -> DataFrame:
    """Byte offset of every packet inside its rotated capture file.

    A "file" is whatever file_col identifies (day partitions here — use
    a derivation like datediff(day, epoch) so no global rank/shuffle is
    needed to number files). Offset = global header + sum of preceding
    record lengths, a windowed cumsum partitioned BY FILE — bounded
    state per partition regardless of total store size.
    """
    from pyspark.sql import Window

    orig_len = (F.length(payload_hex_col) / 2).cast("long")
    rec_len = F.lit(RECORD_HEADER_LEN) + F.least(orig_len, F.lit(snaplen))
    w = (
        Window.partitionBy(file_col)
        .orderBy(ts_us_col, order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return packets.withColumn(
        "file_offset",
        F.lit(GLOBAL_HEADER_LEN)
        + F.coalesce(F.sum(rec_len).over(w), F.lit(0)),
    )


def gap_encode_positions(
    positions: DataFrame,
    *,
    session_col: str = "session_id",
    file_col: str = "file_num",
    offset_col: str = "file_offset",
    ts_us_col: str = "ts_us",
    order_col: str = "event_id",
) -> DataFrame:
    """Fold per-packet (file, offset) into the reference's packetPos
    shape: [-file, first_offset, delta, ..., -next_file, offset, ...]
    (capture/db.c:848-850). Pure aggregate-lambda fold over the sorted
    array — stays in codegen, no Python."""
    per = positions.select(
        F.col(session_col),
        F.struct(
            F.col(ts_us_col).alias("ts_us"),
            F.col(order_col).alias("ord"),
            F.col(file_col).cast("long").alias("f"),
            F.col(offset_col).cast("long").alias("o"),
        ).alias("p"),
    )
    agg = per.groupBy(session_col).agg(
        F.sort_array(F.collect_list("p")).alias("ps")
    )
    folded = F.aggregate(
        F.col("ps"),
        F.struct(
            F.lit(-1).cast("long").alias("last_f"),
            F.lit(0).cast("long").alias("last_o"),
            F.array().cast("array<long>").alias("acc"),
        ),
        lambda st, p: F.struct(
            p["f"].alias("last_f"),
            p["o"].alias("last_o"),
            F.when(
                st["last_f"] == p["f"],
                F.concat(st["acc"], F.array(p["o"] - st["last_o"])),
            )
            .otherwise(F.concat(st["acc"], F.array(-p["f"], p["o"])))
            .alias("acc"),
        ),
        lambda st: st["acc"],
    )
    return agg.select(F.col(session_col), folded.alias("packet_pos"))
