"""Hunts, cron standing queries, rootId chunking, and the streaming
sessionizer exposed through the driver gate."""

from __future__ import annotations

import datetime as dt
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moloch_spark.catalog import events_catalog
from moloch_spark.operators.hunts import HuntSpec, hunt
from moloch_spark.operators.sessionize import sessionize_events
from moloch_spark.registry import register
from moloch_spark.sources.tables import load_table
from moloch_spark.streaming.cron import CronQuery, CronRunner
from moloch_spark.streaming.sessionizer import streaming_sessionize

# ---------------------------------------------------------------------------
# hunts (viewer/apiHunts.js): payload content search
# ---------------------------------------------------------------------------


@register(
    "hunt_ascii_and_regex",
    """
    SELECT doc_id, 'h-ascii' AS hunt_id FROM documents
    WHERE contains(lower(text), 'merge')
    UNION ALL
    SELECT doc_id, 'h-regex' AS hunt_id FROM documents
    WHERE regexp_matches(text, 'sc[ae]n')
    ORDER BY hunt_id, doc_id
    """,
)
def q_hunt(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    a = hunt(docs, HuntSpec("h-ascii", "ascii", "MERGE"), payload_cols=["text"], id_col="doc_id")
    r = hunt(docs, HuntSpec("h-regex", "regex", "sc[ae]n"), payload_cols=["text"], id_col="doc_id")
    return a.unionByName(r).orderBy("hunt_id", "doc_id")


# ---------------------------------------------------------------------------
# cron standing query: one tick with a pinned clock (the incremental
# checkpoint mechanics are exercised in tests/test_streaming.py)
# ---------------------------------------------------------------------------


@register(
    "cron_query_tick",
    """
    SELECT event_id, ts, 'alert' AS tags, 'errs' AS cron_name
    FROM events
    WHERE ts <= TIMESTAMP '2024-01-15 00:00:00' - INTERVAL 90 SECOND
      AND event_type = 'error'
    ORDER BY event_id
    """,
)
def q_cron_tick(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    runner = CronRunner(
        tempfile.mktemp(suffix=".json"), events_catalog()
    )  # fresh state: first tick scans from the epoch, like a new cron query
    out = runner.run_once(
        ev,
        CronQuery("errs", "event.type == error", tags=["alert"]),
        now=dt.datetime(2024, 1, 15, 0, 0, 0),
        id_cols=["event_id", "ts"],
    )
    # CSV-join for the driver canonicalizer (list cells are unhashable there)
    return out.withColumn("tags", F.array_join("tags", ",")).orderBy("event_id")


# ---------------------------------------------------------------------------
# long-session chunking (mid-save rootId semantics, capture/session.c:312)
# ---------------------------------------------------------------------------


@register(
    "sessionize_chunked_rootid",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS root_seq
      FROM seq
    ), chunked AS (
      SELECT *,
             (epoch_ms(ts) - epoch_ms(MIN(ts) OVER (PARTITION BY user_id, root_seq)))
               // 600000 AS chunk_seq
      FROM numbered
    )
    SELECT user_id,
           CAST(root_seq AS VARCHAR) || '-' || CAST(chunk_seq AS VARCHAR) AS session_seq,
           CAST(MIN(root_seq) AS BIGINT) AS root_seq,
           MIN(ts) AS first_packet, MAX(ts) AS last_packet,
           COUNT(*) AS packets,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS tot_bytes,
           array_to_string(list_sort(list(DISTINCT event_type)), ',') AS event_types,
           CAST(LEN(list(DISTINCT event_type)) AS BIGINT) AS event_types_cnt,
           epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS length_ms,
           CAST(user_id AS VARCHAR) || '#' || CAST(root_seq AS VARCHAR) || '-' || CAST(chunk_seq AS VARCHAR) AS session_id
    FROM chunked
    GROUP BY user_id, root_seq, chunk_seq
    """,
)
def q_sessionize_chunked(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # CSV-join for the driver canonicalizer (list cells are unhashable there)
    return sessionize_events(ev, idle_timeout_s=1800, chunk_s=600).withColumn(
        "event_types", F.array_join("event_types", ",")
    )


# ---------------------------------------------------------------------------
# per-protocol idle timeouts (capture/config.c:518-523)
# ---------------------------------------------------------------------------


@register(
    "sessionize_per_proto_timeouts",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) >
                     (CASE event_type WHEN 'error' THEN 600
                                      WHEN 'click' THEN 1800
                                      ELSE 3600 END) * 1000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM seq
    )
    SELECT user_id, session_seq,
           MIN(ts) AS first_packet, MAX(ts) AS last_packet,
           COUNT(*) AS packets
    FROM numbered
    GROUP BY 1, 2
    """,
)
def q_sessionize_per_proto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from moloch_spark.operators.sessionize import assign_sessions, timeout_by_protocol

    ev = load_table(spark, "events", sf_dir)
    timeout = timeout_by_protocol(
        "event_type", {"error": 600, "click": 1800}, default_s=3600
    )
    with_ids = assign_sessions(ev, ["user_id"], "ts", idle_timeout_s=timeout)
    return with_ids.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("first_packet"),
        F.max("ts").alias("last_packet"),
        F.count(F.lit(1)).alias("packets"),
    )


# ---------------------------------------------------------------------------
# streaming sessionizer (stateful, non-SQL-expressible -> rows-only check)
# ---------------------------------------------------------------------------


@register("streaming_sessionize_closed")  # no oracle: custom stateful streaming
def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os

    # file source wants a directory; also the raw parquet carries
    # TIMESTAMP(NANOS), so stream it as long and convert in-flight
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    src = os.path.join(sf_dir, "events.parquet")
    d = tempfile.mkdtemp(prefix="events_stream_")
    os.symlink(src, os.path.join(d, "events.parquet"))
    raw_schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(raw_schema).parquet(d)
    # branch on the ACTUAL streamed dtype: nanosAsLong only kicks in when
    # the file really carries TIMESTAMP(NANOS); smaller SFs arrive as
    # micros and load as timestamp/timestamp_ntz directly
    ts_dt = raw_schema["ts"].dataType.simpleString()
    if ts_dt == "bigint":
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    elif ts_dt == "timestamp_ntz":
        # wall clock == UTC in the fixtures; watermarking needs an instant
        stream = stream.withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
    name = f"sess_{uuid.uuid4().hex[:8]}"
    q = (
        streaming_sessionize(stream, idle_timeout_s=1800, watermark_delay="1 minute")
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # driver canonicalizer can't sort array columns -> CSV-join, same as
    # the other array-emitting gates (queries_stream.py:72, queries_api.py)
    return spark.table(name).withColumn(
        "event_types", F.array_join(F.array_sort("event_types"), ",")
    )


# ---------------------------------------------------------------------------
# pcap-over-ip re-framing (ref capture/reader-pcapoverip.c)
# ---------------------------------------------------------------------------


@register(
    "pcap_over_ip_reframe",
    """
    WITH pkts AS (
      SELECT doc_id, unnest(range(0, 1 + doc_id % 5)) AS i
      FROM documents
    )
    SELECT 'conn' || doc_id AS conn_id,
           CAST(i AS BIGINT) AS pkt_index,
           CAST(doc_id * 1000 + i AS BIGINT) AS ts_us,
           CAST(20 + (doc_id + i) % 50 AS BIGINT) AS incl_len,
           CAST(20 + (doc_id + i) % 50 AS BIGINT) AS orig_len,
           CAST(i % 256 AS INT) AS first_byte
    FROM pkts
    ORDER BY conn_id, pkt_index
    """,
)
def q_pcap_over_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pcap-over-ip transport: synthesize each connection's byte stream
    (global header + records), split into 37-byte chunks that straddle
    record boundaries, then re-frame per connection. Only passes if the
    carry-over walk reassembles records split across chunks — the
    reference reader's exact job (capture/reader-pcapoverip.c)."""
    from moloch_spark.streaming.pcap_over_ip import (
        reframe_pcap_chunks,
        synth_pcap_stream_chunks,
    )

    docs = load_table(spark, "documents", sf_dir)
    chunks = synth_pcap_stream_chunks(docs)
    pkts = reframe_pcap_chunks(chunks)
    return pkts.select(
        "conn_id", "pkt_index", "ts_us", "incl_len", "orig_len",
        F.expr("CAST(conv(hex(substring(data, 1, 1)), 16, 10) AS INT)").alias(
            "first_byte"
        ),
    ).orderBy("conn_id", "pkt_index")
