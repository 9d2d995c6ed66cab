"""Streaming sessionizer — the capture pipeline's stateful core.

Reference: moloch_session_find_or_create + idle-timeout close
(capture/session.c:419-469,484-543): packets hash to a session key,
accumulate into per-session state, and the session flushes when idle
longer than its protocol's timeout (tcp 480s, udp 60s, ... —
capture/config.c:518-523).

Spark shape: groupByKey(session key).applyInPandasWithState with
EventTimeTimeout. State = ONE open session per key (the reference's
hash-table entry); the watermark plays the role of the wall clock that
drives the lazy expiry scan. Emission happens when (a) a gap inside a
batch exceeds the timeout, or (b) the watermark passes last_seen +
timeout (the state timeout callback).

At 100 TB the state size is bounded by OPEN sessions only — identical
to the reference's maxStreams sizing (capture/config.c:525) — and the
shuffle is the same hash-by-key the reference's packet threads do.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("root_seq", T.LongType()),
        T.StructField("first_packet", T.TimestampType()),
        T.StructField("last_packet", T.TimestampType()),
        T.StructField("packets", T.LongType()),
        T.StructField("tot_bytes", T.DoubleType()),
        T.StructField("event_types", T.ArrayType(T.StringType())),
        T.StructField("event_types_cnt", T.LongType()),
        T.StructField("session_id", T.StringType()),
        # mid-save linkage (capture/db.c:579-596): chunks of one long
        # session share root_id; chunk_seq orders them
        T.StructField("root_id", T.StringType()),
        T.StructField("chunk_seq", T.LongType()),
    ]
)

# state: open-session accumulator (timestamps as epoch micros for exactness)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("root_seq", T.LongType()),
        T.StructField("first_us", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("packets", T.LongType()),
        T.StructField("tot_bytes", T.DoubleType()),
        T.StructField("event_types", T.ArrayType(T.StringType())),
        T.StructField("root_us", T.LongType()),  # first_us of the ROOT chunk
        T.StructField("chunk_seq", T.LongType()),
        # last event's type: the expiry timer must re-arm with the OPEN
        # session's per-protocol timeout even when a later batch
        # contributes no surviving rows
        T.StructField("last_etype", T.StringType()),
    ]
)


def _emit_row(user_id: int, st: tuple) -> dict[str, Any]:
    # state carries trailing bookkeeping fields (last_etype) the emitted
    # row doesn't need — unpack the accumulator prefix only
    root_seq, first_us, last_us, packets, tot_bytes, types, root_us, chunk_seq = st[:8]
    # collect_set semantics: NULL event types never enter the set (a
    # mixed None/str set would also crash the sort)
    types = sorted({t for t in types if t is not None})
    # a NULL session key yields NULL ids — an f-string would mint the
    # literal 'nan#...' and silently collide NULL-key sessions
    uid_null = user_id is None or (
        isinstance(user_id, float) and user_id != user_id
    )
    return {
        "user_id": user_id,
        "root_seq": root_seq,
        "first_packet": pd.Timestamp(first_us, unit="us"),
        "last_packet": pd.Timestamp(last_us, unit="us"),
        "packets": packets,
        "tot_bytes": round(tot_bytes, 4),
        "event_types": types,
        "event_types_cnt": len(types),
        # ids derive from (key, first-seen time), NOT a per-key counter:
        # counters reset when timed-out state is evicted, so they collide
        # across restarts; first_us is stable and replay-idempotent
        "session_id": None if uid_null else f"{user_id}#{first_us}",
        "root_id": None if uid_null else f"{user_id}#{root_us}",
        "chunk_seq": chunk_seq,
    }


def _run_batch(user_id, st, pdfs, wm_us, _timeout_ms, chunk_us, out, overflow_tag):
    """Shared in-batch accumulate loop for both sessionizer forms.

    st: unpacked 9-tuple state or None; pdfs: the batch iterator; closed
    sessions are appended to `out` (with overflow=False when
    overflow_tag is True — in-batch closes are never forced). Returns
    the new 9-tuple state, or None when nothing is open (every incoming
    event fell below the watermark and no session was started)."""
    if st is not None:
        (root_seq, first_us, last_us, packets, tot_bytes, types,
         root_us, chunk_seq, last_etype) = st
        types = list(types)
    else:
        root_seq, first_us, last_us, packets, tot_bytes, types = (
            0, None, None, 0, 0.0, []
        )
        root_us, chunk_seq, last_etype = None, 0, None

    def emit(row_state):
        row = _emit_row(user_id, row_state)
        if overflow_tag:
            row["overflow"] = False
        out.append(row)

    rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
    # drop events older than the watermark: they belong to sessions
    # that may already have been emitted — merging them would corrupt
    # counters (the watermark delay IS the lateness tolerance, exactly
    # like dropDuplicatesWithinWatermark's contract)
    for ts, value, etype in zip(
        rows["ts"], rows["value"], rows["event_type"]
    ):
        ts_us = int(pd.Timestamp(ts).value // 1000)
        if wm_us > 0 and ts_us < wm_us:
            continue
        if first_us is None:
            root_seq += 1
            first_us, last_us = ts_us, ts_us
            packets, tot_bytes, types = 0, 0.0, []
            root_us, chunk_seq = ts_us, 0
        elif ts_us - last_us > _timeout_ms(etype) * 1000:
            # idle gap inside the batch: close and start the next
            emit((root_seq, first_us, last_us, packets, tot_bytes,
                  types, root_us, chunk_seq))
            root_seq += 1
            first_us, last_us = ts_us, ts_us
            packets, tot_bytes, types = 0, 0.0, []
            root_us, chunk_seq = ts_us, 0
        elif chunk_us is not None and ts_us - first_us >= chunk_us:
            # mid-save: flush the running chunk, keep the session
            # identity (root_us) and advance the chunk counter
            emit((root_seq, first_us, last_us, packets, tot_bytes,
                  types, root_us, chunk_seq))
            first_us, last_us = ts_us, ts_us
            packets, tot_bytes, types = 0, 0.0, []
            chunk_seq += 1
        packets += 1
        tot_bytes += float(value)
        if etype not in types:
            types.append(etype)
        last_us = max(last_us, ts_us)
        last_etype = etype

    if first_us is None:
        # a NEW key whose entire first batch fell below the watermark:
        # nothing to accumulate and no open session — storing state
        # here would arm a timer off last_us=None and crash the query
        return None
    return (root_seq, first_us, last_us, packets, tot_bytes, types,
            root_us, chunk_seq, last_etype)


def make_session_fn(
    idle_timeout_s: int,
    chunk_s: int | None = None,
    timeout_by_type: dict[str, int] | None = None,
):
    """chunk_s = the tcpSaveTimeout analog: a session open longer than
    chunk_s is flushed as a partial chunk (counters reset, root_id and
    first-seen identity retained) — capture/session.c:312-357.

    timeout_by_type = the per-protocol idle timeouts
    (capture/config.c:518-523: tcp 480, udp 60, icmp 10, ...): the gap
    decision uses the INCOMING event's type, `idle_timeout_s` is the
    default — same semantics as the batch `timeout_by_protocol` column,
    so batch and streaming stay result-identical."""
    timeout_ms = idle_timeout_s * 1000
    by_type_ms = {k: v * 1000 for k, v in (timeout_by_type or {}).items()}
    chunk_us = chunk_s * 1_000_000 if chunk_s else None

    def _timeout_ms(etype) -> int:
        return by_type_ms.get(etype, timeout_ms)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[dict] = []

        if state.hasTimedOut:
            # watermark passed last_seen + timeout: flush the open session
            out.append(_emit_row(user_id, state.get))
            state.remove()
            yield pd.DataFrame(out)
            return

        st = state.get if state.exists else None
        wm_us = state.getCurrentWatermarkMs() * 1000
        new_st = _run_batch(
            user_id, st, pdfs, wm_us, _timeout_ms, chunk_us, out, False
        )
        if new_st is None:
            if out:
                yield pd.DataFrame(out)
            return

        state.update(new_st)
        # expire when the watermark passes last_seen + idle timeout; after
        # a restart the restored watermark may already be past that point
        # (the session should have closed during downtime) — clamp above
        # the watermark so it flushes on the next timeout pass instead of
        # failing INVALID_TIMEOUT_TIMESTAMP. The timer re-arms with the
        # OPEN session's last event type (persisted in state, so a batch
        # contributing no surviving rows keeps the per-proto timeout).
        last_us, last_etype = new_st[2], new_st[8]
        arm_ms = _timeout_ms(last_etype) if last_etype is not None else timeout_ms
        wm = state.getCurrentWatermarkMs()
        state.setTimeoutTimestamp(max(last_us // 1000 + arm_ms, wm + 1))
        if out:
            yield pd.DataFrame(out)

    return fn


def streaming_sessionize(
    events: DataFrame,
    *,
    idle_timeout_s: int = 1800,
    chunk_s: int | None = None,
    timeout_by_type: dict[str, int] | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """events (streaming DF with ts/user_id/event_type/value) -> stream of
    CLOSED sessions (and mid-save chunks when chunk_s is set);
    timeout_by_type gives per-protocol idle timeouts.

    NULL-ts rows are dropped (the batch sessionizer's contract): an
    event without event time cannot participate in watermarked idle
    timing, and whether the engine would silently drop or deliver it
    to the state fn is version-dependent — make it deterministic."""
    return (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_session_fn(idle_timeout_s, chunk_s, timeout_by_type),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


OVERFLOW_SESSION_SCHEMA = T.StructType(
    SESSION_SCHEMA.fields
    + [
        # True when the flush was forced by the state guardrail before the
        # session's event-time close point — the reference tags such
        # sessions too when the stream table overflows
        T.StructField("overflow", T.BooleanType()),
    ]
)


def make_bounded_session_fn(
    idle_timeout_s: int,
    state_ttl_s: int,
    chunk_s: int | None = None,
    timeout_by_type: dict[str, int] | None = None,
):
    """maxStreams-analog state guardrail (capture/config.c:525,568-573;
    session.c:517-531): the reference hard-caps its session hash table
    and force-saves the oldest entries when full. Spark's
    applyInPandasWithState cannot enumerate or evict OTHER keys' state
    from inside one key's call, so the native equivalent of an LRU cap
    is a PROCESSING-TIME TTL: any key silent for state_ttl_s wall
    seconds is force-flushed (tagged overflow=True when its event-time
    close wasn't due yet), no matter whether the watermark has stalled.
    That bounds state to (keys active in the last ttl window) ≈
    ingest_rate × ttl — the same resource bound maxStreams provides,
    expressed in time instead of entries. Event-time semantics inside a
    batch (idle-gap close, mid-save chunking, per-proto timeouts) are
    identical to make_session_fn (shared _run_batch)."""
    timeout_ms = idle_timeout_s * 1000
    by_type_ms = {k: v * 1000 for k, v in (timeout_by_type or {}).items()}
    chunk_us = chunk_s * 1_000_000 if chunk_s else None
    ttl_ms = state_ttl_s * 1000

    def _timeout_ms(etype) -> int:
        return by_type_ms.get(etype, timeout_ms)

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        out: list[dict] = []

        if state.hasTimedOut:
            st = state.get
            last_us, last_etype = st[2], st[8]
            wm_us = state.getCurrentWatermarkMs() * 1000
            # overflow iff the event-time close wasn't due yet — i.e. the
            # watermark hadn't reached last_seen + idle timeout and we are
            # evicting purely to bound state
            due_us = last_us + _timeout_ms(last_etype) * 1000
            row = _emit_row(user_id, st)
            row["overflow"] = bool(wm_us < due_us)
            out.append(row)
            state.remove()
            yield pd.DataFrame(out)
            return

        st = state.get if state.exists else None
        wm_us = state.getCurrentWatermarkMs() * 1000
        new_st = _run_batch(
            user_id, st, pdfs, wm_us, _timeout_ms, chunk_us, out, True
        )
        if new_st is None:
            if out:
                yield pd.DataFrame(out)
            return

        state.update(new_st)
        # wall-clock TTL, not a watermark timer: fires even when the
        # watermark stalls — the whole point of the guardrail
        state.setTimeoutDuration(ttl_ms)
        if out:
            yield pd.DataFrame(out)

    return fn


def streaming_sessionize_bounded(
    events: DataFrame,
    *,
    idle_timeout_s: int = 1800,
    state_ttl_s: int = 3600,
    chunk_s: int | None = None,
    timeout_by_type: dict[str, int] | None = None,
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """streaming_sessionize with the maxStreams-analog state guardrail:
    keys silent for state_ttl_s WALL seconds are force-flushed with
    overflow=True even if the watermark has stalled, so state never
    outgrows ingest_rate × ttl. Uses ProcessingTimeTimeout (a wall
    clock), hence results are not bit-reproducible across replays the
    way the EventTimeTimeout form is — the same determinism trade the
    reference makes when maxStreams evicts under pressure.
    NULL-ts rows are dropped (same contract as streaming_sessionize)."""
    return (
        events.filter(F.col("ts").isNotNull())
        .withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            make_bounded_session_fn(
                idle_timeout_s, state_ttl_s, chunk_s, timeout_by_type
            ),
            outputStructType=OVERFLOW_SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def streaming_dedup(events: DataFrame, *, key_cols: list[str], watermark_delay: str = "10 minutes") -> DataFrame:
    """Packet dedup (capture/dedup.c): drop events whose key was seen
    within the watermark window — dropDuplicatesWithinWatermark keyed on
    the header hash."""
    return events.withWatermark("ts", watermark_delay).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_timeline(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    interval: str = "1 hour",
    watermark_delay: str = "10 minutes",
    sums: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """Streaming facet timeline: watermarked tumbling-window counts +
    sums — the incremental form of endpoints.timeline (same buckets,
    same dsum exactness policy). Late rows inside the watermark fold
    into their window; state per open window is one aggregate buffer,
    so state size is bounded by (span ÷ interval), not event volume.
    In append mode a window emits exactly once, when the watermark
    passes its end — which is what makes the result equal to the batch
    timeline over the same closed data (asserted in test_streaming)."""
    from moloch_spark.operators.endpoints import dsum

    aggs = [F.count(F.lit(1)).alias("doc_count")]
    for src, alias in sums or []:
        aggs.append(dsum(src, alias))
    return (
        events.withWatermark(ts_col, watermark_delay)
        .groupBy(F.window(F.col(ts_col), interval).alias("w"))
        .agg(*aggs)
        .select(F.col("w.start").alias("bucket"), *[
            F.col(a) for a in ["doc_count"] + [al for _, al in (sums or [])]
        ])
    )
