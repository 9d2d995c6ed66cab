"""Per-batch instrumentation for the two streaming gates VERDICT r11
item 2 flagged (streaming_state_cap, streaming_sessionize_closed):
replicates each gate body exactly but records every recentProgress
entry (batch id, rows, and the engine's own duration breakdown), so a
wall-clock regression can be attributed to a specific batch/phase or
pinned as ambient. Run it against any repo checkout:

    python scripts/streaming_probe.py /path/to/repo [reps]

One JSON line per (gate, rep) with total seconds + per-batch durations.
Run ALONE (no concurrent pytest/bench).
"""

import json
import os
import sys
import time
import uuid


def main() -> None:
    root = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sys.path.insert(0, root)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from moloch_spark.session import get_spark
    from moloch_spark.queries_stream import _stream_events
    from moloch_spark.streaming.sessionizer import (
        streaming_sessionize,
        streaming_sessionize_bounded,
    )

    spark = get_spark("streaming_probe", cpus=cpus)

    def progress_rows(q):
        out = []
        for p in q.recentProgress:
            out.append({
                "batchId": p["batchId"],
                "numInputRows": p["numInputRows"],
                "durationMs": p.get("durationMs"),
            })
        return out

    def run_closed():
        stream = _stream_events(spark, sf_dir)
        name = f"probe_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            streaming_sessionize(
                stream, idle_timeout_s=1800, watermark_delay="1 minute"
            )
            .writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(300)
        started = time.perf_counter() - t0
        spark.table(name).write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        return total, started, progress_rows(q)

    def run_cap():
        stream = _stream_events(spark, sf_dir)
        name = f"probe_{uuid.uuid4().hex[:8]}"
        t0 = time.perf_counter()
        q = (
            streaming_sessionize_bounded(
                stream, idle_timeout_s=1800, state_ttl_s=3600,
                watermark_delay="1 minute",
            )
            .writeStream.format("memory").queryName(name)
            .outputMode("append").trigger(availableNow=True).start()
        )
        deadline = time.time() + 180
        polls = 0
        while time.time() < deadline:
            if any(p["numInputRows"] > 0 for p in q.recentProgress):
                break
            polls += 1
            time.sleep(0.05)
        rows = progress_rows(q)
        q.stop()
        q.awaitTermination(60)
        started = time.perf_counter() - t0
        spark.table(name).write.format("noop").mode("overwrite").save()
        total = time.perf_counter() - t0
        return total, started, rows, polls

    for rep in range(reps):
        t, s, pr = run_closed()
        print(json.dumps({
            "gate": "streaming_sessionize_closed", "rep": rep,
            "total_s": round(t, 3), "stream_s": round(s, 3),
            "progress": pr,
            "loadavg": open("/proc/loadavg").read().split()[0],
        }), flush=True)
    for rep in range(reps):
        t, s, pr, polls = run_cap()
        print(json.dumps({
            "gate": "streaming_state_cap", "rep": rep,
            "total_s": round(t, 3), "stream_s": round(s, 3),
            "polls": polls, "progress": pr,
            "loadavg": open("/proc/loadavg").read().split()[0],
        }), flush=True)


if __name__ == "__main__":
    main()
