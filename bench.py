"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full computation, no
driver collect). A warmup pass on sf0.001 first touches all code paths so
JVM/codegen startup isn't attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moloch_spark import queries as q
from moloch_spark.session import get_spark


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("moloch_spark_bench", cpus=cpus)

    registry = q.queries()
    # OPTIONAL scaling-probe knob (r11 verdict item 8; ADDITIVE only —
    # unset, the run is byte-identical to the full bench): a comma-
    # separated gate list restricts the run so the driver can re-bench
    # the heaviest gates at a larger SF, where per-query compute
    # finally dominates the fixed job overhead that makes the sf0.1
    # core-count ratios pure noise (the 8-core total equals the
    # 32-core total there). Example probe:
    #   SPARK_GRAFT_SUBSET=$(python -c "import json; d=json.load(open(
    #     'BENCH_LOCAL.json'))['queries']; print(','.join(sorted(
    #     d, key=d.get)[-10:]))") \
    #   SPARK_GRAFT_SF_DIR=/root/testdata/sf1 python bench.py
    subset = os.environ.get("SPARK_GRAFT_SUBSET")
    if subset:
        keep = {s.strip() for s in subset.split(",") if s.strip()}
        registry = {k: v for k, v in registry.items() if k in keep}

    # warmup: tiny sf touches codegen/JIT for every query shape
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir):
        for fn in registry.values():
            try:
                force(fn(spark, warm_dir))
            except Exception:
                pass

    # per-query isolation: one failing query records an error entry instead
    # of aborting the whole bench (round-1 postmortem: a single analysis
    # exception produced NO numbers at all)
    timings: dict[str, float] = {}
    rep_times: dict[str, list[float]] = {}
    errors: dict[str, str] = {}
    for i, (name, fn) in enumerate(sorted(registry.items())):
        # Drop the previous queries' broadcast/shuffle garbage BETWEEN
        # timings: ContextCleaner frees executor state only after a driver
        # GC, and without this the 80th+ query pays multi-second pauses
        # for the first 79 queries' accumulated broadcasts (measured: q18
        # 10s in-sequence vs 1.5s clean). clearCache drops any cached
        # relations a query left behind so later scans re-read parquet
        # like the driver's fresh sessions do. On a real cluster each
        # query is its own job and the cleaner keeps up; this reproduces
        # that hygiene inside one long-lived session.
        if i % 10 == 0:
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
        try:
            # best-of-2: this box shows hypervisor-level noisy-neighbor
            # stalls that randomly inflate a single run 5-10x (measured:
            # same query 1.2s and 15s minutes apart at idle load).  The
            # min of two back-to-back runs is the reproducible number;
            # BOTH reps are recorded so cross-round comparisons can tell
            # ambient noise (reps far apart) from a real regression
            # (reps agree and both moved).
            reps = []
            for _rep in range(2):
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                reps.append(round(time.perf_counter() - t0, 4))
            rep_times[name] = reps
            timings[name] = min(reps)
        except Exception as exc:  # noqa: BLE001 — record and keep benching
            errors[name] = f"{type(exc).__name__}: {str(exc)[:300]}"
            print(f"bench: {name} FAILED: {errors[name]}", file=sys.stderr)

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "total_query_wall_time",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "reps": 2,
        "rep_times": rep_times,
        "loadavg": open("/proc/loadavg").read().split()[0]
        if os.path.exists("/proc/loadavg")
        else None,
    }
    if errors:
        out["errors"] = errors
    # persist the full result next to the repo so per-query timings stay
    # reviewable even when the driver artifact truncates stdout; a
    # SUBSET probe records to its own file so it can never clobber the
    # full-run bookkeeping record
    try:
        local = os.path.join(
            os.path.dirname(os.path.abspath(__file__)),
            "BENCH_LOCAL_subset.json" if subset else "BENCH_LOCAL.json",
        )
        with open(local, "w") as fh:
            json.dump(out, fh, indent=1, sort_keys=True)
    except OSError:
        pass
    print(json.dumps(out))


if __name__ == "__main__":
    main()
