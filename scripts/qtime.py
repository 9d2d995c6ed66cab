"""Isolated per-gate micro-bench: times the named gates exactly the way
bench.py does (noop sink, best-of-N reps after an sf0.001 warmup), one
JSON line out. Usage:

    python scripts/qtime.py gate1 gate2 ... [--reps N] [--sf DIR]

Run it ALONE (no concurrent pytest/bench) or the numbers are garbage.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    gates = []
    i = 0
    while i < len(args):
        if args[i] == "--reps":
            reps = int(args[i + 1]); i += 2
        elif args[i] == "--sf":
            sf_dir = args[i + 1]; i += 2
        else:
            gates.append(args[i]); i += 1
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from moloch_spark.registry import all_queries
    from moloch_spark.session import get_spark

    spark = get_spark("qtime", cpus=cpus)
    q = all_queries()
    for name in gates:
        spark.sparkContext.setJobDescription(f"warmup:{name}")
        try:
            q[name](spark, "/root/testdata/sf0.001").write.format(
                "noop").mode("overwrite").save()
        except Exception:
            pass
    out = {}
    for name in gates:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        rs = []
        for r in range(reps):
            spark.sparkContext.setJobDescription(f"{name}:rep{r}")
            t0 = time.perf_counter()
            q[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            rs.append(round(time.perf_counter() - t0, 3))
        out[name] = rs
    print(json.dumps({
        "gates": out,
        "best_total": round(sum(min(v) for v in out.values()), 3),
        "loadavg": open("/proc/loadavg").read().split()[0],
    }))


if __name__ == "__main__":
    main()
