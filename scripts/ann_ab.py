"""Isolated ANN-family micro-bench (r11 ask #6): times the ANN gates
plus the other raw-vector-scanning gates the way bench.py does (noop
sink, best-of-N reps), one JSON line out. Run from a worktree root:
`python scripts/ann_ab.py [reps]`."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GATES = [
    "ann_brute_force_topk", "ann_int8_topk", "ann_lsh_bucketed_topk",
    "ann_ivf_topk", "ann_ivf_int8_topk", "ann_pq_adc_topk",
    "ann_ivf_pq_topk", "ann_indexed_topk", "knn_label_vote",
    "embedding_near_dups", "semdedup_prune", "decontaminate_semantic",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from moloch_spark.registry import all_queries
    from moloch_spark.session import get_spark

    spark = get_spark("ann_ab", cpus=cpus)
    q = all_queries()
    # warmup at sf0.001 touches codegen + builds memoized fixtures
    for name in GATES:
        try:
            q[name](spark, "/root/testdata/sf0.001").write.format(
                "noop"
            ).mode("overwrite").save()
        except Exception:
            pass
    out = {}
    for name in GATES:
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        rs = []
        for _ in range(reps):
            t0 = time.perf_counter()
            q[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            rs.append(round(time.perf_counter() - t0, 3))
        out[name] = rs
    print(json.dumps({
        "gates": out,
        "best_total": round(sum(min(v) for v in out.values()), 3),
        "loadavg": open("/proc/loadavg").read().split()[0],
    }))


if __name__ == "__main__":
    main()
