"""VERDICT r11 item 7: demonstrate (or retire) the usable-flag claim at
a scale where it can matter. sf0.1 embeddings are 2 000 rows — any
per-scan win drowns in job overhead there — so this builds a synthetic
N-row dim-64 embeddings table (same NULL/NaN/zero-vector pollution mix
as the fixtures), then A/Bs the vector-op entry filter:

  fold: filter(usable_expr(embedding))   — per-row higher-order
        element-validity + norm fold (the pre-r11 shape)
  flag: filter(usable)                   — the ingest-time boolean,
        parquet-pushable (the r11 shape)

Both sides run the SAME downstream work (a cosine against one broadcast
query vector, noop sink) so the delta is exactly the entry-filter cost.

    python scripts/usable_flag_ab.py [rows] [reps]

Run ALONE. One JSON line out.
"""

import json
import os
import sys
import tempfile
import time


def main() -> None:
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from pyspark.sql import functions as F

    from moloch_spark.operators.dedup import (
        cosine_expr,
        usable_expr,
        with_usable_flag,
    )
    from moloch_spark.session import get_spark

    spark = get_spark("usable_flag_ab", cpus=cpus)
    d = tempfile.mkdtemp(prefix="usable_ab_")
    # deterministic synthetic embeddings with the fixtures' pollution
    # mix: ~1% NULL vector, ~1% NaN element, ~1% zero vector
    base = spark.range(rows).select(
        F.col("id").alias("vec_id"),
        F.when(F.col("id") % 97 == 0, F.lit(None).cast("array<double>"))
        .when(
            F.col("id") % 89 == 0,
            F.array(*([F.lit(float("nan"))] + [F.lit(0.5)] * 63)),
        )
        .when(F.col("id") % 83 == 0, F.array(*([F.lit(0.0)] * 64)))
        .otherwise(
            F.transform(
                F.sequence(F.lit(0), F.lit(63)),
                lambda i: (
                    F.pmod(F.xxhash64(F.col("id"), i), F.lit(1000)) / 500.0
                    - 1.0
                ),
            )
        )
        .alias("embedding"),
    )
    base.write.mode("overwrite").parquet(f"{d}/plain")
    with_usable_flag(spark.read.parquet(f"{d}/plain")).write.mode(
        "overwrite"
    ).parquet(f"{d}/flagged")

    qvec = [0.25] * 64

    def downstream(df):
        return df.select(
            "vec_id",
            cosine_expr(
                F.col("embedding"), F.array(*[F.lit(x) for x in qvec])
            ).alias("cos"),
        )

    def timed(make):
        rs = []
        for _ in range(reps):
            spark.catalog.clearCache()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            downstream(make()).write.format("noop").mode("overwrite").save()
            rs.append(round(time.perf_counter() - t0, 3))
        return rs

    plain = lambda: spark.read.parquet(f"{d}/plain").filter(
        usable_expr("embedding")
    )
    flagged = lambda: (
        spark.read.parquet(f"{d}/flagged")
        .filter(F.col("usable"))
        .drop("usable")
    )
    # two interleaved blocks per side so ambient drift can't masquerade
    # as the effect: fold, flag, fold, flag
    out = {"rows": rows}
    out["fold"] = timed(plain)
    out["flag"] = timed(flagged)
    out["fold2"] = timed(plain)
    out["flag2"] = timed(flagged)
    from moloch_spark.plans import formatted_plan

    out["flag_pushed"] = "EqualTo(usable,true)" in formatted_plan(
        downstream(flagged())
    )
    out["loadavg"] = open("/proc/loadavg").read().split()[0]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
