"""SparkSession factory tuned for the engine.

Local-mode defaults mirror what we would set fleet-wide on a real cluster:
AQE on (runtime re-plan, skew-join handling), shuffle partitions sized to
the parallelism actually available instead of the 200 default, Arrow for
any pandas exchange, and UTC session time so timestamp semantics are
stable across engines (the DuckDB correctness oracle runs naive/UTC).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "moloch_spark", *, cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    On a real cluster the master/memory settings come from spark-submit;
    everything under ``spark.sql.*`` here is what we'd bake into the job
    config at any scale.
    """
    n = cpus or default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        # Size shuffles to available cores. On a 1000-executor cluster this
        # would be ~2-3x total cores; AQE coalesces small partitions anyway.
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # Driver fixtures are tz-naive parquet timestamps; without this Spark
        # 4 infers TIMESTAMP_NTZ (unix_millis()/unix_micros() reject NTZ —
        # window() has accepted it since 3.4). Reading as TIMESTAMP matches
        # DuckDB's naive oracle ONLY because session.timeZone is pinned to
        # UTC above. NOTE: this builder config does NOT protect the scored
        # surface — the driver uses a vanilla session, so all epoch math
        # must stay dtype-aware (operators/timeutil.py) regardless.
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.spill.compress", "true")
        .config("spark.ui.enabled", "false")
        # Single-JVM local mode: the "driver" heap IS the executor heap.
        # 48g of the 128g box keeps full GCs out of the bench timings
        # (16g showed multi-second GC outliers once ~70 query plans +
        # broadcasts accumulate in one session).
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Long-running many-query sessions (bench, a Thrift-server-style
        # deployment) leak broadcast/shuffle state until a DRIVER GC lets
        # ContextCleaner's weak refs fire; with a 48g heap that can be
        # never. 60s periodic GC keeps executor memory flat — without it,
        # queries late in a 100-query sequence see multi-second slowdowns
        # from accumulated broadcasts.
        .config("spark.cleaner.periodicGC.interval", "60s")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
