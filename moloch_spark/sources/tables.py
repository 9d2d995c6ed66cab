"""Table loaders for the driver's synthetic star schema.

The reference's analog is the time-rotated ``sessions3-*`` indices plus
small aux indices (``files``, ``lookups``, ``users``, ... — db/db.pl).
Here the fact tables are parquet; loaders keep the scan declarative so
Catalyst gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Dimension tables small enough to broadcast at ANY scale factor — these are
# bounded by the schema (TPC-H nation=25, region=5) not by sf.
BROADCAST_DIMS = frozenset({"region", "nation"})


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
        # reader rejects; read it as a long and truncate ns -> us exactly
        # like DuckDB does when mapping to its microsecond TIMESTAMP.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if dict(df.dtypes).get("ts") in ("bigint", "long"):
            from pyspark.sql import functions as F

            # integer division — double division loses precision above 2^53
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


_USABLE_EMB_CACHE: dict[str, str] = {}


def load_usable_embeddings(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> DataFrame:
    """Embeddings with the vector-usability contract MATERIALIZED as a
    persisted `usable` boolean column — the ingest-time form (VERDICT
    r10 perf watch). At 100 TB the per-element norm fold runs once in
    the ingest job and rides along as a pushable boolean; every
    `usable_vectors` entry downstream then filters on the flag instead
    of re-deriving a higher-order aggregate per scan. Locally the
    flagged copy is built once per (process, sf_dir) into a tempdir —
    same memoization contract as the media fixtures (immutable sf_dir
    dirs per TESTDATA.md). Row universe and all other columns are
    IDENTICAL to load_table(..., "embeddings"): the flag annotates, it
    never filters."""
    import tempfile

    from moloch_spark.fixture_cache import memoized_fixture

    def build() -> str:
        from moloch_spark.operators.dedup import with_usable_flag

        d = tempfile.mkdtemp(prefix="usable_emb_") + "/embeddings"
        with_usable_flag(load_table(spark, "embeddings", sf_dir)).write.mode(
            "overwrite"
        ).parquet(d)
        return d

    path = memoized_fixture(
        _USABLE_EMB_CACHE, sf_dir, os.path.isdir, build
    )
    return spark.read.parquet(path)


def load_usable_embeddings_spread(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR
) -> DataFrame:
    """load_usable_embeddings + spread_small_scan (split estimate from
    the ORIGINAL fixture file — the flagged copy is the same data)."""
    return spread_small_scan(
        load_usable_embeddings(spark, sf_dir), spark, "embeddings", sf_dir
    )


def spread_small_scan(
    df: DataFrame, spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR
) -> DataFrame:
    """Repartition a scan ONLY when the on-disk layout yields fewer
    input splits than cores. The local fixtures are one small parquet
    file each (one row group = one unsplittable input partition), so a
    gram-expansion / heavy-expression pipeline downstream would run on a
    single core; on a real cluster the table is thousands of splits and
    this returns the scan untouched — no shuffle is added at scale.
    Split estimate is file-size arithmetic (never touches the plan:
    df.rdd.getNumPartitions() under AQE would EXECUTE it)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(path):
            sizes = [
                os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path)
                if f.endswith(".parquet")
            ]
        else:
            sizes = [os.path.getsize(path)]
    except OSError:
        return df
    raw = spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728b")
    m = re.match(r"(\d+)\s*([kmg]?)b?$", raw.strip().lower())
    max_split = (
        int(m.group(1)) * {"": 1, "k": 2**10, "m": 2**20, "g": 2**30}[m.group(2)]
        if m
        else 128 * 2**20
    )
    splits = sum(max(1, -(-s // max_split)) for s in sizes)
    par = spark.sparkContext.defaultParallelism
    return df.repartition(par) if splits < par else df


def load_table_spread(
    spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR
) -> DataFrame:
    """load_table + spread_small_scan — for gates whose per-row work
    (gram explosion, signature math, codecs) dominates the scan."""
    return spread_small_scan(load_table(spark, name, sf_dir), spark, name, sf_dir)


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, name, sf_dir) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view for the SQL API path."""
    for name in TABLES:
        load_table(spark, name, sf_dir).createOrReplaceTempView(name)


def null_reader(spark: SparkSession, rows_per_second: int = 10) -> DataFrame:
    """The null/no-op reader (capture/reader-null.c): a rate source used
    to exercise streaming plumbing with no real input."""
    return (
        spark.readStream.format("rate")
        .option("rowsPerSecond", str(rows_per_second))
        .load()
    )
