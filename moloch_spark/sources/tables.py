"""Table loaders for the driver's synthetic star schema.

The reference's analog is the time-rotated ``sessions3-*`` indices plus
small aux indices (``files``, ``lookups``, ``users``, ... — db/db.pl).
Here the fact tables are parquet; loaders keep the scan declarative so
Catalyst gets predicate pushdown + column pruning for free.
"""

from __future__ import annotations

import os

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
