"""Additional TPC-H-shaped headliners — breadth for the join/agg planner
in the bench (forecast filter-agg, semi-join, conditional agg, big-group
having)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moloch_spark.registry import register
from moloch_spark.sources.tables import load_table

_DISC = (
    "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(8,4))"
)


@register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT CAST(SUM({_DISC}) AS DOUBLE) AS revenue, COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.09
      AND l_quantity < 24
    """,
)
def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.02, 0.09)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * F.col("l_discount").cast("decimal(8,4)")
            )
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "tpch_q12_shipmode_priority",
    """
    SELECT l.l_linestatus AS shipmode,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
    GROUP BY 1
    """,
)
def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
        .join(o, o.o_orderkey == l.l_orderkey)
        .groupBy(F.col("l_linestatus").alias("shipmode"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_promo_effect",
    f"""
    SELECT CAST(SUM(CASE WHEN p.p_type LIKE 'PROMO%' THEN {_DISC} ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE) AS promo_revenue,
           CAST(SUM({_DISC}) AS DOUBLE) AS total_revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1995-10-01 00:00:00'
    """,
)
def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    disc = F.col("l_extendedprice").cast("decimal(12,4)") * F.col(
        "l_discount"
    ).cast("decimal(8,4)")
    zero = F.lit(0).cast("decimal(12,4)")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1995-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-10-01").cast("timestamp"))
        )
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .agg(
            F.sum(
                F.when(F.col("p_type").startswith("PROMO"), disc).otherwise(zero)
            )
            .cast("double")
            .alias("promo_revenue"),
            F.sum(disc).cast("double").alias("total_revenue"),
        )
    )


@register(
    "tpch_q18_large_orders",
    """
    WITH big AS (
      SELECT l_orderkey FROM lineitem
      GROUP BY 1 HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
    FROM orders o
    JOIN big ON o.o_orderkey = big.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY 1, 2, 3, 4
    """,
)
def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 150)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l.select("l_orderkey", "l_quantity"), o.o_orderkey == F.col("l_orderkey"))
        .groupBy("c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,4)"))
            .cast("double")
            .alias("sum_qty")
        )
    )
