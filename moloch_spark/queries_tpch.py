"""Additional TPC-H-shaped headliners — breadth for the join/agg planner
in the bench (forecast filter-agg, semi/anti joins, correlated scalar
subqueries, outer-join count distribution, disjunctive pushdown).

The driver's tables are a reduced TPC-H (no partsupp, no receipt/commit
dates, no comments); shapes that reference those columns are adapted:
lineitem's (l_partkey, l_suppkey) stands in for partsupp, l_returnflag
= 'R' stands in for "late", s_acctbal < 0 for "complaints", and
o_orderpriority = '1-URGENT' for q22's "no orders" predicate (every
customer here has orders). Numeric policy: every float aggregate runs
in exact DECIMAL on BOTH engines and casts to DOUBLE only at the end;
avg-threshold comparisons are rewritten cross-multiplied
(5*qty*cnt < sum) so no inexact division happens before a comparison."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from moloch_spark.registry import register
from moloch_spark.sources.tables import load_table

_DISC = (
    "CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(l_discount AS DECIMAL(8,4))"
)

# revenue term: extendedprice * (1 - discount), exact decimal both engines
_REV = (
    "CAST(l_extendedprice AS DECIMAL(12,4))"
    " * (1 - CAST(l_discount AS DECIMAL(8,4)))"
)


def _rev() -> Column:
    return F.col("l_extendedprice").cast("decimal(12,4)") * (
        F.lit(1).cast("decimal(8,4)") - F.col("l_discount").cast("decimal(8,4)")
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


@register(
    "tpch_q4_priority_exists",
    """
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY 1
    """,
)
def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4 shape: EXISTS decorrelated to a left-semi join (viewer has no
    subqueries; this is the Spark-native form — the semi join keeps only
    the orderkey column of the probe side, no row multiplication)."""
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    late = l.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .join(late, o.o_orderkey == late.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(EXTRACT(YEAR FROM l.l_shipdate) AS INTEGER) AS l_year,
             {_REV} AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
      WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
         OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    ) shipping
    GROUP BY 1, 2, 3
    """,
)
def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q7 shape: the only big-big shuffle is lineitem⋈orders; supplier,
    customer and both nation legs broadcast, and the nation-pair filter
    is pushed into each broadcast side BEFORE the join so non-qualifying
    suppliers/customers never reach the probe."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    n = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin("NATION_1", "NATION_2")
    )
    s = load_table(spark, "supplier", sf_dir).join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sk"),
                             F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("sk"),
    )
    c = load_table(spark, "customer", sf_dir).join(
        F.broadcast(n.select(F.col("n_nationkey").alias("ck"),
                             F.col("n_name").alias("cust_nation"))),
        F.col("c_nationkey") == F.col("ck"),
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(F.broadcast(s.select("s_suppkey", "supp_nation")),
               l.l_suppkey == F.col("s_suppkey"))
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey", "cust_nation")),
              o.o_custkey == F.col("c_custkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY 1, 2, 4, 5
    """,
)
def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape: returned-revenue per customer. Quarter filter prunes
    orders before the lineitem shuffle join; customer+nation broadcast."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    return (
        l.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
            ),
            l.l_orderkey == o.o_orderkey,
        )
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev()).cast("double").alias("revenue"))
    )


@register(
    "tpch_q13_order_distribution",
    """
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
      FROM customer c
      LEFT OUTER JOIN orders o
        ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
      GROUP BY 1
    ) c_orders
    GROUP BY 1
    """,
)
def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q13 shape: left-outer join with an ON-clause residual (priority
    filter must NOT drop order-less customers), then a two-level count
    distribution. COUNT(o_orderkey) counts non-null keys only, so
    no-match customers land in the c_count=0 bucket."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    per_cust = (
        c.join(
            o.filter(F.col("o_orderpriority") != "1-URGENT"),
            c.c_custkey == o.o_custkey,
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY 1
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total AS DOUBLE) AS total_revenue
    FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total = (SELECT MAX(total) FROM revenue)
    """,
)
def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 shape: argmax over an aggregated view. The scalar MAX(total)
    reduces map-side then broadcasts one row back against the aggregate
    (equi-join on the exact decimal total, so ties all surface = SQL MAX
    semantics) — no single-partition window over the per-supplier frame,
    which would serialize the whole aggregate at scale. Revenue stays
    exact decimal until the final cast."""
    s = load_table(spark, "supplier", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_rev()).alias("total"))
        # materialized once (per-supplier rows, dimension-sized): the
        # MAX broadcast and the tie-surfacing equi-join both read it —
        # without this each re-runs the lineitem scan + aggregation
        .localCheckpoint(eager=False)
    )
    mx = rev.agg(F.max("total").alias("mx"))
    top = rev.join(F.broadcast(mx), rev.total == mx.mx).drop("mx")
    return (
        F.broadcast(top)
        .join(s, top.supplier_no == s.s_suppkey)
        .select("s_suppkey", "s_name", F.col("total").cast("double").alias("total_revenue"))
    )


@register(
    "tpch_q16_supplier_cnt",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT ps.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON p.p_partkey = ps.l_partkey
    WHERE p.p_brand <> 'Brand#13'
      AND p.p_size IN (1, 3, 9, 14, 19, 23, 36, 45)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    """,
)
def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q16 shape: lineitem's distinct (part, supplier) pairs stand in
    for partsupp; negative-acctbal suppliers stand in for complaint
    filtering. NOT IN decorrelates to a broadcast left-anti join (safe
    here: s_suppkey is never NULL, so NOT IN == anti join)."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    keep_p = p.filter(
        (F.col("p_brand") != "Brand#13")
        & F.col("p_size").isin(1, 3, 9, 14, 19, 23, 36, 45)
    )
    return (
        pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(keep_p), pairs.l_partkey == keep_p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q17_small_qty_revenue",
    """
    WITH bparts AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
    bl AS (
      SELECT l.* FROM lineitem l
      JOIN bparts ON bparts.p_partkey = l.l_partkey
    ),
    agg AS (
      SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sq,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM bl GROUP BY 1
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0
           AS avg_yearly
    FROM bl l JOIN agg a ON a.l_partkey = l.l_partkey
    WHERE 5 * CAST(l.l_quantity AS DECIMAL(18,4)) * a.cnt < a.sq
    """,
)
def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q17 shape: correlated per-part AVG threshold. The avg comparison
    is cross-multiplied (5*qty*cnt < sum) so both engines compare exact
    decimals — no division before the filter. Brand filter is semi-
    pushed below the self-aggregation so only that brand's lineitems
    shuffle (at 100 TB that's the difference between aggregating the
    whole fact table and ~1/25 of it)."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    bparts = p.filter(F.col("p_brand") == "Brand#13").select("p_partkey")
    bl = l.join(F.broadcast(bparts), l.l_partkey == F.col("p_partkey"), "left_semi")
    agg = bl.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("sq"),
        F.count(F.lit(1)).alias("cnt"),
    )
    return (
        bl.join(F.broadcast(agg), bl.l_partkey == agg.pk)
        .filter(
            F.lit(5) * F.col("l_quantity").cast("decimal(18,4)") * F.col("cnt")
            < F.col("sq")
        )
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / F.lit(7.0)
            ).alias("avg_yearly")
        )
    )


@register(
    "tpch_q19_disjunctive_revenue",
    f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19 shape: disjunctive mixed-table predicate. The per-table
    halves of the OR are pre-pushed below the join (qty 1..30 on
    lineitem, the brand/size union on part) so the scan prunes before
    the broadcast join; the full residual evaluates after."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    arms = [
        ("Brand#2", (1, 5), (1, 11)),
        ("Brand#3", (1, 10), (10, 20)),
        ("Brand#4", (1, 15), (20, 30)),
    ]
    p_pre = None
    full = None
    for brand, (s1, s2), (q1_, q2_) in arms:
        p_arm = (F.col("p_brand") == brand) & F.col("p_size").between(s1, s2)
        arm = p_arm & F.col("l_quantity").between(q1_, q2_)
        p_pre = p_arm if p_pre is None else (p_pre | p_arm)
        full = arm if full is None else (full | arm)
    return (
        l.filter(F.col("l_quantity").between(1, 30))
        .join(F.broadcast(p.filter(p_pre)), l.l_partkey == p.p_partkey)
        .filter(full)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "tpch_q21_waiting_supplier",
    """
    SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY 1
    """,
)
def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: correlated EXISTS + NOT EXISTS over the same fact
    table (l_returnflag='R' stands in for late receipt). Both
    decorrelate to semi/anti self-joins on l_orderkey with a
    different-supplier residual. All four joins share the l_orderkey
    key: at bench SF Catalyst broadcasts every build side; at fact-
    table scale they become same-keyed shuffle joins, so one orderkey
    exchange of l1 serves the semi, anti, and orders probes."""
    s = load_table(spark, "supplier", sf_dir)
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    l1 = l.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = l.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = l.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3")
    )
    return (
        l1.join(
            l2,
            (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2),
            "left_semi",
        )
        .join(
            l3,
            (l1.l_orderkey == l3.k3) & (l1.l_suppkey != l3.s3),
            "left_anti",
        )
        .join(
            o.filter(F.col("o_orderstatus") == "F").select("o_orderkey"),
            l1.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


@register(
    "tpch_q22_global_sales_opportunity",
    """
    WITH pos AS (
      SELECT SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM customer WHERE c_acctbal > 0
    )
    SELECT c.c_nationkey % 5 AS cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM customer c, pos
    WHERE CAST(c.c_acctbal AS DECIMAL(18,4)) * pos.n > pos.s
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY 1
    """,
)
def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape: scalar-avg subquery + anti join. Every customer in
    this dataset has orders, so the anti joins against URGENT orders
    instead. The global avg threshold is cross-multiplied
    (bal * n > sum, exact decimals) and delivered as a 1-row broadcast
    (plain cross-join here — Catalyst plans a 1-row broadcast nested
    loop, no driver round-trip)."""
    c = load_table(spark, "customer", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    bal = F.col("c_acctbal").cast("decimal(18,4)")
    pos = c.filter(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("s"), F.count(F.lit(1)).alias("n")
    )
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(bal * F.col("n") > F.col("s"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy((F.col("c_nationkey") % 5).alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(bal).cast("double").alias("totacctbal"),
        )
    )


@register(
    "tpch_q2_min_cost_supplier",
    """
    WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    located AS (
      SELECT sp.l_partkey, sp.l_suppkey, s.s_name, s.s_acctbal
      FROM supply sp
      JOIN supplier s ON s.s_suppkey = sp.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ),
    ranked AS (
      SELECT p.p_partkey, p.p_brand, l.s_name, l.s_acctbal,
             ROW_NUMBER() OVER (PARTITION BY p.p_partkey
                                ORDER BY l.s_acctbal, l.l_suppkey) AS rn
      FROM located l
      JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_type = 'STANDARD' AND p.p_size < 10
    )
    SELECT p_partkey, p_brand, s_name, s_acctbal
    FROM ranked WHERE rn = 1
    """,
)
def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 shape: correlated MIN subquery (cheapest qualifying supplier
    per part) decorrelated to a rank-1 window — one pass instead of the
    rejoin-on-MIN the SQL form implies. lineitem's distinct pairs stand
    in for partsupp; s_acctbal for supply cost. The supplier/nation/
    region leg broadcasts; the window partitions by part key, so the
    heavy side shuffles ONCE on its natural key."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    located = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "EUROPE")),
              n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal")
    )
    pairs = l.select("l_partkey", "l_suppkey").distinct()
    keep_p = p.filter((F.col("p_type") == "STANDARD") & (F.col("p_size") < 10))
    w = Window.partitionBy("p_partkey").orderBy("s_acctbal", "l_suppkey")
    return (
        pairs.join(F.broadcast(located), pairs.l_suppkey == located.s_suppkey)
        .join(F.broadcast(keep_p), pairs.l_partkey == keep_p.p_partkey)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("p_partkey", "p_brand", "s_name", "s_acctbal")
    )


@register(
    "tpch_q8_market_share",
    f"""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                              ELSE CAST(0 AS DECIMAL(12,4)) END) AS DOUBLE)
                / CAST(SUM(volume) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_REV} AS volume, n1.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA'
    ) nations
    GROUP BY 1
    """,
)
def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape: market share = conditional-sum / total-sum in ONE
    grouped pass (the two-query formulation is a single conditional
    aggregation here). Sums stay exact decimal; the share divides two
    exact doubles, so both engines produce the identical quotient."""
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    cust_in_region = (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r.filter(F.col("r_name") == "ASIA")),
              n.n_regionkey == r.r_regionkey)
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("snk"),
                             F.col("n_name").alias("supp_nation"))),
        s.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "supp_nation")
    zero = F.lit(0).cast("decimal(12,4)")
    nat = F.sum(F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(zero))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cust_in_region), o.o_custkey == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), l.l_suppkey == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (nat.cast("double") / F.sum(_rev()).cast("double"))
            .cast("double")
            .alias("mkt_share")
        )
    )


@register(
    "tpch_q9_product_profit",
    """
    SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             CAST(EXTRACT(YEAR FROM o.o_orderdate) AS INTEGER) AS o_year,
             CAST(l.l_extendedprice AS DECIMAL(12,4))
               * (1 - CAST(l.l_discount AS DECIMAL(8,4)))
               - CAST(p.p_retailprice AS DECIMAL(12,4))
                 * CAST(0.10 AS DECIMAL(4,2))
                 * CAST(l.l_quantity AS DECIMAL(12,4)) AS amount
      FROM lineitem l
      JOIN part p ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE p.p_name LIKE '%red%'
    ) profit
    GROUP BY 1, 2
    """,
)
def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 shape: profit by supplier-nation and year. Supply cost has no
    column in the reduced schema, so cost = 10% of retail price × qty
    (exact decimals both engines). part/supplier/nation broadcast; the
    one big-big join (lineitem⋈orders) carries only 3 columns."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    amount = _rev() - (
        F.col("p_retailprice").cast("decimal(12,4)")
        * F.lit(0.10).cast("decimal(4,2)")
        * F.col("l_quantity").cast("decimal(12,4)")
    )
    supp_nat = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("snk"),
                             F.col("n_name").alias("nation"))),
        s.s_nationkey == F.col("snk"),
    ).select("s_suppkey", "nation")
    return (
        l.join(F.broadcast(p.filter(F.col("p_name").like("%red%"))
                           .select("p_partkey", "p_retailprice")),
               l.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nat), l.l_suppkey == F.col("s_suppkey"))
        .join(o.select("o_orderkey", "o_orderdate"),
              l.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(amount).cast("double").alias("sum_profit"))
    )


@register(
    "tpch_q11_important_stock",
    f"""
    WITH vals AS (
      SELECT l.l_partkey, SUM({_REV}) AS value
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      WHERE s.s_nationkey = 5
      GROUP BY 1
    ),
    total AS (SELECT SUM(value) AS tv FROM vals)
    SELECT l_partkey, CAST(value AS DOUBLE) AS value
    FROM vals, total
    WHERE value * 1000 > tv
    """,
)
def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 shape: groups exceeding a FRACTION of the global total. The
    threshold compare is cross-multiplied (value*1000 > total) over
    exact decimals; the total re-aggregates the tiny per-part result,
    not the fact table, and rides a 1-row broadcast."""
    l = load_table(spark, "lineitem", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    nat5 = s.filter(F.col("s_nationkey") == 5).select("s_suppkey")
    vals = (
        l.join(F.broadcast(nat5), l.l_suppkey == nat5.s_suppkey, "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev()).alias("value"))
        # materialized once so the total really does re-aggregate the
        # per-part result — without this the lineage under the 1-row
        # broadcast re-runs the full lineitem semi-join + aggregation
        .localCheckpoint(eager=False)
    )
    total = vals.agg(F.sum("value").alias("tv"))
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(F.col("value") * 1000 > F.col("tv"))
        .select("l_partkey", F.col("value").cast("double").alias("value"))
    )


@register(
    "tpch_q20_part_supply_nation",
    """
    WITH shipped AS (
      SELECT l_suppkey, l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY 1, 2
    ),
    heavy AS (
      SELECT DISTINCT sh.l_suppkey
      FROM shipped sh
      JOIN part p ON p.p_partkey = sh.l_partkey
      WHERE p.p_name LIKE 'blue%' AND sh.q > 30
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_7'
      AND EXISTS (SELECT 1 FROM heavy h WHERE h.l_suppkey = s.s_suppkey)
    """,
)
def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 shape: nested semi-joins — suppliers (in one nation) who
    shipped >30 units of any 'blue%' part in 1996. The per-(supplier,
    part) aggregation runs ONLY over the date slice, the part-name
    filter broadcasts into it, and the surviving supplier ids semi-join
    the (tiny) supplier dim."""
    l = load_table(spark, "lineitem", sf_dir)
    p = load_table(spark, "part", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    shipped = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(p.filter(F.col("p_name").like("blue%"))
                          .select("p_partkey")),
              F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("q"))
        .filter(F.col("q") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(F.broadcast(n.filter(F.col("n_name") == "NATION_7")),
               s.s_nationkey == F.col("n_nationkey"))
        .join(shipped, s.s_suppkey == shipped.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
    )
