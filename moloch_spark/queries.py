"""Query registry: every implemented operator exposed as (spark, sf_dir) ->
DataFrame, paired with an ANSI-SQL oracle that DuckDB runs on the same
parquet tables.

Naming contract (driver): aggregate/computed columns carry the SAME alias
in the Spark plan and the oracle SQL; numeric aggregations of doubles go
through decimal so both engines produce bit-identical results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moloch_spark.operators.endpoints import (
    connections,
    connections_baseline,
    dsum,
    multiunique,
    sessions_search,
    spigraph,
    spigraph_hierarchy,
    spiview,
    timeline,
    unique,
)
from moloch_spark.catalog import documents_catalog, events_catalog
from moloch_spark.expr import CompileContext, compile_expression
from moloch_spark.operators.sessionize import sessionize_events
from moloch_spark.registry import register
from moloch_spark.sources.tables import load_table

QueryFn = Callable[[SparkSession, str], DataFrame]


def queries() -> dict[str, QueryFn]:
    from moloch_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from moloch_spark.registry import all_oracles

    return all_oracles()


# ---------------------------------------------------------------------------
# flagship: TPC-H Q1-style pricing summary over lineitem
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1 - l_discount AS DECIMAL(8,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(
                F.col("l_extendedprice").cast("decimal(12,4)")
                * (F.lit(1) - F.col("l_discount")).cast("decimal(8,4)")
            )
            .cast("double")
            .alias("sum_disc_price"),
            (
                F.sum(F.col("l_quantity").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_qty"),
            (
                F.sum(F.col("l_discount").cast("decimal(18,4)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# sessions list — filter + sort + page + project (apiSessions.js:1618)
# ---------------------------------------------------------------------------


@register(
    "sessions_search_events",
    """
    SELECT event_id, ts, user_id, event_type, value
    FROM events
    WHERE event_type IN ('error', 'purchase') AND value >= 50.0
    ORDER BY ts ASC, event_id ASC
    LIMIT 200
    """,
)
def q_sessions_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return sessions_search(
        ev,
        F.col("event_type").isin("error", "purchase") & (F.col("value") >= 50.0),
        sort=[("ts", True), ("event_id", True)],
        limit=200,
        fields=["event_id", "ts", "user_id", "event_type", "value"],
    )


# ---------------------------------------------------------------------------
# timeline facets — date histogram + sums (apiSessions.js:1281-1330)
# ---------------------------------------------------------------------------


@register(
    "timeline_events_hourly",
    """
    SELECT date_trunc('hour', ts) AS bucket,
           COUNT(*) AS doc_count,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1
    """,
)
def q_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return timeline(ev, "ts", interval="hour", sums=[("value", "sum_value")])


@register(
    "timeline_events_dense",
    """
    WITH agg AS (
      SELECT date_trunc('hour', ts) AS bucket,
             COUNT(*) AS doc_count,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events GROUP BY 1
    ),
    bounds AS (SELECT min(bucket) AS lo, max(bucket) AS hi FROM agg),
    spine AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
              FROM bounds)
    SELECT s.bucket,
           COALESCE(a.doc_count, 0) AS doc_count,
           COALESCE(a.sum_value, 0.0) AS sum_value
    FROM spine s LEFT JOIN agg a ON s.bucket = a.bucket
    """,
)
def q_timeline_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_histogram parity incl. EMPTY buckets (min_doc_count=0):
    gaps between min and max emit zero rows, like the ES agg."""
    from moloch_spark.operators.endpoints import timeline_dense

    ev = load_table(spark, "events", sf_dir)
    return timeline_dense(ev, "ts", interval="hour", sums=[("value", "sum_value")])


# ---------------------------------------------------------------------------
# unique — top-K terms (apiSessions.js:2283-2407)
# ---------------------------------------------------------------------------


@register(
    "cardinality_fields",
    """
    SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS user_id_card,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS event_type_card,
           CAST(COUNT(DISTINCT props) AS BIGINT) AS props_card
    FROM events
    """,
)
def q_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality-agg parity (exact flavor gated; the HLL++ flavor
    — the reference's actual algorithm — is tolerance-tested in
    tests/test_coverage_gaps.py since sketches differ across engines)."""
    from moloch_spark.operators.endpoints import field_cardinality

    ev = load_table(spark, "events", sf_dir)
    return field_cardinality(ev, ["user_id", "event_type", "props"])


@register(
    "unique_event_type",
    """
    SELECT event_type AS value, COUNT(*) AS count
    FROM events
    WHERE event_type IS NOT NULL
    GROUP BY 1
    ORDER BY count DESC, value ASC
    LIMIT 10000
    """,
)
def q_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return unique(ev, "event_type")


@register(
    "unique_pair_user_type",
    """
    SELECT CAST(user_id AS VARCHAR) || ':' || event_type AS value, COUNT(*) AS count
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY 1
    ORDER BY count DESC, value ASC
    LIMIT 10000
    """,
)
def q_unique_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the nested src-ip:port two-level terms special (apiSessions.js:2330).
    # A pair facet requires BOTH members (the reference only nests ports
    # under sessions that HAVE the ip): half-pairs are excluded, not
    # silently collapsed to the surviving member (concat_ws would).
    ev = load_table(spark, "events", sf_dir).filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )
    pair = F.concat_ws(":", F.col("user_id").cast("string"), F.col("event_type"))
    return unique(ev.select(pair.alias("value")), "value")


# ---------------------------------------------------------------------------
# multiunique — N-field intersection (apiSessions.js:2420-2500)
# ---------------------------------------------------------------------------


@register(
    "multiunique_user_event",
    """
    SELECT user_id, event_type, COUNT(*) AS count
    FROM events
    WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    GROUP BY 1, 2
    ORDER BY count DESC, user_id ASC, event_type ASC
    LIMIT 10000
    """,
)
def q_multiunique(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return multiunique(ev, ["user_id", "event_type"])


# ---------------------------------------------------------------------------
# spiview — per-field top-K in one pass (apiSessions.js:1794-1960)
# ---------------------------------------------------------------------------


@register(
    "spiview_events",
    """
    WITH unpivoted AS (
      SELECT 'event_type' AS field, event_type AS value FROM events
      UNION ALL
      SELECT 'user_id' AS field, CAST(user_id AS VARCHAR) AS value FROM events
    ), counted AS (
      SELECT field, value, COUNT(*) AS count
      FROM unpivoted WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), ranked AS (
      SELECT field, value, count,
             ROW_NUMBER() OVER (PARTITION BY field ORDER BY count DESC, value ASC) AS rnk
      FROM counted
    )
    SELECT field, value, count FROM ranked
    WHERE rnk <= CASE field WHEN 'event_type' THEN 10 ELSE 25 END
    """,
)
def q_spiview(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return spiview(ev, [("event_type", 10), ("user_id", 25)])


# ---------------------------------------------------------------------------
# spigraph — top-K values each with its timeline (apiSessions.js:1966-2146)
# ---------------------------------------------------------------------------


@register(
    "spigraph_sum_metric_rank",
    """
    WITH per_bucket AS (
      SELECT user_id AS value, date_trunc('day', ts) AS bucket,
             COUNT(*) AS doc_count,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
    ), totals AS (
      SELECT value, CAST(SUM(CAST(sum_value AS DECIMAL(18,4))) AS DOUBLE) AS total
      FROM per_bucket GROUP BY 1
      ORDER BY total DESC, value ASC LIMIT 3
    )
    SELECT p.value, p.bucket, p.doc_count, p.sum_value, t.total
    FROM per_bucket p JOIN totals t USING (value)
    """,
)
def q_spigraph_sum_metric(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spigraph ranked by a SUM metric instead of doc count
    # (the metric-sort path, apiSessions.js:2081-2092)
    ev = load_table(spark, "events", sf_dir)
    out = spigraph(
        ev, "user_id", "ts", interval="day", k=3, metric="sum_value",
        sums=[("value", "sum_value")],
    )
    return out


@register(
    "spigraph_event_type_daily",
    """
    WITH per_bucket AS (
      SELECT event_type AS value, date_trunc('day', ts) AS bucket,
             COUNT(*) AS doc_count,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
    ), totals AS (
      SELECT value, CAST(SUM(doc_count) AS BIGINT) AS total
      FROM per_bucket GROUP BY 1
      ORDER BY total DESC, value ASC LIMIT 5
    )
    SELECT p.value, p.bucket, p.doc_count, p.sum_value, t.total
    FROM per_bucket p JOIN totals t USING (value)
    """,
)
def q_spigraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return spigraph(
        ev, "event_type", "ts", interval="day", k=5, sums=[("value", "sum_value")]
    )


# ---------------------------------------------------------------------------
# spigraphhierarchy — N-level drilldown via ROLLUP (apiSessions.js:2159)
# ---------------------------------------------------------------------------


@register(
    "spigraph_hierarchy_orders",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS count,
           (CASE WHEN o_orderstatus IS NOT NULL THEN 1 ELSE 0 END
            + CASE WHEN o_orderpriority IS NOT NULL THEN 1 ELSE 0 END) AS level
    FROM orders
    WHERE o_orderstatus IS NOT NULL AND o_orderpriority IS NOT NULL
    GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
    """,
)
def q_spigraph_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, "orders", sf_dir)
    return spigraph_hierarchy(o, ["o_orderstatus", "o_orderpriority"])


# ---------------------------------------------------------------------------
# connections — edge aggregation (apiConnections.js:36-441) over the
# customer-nation -> supplier-nation graph through orders+lineitem
# ---------------------------------------------------------------------------


@register(
    "connections_nation_graph",
    """
    SELECT cn.n_name AS src, sn.n_name AS dst,
           COUNT(*) AS sessions,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY 1, 2
    HAVING COUNT(*) >= 1
    """,
)
def q_connections(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)
    c = load_table(spark, "customer", sf_dir)
    s = load_table(spark, "supplier", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cn_name")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("sn_name")
    )
    # big fact joins on keys; dims broadcast (bounded size at any sf)
    edges_input = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
    )
    return connections(
        edges_input, "cn_name", "sn_name", sums=[("l_extendedprice", "sum_price")]
    )


@register(
    "connections_baseline_events",
    """
    WITH win AS (
      SELECT user_id, event_type, ts,
             CASE WHEN ts >= TIMESTAMP '2024-01-15 00:00:00' AND ts < TIMESTAMP '2024-02-01 00:00:00' THEN 1 ELSE 0 END AS in_cur,
             CASE WHEN ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-01-15 00:00:00' THEN 1 ELSE 0 END AS in_base
      FROM events
    )
    SELECT user_id AS src, event_type AS dst,
           CAST(SUM(in_cur) AS BIGINT) AS cur_sessions,
           CAST(SUM(in_base) AS BIGINT) AS base_sessions,
           (CASE WHEN SUM(in_cur) > 0 THEN 1 ELSE 0 END
            + CASE WHEN SUM(in_base) > 0 THEN 2 ELSE 0 END) AS inresult
    FROM win
    WHERE in_cur = 1 OR in_base = 1
    GROUP BY 1, 2
    """,
)
def q_connections_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return connections_baseline(
        ev,
        "user_id",
        "event_type",
        "ts",
        current=("2024-01-15 00:00:00", "2024-02-01 00:00:00"),
        baseline=("2024-01-01 00:00:00", "2024-01-15 00:00:00"),
    )


# ---------------------------------------------------------------------------
# sessionization — idle-gap splitting (capture/session.c:419-469)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# expression language — compiled moloch expressions over the test tables
# (molochparser.jison semantics; each oracle is hand-written SQL so the
# compiler and the oracle are independent derivations of the semantics)
# ---------------------------------------------------------------------------


@register(
    "expr_bool_and_list",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE event_type IN ('error', 'purchase') AND value >= 50
    ORDER BY event_id
    """,
)
def q_expr_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ctx = CompileContext(catalog=events_catalog())
    pred = compile_expression(
        "event.type == [error, purchase] && event.value >= 50", ctx
    )
    return (
        ev.filter(pred)
        .select("event_id", "user_id", "event_type", "value")

    )


@register(
    "expr_ne_null_semantics",
    """
    SELECT event_id, event_type
    FROM events
    WHERE event_type IS NULL OR event_type <> 'signup'
    ORDER BY event_id
    """,
)
def q_expr_ne(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ES must_not semantics: != also matches rows where the field is
    # missing (bool must_not, SURVEY §2.3) — hence the IS NULL arm in SQL
    ev = load_table(spark, "events", sf_dir)
    ctx = CompileContext(catalog=events_catalog())
    pred = compile_expression("event.type != signup", ctx)
    return ev.filter(pred).select("event_id", "event_type")


@register(
    "expr_wildcard_date_range",
    """
    SELECT event_id, ts, event_type
    FROM events
    WHERE regexp_matches(event_type, '^p.*e$')
      AND ts >= TIMESTAMP '2024-01-10 00:00:00'
      AND ts < TIMESTAMP '2024-01-20 00:00:00'
    ORDER BY event_id
    """,
)
def q_expr_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    ctx = CompileContext(catalog=events_catalog())
    pred = compile_expression(
        'event.type == p*e && event.ts >= "2024/01/10" && event.ts < "2024/01/20"',
        ctx,
    )
    return ev.filter(pred).select("event_id", "ts", "event_type")


@register(
    "expr_textfield_phrase",
    """
    SELECT doc_id, lang
    FROM documents
    WHERE regexp_matches(lower(text), '(^|[^a-z0-9])hash[^a-z0-9]+join([^a-z0-9]|$)')
    ORDER BY doc_id
    """,
)
def q_expr_phrase(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, "documents", sf_dir)
    ctx = CompileContext(catalog=documents_catalog())
    pred = compile_expression('doc.text == "hash join"', ctx)
    return docs.filter(pred).select("doc_id", "lang")


@register(
    "expr_shortcut_semijoin",
    """
    SELECT doc_id, source, lang
    FROM documents
    WHERE lang IN ('de', 'fr') AND source = 'src1'
    ORDER BY doc_id
    """,
)
def q_expr_shortcut(spark: SparkSession, sf_dir: str) -> DataFrame:
    # $shortcut -> terms lookup against the lookups table
    # (molochparser.jison:377-447); compiled as a broadcast isin
    docs = load_table(spark, "documents", sf_dir)
    ctx = CompileContext(
        catalog=documents_catalog(),
        shortcuts={"eurolangs": ("string", ["de", "fr"])},
    )
    pred = compile_expression("doc.lang == $eurolangs && doc.source == src1", ctx)
    return docs.filter(pred).select("doc_id", "source", "lang")


@register(
    "sessionize_events_30m",
    """
    WITH seq AS (
      SELECT user_id, ts, event_type, value,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM seq
    )
    SELECT user_id, session_seq,
           MIN(ts) AS first_packet, MAX(ts) AS last_packet,
           COUNT(*) AS packets,
           CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS tot_bytes,
           COALESCE(array_to_string(list_sort(
             list(DISTINCT event_type) FILTER (event_type IS NOT NULL)), ','),
             '') AS event_types,
           CAST(COALESCE(LEN(list(DISTINCT event_type)
             FILTER (event_type IS NOT NULL)), 0) AS BIGINT)
             AS event_types_cnt,
           epoch_ms(MAX(ts)) - epoch_ms(MIN(ts)) AS length_ms,
           CAST(user_id AS VARCHAR) || '#' || CAST(session_seq AS VARCHAR) AS session_id
    FROM numbered
    GROUP BY user_id, session_seq
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gate emits event_types CSV-joined: the driver's canonicalizer can't
    # sort/hash list cells (the API keeps the array form)
    ev = load_table(spark, "events", sf_dir)
    return sessionize_events(ev, idle_timeout_s=1800).withColumn(
        "event_types", F.array_join("event_types", ",")
    )


@register(
    "connections_components",
    """
    WITH RECURSIVE
    e AS (
      SELECT DISTINCT 'u:' || CAST(user_id AS VARCHAR) AS a,
             't:' || event_type || ':' || CAST(user_id % 25 AS VARCHAR) AS b
      FROM events
      WHERE user_id IS NOT NULL AND event_type IS NOT NULL
    ),
    und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
    reach(node, lab) AS (
      SELECT a, a FROM (SELECT DISTINCT a FROM und) n
      UNION
      SELECT u.a, r.lab FROM und u JOIN reach r ON r.node = u.b
    )
    SELECT node, MIN(lab) AS component FROM reach GROUP BY node
    """,
)
def q_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection over the connections graph: the Spark side
    runs iterative min-label propagation (one join + one groupBy-min
    per round, lineage truncated each round); the oracle computes the
    same fixpoint with a recursive CTE. Node ids are bucketed so the
    gate exercises MANY components, not one giant blob."""
    from moloch_spark.operators.graph import connected_components

    ev = load_table(spark, "events", sf_dir)
    edges = ev.select(
        F.concat(F.lit("u:"), F.col("user_id").cast("string")).alias("src"),
        F.concat(
            F.lit("t:"), F.col("event_type"), F.lit(":"),
            (F.col("user_id") % 25).cast("string"),
        ).alias("dst"),
    ).distinct()
    return connected_components(edges)
