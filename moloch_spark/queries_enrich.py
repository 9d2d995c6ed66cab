"""Enrichment queries: broadcast dims, rules tagging, WISE feed, interval
join, drop filters — each with a DuckDB oracle."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moloch_spark.operators import enrich as E
from moloch_spark.operators.endpoints import dsum
from moloch_spark.operators.sessionize import sessionize_events
from moloch_spark.registry import register
from moloch_spark.sources.tables import load_table, load_table_spread

# ---------------------------------------------------------------------------
# dimension rollup (geo/ASN-style broadcast enrichment)
# ---------------------------------------------------------------------------


@register(
    "enrich_region_rollup",
    """
    SELECT r.r_name AS region, COUNT(*) AS customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY 1
    """,
)
def q_enrich_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, "customer", sf_dir)
    n = load_table(spark, "nation", sf_dir)
    r = load_table(spark, "region", sf_dir)
    enriched = E.broadcast_enrich(
        E.broadcast_enrich(c, n, c.c_nationkey == n.n_nationkey, how="inner"),
        r,
        F.col("n_regionkey") == r.r_regionkey,
        how="inner",
    )
    return enriched.groupBy(F.col("r_name").alias("region")).agg(
        F.count(F.lit(1)).alias("customers"),
        dsum("c_acctbal", "sum_acctbal"),
    )


# ---------------------------------------------------------------------------
# rules engine: tag + drop field-ops
# ---------------------------------------------------------------------------


@register(
    "rules_tagging",
    """
    SELECT event_id,
           COALESCE(array_to_string(list_sort(list_distinct(list_filter([
             CASE WHEN value >= 150 THEN 'big' END,
             CASE WHEN event_type = 'error' THEN 'err' END,
             CASE WHEN event_type = 'error' AND value >= 150 THEN 'big-err' END
           ], x -> x IS NOT NULL))), ','), '') AS tags
    FROM events
    WHERE NOT (user_id = 0)
    ORDER BY event_id
    """,
)
def q_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    rules = [
        E.Rule("drop-user0", F.col("user_id") == 0, drop=True),
        E.Rule("tag-big", F.col("value") >= 150, add_tags=["big"]),
        E.Rule("tag-err", F.col("event_type") == "error", add_tags=["err"]),
        E.Rule(
            "tag-big-err",
            (F.col("event_type") == "error") & (F.col("value") >= 150),
            add_tags=["big-err"],
        ),
    ]
    # tags stays array<string> in the API; the gate emits it joined as a
    # string because the driver's canonicalizer can't sort/hash list cells
    return (
        E.apply_rules(ev, rules)
        .select(
            "event_id",
            F.array_join(F.array_sort(F.col("tags")), ",").alias("tags"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# WISE feed enrichment
# ---------------------------------------------------------------------------

_FEED_ROWS = [
    ("3", "user", "actor", "known-bot"),
    ("7", "user", "actor", "scanner"),
    ("error", "event_type", "severity", "high"),
]


@register(
    "wise_feed_enrich",
    """
    WITH feed(key, key_type, field, value) AS (
      VALUES ('3', 'user', 'actor', 'known-bot'),
             ('7', 'user', 'actor', 'scanner'),
             ('error', 'event_type', 'severity', 'high')
    )
    SELECT e.event_id, f.field AS wise_field, f.value AS wise_value
    FROM events e
    LEFT JOIN (SELECT * FROM feed WHERE key_type = 'user') f
      ON CAST(e.user_id AS VARCHAR) = f.key
    ORDER BY e.event_id
    """,
)
def q_wise(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    # feed columns renamed up front — 'value' would collide with events.value
    feed = ev.sparkSession.createDataFrame(
        _FEED_ROWS, ["key", "key_type", "wise_field", "wise_value"]
    )
    out = E.wise_enrich(
        ev, feed, key_col="user_id", key_type="user",
        value_cols=("wise_field", "wise_value"),
    )
    return out.select("event_id", "wise_field", "wise_value").orderBy("event_id")


# ---------------------------------------------------------------------------
# suricata-style interval join: alerts correlated to sessions by key + time
# ---------------------------------------------------------------------------


@register(
    "suricata_interval_join",
    """
    WITH seq AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_ms(ts) - epoch_ms(lag(ts) OVER w) > 1800000
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), numbered AS (
      SELECT *, CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
      FROM seq
    ), sessions AS (
      SELECT user_id, session_seq, MIN(ts) AS first_packet, MAX(ts) AS last_packet,
             CAST(user_id AS VARCHAR) || '#' || CAST(session_seq AS VARCHAR) AS session_id
      FROM numbered GROUP BY 1, 2
    ), alerts AS (
      SELECT user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT s.session_id, COUNT(a.ts) AS alert_cnt
    FROM sessions s
    JOIN alerts a
      ON a.user_id = s.user_id
     AND a.ts >= s.first_packet - INTERVAL 30 SECOND
     AND a.ts <= s.last_packet + INTERVAL 30 SECOND
    GROUP BY 1
    """,
)
def q_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    sess = sessionize_events(ev, idle_timeout_s=1800).select(
        "user_id", "session_id", "first_packet", "last_packet"
    )
    alerts = ev.filter(F.col("event_type") == "error").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    joined = E.interval_join(
        alerts,
        sess,
        on=F.col("a_user") == F.col("user_id"),
        left_ts=F.col("a_ts"),
        right_lo=F.col("first_packet") - F.expr("INTERVAL 30 SECOND"),
        right_hi=F.col("last_packet") + F.expr("INTERVAL 30 SECOND"),
    )
    return joined.groupBy("session_id").agg(F.count(F.lit(1)).alias("alert_cnt"))


# ---------------------------------------------------------------------------
# drophash anti-join
# ---------------------------------------------------------------------------


@register(
    "drophash_filter",
    """
    WITH drops(user_id, event_type) AS (
      VALUES (CAST(1 AS BIGINT), 'click'), (CAST(5 AS BIGINT), 'error'),
             (CAST(9 AS BIGINT), 'purchase')
    )
    SELECT e.event_id, e.user_id, e.event_type
    FROM events e
    WHERE NOT EXISTS (
      SELECT 1 FROM drops d
      WHERE d.user_id = e.user_id AND d.event_type = e.event_type
    )
    ORDER BY e.event_id
    """,
)
def q_drophash(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    drops = ev.sparkSession.createDataFrame(
        [(1, "click"), (5, "error"), (9, "purchase")],
        "user_id long, event_type string",
    )
    out = E.drop_filter(ev, drops, on=["user_id", "event_type"])
    return out.select("event_id", "user_id", "event_type").orderBy("event_id")


@register(
    "asof_feed_enrich",
    """
    WITH feed AS (
      SELECT user_id, ts, MAX(value) AS feed_value
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1, 2
    ),
    fact AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    )
    SELECT f.event_id, f.user_id, f.ts,
           x.feed_value, x.ts AS asof_ts
    FROM fact f
    ASOF LEFT JOIN feed x ON f.user_id = x.user_id AND f.ts >= x.ts
    """,
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of enrichment: each click gets the user's LATEST purchase
    value at or before it (versioned-dim lookup). Spark side is the
    union+window rewrite (operators.asof); oracle is DuckDB's native
    ASOF LEFT JOIN — the gate proves the rewrite's exact equivalence,
    including the no-prior-feed NULL rows and equal-timestamp ties."""
    from moloch_spark.operators.asof import as_of_join

    ev = load_table(spark, "events", sf_dir)
    feed = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("feed_value"))
    )
    fact = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return as_of_join(fact, feed, on=["user_id"], ts_col="ts",
                      values=["feed_value"])


# ---------------------------------------------------------------------------
# YARA payload scan (capture/yara.c) — native subset matcher
# ---------------------------------------------------------------------------

_YARA_RULES = r"""
rule merge_txt {
  strings:
    $a = "MERGE" nocase
  condition:
    $a
}
rule scan_re {
  strings:
    $r = /sc[ae]n/
  condition:
    $r
}
rule data_and_model {
  strings:
    $d = "data"
    $m = "model"
  condition:
    $d and $m
}
rule hex_model {
  strings:
    $h = { 6D 6F ?? 65 6C }
  condition:
    $h
}
rule two_of_three {
  strings:
    $a = "merge" nocase
    $s = /sc[ae]n/
    $m = "model"
  condition:
    2 of them
}
"""


@register(
    "yara_scan_documents",
    """
    SELECT doc_id, 'merge_txt' AS rule FROM documents
    WHERE contains(lower(text), 'merge')
    UNION ALL
    SELECT doc_id, 'scan_re' FROM documents WHERE regexp_matches(text, 'sc[ae]n')
    UNION ALL
    SELECT doc_id, 'data_and_model' FROM documents
    WHERE contains(text, 'data') AND contains(text, 'model')
    UNION ALL
    SELECT doc_id, 'hex_model' FROM documents WHERE regexp_matches(text, 'mo.el')
    UNION ALL
    SELECT doc_id, 'two_of_three' FROM documents
    WHERE (CASE WHEN contains(lower(text), 'merge') THEN 1 ELSE 0 END
         + CASE WHEN regexp_matches(text, 'sc[ae]n') THEN 1 ELSE 0 END
         + CASE WHEN contains(text, 'model') THEN 1 ELSE 0 END) >= 2
    ORDER BY doc_id, rule
    """,
)
def q_yara(spark: SparkSession, sf_dir: str) -> DataFrame:
    """YARA ruleset over document payloads: text (nocase), regex, hex
    with ?? wildcard, and boolean / N-of-them conditions — each rule
    mirrored by an independent SQL predicate in the oracle."""
    from moloch_spark.operators.yara import yara_scan

    docs = load_table_spread(spark, "documents", sf_dir)
    return (
        yara_scan(docs, _YARA_RULES, payload_col="text", out_col="yara")
        .select("doc_id", F.explode("yara").alias("rule"))
        .orderBy("doc_id", "rule")
    )
