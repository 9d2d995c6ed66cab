"""Driver-canonicalizer compatibility guards.

The driver's CORRECTNESS harness canonicalizes query output with pandas
``sort_values``/hashing, which throws ``unhashable type: 'list'`` on any
array/map/struct cell (round-1 postmortem: rules_tagging). Every
oracle-paired gate must therefore emit only scalar columns — operators
keep their array-typed API; gates CSV-join before returning.

Separately, the driver runs queries under a VANILLA SparkSession where
the fixtures load as TIMESTAMP_NTZ (not the TIMESTAMP our get_spark
forces), so the sessionization spine must work for both dtypes —
round 1 shipped green locally and red on the scored surface because
only the LTZ path was exercised.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from moloch_spark import queries as q
from tests.conftest import SF_SMOKE

WITH_ORACLE = sorted(n for n in q.queries() if n in q.oracle_sql())

_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_gate_emits_only_scalar_columns(spark, name):
    df = q.queries()[name](spark, SF_SMOKE)
    bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
    assert not bad, (
        f"gate {name} returns complex-typed column(s) {bad}; the driver's "
        "canonicalizer cannot hash list cells — CSV-join them in the gate"
    )


def test_sessionize_spine_works_on_ntz(spark):
    """Force the driver's TIMESTAMP_NTZ reading and run the full spine:
    sessionize -> chunked/rootId -> segments merge -> derived rates."""
    from moloch_spark.operators.sessionize import sessionize_events
    from moloch_spark.operators import sessions_api as A

    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        assert dict(ev.dtypes)["ts"] == "timestamp_ntz", "fixture should read NTZ here"
        sess = sessionize_events(ev, idle_timeout_s=1800)
        assert sess.count() > 0
        chunked = sessionize_events(ev, idle_timeout_s=1800, chunk_s=600)
        merged = A.merge_segments(chunked)
        assert merged.count() > 0
        g = ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day")).agg(
            F.sum("value").alias("gauge")
        )
        rates = A.derived_rates(g, key_col="user_id", ts_col="day", gauge_col="gauge")
        assert rates.filter(F.col("rate_per_s").isNotNull()).count() >= 0
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)


def test_ntz_and_ltz_sessionize_agree(spark):
    """The same fixture sessionized under both timestamp readings must
    produce identical session ids and lengths (wall clock == UTC)."""
    from moloch_spark.operators.sessionize import sessionize_events

    prev = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")

    def run():
        ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        out = sessionize_events(ev, idle_timeout_s=1800)
        return sorted(
            (r.session_id, r.packets, r.length_ms)
            for r in out.select("session_id", "packets", "length_ms").collect()
        )

    try:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        ntz = run()
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        ltz = run()
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", prev)
    assert ntz == ltz
