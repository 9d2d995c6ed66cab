"""Per-user row-level security + audit history.

Reference:
  * forced expression: an admin-set expression ANDed into every query a
    user runs (viewer/viewerUtils.js:239-249)
  * timeLimit: cap on how far back a user may query
    (viewer/apiSessions.js:1206-1217)
  * history: per-API-call audit log (viewer/apiHistory.js)
"""

from __future__ import annotations

import datetime as dt
import os
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from moloch_spark.catalog import FieldCatalog
from moloch_spark.expr import CompileContext, compile_expression


@dataclass
class UserContext:
    user_id: str
    forced_expression: str | None = None  # ANDed into every query
    time_limit_hours: int | None = None  # max lookback
    views: dict[str, str] = dc_field(default_factory=dict)


def apply_user_context(
    df: DataFrame,
    user: UserContext,
    catalog: FieldCatalog,
    *,
    ts_col: str,
    now: dt.datetime | None = None,
) -> DataFrame:
    """Mandatory filter injection: the user's forced expression and time
    limit are applied BEFORE any user-supplied predicate — they cannot be
    bypassed by the query text (row-level security)."""
    out = df
    now = now or dt.datetime.utcnow()
    if user.time_limit_hours is not None:
        cutoff = now - dt.timedelta(hours=user.time_limit_hours)
        # cast the literal to the COLUMN's own timestamp flavor — the
        # fixtures load as TIMESTAMP_NTZ under a vanilla session, and a
        # plain cast("timestamp") would compare NTZ against TZ
        out = out.filter(
            F.col(ts_col)
            >= F.lit(cutoff.isoformat(sep=" ")).cast(
                df.schema[ts_col].dataType
            )
        )
    if user.forced_expression:
        ctx = CompileContext(catalog=catalog, views=user.views, now=now)
        out = out.filter(compile_expression(user.forced_expression, ctx))
    return out


HISTORY_SCHEMA = (
    "ts timestamp, user_id string, api string, expression string, "
    "query_time_ms long, records long"
)


def log_api_call(
    spark: SparkSession,
    path: str,
    *,
    user_id: str,
    api: str,
    expression: str | None,
    query_time_ms: int,
    records: int,
    ts: dt.datetime | None = None,
) -> None:
    """Append-only audit log (the history index).

    Audit rows are API-call metadata — one bounded row per request,
    never data-sized — so the append is a DRIVER-SIDE parquet write
    (pyarrow), not a distributed job: the previous createDataFrame +
    write.append launched a full Spark job per logged call (~0.3 s of
    scheduler latency each; the history gate logs one call per event
    type and paid ~15 jobs per run). read_history still reads the
    directory through Spark, and the file carries the same
    TIMESTAMP_MICROS(UTC) physical type Spark itself writes."""
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "ts": pa.array([ts or dt.datetime.utcnow()],
                           type=pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([user_id], type=pa.string()),
            "api": pa.array([api], type=pa.string()),
            "expression": pa.array([expression], type=pa.string()),
            "query_time_ms": pa.array([int(query_time_ms)], type=pa.int64()),
            "records": pa.array([int(records)], type=pa.int64()),
        }
    )
    os.makedirs(path, exist_ok=True)
    pq.write_table(
        table, os.path.join(path, f"part-{uuid.uuid4().hex}.snappy.parquet")
    )


def read_history(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)
