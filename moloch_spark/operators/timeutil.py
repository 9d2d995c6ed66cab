"""Dtype-aware timestamp -> epoch-milliseconds conversion.

The driver's oracle harness runs our queries under a VANILLA SparkSession,
where parquet tz-naive timestamps load as TIMESTAMP_NTZ (Spark 4 default
inference); our own `get_spark` session reads them as TIMESTAMP (LTZ).
`unix_millis()` rejects NTZ outright, so every gap/duration computation
must branch on the actual column dtype instead of assuming one reading.

For NTZ we use pure wall-clock arithmetic —
``timestampdiff(MILLISECOND, timestamp_ntz'1970-01-01', ts)`` — which is
session-timezone-INDEPENDENT and matches DuckDB's naive-timestamp `epoch`
semantics exactly (verified empirically: casting NTZ->LTZ first would
re-interpret the wall clock in the session zone and shift the epoch).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def epoch_ms_fn(df: DataFrame, ts_col: str) -> Callable[[Column], Column]:
    """Return a ``Column -> Column`` converter producing epoch milliseconds
    (long) for columns sharing ``ts_col``'s dtype in ``df`` — including
    derived columns like ``lag(ts)`` / ``min(ts)`` which keep the dtype.

    TIMESTAMP       -> unix_millis (instant semantics)
    TIMESTAMP_NTZ   -> wall-clock-as-UTC via timestampdiff (tz-independent,
                       DuckDB-naive-oracle parity)
    LONG            -> assumed already epoch ms (pre-converted sources)
    """
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return _ntz_ms
    if isinstance(dt, T.TimestampType):
        return F.unix_millis
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return lambda c: c.cast("long")
    raise TypeError(
        f"column {ts_col!r} has dtype {dt.simpleString()}; expected a "
        "timestamp, timestamp_ntz, or epoch-ms long column"
    )


def _ntz_diff(unit: str, c: Column) -> Column:
    # pyspark 4 renamed timestampdiff -> timestamp_diff; support both
    diff = getattr(F, "timestamp_diff", None) or F.timestampdiff
    return diff(unit, F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), c)


def _ntz_ms(c: Column) -> Column:
    return _ntz_diff("MILLISECOND", c)


def epoch_ms(df: DataFrame, ts_col: str) -> Column:
    """Epoch-ms column for ``df[ts_col]`` directly."""
    return epoch_ms_fn(df, ts_col)(F.col(ts_col))


def epoch_us_fn(df: DataFrame, ts_col: str) -> Callable[[Column], Column]:
    """Like :func:`epoch_ms_fn` but microseconds (pcap ts_us precision)."""
    dt = df.schema[ts_col].dataType
    if isinstance(dt, T.TimestampNTZType):
        return lambda c: _ntz_diff("MICROSECOND", c)
    if isinstance(dt, T.TimestampType):
        return F.unix_micros
    if isinstance(dt, (T.LongType, T.IntegerType)):
        return lambda c: c.cast("long")
    raise TypeError(
        f"column {ts_col!r} has dtype {dt.simpleString()}; expected a "
        "timestamp, timestamp_ntz, or epoch-us long column"
    )
