"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator: (spark, sf_dir) -> DataFrame.
oracle_sql()  — per-query ANSI SQL for the DuckDB correctness oracle.

Implementation lives in moloch_spark.queries; this module is the stable
driver-facing surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from moloch_spark import queries as _q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship on /root/testdata/sf0.001: the engine in one query —
    sessionize the event stream, persist the day-partitioned session
    store, compile a moloch search expression against the field
    catalog, and search the store with it. (packets >= 2: the tiny
    smoke SF has matches at that threshold.)"""
    from moloch_spark.queries_api import store_search

    return store_search(
        spark, "/root/testdata/sf0.001",
        "session.types == error && session.packets >= 2",
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
