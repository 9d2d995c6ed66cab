"""Query/oracle registry shared by all query modules.

Every operator exposed to the driver registers here: a (spark, sf_dir)
-> DataFrame callable plus (when SQL-expressible) a DuckDB oracle SQL
string with IDENTICAL column names/types.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def _load_registrants() -> None:
    # import registrants lazily to avoid import cycles
    import moloch_spark.queries  # noqa: F401
    import moloch_spark.queries_api  # noqa: F401
    import moloch_spark.queries_curate  # noqa: F401
    import moloch_spark.queries_enrich  # noqa: F401
    import moloch_spark.queries_llm  # noqa: F401
    import moloch_spark.queries_pcap  # noqa: F401
    import moloch_spark.queries_stream  # noqa: F401
    import moloch_spark.queries_tpch  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_registrants()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_registrants()
    return dict(_ORACLES)
