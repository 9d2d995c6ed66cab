"""As-of join — enrich each fact row with the LATEST feed row at or
before its timestamp (versioned dimensions: WISE feed snapshots, quota
updates, threat-intel validity windows).

Spark has no ASOF JOIN operator; the naive rewrite (range join + window
to keep the max) shuffles the fact×candidate cross product. This is the
single-shuffle form: union the tagged feed rows INTO the fact stream,
then one window pass per key in time order carries the last-seen feed
values forward (`last(..., ignorenulls)` over rows-unbounded-preceding).
Cost = one shuffle on the key + one sorted pass — the same price as the
sessionizer's windows, independent of how many feed versions a key has
between facts.

Tie rule: a feed row AT the fact's exact timestamp wins (ASOF >=
semantics) — the union sorts feed-before-fact at equal timestamps.
The DuckDB oracle uses its native ASOF LEFT JOIN, so the gate proves
the window rewrite implements the operator exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    fact: DataFrame,
    feed: DataFrame,
    *,
    on: list[str],
    ts_col: str,
    values: list[str],
) -> DataFrame:
    """Backward as-of: for each fact row, the feed row with the
    greatest ts <= fact ts (per key). Feed must be unique per
    (key, ts) — pre-aggregate duplicates, or the pick is undefined.
    Output = fact columns + `values` (+ `asof_ts`), nulls when no feed
    row precedes the fact."""
    feed2 = (
        feed.select(*on, F.col(ts_col), *[F.col(v) for v in values])
        .withColumn("_asof_ts", F.col(ts_col))
        .withColumn("_f", F.lit(1))
    )
    fact2 = fact.withColumn("_f", F.lit(0))
    u = fact2.unionByName(feed2, allowMissingColumns=True)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(ts_col).asc(), F.col("_f").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for v in values + ["_asof_ts"]:
        u = u.withColumn(v, F.last(v, ignorenulls=True).over(w))
    return (
        u.filter(F.col("_f") == 0)
        .drop("_f")
        .withColumnRenamed("_asof_ts", "asof_ts")
    )
