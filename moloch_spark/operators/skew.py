"""Hot-key skew handling for non-algebraic aggregations.

AQE's skew-join splitting (on in session.py) re-plans skewed JOINs at
runtime, and algebraic aggs (sum/count/min/max) are already safe: the
map-side partial combine shrinks every key to one row per task before
the shuffle. The case neither covers is a non-algebraic agg on a hot
key — `collect_set` over a session key with millions of rows lands the
ENTIRE key on one reducer (the reference hits the same wall per packet
thread and caps fields at jsonSize, capture/field.c:488-1030).

`salted_collect_set` makes the reduce two-phase: phase 1 groups on
(key, salt) where salt = hash(value) % N — the hot key fans out over N
reducers, and salting BY VALUE means duplicates of one value share a
salt, so per-salt sets dedup before phase 2. Phase 2 merges N
already-deduped fragments per key. Worst-case reducer load drops from
|rows(key)| to ~|distinct(key)|/N + fragments. Deterministic (hash
salt, no RNG), so results are stable across runs/retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_collect_set(
    df: DataFrame,
    keys: list[str],
    value: str | Column,
    *,
    alias: str = "values",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase distinct-collect: returns one row per key group with a
    sorted array of distinct values (sorted so downstream comparisons
    and the Cnt companion are deterministic)."""
    v = F.col(value) if isinstance(value, str) else value
    salt = F.pmod(F.hash(v), F.lit(salt_buckets)).alias("_salt")
    phase1 = (
        df.select(*keys, v.alias("_v"), salt)
        .groupBy(*keys, "_salt")
        .agg(F.collect_set("_v").alias("_frag"))
    )
    return (
        phase1.groupBy(*keys)
        .agg(
            F.array_sort(
                F.array_distinct(F.flatten(F.collect_list("_frag")))
            ).alias(alias)
        )
    )
