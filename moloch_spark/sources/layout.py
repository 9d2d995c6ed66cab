"""Z-order (Morton) clustering for multi-column scan pruning.

The session store's day-partitioning prunes on time, but the reference's
hottest non-time predicates are value lookups — srcIp/dstIp/port
expression searches (viewer/db.js field queries). At 100 TB a filter on
ANY of those columns should skip most files, not just most partitions.
Sorting by one column gives perfect min/max pruning on it and none on
the others; Z-ORDERING interleaves the bits of several columns' ranks
so every file covers a small hyper-rectangle of the value space —
row-group/file min-max statistics then prune scans filtered on ANY
prefix subset of the clustered columns (the Delta/Databricks OPTIMIZE
ZORDER BY rationale).

Shape at scale: the rank normalization is two scans (one to sample the
per-column range boundaries via approx percentiles, one to write) and
the layout job is a single repartitionByRange + local sort — exactly a
normal sorted write's cost. Everything is JVM-side bit arithmetic; no
UDF anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _rank_norm(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale col into [0, 2^bits) by linear position inside [lo, hi] —
    cheap (no per-row percentile lookup) and monotone, which is all
    Morton interleaving needs. Degenerate ranges map to 0."""
    span = (hi.cast("double") - lo.cast("double"))
    frac = F.when(span > 0, (col.cast("double") - lo) / span).otherwise(
        F.lit(0.0)
    )
    frac = F.least(F.lit(1.0 - 1e-12), F.greatest(F.lit(0.0), frac))
    return F.floor(frac * F.lit(float(1 << bits))).cast("long")


def zorder_key(cols: list[Column], los: list[Column], his: list[Column], *, bits: int = 12) -> Column:
    """Morton interleave: bit j of column i lands at position
    j * n_cols + i. Pure shiftleft/bitwise-OR expression tree —
    whole-stage-codegen friendly, n_cols * bits ops per row."""
    ranks = [
        _rank_norm(c, lo, hi, bits) for c, lo, hi in zip(cols, los, his)
    ]
    n = len(ranks)
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, r in enumerate(ranks):
            bit = F.shiftright(r, j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    bits: int = 12,
    n_files: int = 16,
    mode: str = "overwrite",
) -> None:
    """Cluster `df` by the Morton key of `cols` and write `n_files`
    parquet files, each covering a compact hyper-rectangle of the value
    space. One stats scan (min/max per column — swap for percentile
    boundaries under heavy skew), one range-partitioned sorted write;
    the key column itself is not persisted."""
    stats = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    ).first()
    z = zorder_key(
        [F.col(c) for c in cols],
        [F.lit(stats[f"__lo_{c}"]) for c in cols],
        [F.lit(stats[f"__hi_{c}"]) for c in cols],
        bits=bits,
    )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode(mode)
        .parquet(path)
    )
