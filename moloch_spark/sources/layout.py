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

import os.path

from pyspark.sql import Column, DataFrame, functions as F


def _string_proj_expr(c: str, skip: int) -> Column:
    """Monotone numeric projection of a string column: the 7 UTF-8
    bytes AFTER the column's common prefix, RIGHT-PADDED with zero
    bytes to a fixed 7-byte window and read as a big-endian integer —
    preserves lexicographic order and fits a long exactly. Without the
    padding a short suffix reads as a SMALL integer regardless of its
    leading byte ('b'=98 < 'ab'=24930), so mixed-length values invert
    the order and can collapse the dimension to rank 0 (ADVICE r6).
    The pad happens on the hex encoding (2 chars per byte, right-pad
    to 14 with '0' == zero-byte pad). Skipping the shared prefix
    matters: keys like 'host-001' or '10.0.1.23' spend most of their
    leading bytes on bytes every row shares, and a fixed-window
    projection would collapse them into a handful of ranks. Nulls
    sort to 0."""
    return F.coalesce(
        F.conv(
            F.rpad(
                F.hex(
                    F.substring(F.encode(F.col(c), "UTF-8"), skip + 1, 7)
                ),
                14,
                "0",
            ),
            16,
            10,
        ).cast("double"),
        F.lit(0.0),
    )


def _string_proj_py(s: str | None, skip: int) -> float:
    """Python mirror of _string_proj_expr — used to derive the lo/hi
    literals from the column's min/max strings (the projection is
    monotone, so proj(min)/proj(max) bound every row)."""
    if s is None:
        return 0.0
    b = s.encode("utf-8")[skip : skip + 7]
    return float(int.from_bytes(b.ljust(7, b"\x00"), "big"))


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
    j * n_cols + i — so with n files splitting the top ranges, LATER
    columns get the finer split (their high bits are more
    significant). Put the column you filter on most often LAST. Pure
    shiftleft/bitwise-OR expression tree — whole-stage-codegen
    friendly, n_cols * bits ops per row."""
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
    the key column itself is not persisted. String columns cluster by
    the 7 lexicographic bytes after their common prefix (derived from
    the min/max — every value between two bounds shares the bounds'
    common prefix)."""
    dtypes = dict(df.dtypes)
    aggs = []
    for c in cols:
        src = F.col(c) if dtypes[c] == "string" else F.col(c).cast("double")
        aggs += [F.min(src).alias(f"__lo_{c}"), F.max(src).alias(f"__hi_{c}")]
    stats = df.agg(*aggs).first()
    exprs, los, his = [], [], []
    for c in cols:
        lo_v, hi_v = stats[f"__lo_{c}"], stats[f"__hi_{c}"]
        if dtypes[c] == "string":
            lo_s, hi_s = lo_v or "", hi_v or ""
            skip = len(
                os.path.commonprefix([lo_s, hi_s]).encode("utf-8")
            )
            exprs.append(_string_proj_expr(c, skip))
            los.append(F.lit(_string_proj_py(lo_s, skip)))
            his.append(F.lit(_string_proj_py(hi_s, skip)))
        else:
            exprs.append(F.coalesce(F.col(c).cast("double"), F.lit(0.0)))
            los.append(F.lit(float(lo_v if lo_v is not None else 0.0)))
            his.append(F.lit(float(hi_v if hi_v is not None else 0.0)))
    z = zorder_key(exprs, los, his, bits=bits)
    # secondary uniform tiebreak: with a degenerate key (constant or
    # all-null clustered columns -> every row z=0) repartitionByRange
    # on __z alone collapses to ONE partition, producing one file of
    # the partition's full size and silently abandoning the caller's
    # file-count contract. Ties split by __r instead; for distinct z
    # values the primary ordering is untouched, and splitting WITHIN a
    # z value never widens a file's min/max envelope.
    (
        df.withColumn("__z", z)
        .withColumn("__r", F.rand(0))
        .repartitionByRange(n_files, F.col("__z"), F.col("__r"))
        .sortWithinPartitions("__z")
        .drop("__z", "__r")
        .write.mode(mode)
        .parquet(path)
    )
