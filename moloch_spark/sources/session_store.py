"""Session store — the sessions3-* index layer as a partitioned table.

Reference (SURVEY §1.3): capture writes one JSON doc per session into
time-rotated ES indices `sessions3-YYMMDD[hHH]` (rotation from
lastPacket, capture/db.c:538-577); `db.pl expire` drops old indices on a
retention schedule; queries map index names back to time ranges for
partition pruning (viewer/db.js:1853-1939) and widen the range for
non-`last` time bounding (db.js:1920-1927).

Spark shape: a parquet (Delta-ready) table partitioned by
`day = date(lastPacket)`. Partition pruning is then free: a predicate on
`day` reaches the scan as PartitionFilters. Retention = partition drop.
The bounding-mode widening rule becomes derivation of the `day`
predicate from the right timestamp column(s).
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PARTITION_COL = "day"


def write_sessions(
    sessions: DataFrame,
    path: str,
    *,
    ts_col: str = "last_packet",
    mode: str = "append",
) -> None:
    """Batch write, partitioned by date(ts_col) — the index-rotation
    analog. Parquet here; the layout is Delta-compatible.

    Repartition on the partition column first so each writer task owns
    whole day-partitions: without it every task opens a writer for every
    day it sees (tasks x days small files — a metastore killer at 100 TB).
    AQE splits skewed days back across tasks when one day dominates.
    """
    (
        sessions.withColumn(PARTITION_COL, F.date_format(F.col(ts_col), "yyyy-MM-dd"))
        .repartition(F.col(PARTITION_COL))
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def write_sessions_stream(
    sessions: DataFrame,
    path: str,
    checkpoint: str,
    *,
    ts_col: str = "last_packet",
):
    """Streaming sink: the ES-bulk analog is a partitioned append via
    foreachBatch (capture buffers dbBulkSize per thread; Spark buffers
    per micro-batch)."""

    def write_batch(batch: DataFrame, epoch_id: int) -> None:
        write_sessions(batch, path, ts_col=ts_col, mode="append")

    return (
        sessions.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint)
    )


def read_sessions(
    spark: SparkSession, path: str, *, version: int | None = None
) -> DataFrame:
    """Manifest-aware store read: a plain partitioned parquet read when
    no partition has been manifest-committed (the normal local case),
    the commit-protocol resolver otherwise (object-store updates).
    `version` time-travels to a retained manifest snapshot — a long
    job spanning maintenance commits pins its read to one version and
    stays reproducible as long as vacuum retention covers it."""
    from moloch_spark.sources.commit import read_store

    return read_store(spark, path, PARTITION_COL, version=version)


def time_bounded(
    df: DataFrame,
    *,
    start: str,
    stop: str,
    bounding: str = "last",
    first_col: str = "first_packet",
    last_col: str = "last_packet",
    max_session_days: int = 1,
) -> DataFrame:
    """Time-range filter with moloch bounding modes
    (viewer/apiSessions.js:1240-1279) plus the partition-pruning widening
    rule (viewer/db.js:1920-1927):

      last   — lastPacket in range (default)
      first  — firstPacket in range
      both   — first AND last inside the range
      either — session overlaps the range

    The partition predicate on `day` (derived from lastPacket) is widened
    by max_session_days for modes keyed on firstPacket, mirroring how the
    reference widens the index list by the index rotation period.
    """
    lo = F.lit(start).cast("timestamp")
    hi = F.lit(stop).cast("timestamp")
    first, last = F.col(first_col), F.col(last_col)
    if bounding == "last":
        pred = (last >= lo) & (last <= hi)
        day_lo, day_hi = lo, hi
    elif bounding == "first":
        pred = (first >= lo) & (first <= hi)
        # lastPacket (the partition key) can trail firstPacket by the max
        # session length -> widen the partition window to the right
        day_lo, day_hi = lo, F.date_add(hi.cast("date"), max_session_days).cast("timestamp")
    elif bounding == "both":
        pred = (first >= lo) & (last <= hi)
        day_lo, day_hi = lo, hi
    elif bounding == "either":
        pred = (first <= hi) & (last >= lo)
        day_lo, day_hi = lo, F.date_add(hi.cast("date"), max_session_days).cast("timestamp")
    else:
        raise ValueError(f"unknown bounding {bounding!r}")
    day = F.col(PARTITION_COL)
    day_pred = (day >= F.date_format(day_lo, "yyyy-MM-dd")) & (
        day <= F.date_format(day_hi, "yyyy-MM-dd")
    )
    return df.filter(day_pred & pred)


def expire_partitions(
    spark: SparkSession,
    path: str,
    *,
    keep_days: int,
    now: dt.date | None = None,
    vacuum_retain_s: float | None = None,
    dry_run: bool = False,
) -> list[str]:
    """Retention: drop partitions older than keep_days (db.pl expire).
    Returns the dropped partition names. `dry_run=True` reports what a
    real run would drop — including honoring the same snapshot-driven
    deferrals, simulated against a dry-run vacuum — while changing
    nothing (vacuum_store's DRY RUN counterpart for the destructive
    retention step).

    Manifest-resolved partitions are expired by DROPPING THEIR MANIFEST
    ENTRY only; the data stays on disk until the age-gated
    `vacuum_store(retain_s=vacuum_retain_s)` reclaims it — so a reader
    mid-scan on the pre-expiry manifest, or a read_store(version=...)
    inside the retention horizon, still completes. vacuum_retain_s
    defaults to the orphan-commit grace (ADVICE r6) to also protect
    concurrent READERS of just-superseded generations; since round 8 a
    concurrent WRITER's staging is safe at ANY retention —
    vacuum_store floors never-referenced tokens at the orphan grace
    itself (VERDICT r7 Wrong #1). Pass an explicit horizon to widen
    it, or 0 for a standalone immediate history cleanup.

    A manifest-backed partition whose PLAIN dir is still resolved by a
    retained snapshot (one written before the partition's first
    manifest commit) is DEFERRED, not expired (ADVICE r6): popping its
    entry would unshadow the stale plain dir for current readers, and
    deleting the dir would break time travel inside the retention
    horizon. A later run expires it once vacuum has aged that snapshot
    out. Plain, never-manifest-committed partitions have no snapshot of
    their own protecting them and are deleted inline, as before."""
    import posixpath

    from moloch_spark.sources.commit import (
        ORPHAN_COMMIT_GRACE_S,
        commit_manifest_entries,
        load_manifest,
        resolve_partitions,
        snapshot_bodies,
        vacuum_store,
    )
    from moloch_spark.sources.fs import get_fs

    if vacuum_retain_s is None:
        vacuum_retain_s = ORPHAN_COMMIT_GRACE_S
    fs, root = get_fs(path, spark)
    now = now or dt.date.today()
    cutoff = (now - dt.timedelta(days=keep_days)).isoformat()
    dropped: list[str] = []
    if not fs.isdir(root):
        return dropped
    expirable = {
        name: pdir
        for name, pdir in resolve_partitions(path).items()
        if name.split("=", 1)[1] < cutoff
    }
    if not expirable:
        return dropped  # routine tick, nothing past the cutoff: one
        # listdir + manifest read, no vacuum / snapshot-body scans
    # age superseded snapshots out FIRST so long-gone history does not
    # defer expiry below (a dry run simulates the same pruning and
    # excludes the would-be-pruned snapshots from the deferral check)
    if dry_run:
        pruned = {
            n
            for n in vacuum_store(
                path, retain_s=vacuum_retain_s, dry_run=True
            )
            if n.startswith("_manifest.v")
        }
    else:
        vacuum_store(path, retain_s=vacuum_retain_s)
        pruned = set()
    manifest = load_manifest(path)
    noncurrent_snaps = [
        b
        for b in snapshot_bodies(path, exclude_names=pruned)
        if b != manifest
    ]
    popped: list[str] = []
    for name, pdir in sorted(expirable.items()):
        plain = posixpath.join(root, name)
        if name in manifest:
            if fs.isdir(plain) and any(
                name not in b for b in noncurrent_snaps
            ):
                continue  # deferred: a retained snapshot needs the plain dir
            if not dry_run:
                popped.append(name)
                # the stale plain dir (shadowed until now by the
                # manifest entry) goes inline — no retained snapshot
                # resolves to it
                if fs.isdir(plain):
                    fs.delete(plain)
        elif not dry_run:
            fs.delete(pdir)
        dropped.append(name)
    if not dry_run and popped:
        # removal-based commit: a concurrent tag write-back on a
        # DIFFERENT partition landing mid-expiry survives (merge/retry,
        # commit_manifest_entries); one re-committing an EXPIRED name
        # loses to the removal — retention beats backfill, the same
        # outcome as the reference's index-wide expiry (db/db.pl)
        commit_manifest_entries(path, removals=popped)
        vacuum_store(path, retain_s=vacuum_retain_s)
    return dropped


def write_sessions_bucketed(
    sessions: DataFrame,
    table: str,
    path: str,
    *,
    key: str = "session_id",
    buckets: int = 64,
    mode: str = "overwrite",
) -> None:
    """Bucketed session table: hash-bucketed AND sorted by the session
    key. Any join/merge keyed on `key` against another table bucketed
    the same way (segments merge on rootId, tag-update MERGE, hunt
    results write-back) reads both sides already co-partitioned — the
    scan itself satisfies the join distribution, so NO shuffle of the
    fact table, at any scale. That's the difference between re-shuffling
    100 TB per tag update and touching only matching buckets.

    Bucket count is a layout contract: both sides must agree (64 here;
    on a real cluster pick ~2-4x executor count and keep it stable
    across tables that join together).
    """
    (
        sessions.write.mode(mode)
        .format("parquet")
        .bucketBy(buckets, key)
        .sortBy(key)
        .option("path", path)
        .saveAsTable(table)
    )


def optimize_layout(
    spark: SparkSession,
    path: str,
    cols: list[str],
    *,
    days: list[str] | None = None,
    bits: int = 12,
    n_files: int = 16,
    force_manifest: bool = True,
) -> list[str]:
    """Maintenance: rewrite day partitions Z-ORDERED by `cols` and
    commit them atomically through the PartitionCommitter (VERDICT r6
    #4 — layout.write_zordered was an island with no store path).
    Defaults to MANIFEST mode even on a local store: the reader-
    isolation and all-days-or-nothing guarantees below come from the
    single manifest swap — rename mode deletes each superseded
    partition at its own swap, so a concurrent reader mid-scan would
    hit removed files (pass force_manifest=False only for an offline
    local rewrite with no readers).

    The reference prunes scans by TIME only (index-name ranges,
    viewer/db.js:1853-1939); its hottest non-time predicates —
    srcIp/port expression searches — read every shard. Z-ordering the
    closed day partitions by those value columns adds file/row-group
    min-max pruning on ANY prefix subset of `cols` (SURVEY §4's
    optional ip-range row-group skipping), at the cost of one sorted
    rewrite per day — run it where compact_partitions runs, on CLOSED
    days only. Readers are never disturbed: the rewrite stages under
    the committer's generation and lands with one manifest swap; a
    concurrent reader mid-scan finishes on the superseded generation
    (MVCC retention, reclaim via vacuum_store).

    Scale shape: one driver loop over day partitions (bounded by the
    retention window, the same cadence compaction runs at), each
    iteration two Spark jobs (min/max stats + range-partitioned sorted
    write) — write_zordered's documented cost. Returns the committed
    partition names."""
    import posixpath

    from moloch_spark.sources.commit import (
        PartitionCommitter,
        load_manifest,
        resolve_partitions,
    )
    from moloch_spark.sources.layout import write_zordered

    # ONE manifest read feeds both the data dirs the rewrite scans and
    # the commit-time expected= base — two reads would let a commit
    # landing in between slip past the freshness check (review r7)
    base = load_manifest(path)
    parts = resolve_partitions(path, manifest=base)
    if days is None:
        days = sorted(name.rsplit("=", 1)[1] for name in parts)
    committer = PartitionCommitter(path, force_manifest=force_manifest)
    done: list[str] = []
    for day in days:
        name = f"{PARTITION_COL}={day}"
        pdir = parts.get(name)
        if pdir is None:
            continue
        write_zordered(
            spark.read.parquet(pdir),
            posixpath.join(committer.staging_dir(), name),
            cols,
            bits=bits,
            n_files=n_files,
        )
        done.append(name)
    if done:
        # expected = the generations this rewrite read from (None for
        # a day resolved from the PLAIN tree: it must still be
        # uncommitted at commit time): a day a concurrent UPDATE moved
        # past that base keeps the update (our re-clustered copy of
        # stale data is dropped; re-run later)
        final = committer.commit(
            done,
            expected=(
                {n: base.get(n) for n in done}
                if committer.manifest_mode
                else None  # offline local rewrite: no manifest to check
            ),
        )
        if final is not None:
            done = [
                n
                for n in done
                if final.get(n) == posixpath.join("_gen", committer.token, n)
            ]
    else:
        committer.abort()
    return done


def compact_partitions(
    spark: SparkSession,
    path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    days: list[str] | None = None,
    force_manifest: bool = False,
    zorder_cols: list[str] | None = None,
    zorder_bits: int = 12,
) -> dict[str, int]:
    """Small-files maintenance — the `db.pl optimize` analog. Streaming
    appends and per-day writes accumulate small files; scans then pay
    per-file open/footer costs (the metastore killer at 100 TB). Each
    day partition is rewritten into ceil(bytes/target) files and
    committed through sources/commit.PartitionCommitter — hardened
    atomic renames locally, the manifest protocol on an object store
    (force_manifest=True anywhere; see PLANS.md §28) — so readers
    never observe a partially-rewritten partition. On a real
    deployment the same job runs per closed day (only CLOSED days:
    compaction of the live day races the writer). File stats go through
    the sources/fs adapter — a glob/getsize probe would silently find
    ZERO files on an s3a:// store and no-op the exact deployments
    compaction exists for (VERDICT r6 #3).

    `zorder_cols` clusters each rewritten partition by the Morton key
    of those columns in the SAME rewrite (Delta's `OPTIMIZE ... ZORDER
    BY` shape): a deployment that compacts and then optimize_layout's
    the same closed day pays two full rewrites; folding the layout into
    the compaction pays one. Compaction TRIGGER semantics are unchanged
    (a day already at its target file count is skipped) — use
    optimize_layout to re-cluster without the small-files condition.
    Returns {day: files_after}."""
    import math
    import posixpath

    from moloch_spark.sources.commit import (
        PartitionCommitter,
        load_manifest,
        resolve_partitions,
    )
    from moloch_spark.sources.fs import get_fs

    fs, _root = get_fs(path, spark)

    def _parquet_files(pdir: str) -> list[str]:
        return [
            posixpath.join(pdir, n)
            for n in fs.listdir(pdir)
            if n.endswith(".parquet")
        ]

    # one manifest read feeds both the scanned dirs and the expected=
    # base (see optimize_layout)
    base = load_manifest(path)
    parts = resolve_partitions(path, manifest=base)
    if days is None:
        days = sorted(name.rsplit("=", 1)[1] for name in parts)
    out: dict[str, int] = {}
    committer = PartitionCommitter(path, force_manifest=force_manifest)
    compacted: list[str] = []
    for day in days:
        pdir = parts.get(f"{PARTITION_COL}={day}")
        if pdir is None:
            continue
        files = _parquet_files(pdir)
        size = sum(fs.size(f) for f in files)
        n = max(1, math.ceil(size / target_file_bytes))
        if len(files) <= n:
            out[day] = len(files)
            continue
        dst = posixpath.join(
            committer.staging_dir(), f"{PARTITION_COL}={day}"
        )
        if zorder_cols:
            from moloch_spark.sources.layout import write_zordered

            write_zordered(
                spark.read.parquet(pdir),
                dst,
                zorder_cols,
                bits=zorder_bits,
                n_files=n,
            )
        else:
            spark.read.parquet(pdir).repartition(n).write.mode(
                "overwrite"
            ).parquet(dst)
        compacted.append(day)
    if compacted:
        names = [f"{PARTITION_COL}={d}" for d in compacted]
        # expected: never clobber a concurrent update with the
        # compaction of its superseded generation; None = the day was
        # plain at read time and must still be uncommitted (see
        # optimize_layout)
        final = committer.commit(
            names,
            expected=(
                {n: base.get(n) for n in names}
                if committer.manifest_mode
                else None  # offline local rewrite: no manifest to check
            ),
        )
        parts = resolve_partitions(path)
        for day in compacted:
            name = f"{PARTITION_COL}={day}"
            ours = posixpath.join("_gen", committer.token, name)
            if (final is None or final.get(name) == ours) and name in parts:
                out[day] = len(_parquet_files(parts[name]))
            # else: the day moved (concurrent update) or vanished
            # (concurrent expiry) mid-compaction — OUR rewrite was
            # dropped by the expected check, so it was NOT compacted;
            # leave it out of the result and let the next run see it
    else:
        committer.abort()
    return out
