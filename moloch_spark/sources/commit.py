"""Commit protocols for directory-granular table updates.

Two situations in this engine replace whole directories atomically:
per-day partition swaps in the session store (tag write-back,
compaction — the parquet analog of the reference's in-place ES doc
update, viewer/apiSessions.js:1480-1529) and the cron forward outbox
(tick append, viewer/viewer.js:2259-2265). On a POSIX filesystem a
directory rename is atomic and cheap, so that is the fast path. Object
stores (S3/GCS) have NO rename — "rename" is copy+delete, neither step
atomic — so the portable commit unit is the only thing every store
does atomically: a SINGLE-OBJECT PUT.

Portable protocol (manifest mode):
  * writers write data to its FINAL location under `<store>/_gen/<token>/`
    — the underscore prefix makes the directory invisible to Spark /
    Hadoop partition discovery, so a plain reader can never observe a
    half-written generation;
  * the commit is one atomic swap of a single small object,
    `<store>/_manifest.json`, mapping partition name -> generation dir;
  * readers resolve partitions through the manifest (manifest entry
    wins over the plain directory). A crash between the data write and
    the manifest swap leaves the manifest — and therefore every reader
    — on the previous generation; the orphaned `_gen` dir is a vacuum
    target, exactly like any MVCC table format.

Concurrency: each writer owns a unique `_gen/<token>` prefix, so
racing writers never interleave files. The manifest read-modify-write
itself is last-writer-wins; two writers racing on DIFFERENT partitions
of the same store need a real table format (Delta/Iceberg log) or a
conditional PUT — documented in PLANS.md §28, out of scope here, and
irrelevant for the single-writer maintenance jobs that use this.

The local fast path keeps the two-rename swap but hardened (ADVICE
r4): stale `.old` dirs from a prior crash are recovered on entry, a
failure between the two renames restores the original directory, and
first-write partitions (no existing dst) commit with a single rename.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid


def is_posix_path(path: str) -> bool:
    """Local filesystem paths get the atomic-rename fast path; anything
    with a non-file scheme (s3a://, gs://, ...) must use manifest mode."""
    if "://" not in path:
        return True
    return path.split("://", 1)[0] == "file"


def _strip_scheme(path: str) -> str:
    return path.split("://", 1)[1] if "://" in path else path


MANIFEST = "_manifest.json"


def load_manifest(store: str) -> dict[str, str]:
    """partition name -> store-relative data dir for manifest-committed
    partitions; empty when the store has no manifest."""
    p = os.path.join(_strip_scheme(store), MANIFEST)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f).get("partitions", {})


def _write_manifest(store: str, partitions: dict[str, str]) -> None:
    """Atomic single-object swap: write-to-temp + rename locally; on an
    object store this is one PUT of the manifest key (PUTs are atomic
    per object on S3/GCS)."""
    root = _strip_scheme(store)
    os.makedirs(root, exist_ok=True)
    tmp = os.path.join(root, f".{MANIFEST}.{uuid.uuid4().hex[:8]}.tmp")
    with open(tmp, "w") as f:
        json.dump({"partitions": partitions}, f, sort_keys=True)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(root, MANIFEST))


def resolve_partitions(store: str) -> dict[str, str]:
    """Every live partition of the store: name -> ABSOLUTE data dir.
    Manifest entries override the plain directory of the same name."""
    root = _strip_scheme(store)
    out: dict[str, str] = {}
    if os.path.isdir(root):
        for name in sorted(os.listdir(root)):
            if name.startswith(("_", ".")) or "=" not in name:
                continue
            if os.path.isdir(os.path.join(root, name)):
                out[name] = os.path.join(root, name)
    for name, rel in load_manifest(store).items():
        out[name] = os.path.join(root, rel)
    return out


def read_store(spark, store: str, partition_col: str | None = None):
    """Manifest-aware store read. Without a manifest this is a plain
    partitioned parquet read (zero overhead). With one, each resolved
    partition dir is read explicitly and the partition column re-added
    from the dir name — the moral equivalent of a Delta file index: the
    reader never lists, never trusts, the plain directory tree."""
    manifest = load_manifest(store)
    if not manifest:
        return spark.read.parquet(store)
    from pyspark.sql import functions as F

    parts = resolve_partitions(store)
    dfs = []
    for name, d in sorted(parts.items()):
        col, val = name.split("=", 1)
        if partition_col is not None and col != partition_col:
            continue
        dfs.append(spark.read.parquet(d).withColumn(col, F.lit(val)))
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


class PartitionCommitter:
    """One atomic replace of a set of partitions in a partitioned store.

        c = PartitionCommitter(store)            # or force_manifest=True
        df.write.partitionBy("day").parquet(c.staging_dir())
        c.commit(["day=2024-03-05", ...])

    Rename mode stages OUTSIDE the store tree and swaps each partition
    with the hardened two-rename; manifest mode stages at the FINAL
    path under `<store>/_gen/<token>` and commits all partitions with
    one manifest swap (all-or-nothing across the set, which the rename
    mode cannot give — one more reason it is the portable default for
    multi-partition updates on object stores)."""

    def __init__(self, store: str, *, force_manifest: bool = False):
        self.store = _strip_scheme(store.rstrip("/"))
        self.token = uuid.uuid4().hex[:12]
        self.manifest_mode = force_manifest or not is_posix_path(store)
        self._staging = (
            os.path.join(self.store, "_gen", self.token)
            if self.manifest_mode
            else f"{self.store}__stage_{self.token}"
        )

    def staging_dir(self) -> str:
        return self._staging

    def commit(self, partitions: list[str]) -> None:
        missing = [
            p
            for p in partitions
            if not os.path.isdir(os.path.join(self._staging, p))
        ]
        if missing:
            raise FileNotFoundError(
                f"staged data missing for partitions {missing} under "
                f"{self._staging}"
            )
        if self.manifest_mode:
            manifest = load_manifest(self.store)
            before = {p: manifest.get(p) for p in partitions}
            for p in partitions:
                manifest[p] = os.path.join("_gen", self.token, p)
            _write_manifest(self.store, manifest)
            # superseded generations are now unreachable -> vacuum
            # (drop the partition dir, then its token parent if empty)
            for old in set(before.values()):
                if old is None:
                    continue
                shutil.rmtree(
                    os.path.join(self.store, old), ignore_errors=True
                )
                parent = os.path.dirname(os.path.join(self.store, old))
                # only bookkeeping files (_SUCCESS) left -> whole token
                # dir is garbage
                if os.path.isdir(parent) and all(
                    n.startswith(("_", ".")) for n in os.listdir(parent)
                ):
                    shutil.rmtree(parent, ignore_errors=True)
        else:
            for p in partitions:
                swap_dir(
                    os.path.join(self._staging, p), os.path.join(self.store, p)
                )
            shutil.rmtree(self._staging, ignore_errors=True)

    def abort(self) -> None:
        shutil.rmtree(self._staging, ignore_errors=True)


def swap_dir(src: str, dst: str) -> None:
    """Hardened POSIX directory swap (ADVICE r4): recover a stale
    `<dst>.old` left by a prior crash, commit a first write (missing
    dst) with a single rename, and restore dst if the second rename of
    the two-rename swap fails."""
    old = dst + ".old"
    if os.path.isdir(old):
        if os.path.isdir(dst):
            shutil.rmtree(old)  # prior crash AFTER its swap completed
        else:
            os.rename(old, dst)  # prior crash mid-swap: roll back
    if not os.path.isdir(dst):
        os.rename(src, dst)
        return
    os.rename(dst, old)
    try:
        os.rename(src, dst)
    except OSError:
        os.rename(old, dst)  # put the original back, then re-raise
        raise
    shutil.rmtree(old)


def vacuum_store(store: str) -> list[str]:
    """Remove `_gen` generations not referenced by the manifest (failed
    or superseded writers). Returns removed relative dirs."""
    root = _strip_scheme(store)
    gen_root = os.path.join(root, "_gen")
    if not os.path.isdir(gen_root):
        return []
    live = {rel.split(os.sep)[1] for rel in load_manifest(store).values()}
    removed = []
    for token in sorted(os.listdir(gen_root)):
        if token not in live:
            shutil.rmtree(os.path.join(gen_root, token), ignore_errors=True)
            removed.append(os.path.join("_gen", token))
    return removed


# ---------------------------------------------------------------------------
# Marker-committed append dirs (the cron forward outbox tick)
# ---------------------------------------------------------------------------


def publish_once(df, dest: str, meta: dict | None = None) -> dict:
    """Commit `df` as the content of `dest` EXACTLY ONCE across crashed
    retries and racing writers, portably:

      * already committed -> return the existing commit's meta (the
        caller treats the recorded state, not its own recomputation, as
        the truth — this is what makes replays with a LATER wall-clock
        `now` safe for the cron forwarder);
      * else write data to `dest/data-<wtoken>` (unique per writer, so
        racers never interleave), then PUT `dest/_committed-<wtoken>`
        with the meta as content. Readers resolve the MIN committed
        wtoken, so every reader deterministically agrees on the winner
        even while a race is in flight.

    Crash between data write and marker -> no marker -> invisible;
    the orphan data dir is a vacuum target."""
    existing = resolve_commit(dest)
    if existing is not None:
        return existing[1]
    root = _strip_scheme(dest)
    wtoken = uuid.uuid4().hex[:12]
    df.write.mode("overwrite").parquet(os.path.join(root, f"data-{wtoken}"))
    tmp = os.path.join(root, f".marker.{wtoken}.tmp")
    with open(tmp, "w") as f:
        json.dump(meta or {}, f)
        f.flush()
        os.fsync(f.fileno())
    os.rename(tmp, os.path.join(root, f"_committed-{wtoken}"))
    committed = resolve_commit(dest)
    assert committed is not None
    return committed[1]


def resolve_commit(dest: str) -> tuple[str, dict] | None:
    """(data dir, meta) of the winning commit under dest, or None."""
    root = _strip_scheme(dest)
    if not os.path.isdir(root):
        return None
    markers = sorted(
        n for n in os.listdir(root) if n.startswith("_committed-")
    )
    for m in markers:  # min wtoken whose data dir exists
        wtoken = m.split("-", 1)[1]
        data = os.path.join(root, f"data-{wtoken}")
        if os.path.isdir(data):
            with open(os.path.join(root, m)) as f:
                return data, json.load(f)
    return None
