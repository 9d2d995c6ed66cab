"""Atomic alias indirection for multi-table serving indexes.

build_bm25_index and build_ann_index document the same rebuild caveat:
each index is a FAMILY of tables (postings/dl/stats, codes/model)
dropped and recreated separately, so a query racing an in-place
rebuild can observe the tables at mixed generations (new codes scored
against the old model). The fix every serving system uses is alias
indirection — Elasticsearch index aliases (the reference swaps its
per-day session indices behind exactly this, db/db.pl's alias
rollover), Faiss index symlink flips: REBUILD INTO A FRESH PREFIX,
then repoint one alias atomically; readers resolve the alias at query
start and see either the whole old family or the whole new one, never
a mix.

The alias is one tiny JSON object at a caller-chosen path, published
through the fs adapter's atomic single-object PUT — the same commit
unit as the store manifest, so it works identically on local/HDFS/
object stores and across Spark sessions (a metastore view would be
session/catalog-scoped and cannot atomically cover N tables anyway).

Typical rebuild:

    build_bm25_index(spark, corpus, "idx_g2", path_g2)   # fresh prefix
    set_index_alias("warehouse/docs_idx.alias", "idx_g2")  # the commit
    ...
    prefix = resolve_index_alias("warehouse/docs_idx.alias")
    bm25_topk_indexed(spark, prefix, queries)

A reader that resolved "idx_g1" mid-flight finishes on the g1 tables
(they are not dropped by the swap — MVCC retention, same contract as
the session store's superseded generations); the swap RECORDS the
superseded prefix in the alias body, and vacuum_index_alias reclaims
drained generations past an age gate (round 8 — previously a manual
"drop g1 once drained" step).
"""

from __future__ import annotations

import json
import posixpath
from contextlib import contextmanager

from moloch_spark.sources.fs import get_fs


@contextmanager
def _alias_mutation_lock(fs, p: str):
    """Serialize alias read-modify-writes (`<alias>.lock`, the
    manifest-lock protocol: exclusive create, content-verified TTL
    steal, store-clock staleness). Without it, vacuum_index_alias's
    rewrite racing a rebuild's swap could restore a STALE current
    pointer — the alias-level lost update. Swaps are rebuild-rate
    (rare), so two extra fs ops per mutation are free; resolve stays
    lock-free (a single read of one atomic object)."""
    from moloch_spark.sources.commit import (
        _acquire_manifest_lock,
        _release_manifest_lock,
    )

    root, name = posixpath.split(p)
    token = _acquire_manifest_lock(fs, root or ".", name=f"{name}.lock")
    try:
        yield
    finally:
        _release_manifest_lock(fs, root or ".", token, name=f"{name}.lock")


def _now(fs, p: str) -> float:
    """Store-side "now" for supersession stamps and retention gates
    (one probe object via commit._store_clock; local-clock fallback) —
    both sides of every age comparison in this module use the same
    clock source."""
    from moloch_spark.sources.commit import _store_clock

    return _store_clock(fs, posixpath.split(p)[0] or ".")


def set_index_alias(alias_path: str, prefix: str, spark=None) -> None:
    """Atomically repoint the alias at `prefix` (one PUT — the commit
    point of an index rebuild). The superseded prefix is RECORDED in
    the alias body with its supersession time (the session store's
    MVCC bookkeeping, one object instead of snapshot files) so
    vacuum_index_alias can later reclaim drained generations without a
    side registry; re-pointing at the current prefix is a no-op. The
    read-modify-write is serialized against other swaps and against
    vacuum_index_alias by `<alias>.lock`."""
    fs, p = get_fs(alias_path, spark)
    with _alias_mutation_lock(fs, p):
        history: list[dict] = []
        if fs.exists(p):
            body = json.loads(fs.read_text(p))
            old = body.get("prefix")
            if old == prefix:
                return
            history = body.get("superseded", [])
            if old is not None:
                # supersession time from the STORE's clock, same as the
                # lock staleness check (commit._store_clock): vacuum's
                # retain_s gate compares against this stamp, and a
                # maintenance host with a fast local clock must not see
                # a just-superseded generation as already drained
                history = history + [
                    {"prefix": old, "at": _now(fs, p)}
                ]
        fs.put_text_atomic(
            p, json.dumps({"prefix": prefix, "superseded": history})
        )


def resolve_index_alias(alias_path: str, spark=None) -> str:
    """The table prefix the alias currently points at. Resolve ONCE per
    query and use that prefix for every table of the family — resolving
    per-table would reintroduce the mixed-generation read."""
    fs, p = get_fs(alias_path, spark)
    return json.loads(fs.read_text(p))["prefix"]


def superseded_index_prefixes(
    alias_path: str, spark=None, *, older_than_s: float = 0.0
) -> list[str]:
    """Prefixes the alias superseded at least `older_than_s` seconds
    ago — the drained-generation audit list (a reader that resolved
    before a swap finishes on the old family; age-gate with your
    longest query, like vacuum_store retention)."""
    fs, p = get_fs(alias_path, spark)
    if not fs.exists(p):
        return []
    body = json.loads(fs.read_text(p))
    latest = _latest_supersessions(body)
    now = _now(fs, p)
    return sorted(
        pre for pre, at in latest.items() if now - at >= older_than_s
    )


def _latest_supersessions(body: dict) -> dict[str, float]:
    """prefix -> LATEST supersession time, current prefix excluded. A
    prefix can appear in the history several times (rollback, then
    superseded again); age decisions must key on the newest entry or a
    rolled-back-to generation gets reclaimed through its stale first
    entry while readers are still draining off it."""
    latest: dict[str, float] = {}
    for h in body.get("superseded", []):
        if h["prefix"] != body.get("prefix"):
            latest[h["prefix"]] = max(
                latest.get(h["prefix"], 0.0), h["at"]
            )
    return latest


def vacuum_index_alias(
    alias_path: str,
    spark,
    tables: tuple[str, ...],
    *,
    retain_s: float = 900.0,
    dry_run: bool = False,
) -> list[str]:
    """Reclaim index-family generations the alias superseded more than
    `retain_s` ago — the vacuum_store analog that closes the alias
    docstring's manual "drop the g1 family once in-flight queries have
    drained" step. `tables` is the family's suffix set (("postings",
    "dl", "stats") for BM25, ("codes", "model") for ANN). For each
    reclaimed generation the table's storage LOCATION is resolved
    FIRST, the catalog entry dropped, then the data dir deleted
    through the fs adapter — index tables are EXTERNAL (built with
    .option("path")), so DROP TABLE alone would reclaim only catalog
    rows and leak the parquet (the bulk of what a vacuum exists to
    reclaim).

    Age decisions key on each prefix's LATEST supersession entry
    (rollback-safe — see _latest_supersessions) against the STORE's
    clock, and reclaimed prefixes have ALL their history entries
    removed. The `<alias>.lock` is held ONLY for the fast
    read-plan-rewrite of the alias body (the sub-second RMW the lock
    protocol assumes); the catalog drops and recursive data deletes —
    unbounded I/O on an object store — run AFTER release, so a
    rebuild can never TTL-steal the lock mid-vacuum and have its swap
    clobbered by our rewrite. A crash between the rewrite and the
    drops leaks unreferenced generation tables, the same residue as a
    build that died before its alias PUT — both are reclaimed by
    sweep_orphan_index_generations. Never touches the CURRENT prefix.
    Returns the reclaimed prefixes; `dry_run` audits without dropping
    (and without the lock)."""
    fs, p = get_fs(alias_path, spark)
    if not fs.exists(p):
        return []

    def plan(body):
        now = _now(fs, p)
        latest = _latest_supersessions(body)
        reclaim = sorted(
            pre for pre, at in latest.items() if now - at >= retain_s
        )
        keep = [
            h
            for h in body.get("superseded", [])
            if h["prefix"] not in reclaim
        ]
        return keep, reclaim

    if dry_run:
        return plan(json.loads(fs.read_text(p)))[1]
    with _alias_mutation_lock(fs, p):
        # fast RMW only under the lock: the expensive deletes below
        # must not outlive the lock TTL
        body = json.loads(fs.read_text(p))
        keep, reclaim = plan(body)
        if not reclaim:
            return []
        fs.put_text_atomic(
            p, json.dumps({"prefix": body.get("prefix"), "superseded": keep})
        )
    for prefix in reclaim:
        _drop_generation(spark, prefix, tables)
    return reclaim


def _drop_generation(spark, prefix: str, tables: tuple[str, ...]) -> None:
    """Drop one generation's catalog tables AND their external data
    dirs (location resolved before the drop)."""
    for t in tables:
        loc = _table_location(spark, f"{prefix}_{t}")
        spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")
        if loc is not None:
            dfs, dp = get_fs(loc, spark)
            dfs.delete(dp)


def sweep_orphan_index_generations(
    spark,
    alias_path: str,
    table_prefix: str,
    tables: tuple[str, ...],
    *,
    retain_s: float = 900.0,
    dry_run: bool = False,
) -> list[str]:
    """Reclaim `{table_prefix}_g<token>` generations the alias knows
    NOTHING about — the residue of a build that crashed before its
    set_index_alias commit point, or of a vacuum that crashed between
    its history rewrite and its drops. Those generations appear in
    neither the current pointer nor the superseded history, so
    vacuum_index_alias can never see them; this sweep lists the
    catalog for the family's naming pattern instead. Age-gated on the
    NEWEST mtime across ALL resolvable family table locations with
    `retain_s` (default = the orphan-commit grace: a young orphan may
    be a build IN FLIGHT between its table writes and its alias PUT —
    deleting under it is the vacuum_store in-flight-writer bug all
    over again). The newest-activity gate matters for multi-table
    families: a large build that wrote its first table > retain_s ago
    but is still writing its second must NOT look aged (gating on the
    first table alone is exactly the in-flight-writer bug one level
    up). A generation none of whose locations can be aged — every
    DESCRIBE/mtime probe failed, e.g. transiently — is DEFERRED to the
    next sweep, never dropped blind. `retain_s` must therefore exceed
    the longest plausible build duration, not the longest query.
    Returns the reclaimed prefixes; dry_run audits."""
    known = set()
    fs, p = get_fs(alias_path, spark)
    if fs.exists(p):
        body = json.loads(fs.read_text(p))
        if body.get("prefix"):
            known.add(body["prefix"])
        known |= {h["prefix"] for h in body.get("superseded", [])}
    pat = f"{table_prefix}_g"
    gens: set[str] = set()
    present: dict[str, set[str]] = {}
    for t in spark.catalog.listTables():
        name = t.name
        if not name.startswith(pat):
            continue
        for suffix in tables:
            if name.endswith(f"_{suffix}"):
                prefix = name[: -len(suffix) - 1]
                gens.add(prefix)
                present.setdefault(prefix, set()).add(suffix)
                break
    reclaimed = []
    for prefix in sorted(gens - known):
        # age on the NEWEST activity across the whole family: one
        # young table means the build may still be writing, even if
        # an earlier table has already aged past retain_s. Tables the
        # catalog scan did NOT list were never written (crashed-early
        # build) and legitimately don't gate the age; for a LISTED
        # table, a failed DESCRIBE or mtime probe is an UNAGEABLE
        # table, not a missing one — treat it as "possibly just
        # written" so the family is deferred, never dropped blind
        # (conflating the two is the fail-unsafe branch this sweep
        # exists to avoid).
        ages: list[float] = []
        for t in tables:
            if t not in present.get(prefix, set()):
                continue  # never written: other tables gate the age
            loc = _table_location(spark, f"{prefix}_{t}")
            if loc is None:
                ages.append(float("-inf"))  # DESCRIBE failed on an
                # existing table: unageable, protect the family
                continue
            try:
                dfs, dp = get_fs(loc, spark)
                ages.append(_now(dfs, dp) - dfs.mtime(dp))
            except Exception:
                ages.append(float("-inf"))  # unageable mtime: ditto
        if not ages:
            continue  # nothing listed resolvable: defer to the next
            # sweep (fail-safe, not fail-unsafe)
        if min(ages) < retain_s:
            continue  # possibly a build in flight: protected
        if not dry_run:
            _drop_generation(spark, prefix, tables)
        reclaimed.append(prefix)
    return reclaimed


def _table_location(spark, table: str) -> str | None:
    """Storage location of a catalog table, normalized for the fs
    adapter (Hadoop renders local URIs as `file:/x`, which is neither
    a bare path nor the `file://` form get_fs recognizes), or None for
    a missing table — the caller then has nothing to delete."""
    try:
        rows = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
    except Exception:
        return None
    loc = next(
        (
            r["data_type"].strip()
            for r in rows
            if (r["col_name"] or "").strip() == "Location"
        ),
        None,
    )
    if loc is None:
        return None
    if loc.startswith("file:") and not loc.startswith("file://"):
        return loc[len("file:"):]
    return loc
