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
the session store's superseded generations); drop the g1 family once
in-flight queries have drained.
"""

from __future__ import annotations

import json

from moloch_spark.sources.fs import get_fs


def set_index_alias(alias_path: str, prefix: str, spark=None) -> None:
    """Atomically repoint the alias at `prefix` (one PUT — the commit
    point of an index rebuild)."""
    fs, p = get_fs(alias_path, spark)
    fs.put_text_atomic(p, json.dumps({"prefix": prefix}))


def resolve_index_alias(alias_path: str, spark=None) -> str:
    """The table prefix the alias currently points at. Resolve ONCE per
    query and use that prefix for every table of the family — resolving
    per-table would reintroduce the mixed-generation read."""
    fs, p = get_fs(alias_path, spark)
    return json.loads(fs.read_text(p))["prefix"]
