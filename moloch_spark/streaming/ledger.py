"""Epoch ledger: exactly-once guard for foreachBatch index folds.

Structured Streaming's foreachBatch contract is at-least-once: when a
micro-batch's user function completes but the driver dies before the
checkpoint commit lands, restart re-delivers the SAME epoch id. For
the durable-index appenders (retrieval.append_bm25_index_stream,
similarity.append_ann_index_stream) a re-delivered batch re-appends
its postings/codes — duplicate rows the serving math then double
counts. The fix every transactional sink uses (the Delta `txn`
action, reference analog: the capture process's sequence-numbered ES
bulk writes, capture/db.c) is a per-(checkpoint, sink) ledger of the
highest folded epoch, consulted before the fold and advanced after
it:

  * replay of an epoch <= ledger  -> skip (the common failure: the
    batch finished, only the checkpoint commit was lost),
  * crash INSIDE the fold         -> epoch never recorded, restart
    re-runs it; parquet job commits are all-or-nothing per table
    (FileOutputCommitter publishes at job commit), so the partial
    state is whole tables appended twice, not torn files — run the
    operator's repair_*_index to restore key uniqueness.

The ledger is one tiny JSON object per sink stored INSIDE the stream's
checkpoint directory (same lifecycle: drop the checkpoint to reprocess
from scratch and the ledger resets with it), published through the fs
adapter's atomic single-object PUT so it works on local/HDFS and flat
object stores alike. Epoch ids are monotonically increasing per
checkpoint and foreachBatch delivers them in order, so the max is the
full committed set.

Single-stream contract: one writer per (checkpoint, name) — the same
invariant Structured Streaming itself requires of a checkpoint dir.
"""

from __future__ import annotations

import json

from moloch_spark.sources import fs as fsmod


def _ledger_path(checkpoint: str, name: str) -> str:
    sep = "" if checkpoint.endswith("/") else "/"
    return f"{checkpoint}{sep}_index_epoch.{name}.json"


def committed_epoch(checkpoint: str, name: str, spark=None) -> int:
    """Highest epoch folded into sink `name` under this checkpoint;
    -1 when the ledger does not exist yet (fresh stream)."""
    fs, path = fsmod.get_fs(_ledger_path(checkpoint, name), spark)
    if not fs.exists(path):
        return -1
    return int(json.loads(fs.read_text(path))["epoch"])


def record_epoch(checkpoint: str, name: str, epoch: int, spark=None) -> None:
    """Advance the ledger to `epoch` (atomic PUT; monotonic — a stale
    concurrent write can only lower it back within the single-writer
    contract, so no CAS is needed)."""
    fs, path = fsmod.get_fs(_ledger_path(checkpoint, name), spark)
    fs.put_text_atomic(path, json.dumps({"epoch": int(epoch)}))
