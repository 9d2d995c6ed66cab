"""Standing (cron) queries — moloch's periodic-query engine.

Reference (viewer/viewer.js:2293-2460): each saved query keeps a
watermark `lpValue`; every tick it searches sessions with
lastPacket in (lpValue, now - 90s] matching the saved expression, runs
its action (add tags / forward), and advances lpValue. The 90s lag
covers ingest latency (viewer/internals.js:37-39).

Spark shape: an incremental batch job over the session/event table with
a checkpointed per-query watermark — the same filter is a partition-
pruned range scan, the action is an append to a tags table (at real
scale: a Delta MERGE). Exactly-once per row comes from the watermark
interval being half-open.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from datetime import datetime, timedelta, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moloch_spark.catalog import FieldCatalog
from moloch_spark.expr import CompileContext, compile_expression


@dataclass
class CronQuery:
    name: str
    expression: str  # moloch expression over the fact table
    tags: list[str]  # action: tags to attach
    lag_s: int = 90  # ingest-latency grace (internals.cronTimeout)
    # 'tag' or 'forward:<cluster>' (viewer.js:2334-2336,2259-2265): a
    # forward query re-ships each tick's matched sessions (+ their
    # packetPos refs, so the remote side can fetch packets) to another
    # cluster instead of tagging them
    action: str = "tag"


class CronRunner:
    """Checkpointed incremental runner: state file maps query name ->
    lp_value (ISO). Each run processes (lp_value, now - lag] once."""

    def __init__(self, state_path: str, catalog: FieldCatalog, ts_col: str = "ts"):
        self.state_path = state_path
        self.catalog = catalog
        self.ts_col = ts_col

    def _load(self) -> dict[str, str]:
        if os.path.exists(self.state_path):
            with open(self.state_path) as f:
                return json.load(f)
        return {}

    def _save(self, st: dict[str, str]) -> None:
        with open(self.state_path, "w") as f:
            json.dump(st, f)

    def run_once(
        self,
        df: DataFrame,
        query: CronQuery,
        *,
        now: datetime | None = None,
        id_cols: list[str] | None = None,
        outbox: str | None = None,
    ) -> DataFrame:
        """One tick: returns the matched rows tagged (action 'tag'),
        or — for 'forward:<cluster>' — appends them EXACTLY ONCE to the
        per-cluster forward outbox under `outbox` and returns the
        committed tick. Advances lpValue either way."""
        now = now or datetime.now(timezone.utc).replace(tzinfo=None)
        hi = now - timedelta(seconds=query.lag_s)
        st = self._load()
        lo = st.get(query.name)
        ts = F.col(self.ts_col)
        window = ts <= F.lit(hi.isoformat(sep=" ")).cast("timestamp")
        if lo is not None:
            window = window & (ts > F.lit(lo).cast("timestamp"))
        pred = compile_expression(
            query.expression, CompileContext(catalog=self.catalog, now=now)
        )
        matched = df.filter(window & pred)
        if id_cols:
            matched = matched.select(*id_cols)
        if query.action.startswith("forward:"):
            if outbox is None:
                raise ValueError("forward action needs an outbox path")
            out, committed_hi = self._forward(matched, query, lo, hi, outbox)
            # advance to the COMMITTED tick's hi, not the recomputed
            # one: a replay after a crash (same lo, later wall-clock
            # now -> larger hi) must adopt the committed window so the
            # NEXT tick starts exactly where the committed one ended —
            # otherwise the larger-hi rewrite would be a superset of
            # the committed rows (duplicates). ADVICE r4 (medium).
            st[query.name] = committed_hi
        else:
            out = matched.withColumn(
                "tags", F.array(*[F.lit(t) for t in query.tags])
            ).withColumn("cron_name", F.lit(query.name))
            st[query.name] = hi.isoformat(sep=" ")
        self._save(st)
        return out

    def _forward(
        self, matched: DataFrame, query: CronQuery, lo, hi, outbox: str
    ) -> tuple[DataFrame, str]:
        """Exactly-once forward (sendSessionsListQL analog,
        viewer.js:2259-2265): each tick's matches land in a tick
        directory under the target cluster keyed by `lo` ALONE — the
        deterministic anchor of the half-open watermark chain. The
        commit is the marker protocol in sources/commit.py (unique
        per-writer data dir + atomic marker PUT recording the tick's
        `hi`), so it is safe on object stores, against racing runners,
        and against a crash between the data write and the lpValue
        save: the re-run (even with a later wall-clock now and thus a
        larger candidate hi) finds the committed tick, returns ITS
        rows, and advances lpValue to ITS recorded hi — no duplicates,
        and the uncovered (committed_hi, new_hi] range arrives with the
        next tick — no gaps. The rows keep whatever projection the
        caller chose (session ids, node, packetPos refs) so the
        receiving cluster can fetch the packets, like the reference's
        forward payload (id + node). Returns (committed rows, hi)."""
        from moloch_spark.sources.commit import publish_once, resolve_commit

        cluster = query.action.split(":", 1)[1]
        tick = f"{lo or 'epoch'}".replace(":", "-").replace(" ", "_")
        # the tick dir is keyed by (query, lo), not lo alone: two
        # standing queries forwarding to the same cluster both start
        # from lo='epoch', and a shared dir would make the second query
        # adopt the first one's committed rows and hi. The token is the
        # sanitized name PLUS a short digest of the raw name, so names
        # that sanitize identically ('fwd.err' vs 'fwd_err') still get
        # distinct tick dirs (ADVICE r5).
        import hashlib

        qtoken = (
            "".join(
                c if c.isalnum() or c in "-_" else "_" for c in query.name
            )
            + "-"
            + hashlib.md5(query.name.encode()).hexdigest()[:8]
        )
        dest = os.path.join(
            outbox, f"cluster={cluster}", f"query={qtoken}", f"ticklo={tick}"
        )
        meta = publish_once(
            matched.withColumn("cron_name", F.lit(query.name)),
            dest,
            {"hi": hi.isoformat(sep=" "), "cron_name": query.name},
        )
        data_dir, _ = resolve_commit(dest)
        return matched.sparkSession.read.parquet(data_dir), meta["hi"]


def read_outbox(spark: SparkSession, outbox: str, cluster: str) -> DataFrame:
    """The receiving side: union of all COMMITTED ticks for a cluster,
    across every standing query forwarding to it. Uncommitted (crashed
    / in-flight / losing-racer) data dirs are invisible because
    readers resolve through the markers."""
    from moloch_spark.sources.commit import resolve_commit
    from moloch_spark.sources.fs import get_fs

    fs, base = get_fs(outbox, spark)
    root = os.path.join(base, f"cluster={cluster}")
    dirs = []
    for qdir in fs.listdir(root):
        if not qdir.startswith("query="):
            continue
        qroot = os.path.join(root, qdir)
        for name in fs.listdir(qroot):
            if not name.startswith("ticklo="):
                continue
            c = resolve_commit(os.path.join(qroot, name), spark)
            if c is not None:
                dirs.append(c[0])
    if not dirs:
        raise FileNotFoundError(f"no committed ticks under {root}")
    return spark.read.parquet(*dirs)


@dataclass
class Notifier:
    """A delivery target (viewer/apiNotifiers.js: slack/email/twilio
    configs stored in the notifiers index). Delivery itself is an edge
    concern; the engine's job is the exactly-once alert OUTBOX."""

    name: str
    kind: str  # 'slack' | 'email' | 'twilio' | ...
    target: str


def build_alerts(
    matched: DataFrame,
    cron_name: str,
    notifiers: list[Notifier],
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Alerts-as-rows for a cron/hunt tick: one outbox row per notifier
    summarizing the batch (count + time range), mirroring the
    reference's 'notify on new matches' hook (viewer/viewer.js cron
    notifier path). A 1-row aggregate crossed with a literal notifier
    table — no per-match fanout, so alert volume is O(notifiers) even
    when a tick matches millions of sessions. Append the result to an
    outbox table; a delivery daemon drains it (at-least-once delivery
    with the outbox as the dedup ledger)."""
    summary = matched.agg(
        F.count(F.lit(1)).alias("match_count"),
        F.min(ts_col).alias("first_match"),
        F.max(ts_col).alias("last_match"),
    ).withColumn("cron_name", F.lit(cron_name))
    targets = [
        F.struct(
            F.lit(n.name).alias("notifier"),
            F.lit(n.kind).alias("kind"),
            F.lit(n.target).alias("target"),
        )
        for n in notifiers
    ]
    return (
        summary.select(
            "cron_name", "match_count", "first_match", "last_match",
            F.explode(F.array(*targets)).alias("n"),
        )
        .filter(F.col("match_count") > 0)
        .select(
            "cron_name", "match_count", "first_match", "last_match",
            F.col("n.notifier").alias("notifier"),
            F.col("n.kind").alias("kind"),
            F.col("n.target").alias("target"),
        )
    )
