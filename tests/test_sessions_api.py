from __future__ import annotations

import os

from moloch_spark.operators.sessions_api import (
    determine_interval,
    export_csv,
    update_tags,
)
from moloch_spark.sources.tables import load_table


def test_determine_interval():
    # viewerUtils.js:66-134 span rules
    assert determine_interval(600) == "second"
    assert determine_interval(3600) == "second"
    assert determine_interval(3601) == "minute"
    assert determine_interval(5 * 24 * 3600) == "minute"
    assert determine_interval(6 * 24 * 3600) == "hour"


def test_export_csv(spark, tmp_path):
    ev = load_table(spark, "events", "/root/testdata/sf0.001").limit(10)
    out = str(tmp_path / "csv_out")
    export_csv(ev.select("event_id", "event_type"), out)
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files
    body = open(os.path.join(out, files[0])).read()
    assert body.startswith("event_id,event_type")


def test_update_tags_remove(spark):
    sess = spark.createDataFrame(
        [("a", ["x", "y"]), ("b", ["x"]), ("c", None)],
        "session_id string, tags array<string>",
    )
    matched = spark.createDataFrame([("a",), ("c",)], "session_id string")
    out = {
        r.session_id: r.tags
        for r in update_tags(sess, matched, add=["z"], remove=["x"]).collect()
    }
    assert out["a"] == ["y", "z"]
    assert out["b"] == ["x"]          # unmatched untouched
    assert out["c"] == ["z"]          # null tags -> starts empty


def test_update_tags_partitioned_prunes(spark, tmp_path):
    """Only the day partitions containing matched sessions may be
    rewritten: untouched days keep their exact files (same inode),
    matched days get the tags, and the post-update table is complete."""
    import datetime as dt

    from moloch_spark.operators.sessions_api import update_tags_partitioned
    from moloch_spark.sources.session_store import write_sessions

    rows = []
    for d in range(4):
        for i in range(3):
            rows.append(
                (f"s{d}-{i}", dt.datetime(2024, 3, 1 + d, 12, i), ["old"] if i == 0 else [])
            )
    sess = spark.createDataFrame(
        rows, "session_id string, last_packet timestamp, tags array<string>"
    )
    path = str(tmp_path / "store")
    write_sessions(sess, path, mode="overwrite")

    def day_files(day):
        p = os.path.join(path, f"day=2024-03-0{day}")
        return {
            f: os.stat(os.path.join(p, f)).st_ino
            for f in os.listdir(p)
            if f.endswith(".parquet")
        }

    before = {d: day_files(d) for d in (1, 2, 3, 4)}
    matched = sess.filter("session_id IN ('s1-0', 's1-2')")  # day 2 only
    out = update_tags_partitioned(
        spark, path, matched, add=["flagged"], remove=["old"]
    )
    got = {r.session_id: sorted(r.tags) for r in out.collect()}
    assert len(got) == 12                             # nothing lost
    assert got["s1-0"] == ["flagged"]                 # old removed, flagged added
    assert got["s1-2"] == ["flagged"]
    assert got["s1-1"] == []                          # same day, unmatched row
    assert got["s0-0"] == ["old"]                     # other days untouched
    # physical check: days 1/3/4 keep the very same files; day 2 rewritten
    after = {d: day_files(d) for d in (1, 2, 3, 4)}
    assert after[1] == before[1]
    assert after[3] == before[3]
    assert after[4] == before[4]
    assert after[2] != before[2]


def test_export_ndjson(spark, tmp_path):
    import json

    from moloch_spark.operators.sessions_api import export_ndjson

    df = spark.createDataFrame(
        [(1, ["a", "b"], {"k": "v"}), (2, [], None)],
        "id int, tags array<string>, meta map<string,string>",
    )
    path = str(tmp_path / "nd")
    export_ndjson(df, path)
    rows = []
    import glob
    for f in glob.glob(path + "/part-*.json"):
        rows += [json.loads(l) for l in open(f) if l.strip()]
    by_id = {r["id"]: r for r in rows}
    assert by_id[1]["tags"] == ["a", "b"] and by_id[1]["meta"] == {"k": "v"}
    assert by_id[2].get("tags") == []
