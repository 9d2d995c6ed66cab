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
