from __future__ import annotations

import datetime as dt
import json
import os

from moloch_spark.operators.sessionize import sessionize_events
from moloch_spark.sources.es_sink import DirTransport, index_name, write_bulk
from moloch_spark.sources.tables import load_table


def test_index_rotation_names():
    ts = dt.datetime(2024, 1, 5, 13, 0, 0)
    assert index_name(ts, rotation="daily") == "sessions3-240105"
    assert index_name(ts, rotation="hourly") == "sessions3-240105h13"
    assert index_name(ts, rotation="monthly") == "sessions3-24m01"
    # weekly is weeks-since-Jan-1 (C tm_yday/7, capture/db.c:570-571),
    # NOT strftime %W: Jan 1 is w00 (where %W says w01), Jan 5 still
    # w00, Jan 8 w01, Dec 31 of a leap year w52
    assert index_name(ts, rotation="weekly") == "sessions3-24w00"
    assert (
        index_name(dt.datetime(2024, 1, 1), rotation="weekly")
        == "sessions3-24w00"
    )
    assert (
        index_name(dt.datetime(2024, 1, 8), rotation="weekly")
        == "sessions3-24w01"
    )
    assert (
        index_name(dt.datetime(2024, 12, 31), rotation="weekly")
        == "sessions3-24w52"
    )


def test_index_name_cols_matches_scalar(spark):
    """The JVM column form (index_name_cols) must agree with the Python
    scalar for every rotation across year/week/month boundaries,
    including the leap-year w52 tail and a NULL timestamp (NULL struct
    fields, like the scalar's None handling)."""
    from moloch_spark.sources.es_sink import index_name_cols

    stamps = [
        dt.datetime(2024, 1, 1, 0, 0, 0),
        dt.datetime(2024, 1, 5, 13, 0, 0),
        dt.datetime(2024, 1, 8, 9, 30, 0),
        dt.datetime(2024, 2, 29, 23, 59, 59),
        dt.datetime(2024, 12, 31, 12, 0, 0),
        dt.datetime(2023, 12, 31, 23, 0, 0),
        dt.datetime(1999, 7, 4, 4, 5, 6),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(stamps)] + [(len(stamps), None)],
        "i int, ts timestamp",
    )
    got = {
        r["i"]: r["idx"]
        for r in df.select(
            "i", index_name_cols("ts").alias("idx")
        ).collect()
    }
    for i, t in enumerate(stamps):
        for rot in ("hourly", "daily", "weekly", "monthly"):
            assert got[i][rot] == index_name(t, rotation=rot), (t, rot)
    assert tuple(got[len(stamps)]) == (None, None, None, None)


def test_write_bulk_ndjson(spark, tmp_path):
    sess = sessionize_events(
        load_table(spark, "events", "/root/testdata/sf0.001"), idle_timeout_s=1800
    )
    out = str(tmp_path / "bulk")
    write_bulk(sess, DirTransport(out), bulk_bytes=8 * 1024)
    files = [f for f in os.listdir(out) if f.endswith(".ndjson")]
    assert files
    total_docs = 0
    for f in files:
        lines = open(os.path.join(out, f)).read().strip().splitlines()
        assert len(lines) % 2 == 0  # action+doc pairs
        for i in range(0, len(lines), 2):
            action = json.loads(lines[i])
            doc = json.loads(lines[i + 1])
            assert action["index"]["_index"].startswith("sessions3-2401")
            assert action["index"]["_id"] == doc["session_id"]
            total_docs += 1
    assert total_docs == sess.count()
