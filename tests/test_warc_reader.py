"""WARC reader: round-trips, gzip members, HTTP envelope split,
hostile inputs."""

from __future__ import annotations

import os
import tempfile

from hypothesis import given, settings
from hypothesis import strategies as st

from moloch_spark.sources.warc_reader import (
    encode_http_response,
    encode_warc_file,
    encode_warc_record,
    parse_warc_bytes,
    read_warc,
)


def _records():
    return [
        encode_warc_record(
            warc_type="warcinfo",
            content=b"software: test\r\n",
            content_type="application/warc-fields",
        ),
        encode_warc_record(
            warc_type="response",
            url="http://example.com/a",
            record_id="<urn:uuid:1>",
            content=encode_http_response(b"<html>hello</html>"),
        ),
        encode_warc_record(
            warc_type="response",
            url="http://example.com/b",
            record_id="<urn:uuid:2>",
            content=encode_http_response(
                b'{"x": 1}', status=404, content_type="application/json"
            ),
        ),
        encode_warc_record(
            warc_type="request",
            url="http://example.com/a",
            content=b"GET /a HTTP/1.1\r\n\r\n",
            content_type="application/http; msgtype=request",
        ),
    ]


def test_parse_roundtrip_plain_and_gzip():
    for gz in (False, True):
        buf = encode_warc_file(_records(), gzip_members=gz)
        rows = list(parse_warc_bytes("f", buf))
        assert [r[2] for r in rows] == ["warcinfo", "response", "response", "request"]
        assert rows[1][3] == "http://example.com/a"
        assert rows[1][7] == 200 and rows[1][8] == "text/html"
        assert rows[1][9] == b"<html>hello</html>"
        assert rows[2][7] == 404 and rows[2][8] == "application/json"
        assert rows[2][9] == b'{"x": 1}'
        # request records keep their raw content, no HTTP split
        assert rows[3][7] is None and rows[3][9].startswith(b"GET /a")


def test_truncated_tail_and_lost_sync():
    buf = encode_warc_file(_records())
    # truncated mid-content: final record dropped, earlier kept
    cut = buf[: len(buf) - 30]
    rows = list(parse_warc_bytes("f", cut))
    assert len(rows) == 3
    # garbage between records: walk stops, no throw
    garbage = _records()[0] + b"NOT A WARC" + _records()[1]
    assert len(list(parse_warc_bytes("f", garbage))) == 1
    # absurd content-length: stops cleanly
    bad = encode_warc_record(warc_type="response", content=b"x").replace(
        b"Content-Length: 1", b"Content-Length: 999999999999"
    )
    assert list(parse_warc_bytes("f", bad)) == []


def test_read_warc_spark(spark):
    d = tempfile.mkdtemp(prefix="warc_")
    for i, gz in enumerate((False, True)):
        name = os.path.join(d, f"seg{i}.warc" + (".gz" if gz else ""))
        with open(name, "wb") as f:
            f.write(encode_warc_file(_records(), gzip_members=gz))
    df = read_warc(spark, d)
    rows = df.collect()
    assert len(rows) == 8  # 4 records x 2 files
    resp = [r for r in rows if r.warc_type == "response" and r.http_status == 200]
    assert len(resp) == 2
    assert all(r.body == b"<html>hello</html>" for r in resp)


@settings(max_examples=25, deadline=None)
@given(data=st.binary(max_size=400))
def test_parser_never_throws_on_garbage(data):
    list(parse_warc_bytes("f", data))
    list(parse_warc_bytes("f", b"WARC/1.0\r\n" + data))
    list(parse_warc_bytes("f", b"\x1f\x8b" + data))
