"""Geo range-join enrichment + decode pipelines + differential
partitioning consistency (the single-vs-multies oracle, FIXTURES §5)."""

from __future__ import annotations

import base64
import gzip

import pytest
from pyspark.sql import functions as F

from moloch_spark.operators.decode import decode_pipeline
from moloch_spark.operators.geo import geo_dim_from_cidrs, geo_enrich, geo_enrich_bucketed

GEO_ROWS = [
    ("10.0.0.0/8", "XX", 64512, "PrivateNet", "rfc1918"),
    ("192.168.0.0/16", "YY", 64513, "HomeNet", "rfc1918"),
    ("203.0.113.0/24", "AU", 1221, "Telstra", "apnic"),
]


def ipn(s):
    a, b, c, d = (int(x) for x in s.split("."))
    return (a << 24) | (b << 16) | (c << 8) | d


@pytest.fixture(scope="module")
def facts(spark):
    rows = [
        (1, ipn("10.1.2.3")),
        (2, ipn("192.168.5.5")),
        (3, ipn("203.0.113.9")),
        (4, ipn("8.8.8.8")),  # no geo match
    ]
    return spark.createDataFrame(rows, "id int, ip_num long")


def test_geo_enrich_both_shapes_agree(spark, facts):
    geo = geo_dim_from_cidrs(spark, GEO_ROWS)
    plain = {
        r.id: r.country for r in geo_enrich(facts, geo, ip_num_col="ip_num").collect()
    }
    bucketed = {
        r.id: r.country
        for r in geo_enrich_bucketed(facts, geo, ip_num_col="ip_num").collect()
    }
    assert plain == bucketed == {1: "XX", 2: "YY", 3: "AU", 4: None}


def test_geo_bucketed_is_hash_join(spark, facts):
    geo = geo_dim_from_cidrs(spark, GEO_ROWS)
    plan = geo_enrich_bucketed(facts, geo, ip_num_col="ip_num")._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan  # not a nested loop


def test_decode_pipeline(spark):
    body = b"hello compressed world"
    payload = base64.b64encode(gzip.compress(b"HTTP/1.1 200 OK\r\nX: y\r\n\r\n" + body))
    df = spark.createDataFrame([(1, payload.decode())], "id int, payload string")
    out = decode_pipeline(df, "payload", ["base64", "gzip", "http_body"]).collect()[0]
    assert bytes(out.payload) == body
    # non-gzip passthrough
    df2 = spark.createDataFrame([(1, b"plain")], "id int, payload binary")
    out2 = decode_pipeline(df2, "payload", ["gzip"]).collect()[0]
    assert bytes(out2.payload) == b"plain"


def test_partitioning_differential(spark):
    """Single- vs multi-partition equality for representative queries —
    mirrors the reference's single-viewer vs multies oracle
    (tests/api-unique.t:12-29)."""
    from moloch_spark.registry import all_queries
    from tests.oracle_utils import canon_rows

    qs = all_queries()
    sf = "/root/testdata/sf0.001"
    for name in ["unique_event_type", "sessionize_events_30m", "tpch_q1_pricing_summary",
                 "dedup_minhash_signatures", "connections_nation_graph"]:
        df = qs[name](spark, sf)
        one = canon_rows(df.coalesce(1).toPandas())
        many = canon_rows(df.repartition(16).toPandas())
        assert one == many, f"{name} differs across partitionings"


def test_xor_brute_and_mime_stages(spark):
    import gzip

    from moloch_spark.operators.decode import decode_pipeline

    secret = b"attack at dawn"
    gz = gzip.compress(secret)
    xored = bytes(x ^ 0x5A for x in gz)
    mime = (
        b"MIME-Version: 1.0\r\n"
        b'Content-Type: multipart/mixed; boundary="B"\r\n\r\n'
        b"--B\r\nContent-Type: text/plain\r\n"
        b"Content-Transfer-Encoding: base64\r\n\r\n"
        + __import__("base64").b64encode(b"hello mime")
        + b"\r\n--B\r\nContent-Type: application/octet-stream\r\n\r\n"
        b"BINARYJUNK\r\n--B--\r\n"
    )
    df = spark.createDataFrame(
        [(1, xored), (2, b"not gzip at all"), (3, mime), (4, b"plain text")],
        "id int, payload binary",
    )
    xb = {r.id: bytes(r.payload) for r in
          decode_pipeline(df, "payload", ["xor_brute"]).collect()}
    assert xb[1] == secret            # key 0x5a recovered
    assert xb[2] == b"not gzip at all"  # passthrough

    mb = {r.id: bytes(r.payload) for r in
          decode_pipeline(df, "payload", ["mime_body"]).collect()}
    assert mb[3] == b"hello mime"     # text/* leaf decoded, binary part skipped
    assert mb[4] == b"plain text"     # non-MIME passthrough


def test_geo6_enrich_bucketed(spark):
    import ipaddress

    from moloch_spark.operators.geo import geo6_dim_from_cidrs, geo6_enrich_bucketed

    dim = geo6_dim_from_cidrs(
        spark,
        [
            ("2001:db8::/32", "XX", 64512, "DocNet", "ARIN"),
            ("2a00::/12", "EU", 64513, "RipeBlock", "RIPE"),  # spans 16 buckets
        ],
    )
    fact = spark.createDataFrame(
        [
            (1, "2001:db8::1"),
            (2, "2001:0db8:ffff:ffff:ffff:ffff:ffff:ffff"),
            (3, "2001:db9::1"),          # just outside /32
            (4, "2a0f:aaaa::5"),         # inside the /12
            (5, "2b00::1"),              # just past the /12
        ],
        "id int, ip string",
    )
    out = {r.id: r.country for r in geo6_enrich_bucketed(fact, dim, ip_col="ip").collect()}
    assert out == {1: "XX", 2: "XX", 3: None, 4: "EU", 5: None}
    # plan: equi hash join, not a nested loop
    plan = geo6_enrich_bucketed(fact, dim, ip_col="ip")._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "NestedLoop" not in plan


def test_carve_files(spark):
    from moloch_spark.operators.decode import carve_files, carve_payload

    png = b"\x89PNG\r\n\x1a\n" + b"\x00" * 20 + b"IEND" + b"\x00" * 4
    jpeg = b"\xff\xd8\xff\xe0" + b"\x00" * 10 + b"\xff\xd9"
    blob = b"junk" + png + b"mid" + jpeg + b"\x1f\x8b\x08tail"

    hits = carve_payload(blob)
    by_fmt = {f: (o, ln) for o, f, ln in hits}
    assert by_fmt["png"] == (4, len(png))
    assert by_fmt["jpeg"] == (4 + len(png) + 3, len(jpeg))
    assert by_fmt["gzip"][1] is None  # stream format: no end marker

    df = spark.createDataFrame([(1, bytearray(blob)), (2, None)], "id int, payload binary")
    rows = {r.id: r.carved for r in carve_files(df).collect()}
    assert {c.format for c in rows[1]} == {"png", "jpeg", "gzip"}
    assert rows[2] == []


def test_carve_gif87a(spark):
    from moloch_spark.operators.decode import carve_payload

    gif87 = b"GIF87a" + b"\x00" * 10 + b"\x00;"
    hits = carve_payload(b"xx" + gif87)
    assert any(f == "gif" and o == 2 for o, f, _ in hits)
