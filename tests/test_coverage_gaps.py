"""Tests for the coverage-closing operators: fileand, fragment
reassembly, OUI enrichment, null reader, stubs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from moloch_spark.catalog import Field, FieldCatalog
from moloch_spark.expr import CompileContext, compile_expression
from moloch_spark.operators.enrich import oui_enrich, reverse_dns_stub
from moloch_spark.operators.packets import reassemble_fragments
from moloch_spark.sources.tables import null_reader


def test_fileand(spark):
    cat = FieldCatalog()
    cat.define(Field("file", "", "fileand"))
    ctx = CompileContext(
        catalog=cat,
        files={"cap1.pcap": [("node1", 7), ("node2", 9)]},
    )
    df = spark.createDataFrame(
        [(1, "node1", 7), (2, "node1", 8), (3, "node2", 9)],
        "id int, node string, file_id int",
    )
    pred = compile_expression('file == "cap1.pcap"', ctx)
    assert sorted(r.id for r in df.filter(pred).collect()) == [1, 3]
    pred_ne = compile_expression('file != "cap1.pcap"', ctx)
    assert sorted(r.id for r in df.filter(pred_ne).collect()) == [2]
    with pytest.raises(Exception, match="File not found"):
        compile_expression("file == nope.pcap", ctx)


def test_fragment_reassembly(spark):
    rows = [
        # complete datagram: 0..3, 3..6, final
        ("a", "b", 1, 0, "abc", True),
        ("a", "b", 1, 3, "def", True),
        ("a", "b", 1, 6, "gh", False),
        # hole at 5..10
        ("a", "b", 2, 0, "12345", True),
        ("a", "b", 2, 10, "xy", False),
        # missing last fragment (MF still set)
        ("a", "b", 3, 0, "zz", True),
    ]
    df = spark.createDataFrame(
        rows,
        "src_ip string, dst_ip string, frag_id int, frag_offset long, payload string, more_fragments boolean",
    )
    out = {r.frag_id: r for r in reassemble_fragments(df).collect()}
    assert out[1].payload == "abcdefgh" and out[1].complete
    assert not out[2].complete
    assert not out[3].complete
    assert out[1].fragments == 3


def test_oui_enrich(spark):
    fact = spark.createDataFrame(
        [(1, "AA-BB-CC-11-22-33"), (2, "aa:bb:cc:99:88:77"), (3, "00:11:22:33:44:55")],
        "id int, mac string",
    )
    oui = spark.createDataFrame(
        [("aa:bb:cc", "AcmeCorp")], "mac_prefix string, manufacturer string"
    )
    out = {r.id: r.manufacturer for r in oui_enrich(fact, oui, mac_col="mac").collect()}
    assert out == {1: "AcmeCorp", 2: "AcmeCorp", 3: None}


def test_null_reader(spark):
    stream = null_reader(spark)
    assert stream.isStreaming
    assert {f.name for f in stream.schema.fields} == {"timestamp", "value"}


def test_stubs_raise(spark):
    df = spark.range(1)
    with pytest.raises(NotImplementedError):
        reverse_dns_stub(df, ip_col="x")


def test_cardinality_hll_vs_exact(spark):
    from moloch_spark.operators.endpoints import field_cardinality

    df = spark.createDataFrame(
        [(i % 1357, f"v{i % 89}") for i in range(20000)], "a long, b string"
    )
    exact = field_cardinality(df, ["a", "b"]).first()
    assert (exact.a_card, exact.b_card) == (1357, 89)
    # HLL++ (the reference's ES cardinality agg algorithm): within rsd-ish
    approx = field_cardinality(df, ["a", "b"], approx=True, rsd=0.02).first()
    assert abs(approx.a_card - 1357) / 1357 < 0.1
    assert abs(approx.b_card - 89) / 89 < 0.1


def test_percentiles_sketch(spark):
    from moloch_spark.operators.endpoints import percentiles

    df = spark.range(100000).select((F.col("id") % 10000).alias("v"))
    r = percentiles(df, "v", (0.5, 0.9, 0.99)).first()
    assert abs(r.p50 - 5000) <= 50
    assert abs(r.p90 - 9000) <= 50
    assert abs(r.p99 - 9900) <= 50


def test_salted_collect_set(spark):
    from moloch_spark.operators.skew import salted_collect_set

    # one hot key with many duplicate values + a normal key
    rows = [("hot", f"v{i % 37}") for i in range(5000)] + [("cold", "x")]
    df = spark.createDataFrame(rows, "k string, val string")
    out = {r.k: list(r.values) for r in
           salted_collect_set(df, ["k"], "val").collect()}
    assert out["hot"] == sorted({f"v{i}" for i in range(37)})
    assert out["cold"] == ["x"]

    # equals the single-phase result exactly (sorted distinct)
    plain = {
        r.k: sorted(r.s)
        for r in df.groupBy("k").agg(F.collect_set("val").alias("s")).collect()
    }
    assert out == plain


def test_connected_components_shapes(spark):
    from moloch_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [
            ("a", "b"), ("b", "c"), ("c", "a"),   # cycle
            ("d", "e"),                            # pair
            ("f", "g"), ("g", "h"), ("h", "i"),   # chain (diameter 3)
        ],
        "src string, dst string",
    )
    out = {r.node: r.component for r in connected_components(edges).collect()}
    assert {out[x] for x in "abc"} == {"a"}
    assert {out[x] for x in "de"} == {"d"}
    assert {out[x] for x in "fghi"} == {"f"}
    assert len(out) == 9
    # driver_threshold=0 forces the distributed min-label loop — it must
    # reach the identical fixpoint (the 100 TB path stays exercised even
    # though small graphs now take the union-find fast path)
    dist = {
        r.node: r.component
        for r in connected_components(edges, driver_threshold=0).collect()
    }
    assert dist == out


def test_as_of_join_semantics(spark):
    from moloch_spark.operators.asof import as_of_join

    fact = spark.createDataFrame(
        [(1, "k", 100), (2, "k", 205), (3, "k", 50), (4, "other", 100)],
        "id int, k string, ts long",
    )
    feed = spark.createDataFrame(
        [("k", 100, "at-100"), ("k", 200, "at-200"), ("k", 90, "at-90")],
        "k string, ts long, v string",
    )
    out = {r.id: (r.v, r.asof_ts) for r in
           as_of_join(fact, feed, on=["k"], ts_col="ts", values=["v"]).collect()}
    assert out[1] == ("at-100", 100)   # equal-ts feed row wins (>= tie rule)
    assert out[2] == ("at-200", 200)   # latest prior, not just any prior
    assert out[3] == (None, None)      # no feed at or before -> null
    assert out[4] == (None, None)      # key never in feed


def test_reverse_dns_injected_resolver(spark):
    from moloch_spark.operators.enrich import reverse_dns

    df = spark.createDataFrame(
        [(1, "10.0.0.1"), (2, "10.0.0.2"), (3, None), (4, "10.0.0.1")],
        "id int, ip string",
    )
    table = {"10.0.0.1": "host-a.example", "10.0.0.2": "host-b.example"}
    out = {r.id: r.rdns for r in reverse_dns(df, ip_col="ip", resolver=table).collect()}
    assert out == {1: "host-a.example", 2: "host-b.example", 3: None, 4: "host-a.example"}


def test_unique_explodes_array_valued_column_expressions(spark):
    """unique() must detect array columns even when passed a Column
    EXPRESSION (not a named column) — a dtypes-by-name lookup silently
    skipped explode detection for computed fields."""
    from pyspark.sql import functions as F

    from moloch_spark.operators.endpoints import unique

    df = spark.createDataFrame(
        [(["a", "b"], 1), (["b"], 2), ([], 3)],
        "tags array<string>, n int",
    )
    # computed array expression: concat of the array with itself filtered
    expr = F.filter(F.col("tags"), lambda x: x != "zz")
    # ES terms-agg contract (r10): missing values are NOT a term — the
    # row with an empty array contributes no bucket; exists/missing
    # facets count it instead (endpoints.py unique()).
    got = {r.value: r["count"] for r in unique(df, expr).collect()}
    assert got == {"a": 1, "b": 2}
    # named-column path unchanged
    got2 = {r.value: r["count"] for r in unique(df, "tags").collect()}
    assert got2 == {"a": 1, "b": 2}
