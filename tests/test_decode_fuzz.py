"""Hypothesis fuzz for the decode pipelines: arbitrary UTF-8 content
must round-trip bit-exactly through every encode→decode stage pair
(gzip, xor-brute, MIME multipart), and the xor-brute search must find
the planted key for EVERY key value — including 0 (already-gzip) and
keys that turn other payload bytes into accidental gzip magic."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from moloch_spark.operators.decode import decode_pipeline

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
        max_size=200,
    ),
    min_size=1,
    max_size=8,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


@settings(max_examples=10, deadline=None)
@given(texts=TEXTS)
def test_gzip_roundtrip_exact(spark, texts):
    from moloch_spark.operators.decode import encode_gzip_udf

    df = _df(spark, texts).select(
        "doc_id", "text", encode_gzip_udf(F.col("text")).alias("payload")
    )
    out = decode_pipeline(df, "payload", ["gzip"]).collect()
    for r in out:
        assert bytes(r.payload) == r.text.encode("utf-8")


@settings(max_examples=10, deadline=None)
@given(texts=TEXTS, key_base=st.integers(min_value=0, max_value=255))
def test_xor_brute_finds_every_key(spark, texts, key_base):
    from moloch_spark.operators.decode import encode_xor_gzip_udf

    df = _df(spark, texts).select(
        "doc_id",
        "text",
        encode_xor_gzip_udf(
            F.col("text"),
            ((F.col("doc_id") + key_base) % 256).cast("long"),
        ).alias("payload"),
    )
    out = decode_pipeline(df, "payload", ["xor_brute"]).collect()
    for r in out:
        assert bytes(r.payload) == r.text.encode("utf-8")


@settings(max_examples=10, deadline=None)
@given(texts=TEXTS)
def test_mime_multipart_roundtrip(spark, texts):
    """Two base64 text/plain leaves -> the tree walk's newline-joined
    concatenation — the exact synthesis the decode_pipeline_gzip_mime
    gate uses, here over arbitrary UTF-8 (boundary collisions are
    impossible: base64 bodies never contain '--gate42')."""
    crlf = "\r\n"
    half = F.floor(F.length("text") / 2).cast("int")
    b64 = lambda c: F.base64(F.encode(c, "UTF-8"))  # noqa: E731
    mime = F.concat(
        F.lit(
            "MIME-Version: 1.0" + crlf
            + 'Content-Type: multipart/mixed; boundary="gate42"' + crlf
            + crlf + "--gate42" + crlf
            + 'Content-Type: text/plain; charset="utf-8"' + crlf
            + "Content-Transfer-Encoding: base64" + crlf + crlf
        ),
        b64(F.col("text").substr(F.lit(1), half)),
        F.lit(
            crlf + "--gate42" + crlf
            + 'Content-Type: text/plain; charset="utf-8"' + crlf
            + "Content-Transfer-Encoding: base64" + crlf + crlf
        ),
        b64(F.col("text").substr(half + 1, F.length("text"))),
        F.lit(crlf + "--gate42--" + crlf),
    )
    df = _df(spark, texts).select("doc_id", "text", mime.alias("payload"))
    out = decode_pipeline(df, "payload", ["mime_body"]).collect()
    for r in out:
        t = r.text
        h = len(t) // 2
        expected = t[:h].encode("utf-8") + b"\n" + t[h:].encode("utf-8")
        assert bytes(r.payload) == expected
