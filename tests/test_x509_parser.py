"""X.509 certsinfo parser golden tests — encoder-built DER certificates
with known field expectations plus hostile-input hardening
(ref capture/parsers/certs.c field extraction)."""

from __future__ import annotations

import datetime as dt
import hashlib

from moloch_spark.operators.x509_parser import (
    encode_certificate,
    parse_certificate,
    parse_x509,
)


def test_basic_fields():
    der = encode_certificate(
        serial=0xABCD01,
        issuer_cn="Acme Root CA",
        subject_cn="www.example.org",
        subject_org="Example Org",
        not_before="240315120000",
        not_after="270315115959",
    )
    out = parse_certificate(der)
    assert out["parse_error"] is None
    assert out["serial"] == "abcd01"
    assert out["issuer_cn"] == "Acme Root CA"
    assert out["subject_cn"] == "www.example.org"
    assert out["subject_org"] == "Example Org"
    assert out["not_before"] == dt.datetime(2024, 3, 15, 12, 0, 0)
    assert out["not_after"] == dt.datetime(2027, 3, 15, 11, 59, 59)
    assert out["digest_md5"] == hashlib.md5(der).hexdigest()


def test_san_dns_names():
    der = encode_certificate(
        subject_cn="example.net",
        alt_names=("example.net", "www.example.net", "api.example.net"),
    )
    out = parse_certificate(der)
    assert out["alt_names"] == ["example.net", "www.example.net", "api.example.net"]


def test_utctime_pre2000_window():
    # UTCTime YY >= 50 means 19YY (the sliding window rule)
    der = encode_certificate(not_before="980101000000", not_after="990101000000")
    out = parse_certificate(der)
    assert out["not_before"].year == 1998
    assert out["not_after"].year == 1999


def test_hostile_inputs_never_throw():
    assert parse_certificate(b"")["parse_error"] is not None
    assert parse_certificate(b"\x30\x02\x00")["parse_error"] is not None
    assert parse_certificate(b"\xff" * 50)["parse_error"] is not None
    good = encode_certificate()
    assert parse_certificate(good[: len(good) // 2])["parse_error"] is not None
    # long-form length overflow
    assert parse_certificate(b"\x30\x84\xff\xff\xff\xff")["parse_error"] is not None


def test_dataframe_path(spark):
    certs = [
        (1, bytearray(encode_certificate(subject_cn="a.test", alt_names=("a.test",)))),
        (2, bytearray(b"garbage")),
        (3, None),
    ]
    df = spark.createDataFrame(certs, "id int, cert_der binary")
    rows = {r.id: r for r in parse_x509(df).collect()}
    assert rows[1].cert_subject_cn == "a.test"
    assert rows[1].cert_alt_names == ["a.test"]
    assert rows[2].cert_parse_error is not None
    assert rows[3].cert_serial is None
