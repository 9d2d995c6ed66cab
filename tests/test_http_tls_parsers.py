"""HTTP and TLS parser golden tests — hand-built messages, hand-computed
expectations (incl. JA3 recomputed independently in the test), matching
the reference's tests/*.test golden pattern for http.c / tls.c."""

from __future__ import annotations

import hashlib

from moloch_spark.operators.http_parser import parse_http, parse_http_message
from moloch_spark.operators.tls_parser import (
    encode_client_hello,
    parse_client_hello,
    parse_tls,
)

# ---------------------------------------------------------------------------
# HTTP
# ---------------------------------------------------------------------------

REQ = (
    b"GET /index.html?q=1 HTTP/1.1\r\n"
    b"Host: example.com\r\n"
    b"User-Agent: test-agent/1.0\r\n"
    b"Accept: */*\r\n"
    b"\r\n"
)

RESP = (
    b"HTTP/1.1 404 Not Found\r\n"
    b"Content-Type: text/html; charset=utf-8\r\n"
    b"Content-Length: 9\r\n"
    b"\r\n"
    b"not found"
)


def test_http_request_fields():
    out = parse_http_message(REQ)
    assert out["parse_error"] is None
    assert out["kind"] == "request"
    assert (out["method"], out["uri"]) == ("GET", "/index.html?q=1")
    assert out["version"] == "HTTP/1.1"
    assert out["host"] == "example.com"
    assert out["user_agent"] == "test-agent/1.0"
    assert out["header_cnt"] == 3
    assert out["body_len"] == 0


def test_http_response_fields():
    out = parse_http_message(RESP)
    assert out["kind"] == "response"
    assert out["status_code"] == 404
    assert out["content_type"] == "text/html; charset=utf-8"
    assert out["content_length"] == 9
    assert out["body_len"] == 9


def test_http_hostile_inputs():
    assert parse_http_message(b"")["parse_error"] is not None
    assert parse_http_message(b"NOTAMETHOD / x\r\n\r\n")["parse_error"] is not None
    assert parse_http_message(b"GET /\r\n\r\n")["parse_error"] is not None  # no version
    assert parse_http_message(b"\xff\xfe binary junk")["parse_error"] is not None
    # bare-LF separators still parse (lenient like http_parser)
    out = parse_http_message(b"GET / HTTP/1.0\nHost: a\n\nbody")
    assert out["host"] == "a" and out["body_len"] == 4


def test_http_dataframe(spark):
    df = spark.createDataFrame(
        [(1, bytearray(REQ)), (2, bytearray(RESP)), (3, None)],
        "id int, payload binary",
    )
    rows = {r.id: r for r in parse_http(df).collect()}
    assert rows[1].http_method == "GET" and rows[1].http_host == "example.com"
    assert rows[2].http_status_code == 404
    assert rows[3].http_parse_error is not None


# ---------------------------------------------------------------------------
# TLS / JA3
# ---------------------------------------------------------------------------


def test_client_hello_roundtrip_and_ja3():
    hello = encode_client_hello(
        version=0x0303,
        ciphers=[0x1301, 0x1302, 0x002F],
        sni="spark.apache.org",
        curves=[29, 23],
        point_formats=[0],
        alpn=["h2", "http/1.1"],
    )
    out = parse_client_hello(hello)
    assert out["parse_error"] is None
    assert out["client_version"] == "TLSv1.2"
    assert out["sni"] == "spark.apache.org"
    assert out["ciphers"] == [0x1301, 0x1302, 0x002F]
    assert out["alpn"] == ["h2", "http/1.1"]
    # JA3 recomputed independently: version,ciphers,extensions,curves,formats
    expect = "771,4865-4866-47,0-10-11-16,29-23,0"
    assert out["ja3_string"] == expect
    assert out["ja3"] == hashlib.md5(expect.encode()).hexdigest()


def test_grease_values_excluded_from_ja3():
    hello = encode_client_hello(
        ciphers=[0x0A0A, 0x1301], curves=[0x1A1A, 29], sni=None, alpn=[]
    )
    out = parse_client_hello(hello)
    assert 0x0A0A not in out["ciphers"]
    assert out["ja3_string"].split(",")[1] == "4865"
    assert out["ja3_string"].split(",")[3] == "29"


def test_tls_hostile_inputs():
    assert parse_client_hello(b"")["parse_error"] is not None
    assert parse_client_hello(b"\x17\x03\x03\x00\x05hello")["parse_error"] is not None
    # handshake record but ServerHello (type 2)
    bad = b"\x16\x03\x01\x00\x04\x02\x00\x00\x00"
    assert parse_client_hello(bad)["parse_error"] is not None
    truncated = encode_client_hello(sni="x.y")[:20]
    assert parse_client_hello(truncated)["parse_error"] is not None


def test_tls_dataframe(spark):
    hello = encode_client_hello(sni="a.example")
    df = spark.createDataFrame([(1, bytearray(hello))], "id int, payload binary")
    row = parse_tls(df).first()
    assert row.tls_sni == "a.example"
    assert row.tls_ja3 is not None and len(row.tls_ja3) == 32


# ---------------------------------------------------------------------------
# SSH / HASSH
# ---------------------------------------------------------------------------


def test_ssh_banner_and_hassh():
    from moloch_spark.operators.ssh_parser import encode_kexinit, parse_ssh

    buf = encode_kexinit(
        banner="SSH-2.0-OpenSSH_9.6p1 Ubuntu-3",
        kex=("curve25519-sha256",),
        enc=("aes128-ctr",),
        mac=("hmac-sha2-256",),
        comp=("none",),
    )
    out = parse_ssh(buf)
    assert out["parse_error"] is None
    assert out["version"] == "2.0"
    assert out["software"] == "OpenSSH_9.6p1"
    assert out["kex_algos"] == ["curve25519-sha256"]
    expect = "curve25519-sha256;aes128-ctr;hmac-sha2-256;none"
    assert out["hassh_string"] == expect
    assert out["hassh"] == hashlib.md5(expect.encode()).hexdigest()


def test_ssh_banner_only_and_hostile():
    from moloch_spark.operators.ssh_parser import parse_ssh

    out = parse_ssh(b"SSH-2.0-dropbear_2022.83\r\n")
    assert out["software"] == "dropbear_2022.83" and out["hassh"] is None
    assert parse_ssh(b"HTTP/1.1 200 OK\r\n")["parse_error"] is not None
    assert parse_ssh(b"")["parse_error"] is not None
    assert parse_ssh(b"SSH-2.0-x\r\n\x00\x00\x00\x08\x04\x14trunc")["parse_error"] is not None


def test_ssh_dataframe(spark):
    from moloch_spark.operators.ssh_parser import encode_kexinit, parse_ssh_df

    df = spark.createDataFrame(
        [(1, bytearray(encode_kexinit())), (2, None)], "id int, payload binary"
    )
    rows = {r.id: r for r in parse_ssh_df(df).collect()}
    assert rows[1].ssh_version == "2.0" and len(rows[1].ssh_hassh) == 32
    assert rows[2].ssh_banner is None


def test_http_keeps_fields_parsed_before_error():
    out = parse_http_message(
        b"GET / HTTP/1.1\r\nHost: e.com\r\nContent-Length: abc\r\n\r\n"
    )
    assert out["parse_error"] is not None
    assert out["method"] == "GET" and out["host"] == "e.com"


# ---------------------------------------------------------------------------
# SMTP
# ---------------------------------------------------------------------------


def test_smtp_envelope_and_headers():
    from moloch_spark.operators.smtp_parser import encode_smtp, parse_smtp

    buf = encode_smtp(
        helo="mail.client.net",
        mail_from="alice@example.com",
        rcpt=("bob@example.org", "carol@example.net"),
        subject="quarterly report",
    )
    out = parse_smtp(buf)
    assert out["parse_error"] is None
    assert out["helo"] == "mail.client.net"
    assert out["mail_from"] == "alice@example.com"
    assert out["rcpt_to"] == ["bob@example.org", "carol@example.net"]
    assert out["subject"] == "quarterly report"
    assert out["has_data"] is True


def test_smtp_case_insensitive_and_no_angle_brackets():
    from moloch_spark.operators.smtp_parser import parse_smtp

    out = parse_smtp(b"helo x\r\nmail from: a@b.c\r\nrcpt to: d@e.f\r\n")
    assert out["helo"] == "x"
    assert out["mail_from"] == "a@b.c"
    assert out["rcpt_to"] == ["d@e.f"]
    assert out["has_data"] is False and out["subject"] is None


def test_smtp_hostile():
    from moloch_spark.operators.smtp_parser import parse_smtp

    assert parse_smtp(b"")["parse_error"] is not None
    assert parse_smtp(b"GET / HTTP/1.1\r\n")["parse_error"] is not None
    assert parse_smtp(b"\xff\xfe\x00junk")["parse_error"] is not None


def test_smtp_dataframe(spark):
    from moloch_spark.operators.smtp_parser import encode_smtp, parse_smtp_df

    df = spark.createDataFrame(
        [(1, bytearray(encode_smtp())), (2, None)], "id int, payload binary"
    )
    rows = {r.id: r for r in parse_smtp_df(df).collect()}
    assert rows[1].smtp_mail_from == "a@example.com"
    assert rows[2].smtp_helo is None
