"""ISIS / TDS / RDP / DTLS field scraps (ref isis.c, tds.c, misc.c,
dtls.c)."""

from __future__ import annotations

from moloch_spark.operators.misc_parsers import (
    dtls_certificates,
    encode_dtls_certificate_msg,
    encode_rdp_request,
    encode_tds_login,
    isis_pdu_type,
    rdp_cookie_user,
    tds_login_user,
)
from moloch_spark.operators.x509_parser import encode_certificate


def test_isis_pdu_types():
    for code, label in ((15, "lan-l1-hello"), (17, "p2p-hello"), (27, "l2-psnp")):
        assert isis_pdu_type(b"\x00" * 21 + bytes([code])) == label
    assert isis_pdu_type(b"\x00" * 21 + bytes([99])) == "unk-99"
    assert isis_pdu_type(b"short") == "err-len-5"
    assert isis_pdu_type(None) == "err-len-0"


def test_tds_login_user():
    assert tds_login_user(encode_tds_login(user="SA_Admin")) == "sa_admin"
    assert tds_login_user(encode_tds_login(user="x")[:500]) is None  # <598
    assert tds_login_user(b"\x03" + encode_tds_login(user="x")[1:]) is None


def test_rdp_cookie_user():
    assert rdp_cookie_user(encode_rdp_request(user="Alice")) == "alice"
    assert rdp_cookie_user(b"\x03\x00\x00\x0b\x06\xe0" + b"\x00" * 30) is None
    assert rdp_cookie_user(b"") is None


def test_dtls_certificate_chain():
    ders = [
        encode_certificate(subject_cn="srv.example", serial=7),
        encode_certificate(subject_cn="Test CA", serial=8),
    ]
    certs = dtls_certificates(encode_dtls_certificate_msg(ders))
    assert [c["subject_cn"] for c in certs] == ["srv.example", "Test CA"]


def test_dtls_hostile():
    good = encode_dtls_certificate_msg(
        [encode_certificate(subject_cn="a", serial=1)]
    )
    for bad in (b"", b"\x17junk", good[:20], good[:-5] + b"\xff" * 5):
        assert isinstance(dtls_certificates(bad), list)
