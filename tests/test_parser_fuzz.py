"""Property fuzz: every byte-level parser must be total — arbitrary
bytes either parse or set parse_error, NEVER raise. This is the
hostile-network-input contract the reference's C parsers enforce with
length checks (a crash there is a capture outage; a throw here kills a
100 TB scan)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from moloch_spark.operators.dns_parser import parse_dns_message
from moloch_spark.operators.http_parser import parse_http_message
from moloch_spark.operators.multimodal import decode_image_header
from moloch_spark.operators.ssh_parser import parse_ssh
from moloch_spark.operators.tls_parser import parse_client_hello
from moloch_spark.operators.x509_parser import parse_certificate
from moloch_spark.operators.decode import carve_payload

BYTES = st.binary(min_size=0, max_size=400)

# prefix each parser's magic so fuzzing reaches deep paths, not just the
# front-door rejection
DNS_PREFIXED = st.tuples(st.binary(min_size=12, max_size=12), BYTES).map(
    lambda t: t[0] + t[1]
)
TLS_PREFIXED = BYTES.map(lambda b: b"\x16\x03\x01" + b)
SSH_PREFIXED = BYTES.map(lambda b: b"SSH-2.0-x\r\n" + b)
DER_PREFIXED = BYTES.map(lambda b: b"\x30\x82" + b)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, DNS_PREFIXED))
def test_dns_total(buf):
    out = parse_dns_message(buf)
    assert isinstance(out, dict)


@settings(max_examples=300, deadline=None)
@given(BYTES)
def test_http_total(buf):
    assert isinstance(parse_http_message(buf), dict)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, TLS_PREFIXED))
def test_tls_total(buf):
    assert isinstance(parse_client_hello(buf), dict)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, SSH_PREFIXED))
def test_ssh_total(buf):
    assert isinstance(parse_ssh(buf), dict)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, DER_PREFIXED))
def test_x509_total(buf):
    assert isinstance(parse_certificate(buf), dict)


@settings(max_examples=200, deadline=None)
@given(BYTES)
def test_image_header_and_carve_total(buf):
    fmt, w, h = decode_image_header(buf)
    assert fmt is None or isinstance(fmt, str)
    assert isinstance(carve_payload(buf), list)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, BYTES.map(lambda b: b"EHLO x\r\n" + b)))
def test_smtp_total(buf):
    from moloch_spark.operators.smtp_parser import parse_smtp

    assert isinstance(parse_smtp(buf), dict)


from moloch_spark.operators.dhcp_parser import parse_dhcp
from moloch_spark.operators.irc_parser import parse_irc
from moloch_spark.operators.radius_parser import parse_radius
from moloch_spark.operators.socks_parser import parse_socks

DHCP_PREFIXED = st.binary(min_size=0, max_size=200).map(
    lambda b: b"\x01\x01\x06\x00" + b"\x00" * 232 + b"\x63\x82\x53\x63" + b
)
SOCKS5_PREFIXED = st.binary(max_size=200).map(lambda b: b"\x05" + b)
SOCKS4_PREFIXED = st.binary(max_size=200).map(lambda b: b"\x04\x01" + b)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, DHCP_PREFIXED))
def test_dhcp_total(buf):
    assert isinstance(parse_dhcp(buf), dict)


@settings(max_examples=300, deadline=None)
@given(BYTES)
def test_irc_total(buf):
    assert isinstance(parse_irc(buf), dict)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, SOCKS4_PREFIXED, SOCKS5_PREFIXED))
def test_socks_total(buf):
    assert isinstance(parse_socks(buf), dict)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_radius_total(buf):
    # exercise the AVP walk: fix up the length field to match
    fixed = buf[:2] + len(buf).to_bytes(2, "big") + buf[4:] if len(buf) >= 20 else buf
    assert isinstance(parse_radius(fixed), dict)
    assert isinstance(parse_radius(buf), dict)


from moloch_spark.operators.ldap_parser import parse_ldap
from moloch_spark.operators.krb5_parser import parse_krb5

LDAP_PREFIXED = st.binary(max_size=200).map(lambda b: b"\x30\x81" + b)
KRB_PREFIXED = st.binary(max_size=200).map(lambda b: b"\x6a\x81" + b)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, LDAP_PREFIXED))
def test_ldap_total(buf):
    assert isinstance(parse_ldap(buf), dict)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, KRB_PREFIXED))
def test_krb5_total(buf):
    assert isinstance(parse_krb5(buf), dict)


from moloch_spark.operators.db_parsers import parse_mysql, parse_postgresql

MYSQL_PREFIXED = st.binary(max_size=200).map(
    lambda b: b"\x40\x00\x00\x00\x0a" + b
)
PG_PREFIXED = st.binary(max_size=200).map(
    lambda b: b"\x00\x00\x00" + bytes([max(16, len(b) + 8) & 0xFF]) + b"\x00\x03\x00\x00" + b
)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, MYSQL_PREFIXED), st.one_of(st.none(), BYTES))
def test_mysql_total(server, client):
    assert isinstance(parse_mysql(server, client), dict)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, PG_PREFIXED))
def test_postgresql_total(buf):
    assert isinstance(parse_postgresql(buf), dict)


from moloch_spark.operators.tns_parser import parse_tns_connect
from moloch_spark.operators.bgp_parser import parse_bgp

BGP_PREFIXED = st.binary(max_size=200).map(lambda b: b"\xff" * 16 + b)


@settings(max_examples=300, deadline=None)
@given(st.binary(max_size=400))
def test_tns_total(buf):
    # also exercise the deep path: fix the length field to match
    fixed = bytes([len(buf) >> 8, len(buf) & 0xFF]) + buf[2:] if len(buf) > 27 else buf
    assert isinstance(parse_tns_connect(fixed), dict)
    assert isinstance(parse_tns_connect(buf), dict)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, BGP_PREFIXED))
def test_bgp_total(buf):
    assert isinstance(parse_bgp(buf), dict)


from moloch_spark.operators.http2_parser import parse_http2, PREFACE

H2_PREFIXED = st.binary(max_size=300).map(lambda b: PREFACE + b)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, H2_PREFIXED))
def test_http2_total(buf):
    assert isinstance(parse_http2(buf), dict)


from moloch_spark.operators.quic_parser import parse_quic

QUIC_PREFIXED = st.binary(max_size=300).map(
    lambda b: b"\xc3Q046\x08" + b"\xaa" * 8 + b"CHLO" + b
)


@settings(max_examples=300, deadline=None)
@given(st.one_of(BYTES, QUIC_PREFIXED))
def test_quic_total(buf):
    assert isinstance(parse_quic(buf), dict)


SMB_PREFIXED = st.binary(max_size=200).map(
    lambda b: b"\x00" + len(b).to_bytes(3, "big") + b
)
SMB1_PREFIXED = st.binary(max_size=200).map(
    lambda b: b"\x00" + (len(b) + 4).to_bytes(3, "big") + b"\xffSMB" + b
)
SMB2_PREFIXED = st.binary(max_size=200).map(
    lambda b: b"\x00" + (len(b) + 4).to_bytes(3, "big") + b"\xfeSMB" + b
)


@given(st.one_of(BYTES, SMB_PREFIXED, SMB1_PREFIXED, SMB2_PREFIXED))
def test_smb_total(buf):
    from moloch_spark.operators.smb_parser import parse_smb

    assert isinstance(parse_smb(buf), dict)


JPEG_PREFIXED = st.binary(max_size=300).map(lambda b: b"\xff\xd8" + b)
GIF_PREFIXED = st.binary(max_size=300).map(lambda b: b"GIF89a" + b)


@given(st.one_of(BYTES, JPEG_PREFIXED, GIF_PREFIXED))
def test_pixel_decode_total(buf):
    from moloch_spark.operators.multimodal import _decode_pixels

    out = _decode_pixels(buf)  # None or (fmt, array); never raises
    assert out is None or len(out) == 2


DTLS_PREFIXED = st.binary(max_size=300).map(lambda b: b"\x16\xfe\xfd" + b)


@given(st.one_of(BYTES, DTLS_PREFIXED))
def test_misc_field_parsers_total(buf):
    from moloch_spark.operators.misc_parsers import (
        dtls_certificates,
        isis_pdu_type,
        rdp_cookie_user,
        tds_login_user,
    )

    assert isinstance(isis_pdu_type(buf), str)
    tds_login_user(buf)
    rdp_cookie_user(buf)
    assert isinstance(dtls_certificates(buf), list)


QUIC_V1_PREFIXED = st.binary(min_size=0, max_size=1400).map(
    lambda b: b"\xc3\x00\x00\x00\x01" + b
)


@settings(max_examples=200, deadline=None)
@given(st.one_of(st.binary(min_size=0, max_size=1400), QUIC_V1_PREFIXED))
def test_quic_v1_total(buf):
    """Arbitrary bytes through header-protection removal + GCM open +
    frame walk either parse or set parse_error — and can never produce
    ClientHello fields, because a forged packet cannot pass the tag."""
    from moloch_spark.operators.quic_parser import parse_quic_v1

    out = parse_quic_v1(buf)
    assert isinstance(out, dict)
    if out["parse_error"] is not None:
        assert out["sni"] is None and out["ja3"] is None
