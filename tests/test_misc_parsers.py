"""Golden tests for the DHCP / IRC / SOCKS / RADIUS exemplar parsers
(ref capture/parsers/{dhcp,irc,socks,radius}.c) — hand-computed
expectations over hand-built wire bytes, plus the reference's
classification rejections."""

from __future__ import annotations

import ipaddress

from moloch_spark.operators.dhcp_parser import encode_dhcp, parse_dhcp
from moloch_spark.operators.irc_parser import encode_irc, parse_irc
from moloch_spark.operators.radius_parser import encode_radius, parse_radius
from moloch_spark.operators.socks_parser import (
    encode_socks4,
    encode_socks5,
    parse_socks,
)

# ---------------------------------------------------------------------------
# DHCP
# ---------------------------------------------------------------------------


def test_dhcp_basic_fields():
    pkt = encode_dhcp(msg_type=3, host="My-Laptop", xid=0xDEADBEEF,
                      mac=b"\x00\x11\x22\x33\x44\x55")
    out = parse_dhcp(pkt)
    assert out["msg_type"] == "REQUEST"
    assert out["host"] == "my-laptop"  # lowercased like the reference
    assert out["mac"] == "00:11:22:33:44:55"
    assert out["oui"] == "00:11:22"
    assert out["xid"] == "deadbeef"
    assert out["parse_error"] is None


def test_dhcp_client_identifier_overrides_chaddr():
    pkt = bytearray(encode_dhcp(mac=b"\xaa" * 6))
    # strip End option, append option 61 (hwtype 1 + MAC), re-end
    end = bytes(pkt).index(b"\xff", 236)
    pkt = bytes(pkt[:end]) + bytes([61, 7, 1]) + b"\x01\x02\x03\x04\x05\x06" + b"\xff"
    pkt += b"\x00" * max(0, 300 - len(pkt))
    assert parse_dhcp(pkt)["mac"] == "01:02:03:04:05:06"


def test_dhcp_fqdn_option_81():
    pkt = bytearray(encode_dhcp(host="ignored"))
    end = bytes(pkt).index(b"\xff", 236)
    fqdn = b"\x00\x00\x00" + b"Host.Example.COM"
    pkt = bytes(pkt[:end]) + bytes([81, len(fqdn)]) + fqdn + b"\xff"
    pkt += b"\x00" * max(0, 300 - len(pkt))
    assert parse_dhcp(pkt)["host"] == "host.example.com"


def test_dhcp_rejects():
    assert parse_dhcp(b"\x01" * 100)["parse_error"] is not None  # short
    good = bytearray(encode_dhcp())
    good[236:240] = b"\x00\x00\x00\x00"  # break magic
    assert parse_dhcp(bytes(good))["parse_error"] is not None
    good = bytearray(encode_dhcp())
    good[0] = 9  # bad op
    assert parse_dhcp(bytes(good))["parse_error"] is not None


# ---------------------------------------------------------------------------
# IRC
# ---------------------------------------------------------------------------


def test_irc_nick_and_channels():
    out = parse_irc(encode_irc(nick="bob", channels=("#a", "#b-ops")))
    assert out["nick"] == "bob"
    assert out["channels"] == ["#a", "#b-ops"]


def test_irc_token_stops_at_space():
    out = parse_irc(b"NICK alice extra\r\nJOIN #chan key\r\n")
    assert out["nick"] == "alice"
    assert out["channels"] == ["#chan"]


def test_irc_classify_rejections():
    # server stream (leading ':' without NOTICE)
    assert parse_irc(b":server 001 hi there")["parse_error"] is not None
    # USER without NICK looks like FTP
    assert parse_irc(b"USER anonymous pass")["parse_error"] is not None
    # but USER with +iw is fine per the reference's allowance
    assert parse_irc(b"USER a b +iw :r\r\nJOIN #x\r\n")["channels"] == ["#x"]


# ---------------------------------------------------------------------------
# SOCKS
# ---------------------------------------------------------------------------


def test_socks4_request():
    out = parse_socks(encode_socks4(ip="10.1.2.3", port=8080, user="joe"))
    assert out["version"] == 4
    assert out["dst_ip"] == "10.1.2.3"
    assert out["dst_port"] == 8080
    assert out["user"] == "joe"
    assert out["dst_host"] is None


def test_socks4a_hostname():
    buf = (
        b"\x04\x01" + (443).to_bytes(2, "big")
        + bytes([0, 0, 0, 7]) + b"u\x00" + b"EXample.org\x00"
    )
    out = parse_socks(buf)
    assert out["dst_host"] == "example.org"
    assert out["dst_ip"] is None and out["dst_port"] == 443


def test_socks5_domain_connect():
    out = parse_socks(encode_socks5(host="API.Test.io", port=9443))
    assert out["version"] == 5
    assert out["dst_host"] == "api.test.io"
    assert out["dst_port"] == 9443
    assert out["user"] is None


def test_socks5_with_auth_and_ipv4():
    msg = (
        b"\x05\x01\x02"
        + b"\x01\x03bob\x00"  # user/pass subnegotiation, empty password
        + b"\x05\x01\x00\x01" + ipaddress.IPv4Address("198.51.100.7").packed
        + (1080).to_bytes(2, "big")
    )
    out = parse_socks(msg)
    assert out["user"] == "bob"
    assert out["dst_ip"] == "198.51.100.7"
    assert out["dst_port"] == 1080


def test_socks5_ipv6_connect():
    msg = (
        b"\x05\x01\x00"
        + b"\x05\x01\x00\x04" + ipaddress.IPv6Address("2001:db8::1").packed
        + (53).to_bytes(2, "big")
    )
    out = parse_socks(msg)
    assert out["dst_ip"] == "2001:db8::1"
    assert out["dst_port"] == 53


def test_socks_rejects():
    assert parse_socks(b"")["parse_error"] is not None
    assert parse_socks(b"\x03rest")["parse_error"] is not None
    assert parse_socks(b"\x04\x02\x00\x50")["parse_error"] is not None


# ---------------------------------------------------------------------------
# RADIUS
# ---------------------------------------------------------------------------


def test_radius_avps():
    pkt = encode_radius(
        code=2, user="eve", framed_ip="172.16.5.9",
        mac_hex="a1b2c3d4e5f6", endpoint_ip="203.0.113.9",
    )
    out = parse_radius(pkt)
    assert out["code"] == 2
    assert out["user"] == "eve"
    assert out["framed_ip"] == "172.16.5.9"
    assert out["mac"] == "a1:b2:c3:d4:e5:f6"
    assert out["endpoint_ip"] == "203.0.113.9"


def test_radius_length_check():
    pkt = bytearray(encode_radius())
    pkt[2:4] = (len(pkt) + 5).to_bytes(2, "big")  # lie about length
    assert parse_radius(bytes(pkt))["parse_error"] is not None


def test_radius_short_avp_stops_walk():
    base = encode_radius(user="x")
    # append an AVP with length 1 (< 3): walk must stop, not loop/throw
    pkt = base + bytes([1, 1])
    pkt = pkt[:2] + len(pkt).to_bytes(2, "big") + pkt[4:]
    out = parse_radius(pkt)
    assert out["parse_error"] is None and out["user"] == "x"


# ---------------------------------------------------------------------------
# LDAP
# ---------------------------------------------------------------------------

from moloch_spark.operators.ldap_parser import encode_ldap_bind, parse_ldap
from moloch_spark.operators.krb5_parser import encode_as_req, parse_krb5
from moloch_spark.operators.x509_parser import _enc


def test_ldap_simple_bind():
    out = parse_ldap(encode_ldap_bind(msg_id=300, name="uid=x,o=y", password="p"))
    assert out["msg_id"] == 300
    assert out["bind_name"] == "uid=x,o=y"
    assert out["auth_type"] == "simple"


def test_ldap_root_and_anonymous():
    out = parse_ldap(encode_ldap_bind(name="", password=None))
    assert out["bind_name"] == "<ROOT>"  # ref ldap.c:62 sentinel
    assert out["auth_type"] == "none"


def test_ldap_sasl_auth_tag():
    op = (
        _enc(0x02, b"\x03") + _enc(0x04, b"dn")
        + _enc(0xA3, _enc(0x04, b"GSSAPI"))  # SASL credentials, tag 3
    )
    msg = _enc(0x30, _enc(0x02, b"\x01") + _enc(0x60, op))
    assert parse_ldap(msg)["auth_type"] == "sasl"


def test_ldap_rejects_non_message():
    assert parse_ldap(b"\x04\x02hi")["parse_error"] is not None


# ---------------------------------------------------------------------------
# Kerberos
# ---------------------------------------------------------------------------


def test_krb5_as_req_fields():
    out = parse_krb5(encode_as_req(
        cname="carol", realm="CORP.TEST", sname="krbtgt/CORP.TEST"))
    assert out["msg_type"] == "AS-REQ"
    assert out["realm"] == "CORP.TEST"
    assert out["cname"] == "carol"
    assert out["sname"] == "krbtgt/CORP.TEST"


def test_krb5_multi_component_principal_joined():
    out = parse_krb5(encode_as_req(cname="host/db01.corp", realm="R"))
    assert out["cname"] == "host/db01.corp"  # ref krb5.c:55-59 '/'-join


def test_krb5_tcp_length_prefix():
    out = parse_krb5(encode_as_req(cname="u", realm="R", tcp=True))
    assert out["parse_error"] is None and out["cname"] == "u"


def test_krb5_rejects_wrong_pvno():
    msg = encode_as_req()
    # pvno byte value 5 lives inside the [1] member; flip it to 4
    broken = msg.replace(_enc(0xA1, _enc(0x02, b"\x05")),
                         _enc(0xA1, _enc(0x02, b"\x04")), 1)
    assert parse_krb5(broken)["parse_error"] is not None


# ---------------------------------------------------------------------------
# MySQL / PostgreSQL
# ---------------------------------------------------------------------------

from moloch_spark.operators.db_parsers import (
    encode_mysql_greeting,
    encode_mysql_login,
    encode_pg_startup,
    parse_mysql,
    parse_postgresql,
)


def test_mysql_greeting_and_login():
    out = parse_mysql(
        encode_mysql_greeting(version="5.7.44-log"),
        encode_mysql_login(user="Admin", ssl=True),
    )
    assert out["version"] == "5.7.44-log"
    assert out["user"] == "admin"  # lowercased like the reference
    assert out["client_ssl"] is True


def test_mysql_greeting_only():
    out = parse_mysql(encode_mysql_greeting(version="8.0.1"))
    assert out["version"] == "8.0.1" and out["user"] is None


def test_mysql_rejects_nonprintable_version():
    g = bytearray(encode_mysql_greeting(version="8.0.1"))
    g[6] = 0x01  # control char inside version
    assert parse_mysql(bytes(g))["parse_error"] is not None


def test_postgresql_startup_fields():
    out = parse_postgresql(
        encode_pg_startup(user="svc", database="warehouse", application="etl")
    )
    assert (out["pg_user"], out["pg_database"], out["pg_application"]) == (
        "svc", "warehouse", "etl",
    )


def test_postgresql_sslrequest_magic():
    out = parse_postgresql(b"\x00\x00\x00\x08\x04\xd2\x16\x2f")
    assert out["is_sslrequest"] is True and out["parse_error"] is None


def test_postgresql_rejects_wrong_major():
    msg = bytearray(encode_pg_startup())
    msg[4:6] = (2).to_bytes(2, "big")  # protocol major 2
    assert parse_postgresql(bytes(msg))["parse_error"] is not None


# ---------------------------------------------------------------------------
# Oracle TNS / BGP
# ---------------------------------------------------------------------------

from moloch_spark.operators.tns_parser import encode_tns_connect, parse_tns_connect
from moloch_spark.operators.bgp_parser import (
    encode_bgp_keepalive,
    encode_bgp_open,
    parse_bgp,
)


def test_tns_connect_items():
    out = parse_tns_connect(
        encode_tns_connect(host="DB9.Corp", user="Scott", service="OrclPDB")
    )
    assert out["host"] == "db9.corp"          # lowercased like the reference
    assert out["user"] == "scott"
    assert out["service_name"] == "orclpdb"


def test_tns_rejects_bad_bounds():
    pkt = bytearray(encode_tns_connect())
    pkt[25] += 1  # data length no longer sums to packet length
    assert parse_tns_connect(bytes(pkt))["parse_error"] is not None
    pkt = bytearray(encode_tns_connect())
    pkt[0] ^= 0xFF  # length field lies
    assert parse_tns_connect(bytes(pkt))["parse_error"] is not None


def test_bgp_open_fields():
    out = parse_bgp(encode_bgp_open(asn=64512, hold_time=90, router_id="192.0.2.9"))
    assert out["msg_type"] == "OPEN"
    assert out["open_version"] == 4
    assert out["open_asn"] == 64512
    assert out["open_hold_time"] == 90
    assert out["open_router_id"] == "192.0.2.9"


def test_bgp_keepalive_and_rejections():
    assert parse_bgp(encode_bgp_keepalive())["msg_type"] == "KEEPALIVE"
    assert parse_bgp(b"\xff" * 18)["parse_error"] is not None  # short
    bad = bytearray(encode_bgp_keepalive())
    bad[0] = 0  # broken marker
    assert parse_bgp(bytes(bad))["parse_error"] is not None
    bad = bytearray(encode_bgp_keepalive())
    bad[18] = 9  # type out of range
    assert parse_bgp(bytes(bad))["parse_error"] is not None


# ---------------------------------------------------------------------------
# HTTP/2 + HPACK
# ---------------------------------------------------------------------------

from moloch_spark.operators.http2_parser import (
    HpackDecoder,
    encode_http2_request,
    huffman_decode,
    huffman_encode,
    parse_http2,
)


def test_hpack_huffman_rfc_vectors():
    # RFC 7541 C.4.1/C.4.2: huffman-coded literal values
    assert huffman_encode(b"www.example.com").hex() == "f1e3c2e5f23a6ba0ab90f4ff"
    assert huffman_encode(b"no-cache").hex() == "a8eb10649cbf"
    assert huffman_decode(bytes.fromhex("f1e3c2e5f23a6ba0ab90f4ff")) == b"www.example.com"


def test_hpack_rfc_c3_request_sequence():
    """RFC 7541 C.3: three requests on one connection, plain literals,
    exercising the dynamic table across blocks."""
    d = HpackDecoder()
    first = bytes.fromhex(
        "828684410f7777772e6578616d706c652e636f6d"
    )
    assert d.decode(first) == [
        (":method", "GET"), (":scheme", "http"), (":path", "/"),
        (":authority", "www.example.com"),
    ]
    second = bytes.fromhex("828684be58086e6f2d6361636865")
    assert d.decode(second) == [
        (":method", "GET"), (":scheme", "http"), (":path", "/"),
        (":authority", "www.example.com"), ("cache-control", "no-cache"),
    ]


def test_http2_huffman_and_plain_paths():
    for huff in (False, True):
        out = parse_http2(encode_http2_request(
            method="POST", path="/x/y", authority="h.example",
            user_agent="ua/2", huffman=huff,
        ))
        assert out["parse_error"] is None, out
        assert (out["method"], out["path"]) == ("POST", "/x/y")
        assert out["authority"] == "h.example"
        assert out["user_agent"] == "ua/2"


def test_http2_rejections():
    assert parse_http2(b"")["parse_error"] is not None
    assert parse_http2(b"GET / HTTP/1.1\r\n")["parse_error"] is not None
    # truncated frame after valid preface
    from moloch_spark.operators.http2_parser import PREFACE
    bad = PREFACE + (100).to_bytes(3, "big") + b"\x01\x04" + (1).to_bytes(4, "big") + b"xx"
    assert parse_http2(bad)["parse_error"] is not None


# ---------------------------------------------------------------------------
# gQUIC
# ---------------------------------------------------------------------------

from moloch_spark.operators.quic_parser import encode_chlo_packet, parse_quic


def test_quic_chlo_fields():
    out = parse_quic(encode_chlo_packet(
        version=46, sni="CDN.Example.net", user_agent="ua/7", chlo_ver="Q046"))
    assert out["version"] == "Q046"
    assert out["sni"] == "cdn.example.net"  # lowercased like the reference
    assert out["user_agent"] == "ua/7"
    assert out["chlo_ver"] == "Q046"


def test_quic_header_without_chlo():
    out = parse_quic(bytes([0xC3]) + b"Q048" + bytes(40))
    assert out["version"] == "Q048" and out["sni"] is None
    assert out["parse_error"] is None


def test_quic_rejections():
    assert parse_quic(b"\x00Q046" + bytes(20))["parse_error"] is not None  # flags
    assert parse_quic(b"\xc3Q999" + bytes(20))["parse_error"] is not None  # version
    assert parse_quic(b"\xc3QA46" + bytes(20))["parse_error"] is not None  # digits
    assert parse_quic(b"")["parse_error"] is not None
