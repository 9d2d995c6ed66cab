"""Expression-language semantics tests (molochparser.jison parity).

Each case builds a tiny in-memory DataFrame with a known catalog and
asserts exactly which row ids the compiled predicate selects — including
the ES null semantics (must_not matches missing fields) that naive SQL
translation gets wrong.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from moloch_spark.catalog import Field, FieldCatalog
from moloch_spark.expr import CompileContext, compile_expression
from moloch_spark.expr.dates import parse_seconds
from moloch_spark.expr.parser import ParseError, parse

NOW = dt.datetime(2024, 3, 14, 15, 9, 26)  # a Thursday


@pytest.fixture(scope="module")
def catalog():
    c = FieldCatalog()
    c.define(Field("host", "host", "lotermfield"))
    c.define(Field("uri", "uri", "termfield", multi=True))
    c.define(Field("body", "body", "textfield"))
    c.define(Field("bytes", "bytes", "integer"))
    c.define(Field("ports", "ports", "integer", multi=True))
    c.define(Field("ip.src", "src_ip", "ip", port_field="src_port"))
    c.define(Field("ip.dst", "dst_ip", "ip", port_field="dst_port"))
    c.define(Field("ip", "", "ip", regex=r"^ip\.(src|dst)$"))
    c.define(Field("start", "start_ts", "date"))
    c.define(Field("stop.sec", "stop_s", "seconds"))
    c.define(Field("proto", "proto", "integer", transform="ipProtocolLookup"))
    c.define(Field("mac", "mac", "lotermfield", transform="dash2Colon"))
    c.define(Field("rhost", "rhost", "lotermfield", transform="removeProtocolAndURI"))
    return c


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        # id, host, uri[], body, bytes, ports[], src_ip, src_port, dst_ip, dst_port, start_ts, stop_s, proto, mac, rhost
        (1, "WWW.Example.COM", ["/a", "/b/c.html"], "quick brown fox", 100,
         [80, 443], "10.1.2.3", 80, "192.168.1.1", 443,
         dt.datetime(2024, 3, 14, 12, 0, 0), 1710418000, 6, "aa:bb:cc:dd:ee:ff", "example.com"),
        (2, "api.test.org", ["/api/v1"], "The Quick BROWN dog", 2000,
         [8080], "10.1.9.9", 8080, "172.16.0.5", 53,
         dt.datetime(2024, 3, 13, 12, 0, 0), 1710331600, 17, "11:22:33:44:55:66", "test.org"),
        (3, None, [], None, 300,
         None, "203.0.113.7", 1234, None, None,
         dt.datetime(2024, 2, 1, 0, 0, 0), 1706745600, 1, None, None),
        (4, "www.example.com", ["/b/c.html", "/d"], "lazy dogs sleep", 150,
         [443, 22], "10.2.0.1", 443, "192.168.1.1", 80,
         dt.datetime(2024, 3, 14, 15, 0, 0), 1710428400, 6, "aa:bb:cc:11:22:33", "sub.example.com"),
    ]
    cols = ["id", "host", "uri", "body", "bytes", "ports", "src_ip", "src_port",
            "dst_ip", "dst_port", "start_ts", "stop_s", "proto", "mac", "rhost"]
    return spark.createDataFrame(rows, cols).cache()


def ids(df, catalog, expr, **kw):
    ctx = CompileContext(catalog=catalog, now=NOW, **kw)
    pred = compile_expression(expr, ctx)
    return sorted(r.id for r in df.filter(pred).select("id").collect())


# --- term/case-fold/null semantics ---------------------------------------

def test_lotermfield_casefolds_constant(df, catalog):
    assert ids(df, catalog, 'host == WWW.EXAMPLE.COM') == [1, 4]
    assert ids(df, catalog, 'host == "www.example.com"') == [1, 4]


def test_ne_matches_missing_field(df, catalog):
    # ES must_not semantics: row 3 (host null) MUST match host != x
    assert ids(df, catalog, 'host != api.test.org') == [1, 3, 4]


def test_not_expression(df, catalog):
    assert ids(df, catalog, '!(host == api.test.org)') == [1, 3, 4]


def test_exists(df, catalog):
    assert ids(df, catalog, 'host == EXISTS!') == [1, 2, 4]
    assert ids(df, catalog, 'host != EXISTS!') == [3]
    # multi: empty array == missing (ES exists on empty array is false)
    assert ids(df, catalog, 'uri == EXISTS!') == [1, 2, 4]
    assert ids(df, catalog, 'uri != EXISTS!') == [3]


# --- wildcard / regex ------------------------------------------------------

def test_wildcard(df, catalog):
    assert ids(df, catalog, 'host == www.*') == [1, 4]
    assert ids(df, catalog, 'host == *.example.com') == [1, 4]
    # '?' is a single-char wildcard only when '*' is also present — the
    # reference only routes to the ES wildcard query on '*' (stringQuery)
    assert ids(df, catalog, 'host == api.te?t.*') == [2]
    assert ids(df, catalog, 'host == api.????.org') == []  # plain term, no match


def test_wildcard_star_alone_rejected(df, catalog):
    with pytest.raises(Exception, match="EXISTS"):
        ids(df, catalog, 'host == *')


def test_regex_is_anchored(df, catalog):
    # ES regexp = full-value match; 'example' alone must NOT match
    assert ids(df, catalog, 'host == /example/') == []
    assert ids(df, catalog, 'host == /.*example.*/') == [1, 4]


def test_multivalue_membership(df, catalog):
    # term on array = set membership (the critical moloch semantic)
    assert ids(df, catalog, 'uri == /b/c.html') == [1, 4]
    assert ids(df, catalog, 'uri != /b/c.html') == [2, 3]
    assert ids(df, catalog, 'uri == *c.html') == [1, 4]


# --- textfield phrase ------------------------------------------------------

def test_textfield_phrase(df, catalog):
    assert ids(df, catalog, 'body == "quick brown"') == [1, 2]  # analyzed, case-insensitive
    assert ids(df, catalog, 'body == "brown fox"') == [1]
    assert ids(df, catalog, 'body == fox') == [1]
    assert ids(df, catalog, 'body == quick') == [1, 2]


# --- lists -----------------------------------------------------------------

def test_list_values(df, catalog):
    assert ids(df, catalog, 'host == [api.test.org, www.example.com]') == [1, 2, 4]
    assert ids(df, catalog, 'bytes == [100, 300]') == [1, 3]
    assert ids(df, catalog, 'host != [api.test.org, www.example.com]') == [3]


def test_list_mixed_wildcard(df, catalog):
    assert ids(df, catalog, 'host == [api.*, www.example.com]') == [1, 2, 4]


# --- integer ---------------------------------------------------------------

def test_integer_ops(df, catalog):
    assert ids(df, catalog, 'bytes == 100') == [1]
    assert ids(df, catalog, 'bytes != 100') == [2, 3, 4]
    assert ids(df, catalog, 'bytes >= 300') == [2, 3]
    assert ids(df, catalog, 'bytes < 150') == [1]


def test_integer_range_shorthand(df, catalog):
    assert ids(df, catalog, 'bytes == 100-300') == [1, 3, 4]


def test_integer_array_field(df, catalog):
    assert ids(df, catalog, 'ports == 443') == [1, 4]
    assert ids(df, catalog, 'ports == [22, 8080]') == [2, 4]
    assert ids(df, catalog, 'ports >= 8000') == [2]


def test_integer_rejects_nonnumber(df, catalog):
    with pytest.raises(Exception, match="not a number"):
        ids(df, catalog, 'bytes == abc')


# --- boolean precedence ----------------------------------------------------

def test_precedence_and_tighter_than_or(df, catalog):
    # a || b && c  ==  a || (b && c)
    got = ids(df, catalog, 'bytes == 300 || bytes == 100 && host == www.example.com')
    assert got == [1, 3]
    got2 = ids(df, catalog, '(bytes == 300 || bytes == 100) && host == www.example.com')
    assert got2 == [1]


def test_op_aliases(df, catalog):
    assert ids(df, catalog, 'bytes = 100 | bytes = 300') == [1, 3]
    assert ids(df, catalog, 'bytes = 100 & host = www.example.com') == [1]


# --- ip --------------------------------------------------------------------

def test_ip_exact_and_cidr(df, catalog):
    assert ids(df, catalog, 'ip.src == 10.1.2.3') == [1]
    assert ids(df, catalog, 'ip.src == 10.1.2.3/32') == [1]
    assert ids(df, catalog, 'ip.src == 10.1') == [1, 2]      # /16 shorthand
    assert ids(df, catalog, 'ip.src == 10') == [1, 2, 4]     # /8 shorthand
    assert ids(df, catalog, 'ip.src == 10.1.0.0/16') == [1, 2]


def test_ip_with_port(df, catalog):
    assert ids(df, catalog, 'ip.src == 10.1.2.3:80') == [1]
    assert ids(df, catalog, 'ip.src == 10.1.2.3:81') == []
    assert ids(df, catalog, 'ip.src == :8080') == [2]


def test_ip_list_and_ne(df, catalog):
    assert ids(df, catalog, 'ip.src == [10.1.2.3, 203.0.113.7]') == [1, 3]
    assert ids(df, catalog, 'ip.src != 10/8') == [3]


def test_ip_fanout_pseudofield(df, catalog):
    # `ip == x` fans out over ip.src and ip.dst
    assert ids(df, catalog, 'ip == 192.168.1.1') == [1, 4]
    assert ids(df, catalog, 'ip == 203.0.113.7') == [3]
    assert ids(df, catalog, 'ip != 10/8') == [3]


def test_ip_range_ops(df, catalog):
    assert ids(df, catalog, 'ip.src > 192.0.0.0') == [3]


def test_ipv4_ipv6_specials(df, catalog):
    assert ids(df, catalog, 'ip.src == ipv4') == [1, 2, 3, 4]
    assert ids(df, catalog, 'ip.src == ipv6') == []


def test_ip6_cidr(spark, catalog):
    rows = [
        (1, "2001:db8::1", ["2001:db8::1"]),
        (2, "2001:db8:0:0:0:0:0:2", ["2001:db8::2", "10.0.0.1"]),
        (3, "2001:db9::1", []),
        (4, "::ffff:10.1.2.3", ["fe80::1"]),
        (5, "10.1.2.3", None),  # v4 row must never match a v6 predicate
    ]
    df6 = spark.createDataFrame(rows, ["id", "src_ip", "other_ips"])
    cat = FieldCatalog()
    cat.define(Field("ip.src", "src_ip", "ip"))
    cat.define(Field("ip.other", "other_ips", "ip", multi=True))

    assert ids(df6, cat, "ip.src == 2001:db8::/32") == [1, 2]
    assert ids(df6, cat, "ip.src == 2001:db8::/127") == [1]
    assert ids(df6, cat, "ip.src == 2001:db8::2") == [2]  # any textual form
    assert ids(df6, cat, "ip.src == ::ffff:10.1.2.3") == [4]
    assert ids(df6, cat, "ip.src != 2001:db8::/32") == [3, 4, 5]
    assert ids(df6, cat, "ip.other == 2001:db8::/32") == [1, 2]
    assert ids(df6, cat, "ip.other == fe80::/10") == [4]

    # v6 gt/lt: 128-bit literals compare in the canonical-hex domain;
    # v4 and NULL rows never match a v6 range
    assert ids(df6, cat, "ip.src > 2001:db8::1") == [2, 3]
    assert ids(df6, cat, "ip.src >= 2001:db9::") == [3]
    assert ids(df6, cat, "ip.src < 2001:db8::2") == [1, 4]
    assert ids(df6, cat, "ip.src <= ::ffff:10.1.2.3") == [4]
    assert ids(df6, cat, "ip.other > 2001:db8::1") == [2, 4]
    assert ids(df6, cat, "ip.other < ::1") == []


def test_ip6_hex_expansion_matches_python(spark):
    import ipaddress

    from moloch_spark.expr.compiler import ip6_str_to_hex

    cases = [
        "::", "::1", "1::", "2001:db8::8a2e:370:7334",
        "2001:0db8:85a3:0000:0000:8a2e:0370:7334",
        "fe80::204:61ff:fe9d:f156", "::ffff:192.0.2.128",
        "64:ff9b::255.255.255.255", "ff02::1:ff00:0",
        "ABCD:EF01:2345:6789:abcd:ef01:2345:6789",
    ]
    df = spark.createDataFrame([(c,) for c in cases], ["ip"])
    got = {r.ip: r.h for r in df.select("ip", ip6_str_to_hex(F.col("ip")).alias("h")).collect()}
    for c in cases:
        want = format(int(ipaddress.IPv6Address(c)), "032x")
        assert got[c] == want, f"{c}: {got[c]} != {want}"


def test_ip_rejects_wildcard_regex(df, catalog):
    with pytest.raises(Exception, match="Wildcard"):
        ids(df, catalog, 'ip.src == 10.*')
    with pytest.raises(Exception, match="Regex"):
        ids(df, catalog, 'ip.src == /10.1/')


# --- date / seconds ----------------------------------------------------------

def test_date_absolute(df, catalog):
    assert ids(df, catalog, 'start >= "2024/03/14 00:00:00"') == [1, 4]
    assert ids(df, catalog, 'start < "2024/03/01"') == [3]
    assert ids(df, catalog, 'start == "2024/03/14 12:00:00"') == [1]


def test_date_relative(df, catalog):
    # NOW = 2024-03-14 15:09:26 Thu; -1d = 2024-03-13 15:09:26
    assert ids(df, catalog, 'start >= -1d') == [1, 4]
    # snap to start of day then -0h: -0h@d = 2024-03-14 00:00:00
    assert ids(df, catalog, 'start >= -0h@d') == [1, 4]
    # @w4 = Thursday of this week (moment .day(4) after startOf week)
    assert ids(df, catalog, 'start >= @w4') == [1, 4]


def test_seconds_kind(df, catalog):
    assert ids(df, catalog, 'stop.sec >= 1710418000') == [1, 4]
    assert ids(df, catalog, 'stop.sec == 1706745600') == [3]


# --- transforms --------------------------------------------------------------

def test_ip_protocol_lookup(df, catalog):
    assert ids(df, catalog, 'proto == tcp') == [1, 4]
    assert ids(df, catalog, 'proto == udp') == [2]
    assert ids(df, catalog, 'proto == [tcp, icmp]') == [1, 3, 4]
    with pytest.raises(Exception, match="Unknown protocol"):
        ids(df, catalog, 'proto == bogus')


def test_dash2colon(df, catalog):
    assert ids(df, catalog, 'mac == aa-bb-cc-dd-ee-ff') == [1]


def test_remove_protocol_and_uri(df, catalog):
    # '=' is not a legal STR char (jison lexer), so the value is quoted —
    # transforms apply to quoted values too (stringQuery order)
    assert ids(df, catalog, 'rhost == "http://example.com/path?x=1"') == [1]
    assert ids(df, catalog, 'rhost == https://test.org/whatever') == [2]


# --- shortcuts / views / db: -------------------------------------------------

def test_shortcuts(df, catalog):
    sc = {"bad_hosts": ("string", ["www.example.com", "evil.org"]),
          "big": ("number", ["2000", "300"]),
          "nets": ("ip", ["10.1.0.0/16"])}
    assert ids(df, catalog, 'host == $bad_hosts', shortcuts=sc) == [1, 4]
    assert ids(df, catalog, 'host != $bad_hosts', shortcuts=sc) == [2, 3]
    assert ids(df, catalog, 'bytes == $big', shortcuts=sc) == [2, 3]
    assert ids(df, catalog, 'ip.src == $nets', shortcuts=sc) == [1, 2]
    with pytest.raises(Exception, match="Shortcut not found"):
        ids(df, catalog, 'host == $nope', shortcuts=sc)


def test_views(df, catalog):
    views = {"internal": "ip.src == 10/8"}
    c = FieldCatalog(dict(catalog.fields))
    c.define(Field("view", "", "viewand"))
    assert ids(df, c, 'view == internal && bytes < 200', views=views) == [1, 4]
    assert ids(df, c, 'view != internal', views=views) == [3]


def test_db_prefix_lookup(df, catalog):
    assert ids(df, catalog, 'db:bytes == 100') == [1]


# --- parser errors -----------------------------------------------------------

def test_parse_errors():
    for bad in ["", "host ==", "== x", "host == (", "(host == a", "host <> 3"]:
        with pytest.raises(ParseError):
            parse(bad)


def test_unknown_field(df, catalog):
    with pytest.raises(Exception, match="Unknown field"):
        ids(df, catalog, 'nosuch == 1')


# --- relative-date unit behavior ----------------------------------------------

def test_parse_seconds_units():
    now = NOW
    assert parse_seconds("-5d", now) == int((now - dt.timedelta(days=5)).replace(tzinfo=dt.timezone.utc).timestamp())
    assert parse_seconds("+2h", now) == int((now + dt.timedelta(hours=2)).replace(tzinfo=dt.timezone.utc).timestamp())
    # -1d@d: snap to start of day FIRST, then subtract
    assert parse_seconds("-1d@d", now) == int(dt.datetime(2024, 3, 13, tzinfo=dt.timezone.utc).timestamp())
    # @h snap
    assert parse_seconds("@h", now) == int(dt.datetime(2024, 3, 14, 15, tzinfo=dt.timezone.utc).timestamp())
    # @w = Sunday start of week (2024-03-10); @w3 = Wednesday (2024-03-13)
    assert parse_seconds("@w", now) == int(dt.datetime(2024, 3, 10, tzinfo=dt.timezone.utc).timestamp())
    assert parse_seconds("@w3", now) == int(dt.datetime(2024, 3, 13, tzinfo=dt.timezone.utc).timestamp())
    # months clamp: 2024-03-31 minus 1 month -> 2024-02-29 (moment .add clamps)
    assert parse_seconds("-1mon", dt.datetime(2024, 3, 31, 12, 0, 0)) == int(
        dt.datetime(2024, 2, 29, 12, 0, 0, tzinfo=dt.timezone.utc).timestamp()
    )
    # "-1M" is a no-op in the reference: its lexer regex only admits
    # [a-z] units, so the uppercase M is dropped (bug-compatible)
    assert parse_seconds("-1M", NOW) == int(
        NOW.replace(tzinfo=dt.timezone.utc).timestamp()
    )
    # bare epoch
    assert parse_seconds("1710418166", now) == 1710418166
