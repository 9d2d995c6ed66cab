"""YARA-subset matcher unit tests — hand-computed expectations
(the reference's test style: known payloads, known rule hits;
cf. capture/yara.c + tests/config.test.ini yara= wiring)."""

from __future__ import annotations

import pytest

from moloch_spark.operators.yara import match_rules, parse_rules, yara_scan

RULES = r"""
rule ascii_plain {
  strings:
    $a = "evil"
  condition:
    $a
}
rule ascii_nocase {
  strings:
    $a = "EVIL" nocase
  condition:
    $a
}
rule hex_wild {
  strings:
    $h = { DE AD ?? EF }
  condition:
    $h
}
rule hex_jump {
  strings:
    $h = { 41 [1-3] 42 }
  condition:
    $h
}
rule re_rule {
  strings:
    $r = /ev[i1]l/
  condition:
    $r
}
rule combo_and {
  strings:
    $a = "foo"
    $b = "bar"
  condition:
    $a and $b
}
rule combo_not {
  strings:
    $a = "foo"
    $b = "bar"
  condition:
    $a and not $b
}
rule n_of {
  strings:
    $a = "alpha"
    $b = "beta"
    $c = "gamma"
  condition:
    2 of them
}
rule any_rule {
  strings:
    $a = "xyzzy"
    $b = "plugh"
  condition:
    any of them
}
"""


@pytest.fixture(scope="module")
def rules():
    return parse_rules(RULES)


def hits(rules, data: bytes) -> set[str]:
    return set(match_rules(rules, data))


def test_text_and_nocase(rules):
    assert hits(rules, b"pure evil here") >= {"ascii_plain", "ascii_nocase", "re_rule"}
    assert "ascii_plain" not in hits(rules, b"EVIL uppercase")
    assert "ascii_nocase" in hits(rules, b"EVIL uppercase")


def test_hex_wildcard_and_jump(rules):
    assert "hex_wild" in hits(rules, b"\x00\xde\xad\x99\xef\x00")
    assert "hex_wild" not in hits(rules, b"\xde\xad\x99\x00")
    assert "hex_jump" in hits(rules, b"A__B")
    assert "hex_jump" in hits(rules, b"AxB")
    assert "hex_jump" not in hits(rules, b"AB")           # jump needs >=1
    assert "hex_jump" not in hits(rules, b"A____B")       # >3 gap


def test_regex_class(rules):
    assert "re_rule" in hits(rules, b"ev1l l33t")
    assert "re_rule" not in hits(rules, b"evol")


def test_boolean_conditions(rules):
    assert "combo_and" in hits(rules, b"foo bar")
    assert "combo_and" not in hits(rules, b"foo only")
    assert "combo_not" in hits(rules, b"foo only")
    assert "combo_not" not in hits(rules, b"foo bar")


def test_n_of_them(rules):
    assert "n_of" in hits(rules, b"alpha beta")
    assert "n_of" in hits(rules, b"alpha beta gamma")
    assert "n_of" not in hits(rules, b"alpha only")


def test_any_of_them(rules):
    assert "any_rule" in hits(rules, b"say plugh")
    assert "any_rule" not in hits(rules, b"nothing")


def test_bad_rules_fail_fast():
    with pytest.raises(ValueError):
        parse_rules("rule broken { strings: $a = \"x\" }")  # no condition
    with pytest.raises(ValueError):
        parse_rules(
            "rule evil_cond { strings: $a = \"x\"\n condition: __import__ }\n}"
        )


def test_yara_scan_dataframe(spark):
    df = spark.createDataFrame(
        [(1, "pure evil"), (2, "foo bar"), (3, None), (4, "nothing")],
        "id int, payload string",
    )
    out = {r.id: set(r.yara) for r in yara_scan(df, RULES).collect()}
    assert {"ascii_plain", "re_rule"} <= out[1]
    assert "combo_and" in out[2]
    assert out[3] == set()
    assert out[4] == set()


def test_yara_scan_binary_col(spark):
    df = spark.createDataFrame([(1, bytearray(b"\xde\xad\xbe\xef"))], "id int, payload binary")
    out = yara_scan(df, RULES).first()
    assert "hex_wild" in out.yara


def test_hex_wildcard_matches_newline_byte(rules):
    # YARA ?? means ANY byte including 0x0a — regression for missing DOTALL
    assert "hex_wild" in hits(rules, b"\xde\xad\x0a\xef")
    assert "hex_jump" in hits(rules, b"A\x0aB")
