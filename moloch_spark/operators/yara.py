"""YARA-subset payload scanning (ref capture/yara.c:1-516).

The reference compiles a YARA ruleset once at startup and scans every
packet/session payload, adding `tags` per matching rule. yara-python
isn't available in this container, so this implements the commonly-used
subset natively and keeps the identical Spark shape the real binding
would use: rules compile once per executor, payloads stream through an
Arrow-batched pandas UDF, matches land in an array column.

Supported subset:
  * text strings   $a = "evil"        (modifier: nocase)
  * hex strings    $h = { DE AD ?? EF }   (?? wildcard, [n] / [n-m] jumps)
  * regex strings  $r = /ev[i1]l/     (modifier: nocase)
  * conditions: boolean combos of $ids (and/or/not/parens),
    `any of them`, `all of them`, `N of them`

Matching is bytes-based (UTF-8 encoding for string payloads), same as
libyara scanning raw buffers.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_RULE_RE = re.compile(
    r"rule\s+(?P<name>\w+)\s*\{(?P<body>.*?)\n\s*\}", re.DOTALL
)
_STRING_RE = re.compile(
    r"\$(?P<id>\w+)\s*=\s*(?P<def>\"(?:[^\"\\]|\\.)*\"|\{[^}]*\}|/(?:[^/\\]|\\.)+/)"
    r"(?P<mods>[^\n]*)"
)


@dataclass(frozen=True)
class YaraString:
    ident: str
    pattern: bytes  # regex source, bytes
    flags: int


@dataclass(frozen=True)
class YaraRule:
    name: str
    strings: tuple[YaraString, ...]
    condition: str  # python expression over m[...] (pre-validated)


def _hex_to_regex(body: str) -> bytes:
    """{ DE AD ?? EF [2-4] 00 } -> bytes regex with wildcards/jumps."""
    out = []
    for tok in body.split():
        if tok == "??":
            out.append(b".")
        elif re.fullmatch(r"\[\d+\]", tok):
            out.append(b".{%d}" % int(tok[1:-1]))
        elif re.fullmatch(r"\[\d+-\d+\]", tok):
            lo, hi = tok[1:-1].split("-")
            out.append(b".{%d,%d}" % (int(lo), int(hi)))
        elif re.fullmatch(r"[0-9A-Fa-f]{2}", tok):
            out.append(re.escape(bytes([int(tok, 16)])))
        else:
            raise ValueError(f"unsupported hex token {tok!r}")
    return b"".join(out)


def _compile_condition(cond: str, idents: list[str]) -> str:
    """Translate a YARA condition into a validated python expression over
    the per-payload match dict ``m``. No eval of raw user text: after
    substitution, only whitelisted tokens may remain."""
    c = cond.strip()
    all_refs = "(" + " or ".join(f'm["{i}"]' for i in idents) + ")"
    c = re.sub(r"\bany\s+of\s+them\b", all_refs, c)
    c = re.sub(
        r"\ball\s+of\s+them\b",
        "(" + " and ".join(f'm["{i}"]' for i in idents) + ")",
        c,
    )
    c = re.sub(
        r"\b(\d+)\s+of\s+them\b",
        lambda g: "((" + "+".join(f'int(m["{i}"])' for i in idents) + f") >= {int(g.group(1))})",
        c,
    )
    c = re.sub(r"\$(\w+)", lambda g: f'm["{g.group(1)}"]', c)
    leftover = re.sub(r'm\["\w+"\]|\bint\b|\band\b|\bor\b|\bnot\b|[()+\s]|>=|\d+', "", c)
    if leftover:
        raise ValueError(f"unsupported condition tokens: {leftover!r}")
    compile(c, "<yara-condition>", "eval")  # syntax check at parse time
    return c


def parse_rules(text: str) -> list[YaraRule]:
    rules = []
    for rm in _RULE_RE.finditer(text):
        body = rm.group("body")
        cond_m = re.search(r"condition\s*:\s*(.*)", body, re.DOTALL)
        if not cond_m:
            raise ValueError(f"rule {rm.group('name')}: missing condition")
        strings = []
        str_m = re.search(r"strings\s*:(.*?)condition\s*:", body, re.DOTALL)
        if str_m:
            for sm in _STRING_RE.finditer(str_m.group(1)):
                sdef, mods = sm.group("def"), sm.group("mods")
                flags = re.IGNORECASE if "nocase" in mods else 0
                if sdef.startswith('"'):
                    lit = sdef[1:-1].encode().decode("unicode_escape").encode("latin-1")
                    pat = re.escape(lit)
                elif sdef.startswith("{"):
                    pat = _hex_to_regex(sdef[1:-1])
                    # YARA ?? / [n-m] mean ANY byte incl. 0x0A — without
                    # DOTALL the translated `.` skips newlines and drops
                    # real hits on binary payloads
                    flags |= re.DOTALL
                else:  # /regex/
                    pat = sdef[1:-1].encode()
                strings.append(YaraString(sm.group("id"), pat, flags))
        idents = [s.ident for s in strings]
        cond = _compile_condition(cond_m.group(1), idents)
        rules.append(YaraRule(rm.group("name"), tuple(strings), cond))
    if not rules:
        raise ValueError("no rules parsed")
    return rules


def match_rules(rules: list[YaraRule], data: bytes) -> list[str]:
    """Rule names matching one payload, in ruleset order (the order the
    reference adds tags, capture/yara.c callback order)."""
    matched = []
    for r in rules:
        m = {s.ident: re.search(s.pattern, data, s.flags) is not None for s in r.strings}
        try:
            hit = eval(r.condition, {"__builtins__": {}, "int": int}, {"m": m})  # noqa: S307 — tokens whitelisted at parse time
        except (TypeError, KeyError):
            # structurally-valid-but-nonsensical conditions (e.g. calling
            # a match result) must not kill a 100 TB scan — no-match
            hit = False
        if hit:
            matched.append(r.name)
    return matched


# per-process ruleset memo: the UDF body runs once per Arrow batch, and
# re-parsing/re-compiling there would undo the compile-once contract
_RULES_CACHE: dict[str, list[YaraRule]] = {}


def _rules_cached(rules_text: str) -> list[YaraRule]:
    if rules_text not in _RULES_CACHE:
        _RULES_CACHE[rules_text] = parse_rules(rules_text)
    return _RULES_CACHE[rules_text]


def yara_scan(
    df: DataFrame,
    rules_text: str,
    *,
    payload_col: str = "payload",
    out_col: str = "yara",
) -> DataFrame:
    """Scan a payload column (binary or string) against a ruleset.

    Rules parse on the driver (fail-fast on bad rules) and recompile
    lazily inside each executor from the source text — compile once,
    scan every row, like the reference's single yara compiler instance.
    Scan-side only: no shuffle, the UDF rides the existing partitions.
    """
    parse_rules(rules_text)  # driver-side validation

    @F.pandas_udf("array<string>")
    def scan(col: pd.Series) -> pd.Series:
        rules = _rules_cached(rules_text)
        out = []
        for v in col:
            if v is None:
                out.append([])
                continue
            data = v if isinstance(v, (bytes, bytearray)) else str(v).encode("utf-8")
            out.append(match_rules(rules, bytes(data)))
        return pd.Series(out)

    # asNondeterministic stops the optimizer pushing a downstream
    # filter (e.g. explode's implicit size>0 pruning) BELOW the UDF
    # while also keeping it above — which evaluates the full ruleset
    # scan twice per row (two ArrowEvalPython nodes in the gate plan;
    # guide §4.4). The scan is pure; the marker only pins one
    # evaluation.
    return df.withColumn(out_col, scan.asNondeterministic()(F.col(payload_col)))
