"""Property-based tests (hypothesis): the expression parser/compiler
must never hang, and must either parse or raise cleanly; generated
well-formed expressions always compile to a usable predicate."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import given, settings, strategies as st

from moloch_spark.catalog import events_catalog
from moloch_spark.expr import CompileContext, compile_expression
from moloch_spark.expr.dates import parse_seconds
from moloch_spark.expr.parser import ParseError, parse

FIELDS = ["event.type", "event.user", "event.value", "event.ts"]
STR_VALUES = ["error", "click", "signup", "p*e", '"quoted val"', "[a, b, c]"]
INT_VALUES = ["5", "100", "10-20", "[1, 2, 3]"]
OPS = ["==", "!=", ">", ">=", "<", "<="]


@st.composite
def leaf(draw):
    f = draw(st.sampled_from(FIELDS))
    if f in ("event.user", "event.value"):
        v = draw(st.sampled_from(INT_VALUES))
        op = draw(st.sampled_from(OPS if "-" not in v and "[" not in v else ["==", "!="]))
    elif f == "event.ts":
        v = draw(st.sampled_from(['"2024/01/10"', "-5d", "@h"]))
        op = draw(st.sampled_from([">", ">=", "<", "<="]))
    else:
        v = draw(st.sampled_from(STR_VALUES))
        op = draw(st.sampled_from(["==", "!="]))
    return f"{f} {op} {v}"


@st.composite
def expr(draw, depth=0):
    if depth >= 3 or draw(st.booleans()):
        return draw(leaf())
    kind = draw(st.sampled_from(["and", "or", "not", "paren"]))
    if kind == "not":
        return "!(" + draw(expr(depth + 1)) + ")"
    if kind == "paren":
        return "(" + draw(expr(depth + 1)) + ")"
    op = "&&" if kind == "and" else "||"
    return f"{draw(expr(depth + 1))} {op} {draw(expr(depth + 1))}"


@settings(max_examples=200, deadline=None)
@given(expr())
def test_wellformed_expressions_compile(e):
    ctx = CompileContext(catalog=events_catalog(), now=dt.datetime(2024, 3, 1))
    col = compile_expression(e, ctx)
    assert col is not None


@settings(max_examples=300, deadline=None)
@given(st.text(max_size=60))
def test_arbitrary_text_never_hangs(s):
    try:
        node = parse(s)
        # parseable garbage may still fail at compile (unknown fields) —
        # must be a clean CompileError/ParseError, never a crash
        try:
            compile_expression(
                node, CompileContext(catalog=events_catalog(), now=dt.datetime(2024, 3, 1))
            )
        except (ParseError, ValueError):
            pass
    except ParseError:
        pass


@settings(max_examples=200, deadline=None)
@given(
    st.integers(min_value=0, max_value=500),
    st.sampled_from(["s", "m", "h", "d", "w", "mon", "y"]),
    st.booleans(),
)
def test_relative_dates_total(n, unit, neg):
    now = dt.datetime(2024, 3, 14, 15, 9, 26)
    s = f"{'-' if neg else '+'}{n}{unit}"
    out = parse_seconds(s, now)
    base = int(now.replace(tzinfo=dt.timezone.utc).timestamp())
    assert isinstance(out, int)
    if neg and n > 0:
        assert out <= base
    if not neg and n > 0:
        assert out >= base
