"""Compile the expression AST to a PySpark Column predicate.

Semantics mirror formatQuery/stringQuery/termOrTerms* in
viewer/molochparser.jison (reimplemented for Spark — see SURVEY §1.2 for
the kind table). Key decisions:

* **Two-valued logic.** ES bool queries are match/no-match: a `term` on a
  missing field doesn't match, and `must_not` of it DOES. SQL's 3-valued
  NULL logic would drop those rows, so every leaf predicate is wrapped in
  coalesce(pred, false); then NOT/AND/OR behave exactly like ES bool
  must_not/filter/should.
* **Multivalue membership.** A predicate on an array column is
  set-membership (ES term/wildcard/regexp against array fields) —
  array_contains / exists(col, ...) instead of scalar compare.
* **Constant-side folding.** Case-folds (lo/up kinds), value transforms
  (dash2Colon, ipProtocolLookup, ...), relative-date resolution, and ip
  shorthand all happen at compile time on the literal, never on the
  column — so Catalyst sees plain comparisons it can push down to
  parquet.
* **Wildcards / regex.** ES wildcard (*, ?) and regexp are anchored,
  full-value matches on the raw field -> translated to anchored rlike.
"""

from __future__ import annotations

import datetime as dt
import re
from dataclasses import dataclass, field as dc_field

from pyspark.sql import Column
from pyspark.sql import functions as F

from moloch_spark.catalog import Field, FieldCatalog
from moloch_spark.expr import parser as P
from moloch_spark.expr.dates import parse_seconds
from moloch_spark.expr.iputil import IpCond, ip_literal_to_int, parse_ip_port


class CompileError(ValueError):
    pass


@dataclass
class CompileContext:
    catalog: FieldCatalog
    shortcuts: dict[str, tuple[str, list[str]]] = dc_field(default_factory=dict)
    views: dict[str, str] = dc_field(default_factory=dict)
    now: dt.datetime | None = None  # injectable for deterministic relative dates
    array_fields: set[str] = dc_field(default_factory=set)
    # fileand resolution: file name -> [(node, file_id), ...], the files
    # catalog lookup (viewer/viewerUtils.js:149-176). Resolved at compile
    # time, exactly like the reference's async rewrite pass.
    files: dict[str, list[tuple[str, int]]] = dc_field(default_factory=dict)
    # column names for the (node, fileId) pair on the fact table
    node_col: str = "node"
    file_id_col: str = "file_id"


def compile_expression(expression: str | P.Node, ctx: CompileContext) -> Column:
    node = P.parse(expression) if isinstance(expression, str) else expression
    return _compile(node, ctx)


# ---------------------------------------------------------------------------


def _wrap(pred: Column) -> Column:
    """Two-valued coercion. Applied at NEGATION boundaries only: wrapping
    every leaf in coalesce(pred, false) would be semantically identical
    (ES bool logic) but blocks parquet filter pushdown — Catalyst cannot
    translate coalesce() into a data-source filter. In plain filter
    context SQL's null already behaves like ES no-match; only NOT must
    map null -> false -> true explicitly."""
    return F.coalesce(pred, F.lit(False))


def _leaf(pred: Column) -> Column:
    """Leaf predicates stay unwrapped so Catalyst can push them into the
    parquet scan; see _wrap for the semantics argument."""
    return pred


def _negate(pred: Column) -> Column:
    """ES must_not: matches docs where pred is false OR the field is
    missing (null) — hence the coalesce before negating."""
    return ~F.coalesce(pred, F.lit(False))


def _compile(node: P.Node, ctx: CompileContext) -> Column:
    if isinstance(node, P.And):
        return _compile(node.left, ctx) & _compile(node.right, ctx)
    if isinstance(node, P.Or):
        return _compile(node.left, ctx) | _compile(node.right, ctx)
    if isinstance(node, P.Not):
        return _negate(_compile(node.child, ctx))
    if isinstance(node, P.Exists):
        return _exists(node, ctx)
    if isinstance(node, P.Cmp):
        return _cmp(node, ctx)
    raise CompileError(f"unknown node {node!r}")


def _field(ctx: CompileContext, name: str) -> Field:
    info = ctx.catalog.get(name)
    if info is None:
        raise CompileError(f"Unknown field {name}")
    return info


def _is_multi(info: Field, ctx: CompileContext) -> bool:
    return info.multi or info.db_field in ctx.array_fields


def _exists(node: P.Exists, ctx: CompileContext) -> Column:
    info = _field(ctx, node.field)
    if info.regex is not None:  # fanout pseudo-field
        targets = ctx.catalog.fanout(info)
        if not targets:
            raise CompileError(f"no fields match pseudo-field {node.field}")
        preds = [
            _exists(P.Exists(f.exp, negated=False), ctx) for f in targets
        ]
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
        return _negate(pred) if node.negated else pred
    col = F.col(info.db_field)
    if _is_multi(info, ctx):
        pred = _leaf(F.size(col) > 0)
    else:
        pred = _leaf(col.isNotNull())
    return _negate(pred) if node.negated else pred


# ---------------------------------------------------------------------------
# value transforms (jison global.moloch.*)
# ---------------------------------------------------------------------------

_PROTOCOLS = {
    "icmp": 1,
    "igmp": 2,
    "tcp": 6,
    "udp": 17,
    "gre": 47,
    "esp": 50,
    "icmp6": 58,
    "icmpv6": 58,
    "ospf": 89,
    "pim": 103,
    "sctp": 132,
}


def _transform(value: str, transform: str | None) -> str:
    if transform is None:
        return value
    if transform == "dash2Colon":
        return value.replace("-", ":")
    if transform == "utf8ToHex":
        # hex-encode, keeping '*' usable as a wildcard (jison utf8ToHex)
        hexed = value.encode("utf-8").hex()
        return hexed.replace("2a", "*")
    if transform == "ipProtocolLookup":
        if value in _PROTOCOLS:
            return str(_PROTOCOLS[value])
        if not value.lstrip("-").isdigit():
            raise CompileError(f"Unknown protocol string {value}")
        return value
    if transform == "removeProtocol":
        return re.sub(r"^[a-z]+://", "", value, flags=re.I)
    if transform == "removeProtocolAndURI":
        v = re.sub(r"^[a-z]+://", "", value, flags=re.I)
        return re.sub(r"/.*", "", v)
    raise CompileError(f"unknown transform {transform}")


# ---------------------------------------------------------------------------
# comparison dispatch
# ---------------------------------------------------------------------------


def _cmp(node: P.Cmp, ctx: CompileContext) -> Column:
    info = _field(ctx, node.field)

    # fanout pseudo-fields (`ip`, `port`, `host`, ... via catalog regex):
    # expand to OR over concrete fields; != is NOT(any eq) per formatQuery.
    if info.regex is not None:
        need_port = info.kind == "ip" and _value_has_port(node.value)
        targets = ctx.catalog.fanout(info, need_port=need_port)
        if not targets:
            raise CompileError(f"no fields match pseudo-field {node.field}")
        op = "eq" if node.op == "ne" else node.op
        preds = [
            _cmp(P.Cmp(f.exp, op, node.value), ctx) for f in targets
        ]
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
        return _negate(pred) if node.op == "ne" else pred

    # $shortcut values resolve against the lookups table (jison:377-447)
    if node.value.kind == "str" and node.value.text.startswith("$"):
        return _shortcut(node, info, ctx)

    kind = info.kind
    if kind == "integer":
        return _integer(node, info, ctx)
    if kind in ("termfield", "textfield", "lotermfield", "lotextfield",
                "uptermfield", "uptextfield"):
        return _string(node, info, ctx)
    if kind == "ip":
        return _ip(node, info, ctx)
    if kind in ("date", "seconds"):
        return _datetime(node, info, ctx)
    if kind == "viewand":
        return _view(node, ctx)
    if kind == "fileand":
        return _fileand(node, ctx)
    raise CompileError(f"Unknown field type: {kind}")


def _value_has_port(v: P.Value) -> bool:
    if v.kind == "list":
        return any(_value_has_port(i) for i in v.items)
    s = v.text
    return (
        s.startswith(":")
        or (s.count(":") == 1 and not s.startswith(":"))
        or (s.count(":") > 2 and "." in s)
    )


# ---------------------------------------------------------------------------
# integer
# ---------------------------------------------------------------------------

_RANGE_RE = re.compile(r"^(-?\d+)-(-?\d+)$")


def _num(text: str) -> float:
    t = text.strip().strip('"')
    try:
        return int(t)
    except ValueError:
        try:
            return float(t)
        except ValueError:
            raise CompileError(f"{t} is not a number") from None


def _integer(node: P.Cmp, info: Field, ctx: CompileContext) -> Column:
    col = F.col(info.db_field)
    multi = _is_multi(info, ctx)
    v = node.value
    if v.kind == "regex":
        raise CompileError("Regex queries not supported for integer queries")

    if node.op in ("eq", "ne"):
        if v.kind == "list":
            nums = [
                _num(_transform(i.text, info.transform)) for i in v.items
            ]
            if multi:
                pred = _leaf(
                    F.arrays_overlap(col, F.array(*[F.lit(n) for n in nums]))
                )
            else:
                pred = _leaf(col.isin(nums))
        else:
            text = _transform(v.text.strip('"'), info.transform)
            m = _RANGE_RE.match(text) if v.kind == "str" else None
            if m:
                lo, hi = int(m.group(1)), int(m.group(2))
                if multi:
                    pred = _leaf(
                        F.exists(col, lambda x: (x >= F.lit(lo)) & (x <= F.lit(hi)))
                    )
                else:
                    pred = _leaf((col >= lo) & (col <= hi))
            else:
                n = _num(text)
                pred = _leaf(F.array_contains(col, F.lit(n)) if multi else col == n)
        return _negate(pred) if node.op == "ne" else pred

    if v.kind == "list":
        raise CompileError("List queries not supported for gt/lt queries")
    n = _num(_transform(v.text.strip('"'), info.transform))
    return _range_pred(col, node.op, F.lit(n), multi)


def _range_pred(col: Column, op: str, lit: Column, multi: bool) -> Column:
    ops = {
        "lt": lambda a, b: a < b,
        "lte": lambda a, b: a <= b,
        "gt": lambda a, b: a > b,
        "gte": lambda a, b: a >= b,
    }
    f = ops[op]
    if multi:
        return _leaf(F.exists(col, lambda x: f(x, lit)))
    return _leaf(f(col, lit))


# ---------------------------------------------------------------------------
# strings (term / text kinds)
# ---------------------------------------------------------------------------


def _fold(text: str, kind: str) -> str:
    if kind in ("lotermfield", "lotextfield"):
        return text.lower()
    if kind in ("uptermfield", "uptextfield"):
        return text.upper()
    return text


_GLOB_SPECIAL = re.compile(r"([.^$+{}\[\]()|\\])")


def _glob_to_regex(glob: str) -> str:
    # ES wildcard: * = any run, ? = one char, anchored full match
    pat = _GLOB_SPECIAL.sub(r"\\\1", glob)
    pat = pat.replace("*", ".*").replace("?", ".")
    return f"^{pat}$"


def _phrase_regex(phrase: str) -> str:
    """match_phrase over a wordSplit-analyzed text field (db/db.pl
    wordSplit analyzer): tokens in order with non-token chars between,
    case-insensitive."""
    tokens = [t for t in re.split(r"[^a-z0-9]+", phrase.lower()) if t]
    if not tokens:
        return "^$"
    body = r"[^a-z0-9]+".join(re.escape(t) for t in tokens)
    # rlike is a partial match, so plain boundaries suffice — a leading
    # `.*` would force quadratic backtracking over every row
    return rf"(^|[^a-z0-9]){body}([^a-z0-9]|$)"


def _fold_col(col: Column, kind: str) -> Column:
    """lo/up term kinds are normalized at ingest in the reference (the ES
    mapping stores the case-folded value); our engine folds the column at
    compare time instead, which is the same user-visible semantic."""
    if kind in ("lotermfield", "lotextfield"):
        return F.lower(col)
    if kind in ("uptermfield", "uptextfield"):
        return F.upper(col)
    return col


def _string_one(
    col: Column, v: P.Value, info: Field, ctx: CompileContext
) -> Column:
    """One value (not a list) -> predicate, following stringQuery.

    Reference order of operations: case-fold the whole token
    (formatQuery lo/up branches), then per-shape handling; the value
    transform applies to quoted and bare values alike, and the wildcard
    check also fires inside quoted strings (stringQuery).
    """
    kind = info.kind
    multi = _is_multi(info, ctx)
    is_text = "textfield" in kind

    if v.kind == "regex":
        pat = _fold(v.text, kind)
        if info.transform == "utf8ToHex":
            pat = _transform(pat, info.transform).replace("2e", ".")
        anchored = f"^(?:{pat})$"
        if multi:
            return _leaf(F.exists(col, lambda x: _fold_col(x, kind).rlike(anchored)))
        return _leaf(_fold_col(col, kind).rlike(anchored))

    text = _transform(_fold(v.text, kind), info.transform)

    if "*" in text:
        if text == "*":
            raise CompileError("Please use 'EXISTS!' instead of a '*' in expression")
        pat = _glob_to_regex(text)
        if multi:
            return _leaf(F.exists(col, lambda x: _fold_col(x, kind).rlike(pat)))
        return _leaf(_fold_col(col, kind).rlike(pat))

    if is_text:
        pat = _phrase_regex(text)
        if multi:
            return _leaf(F.exists(col, lambda x: F.lower(x).rlike(pat)))
        return _leaf(F.lower(col).rlike(pat))

    if multi:
        return _leaf(F.array_contains(F.transform(col, lambda x: _fold_col(x, kind)), F.lit(text)))
    return _leaf(_fold_col(col, kind) == F.lit(text))


def _string(node: P.Cmp, info: Field, ctx: CompileContext) -> Column:
    if node.op not in ("eq", "ne"):
        raise CompileError(f"Invalid operator '{node.op}' for {node.field}")
    col = F.col(info.db_field)
    v = node.value
    if v.kind == "list":
        preds = [_string_one(col, i, info, ctx) for i in v.items]
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
    else:
        pred = _string_one(col, v, info, ctx)
    return _negate(pred) if node.op == "ne" else pred


# ---------------------------------------------------------------------------
# ip
# ---------------------------------------------------------------------------

_V4_RE = r"^\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"


def ip4_str_to_long(col: Column) -> Column:
    """v4 dotted string -> unsigned 32-bit integer, JVM-side (no UDF).

    Numeric form is what enables parquet min/max row-group skipping for
    CIDR predicates (SURVEY §4 'custom Spark pieces').
    """
    parts = F.split(col, r"\.")
    return (
        parts.getItem(0).cast("long") * 16777216
        + parts.getItem(1).cast("long") * 65536
        + parts.getItem(2).cast("long") * 256
        + parts.getItem(3).cast("long")
    )


def ip6_str_to_hex(col: Column) -> Column:
    """v6 string -> 32-char lowercase hex, JVM-side (no UDF).

    Fixed-width hex compares lexicographically in numeric address order,
    so v6 CIDR/range predicates become plain string BETWEENs — sortable,
    min/max-skippable when materialized as a store column (same trick as
    the v4 numeric companion, SURVEY §4). Handles `::` compression and
    the mixed dotted-quad tail (`::ffff:1.2.3.4`).
    """

    def grp_hex(g: Column) -> Column:
        p = F.split(g, r"\.")
        v4 = (
            p.getItem(0).cast("long") * 16777216
            + p.getItem(1).cast("long") * 65536
            + p.getItem(2).cast("long") * 256
            + p.getItem(3).cast("long")
        )
        return F.when(
            g.contains("."), F.lpad(F.lower(F.hex(v4)), 8, "0")
        ).otherwise(F.lpad(F.lower(g), 4, "0"))

    halves = F.split(col, "::")
    empty = F.array().cast("array<string>")
    lg = F.when(halves.getItem(0) == "", empty).otherwise(
        F.split(halves.getItem(0), ":")
    )
    rg = F.when(
        (F.size(halves) > 1) & (halves.getItem(1) != ""),
        F.split(halves.getItem(1), ":"),
    ).otherwise(empty)
    lhex = F.array_join(F.transform(lg, grp_hex), "")
    rhex = F.array_join(F.transform(rg, grp_hex), "")
    # zero-fill for the groups `::` elided; dotted-quad groups already
    # contribute 8 chars so sizing off hex length (not group count) is
    # exact
    filler = F.lit("0" * 32).substr(
        F.lit(1), F.lit(32) - F.length(lhex) - F.length(rhex)
    )
    return F.concat(lhex, filler, rhex)


def _ip_one(cond: IpCond, info: Field, ctx: CompileContext) -> Column:
    col = F.col(info.db_field)
    multi = _is_multi(info, ctx)
    pred: Column | None = None
    if cond.lo is not None:
        if cond.v6:
            lo, hi = format(cond.lo, "032x"), format(cond.hi, "032x")

            def v6_pred(x: Column) -> Column:
                h = ip6_str_to_hex(x)
                return x.contains(":") & (h >= F.lit(lo)) & (h <= F.lit(hi))

            pred = F.exists(col, v6_pred) if multi else v6_pred(col)
        elif info.num_field:
            # numeric companion column: plain long range — pushes down to
            # parquet row-group stats, unlike the string-conversion path
            n = F.col(info.num_field)
            if multi:
                pred = F.exists(
                    n, lambda x: (x >= F.lit(cond.lo)) & (x <= F.lit(cond.hi))
                )
            else:
                pred = (n >= F.lit(cond.lo)) & (n <= F.lit(cond.hi))
        else:
            if multi:
                pred = F.exists(
                    col,
                    lambda x: x.rlike(_V4_RE)
                    & (ip4_str_to_long(x) >= F.lit(cond.lo))
                    & (ip4_str_to_long(x) <= F.lit(cond.hi)),
                )
            else:
                n = ip4_str_to_long(col)
                pred = (
                    col.rlike(_V4_RE)
                    & (n >= F.lit(cond.lo))
                    & (n <= F.lit(cond.hi))
                )
    if cond.port is not None:
        if not info.port_field:
            raise CompileError(f"{info.exp} doesn't support port")
        port_pred = F.col(info.port_field) == F.lit(cond.port)
        pred = port_pred if pred is None else (pred & port_pred)
    if pred is None:
        raise CompileError("empty ip condition")
    return _leaf(pred)


def _ip(node: P.Cmp, info: Field, ctx: CompileContext) -> Column:
    v = node.value
    if v.kind == "regex":
        raise CompileError("Regex not supported for ip queries")
    if "*" in v.text and v.kind != "list":
        raise CompileError("Wildcard not supported for ip queries")

    op = node.op
    text = v.text
    if v.kind == "str" and text == "ipv4":
        text = "0.0.0.0/0"
    elif v.kind == "str" and text == "ipv6":
        # ipv6 == x  <=>  NOT in v4 space (jison ipv4/ipv6 special-case)
        text = "0.0.0.0/0"
        op = "eq" if op == "ne" else "ne"

    if op in ("eq", "ne"):
        if v.kind == "list":
            preds = [
                _ip_one(parse_ip_port(i.text), info, ctx) for i in v.items
            ]
            pred = preds[0]
            for p in preds[1:]:
                pred = pred | p
        else:
            pred = _ip_one(parse_ip_port(text), info, ctx)
        return _negate(pred) if op == "ne" else pred

    if v.kind == "list":
        raise CompileError("List queries not supported for gt/lt queries")
    n = ip_literal_to_int(text)
    if ":" in text:
        # v6 range: 128-bit values exceed Spark's long literals, so
        # compare in the canonical-hex domain (fixed-width hex orders
        # lexicographically == numerically; same trick as v6 CIDR)
        hx = F.lit(format(n, "032x"))
        ops = {
            "lt": lambda a, b: a < b,
            "lte": lambda a, b: a <= b,
            "gt": lambda a, b: a > b,
            "gte": lambda a, b: a >= b,
        }

        def v6_range(x: Column) -> Column:
            # non-v6 strings compare as NULL -> excluded, matching the
            # v4 path's rlike guard
            h = F.when(x.contains(":"), ip6_str_to_hex(x))
            return ops[op](h, hx)

        col = F.col(info.db_field)
        if _is_multi(info, ctx):
            return _leaf(F.exists(col, v6_range))
        return _leaf(v6_range(col))
    if info.num_field:
        return _range_pred(
            F.col(info.num_field), node.op, F.lit(n), _is_multi(info, ctx)
        )
    col = F.col(info.db_field)
    num = ip4_str_to_long(col)
    return _range_pred(
        F.when(col.rlike(_V4_RE), num), node.op, F.lit(n), _is_multi(info, ctx)
    )


# ---------------------------------------------------------------------------
# date / seconds
# ---------------------------------------------------------------------------


def _datetime(node: P.Cmp, info: Field, ctx: CompileContext) -> Column:
    v = node.value
    if v.kind == "regex":
        raise CompileError("Regex queries not supported for date queries")
    col = F.col(info.db_field)
    is_date = info.kind == "date"

    def lit(secs: int) -> Column:
        return F.timestamp_seconds(F.lit(secs)) if is_date else F.lit(secs)

    if node.op in ("eq", "ne"):
        if v.kind == "list":
            secs = [parse_seconds(i.text, ctx.now) for i in v.items]
            preds = [_leaf(col == lit(s)) for s in secs]
            pred = preds[0]
            for p in preds[1:]:
                pred = pred | p
        else:
            s = parse_seconds(v.text, ctx.now)
            pred = _leaf(col == lit(s))
        return _negate(pred) if node.op == "ne" else pred

    if v.kind == "list":
        raise CompileError("List queries not supported for gt/lt queries")
    s = parse_seconds(v.text, ctx.now)
    return _range_pred(col, node.op, lit(s), False)


# ---------------------------------------------------------------------------
# shortcuts & views
# ---------------------------------------------------------------------------


def _shortcut(node: P.Cmp, info: Field, ctx: CompileContext) -> Column:
    if node.op not in ("eq", "ne"):
        raise CompileError("Shortcuts only support == and !=")
    name = node.value.text[1:]
    if name not in ctx.shortcuts:
        raise CompileError(f"{name} - Shortcut not found")
    stype, values = ctx.shortcuts[name]
    kind = info.kind
    type_map = {
        "integer": "number",
        "ip": "ip",
        "termfield": "string",
        "lotermfield": "string",
        "uptermfield": "string",
        "textfield": "string",
        "lotextfield": "string",
        "uptextfield": "string",
    }
    want = type_map.get(kind)
    if want is None:
        raise CompileError(f"Unsupported field type: {kind}")
    if stype != want:
        raise CompileError(f"shortcut must be of type {want}")

    col = F.col(info.db_field)
    multi = _is_multi(info, ctx)
    if kind == "ip":
        preds = [_ip_one(parse_ip_port(v), info, ctx) for v in values]
        pred = preds[0]
        for p in preds[1:]:
            pred = pred | p
    elif kind == "integer":
        nums = [_num(v) for v in values]
        pred = _leaf(
            F.arrays_overlap(col, F.array(*[F.lit(n) for n in nums]))
            if multi
            else col.isin(nums)
        )
    else:
        vals = [_fold(v, kind) for v in values]
        folded = (
            F.transform(col, lambda x: _fold_col(x, kind)) if multi else _fold_col(col, kind)
        )
        pred = _leaf(
            F.arrays_overlap(folded, F.array(*[F.lit(x) for x in vals]))
            if multi
            else folded.isin(vals)
        )
    return _negate(pred) if node.op == "ne" else pred


def _view(node: P.Cmp, ctx: CompileContext) -> Column:
    if node.op not in ("eq", "ne"):
        raise CompileError(f"{node.op} - not supported for view queries")
    name = node.value.text.strip('"')
    if name not in ctx.views:
        raise CompileError(f"{name} - View not found for user")
    pred = compile_expression(ctx.views[name], ctx)
    return _negate(pred) if node.op == "ne" else pred


def _fileand(node: P.Cmp, ctx: CompileContext) -> Column:
    """fileand virtual field (jison:519-527): file name resolves against
    the files catalog into an OR of (node, fileId) pairs."""
    if node.value.kind == "list":
        raise CompileError("List queries not supported for file queries")
    if node.op not in ("eq", "ne"):
        raise CompileError(f"{node.op} - not supported for file queries")
    name = node.value.text.strip('"')
    pairs = ctx.files.get(name)
    if not pairs:
        raise CompileError(f"{name} - File not found")
    preds = [
        (F.col(ctx.node_col) == F.lit(n)) & (F.col(ctx.file_id_col) == F.lit(fid))
        for n, fid in pairs
    ]
    pred = preds[0]
    for p in preds[1:]:
        pred = pred | p
    return _negate(pred) if node.op == "ne" else pred
