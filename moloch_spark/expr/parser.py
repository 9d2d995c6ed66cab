"""Parser for the moloch search-expression language.

Grammar per viewer/molochparser.jison:1-83 (reference, reimplemented):

    e := e '&&' e | e '||' e | '!' e | '(' e ')'
       | FIELD OP VALUE | FIELD '==' EXISTS! | FIELD '!=' EXISTS!
    OP := == | = | != | < | <= | > | >=
    VALUE := bare-str | "quoted" | /regex/ | [list, of, values]

Token shapes from the jison lexer: `=` is an alias of `==`, `|` of `||`,
`&` of `&&`; bare strings match [-+a-zA-Z0-9_.@:*?/$]+. Precedence is
NOT > AND > OR (jison %left declarations, later = tighter; UMINUS gives
'!' the tightest binding).

The output is a small AST; all field/kind semantics live in the
compiler, mirroring how the reference resolves fieldsMap inside the
grammar actions.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class ParseError(ValueError):
    pass


# ---------------------------------------------------------------------------
# AST
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class And:
    left: "Node"
    right: "Node"


@dataclass(frozen=True)
class Or:
    left: "Node"
    right: "Node"


@dataclass(frozen=True)
class Not:
    child: "Node"


@dataclass(frozen=True)
class Cmp:
    field: str
    op: str  # eq ne lt lte gt gte
    value: "Value"


@dataclass(frozen=True)
class Exists:
    field: str
    negated: bool


@dataclass(frozen=True)
class Value:
    """Raw value token, shape preserved for the compiler.

    kind: 'str' (bare), 'quoted', 'regex', 'list'
    For 'list', items is a tuple of Value ('str'/'quoted'/'regex').
    """

    kind: str
    text: str
    items: tuple["Value", ...] = ()


Node = And | Or | Not | Cmp | Exists


# ---------------------------------------------------------------------------
# Lexer
# ---------------------------------------------------------------------------

# The jison lexer runs in flex mode: LONGEST match wins, declaration
# order breaks ties. That matters: `/b/c.html` is a bare STR (9 chars
# beats the 3-char non-greedy regex match), while `/re/` alone is a
# REGEXSTR (tie -> earlier rule), and `EXISTS!` (7) beats STR `EXISTS`.
_TOKEN_DEFS: list[tuple[str, re.Pattern]] = [
    (name, re.compile(pat))
    for name, pat in [
        ("ws", r"\s+"),
        ("quoted", r'"(?:\\.|[^"\\])*"'),
        ("regex", r"/(?:\\.|[^/\\])*/"),
        ("str", r"[-+a-zA-Z0-9_.@:*?/$]+"),
        ("list", r"\[[^\]\\]*(?:\\.[^\]\\]*)*\]"),
        ("exists", r"EXISTS!"),
        ("lte", r"<="),
        ("gte", r">="),
        ("lt", r"<"),
        ("gt", r">"),
        ("ne", r"!="),
        ("eq", r"==|="),
        ("or", r"\|\||\|"),
        ("and", r"&&|&"),
        ("lparen", r"\("),
        ("rparen", r"\)"),
        ("bang", r"!"),
    ]
]

_OPS = {"lte": "lte", "gte": "gte", "lt": "lt", "gt": "gt", "ne": "ne", "eq": "eq"}


def _lex(text: str) -> list[tuple[str, str]]:
    out: list[tuple[str, str]] = []
    pos = 0
    while pos < len(text):
        best: tuple[str, str] | None = None
        for name, rx in _TOKEN_DEFS:
            m = rx.match(text, pos)
            if m and (best is None or len(m.group()) > len(best[1])):
                best = (name, m.group())
        if best is None:
            raise ParseError(f"invalid character at {pos}: {text[pos]!r}")
        pos += len(best[1])
        if best[0] == "ws":
            continue
        out.append(best)
    out.append(("eof", ""))
    return out


# ---------------------------------------------------------------------------
# Recursive-descent parser (precedence: OR < AND < NOT)
# ---------------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens: list[tuple[str, str]]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> tuple[str, str]:
        return self.toks[self.i]

    def next(self) -> tuple[str, str]:
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, kind: str) -> str:
        k, v = self.next()
        if k != kind:
            raise ParseError(f"expected {kind}, got {k} {v!r}")
        return v

    def parse(self) -> Node:
        node = self.parse_or()
        if self.peek()[0] != "eof":
            raise ParseError(f"trailing input at token {self.peek()!r}")
        return node

    def parse_or(self) -> Node:
        node = self.parse_and()
        while self.peek()[0] == "or":
            self.next()
            node = Or(node, self.parse_and())
        return node

    def parse_and(self) -> Node:
        node = self.parse_unary()
        while self.peek()[0] == "and":
            self.next()
            node = And(node, self.parse_unary())
        return node

    def parse_unary(self) -> Node:
        k, v = self.peek()
        if k == "bang":
            self.next()
            return Not(self.parse_unary())
        if k == "lparen":
            self.next()
            node = self.parse_or()
            self.expect("rparen")
            return node
        return self.parse_cmp()

    def parse_cmp(self) -> Node:
        field = self.expect("str")
        opk, opv = self.next()
        if opk not in _OPS:
            raise ParseError(f"expected comparison operator after {field!r}, got {opv!r}")
        op = _OPS[opk]
        vk, vv = self.next()
        if vk == "exists":
            if op == "eq":
                return Exists(field, negated=False)
            if op == "ne":
                return Exists(field, negated=True)
            raise ParseError("EXISTS! only supports == and !=")
        if vk == "str":
            return Cmp(field, op, Value("str", vv))
        if vk == "quoted":
            return Cmp(field, op, Value("quoted", _unquote(vv)))
        if vk == "regex":
            return Cmp(field, op, Value("regex", _unregex(vv)))
        if vk == "list":
            return Cmp(field, op, Value("list", vv, _list_items(vv)))
        raise ParseError(f"expected value after {field} {opv}, got {vk} {vv!r}")


def _unquote(tok: str) -> str:
    return re.sub(r"\\(.)", r"\1", tok[1:-1])


def _unregex(tok: str) -> str:
    # the reference keeps backslash-escapes except \/ which it unescapes
    return tok[1:-1].replace("\\/", "/")


def _list_items(tok: str) -> tuple[Value, ...]:
    """Split a [a, b, c] token honoring \\, and \\\\ escapes
    (ListToArray, molochparser.jison)."""
    inner = tok[1:-1]
    inner = inner.replace("\\\\", "\x00").replace("\\,", "\x01")
    parts = re.split(r"\s*,\s*", inner)
    out = []
    for p in parts:
        p = p.replace("\x01", ",").replace("\x00", "\\").strip()
        if not p:
            continue
        if p.startswith('"') and p.endswith('"') and len(p) >= 2:
            out.append(Value("quoted", re.sub(r"\\(.)", r"\1", p[1:-1])))
        elif p.startswith("/") and p.endswith("/") and len(p) >= 2:
            out.append(Value("regex", p[1:-1]))
        else:
            out.append(Value("str", p))
    return tuple(out)


def parse(text: str) -> Node:
    """Parse an expression string into the AST."""
    if not text or not text.strip():
        raise ParseError("empty expression")
    return _Parser(_lex(text)).parse()
