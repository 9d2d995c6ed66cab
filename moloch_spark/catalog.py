"""Field catalog — expression name -> column/kind/semantics.

The reference registers ~180 fields via moloch_field_define
(capture/field.c:254) into the ES `fields` index (db/db.pl:695-744), and
the jison parser resolves expression names through yy.fieldsMap
(viewer/apiSessions.js:1344-1352). Pseudo-fields like `ip`/`port` carry a
`regex` that fans the predicate out over every matching concrete field
(db/db.pl:744-792, molochparser.jison formatQuery regex branch).

Here the catalog is a plain table of Field records. It is data, not
code — new fields (WISE/tagger-style) can be added at runtime, exactly
like the reference's runtime field definitions (capture/field.c:64-240).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field as dc_field

KINDS = {
    "integer",
    "termfield",
    "lotermfield",
    "uptermfield",
    "textfield",
    "lotextfield",
    "uptextfield",
    "ip",
    "date",
    "seconds",
    "fileand",
    "viewand",
}

TRANSFORMS = {
    "dash2Colon",
    "utf8ToHex",
    "ipProtocolLookup",
    "removeProtocol",
    "removeProtocolAndURI",
}


@dataclass(frozen=True)
class Field:
    exp: str  # expression-language name, e.g. "http.uri"
    db_field: str  # Spark column name/path, e.g. "http.uri"
    kind: str  # one of KINDS
    multi: bool = False  # array column (term == membership)
    transform: str | None = None  # constant-side transform
    port_field: str | None = None  # paired port column for ip kinds
    regex: str | None = None  # fanout pseudo-field: regex over exp names
    # ip kinds: name of a companion NUMERIC column (unsigned-int form of
    # the address). When present, CIDR/range predicates compile against
    # it directly — plain long comparisons that parquet row-group stats
    # can skip on (SURVEY §4 "store ips as numeric to get it free").
    num_field: str | None = None

    def __post_init__(self):
        if self.kind not in KINDS:
            raise ValueError(f"unknown kind {self.kind!r} for field {self.exp!r}")
        if self.transform is not None and self.transform not in TRANSFORMS:
            raise ValueError(f"unknown transform {self.transform!r}")


@dataclass
class FieldCatalog:
    fields: dict[str, Field] = dc_field(default_factory=dict)

    def define(self, f: Field) -> "FieldCatalog":
        self.fields[f.exp] = f
        return self

    def get(self, exp: str) -> Field | None:
        # `db:` prefix resolves by column name (jison getFieldInfo, #1461)
        if exp.startswith("db:"):
            db = exp[3:]
            for f in self.fields.values():
                if f.db_field == db:
                    return f
            return None
        return self.fields.get(exp)

    def fanout(self, pseudo: Field, need_port: bool = False) -> list[Field]:
        """Expand a regex pseudo-field over matching concrete fields
        (getIpInfoList / formatQuery regex branch). Dedups by db_field,
        preserving definition order."""
        assert pseudo.regex is not None
        rx = re.compile(pseudo.regex)
        seen: set[str] = set()
        out: list[Field] = []
        for exp, f in self.fields.items():
            if f.regex is not None:
                continue
            if not rx.match(exp):
                continue
            if f.db_field in seen:
                continue
            if need_port and not f.port_field:
                continue
            seen.add(f.db_field)
            out.append(f)
        return out


# ---------------------------------------------------------------------------
# catalogs for the driver's test tables
# ---------------------------------------------------------------------------


def events_catalog() -> FieldCatalog:
    c = FieldCatalog()
    c.define(Field("event.id", "event_id", "integer"))
    c.define(Field("event.ts", "ts", "date"))
    c.define(Field("event.user", "user_id", "integer"))
    c.define(Field("event.type", "event_type", "termfield"))
    c.define(Field("event.type.lower", "event_type", "lotermfield"))
    c.define(Field("event.value", "value", "integer"))
    c.define(Field("event.props", "props", "termfield"))
    # fanout pseudo-field over every event.* termfield (moloch `host`/`ip` style)
    c.define(Field("event.any", "", "termfield", regex=r"^event\.(type|props)$"))
    return c


def documents_catalog() -> FieldCatalog:
    c = FieldCatalog()
    c.define(Field("doc.id", "doc_id", "integer"))
    c.define(Field("doc.text", "text", "textfield"))
    c.define(Field("doc.lang", "lang", "lotermfield"))
    c.define(Field("doc.source", "source", "termfield"))
    c.define(Field("doc.chars", "n_chars", "integer"))
    return c


def sessions_catalog() -> FieldCatalog:
    """Catalog over the output of sessionize_events — multivalued fields
    get set-membership semantics exactly like moloch's SPI arrays."""
    c = FieldCatalog()
    c.define(Field("session.user", "user_id", "integer"))
    c.define(Field("session.id", "session_id", "termfield"))
    c.define(Field("session.packets", "packets", "integer"))
    c.define(Field("session.bytes", "tot_bytes", "integer"))
    c.define(Field("session.first", "first_packet", "date"))
    c.define(Field("session.last", "last_packet", "date"))
    c.define(Field("session.types", "event_types", "termfield", multi=True))
    c.define(Field("session.types.cnt", "event_types_cnt", "integer"))
    return c
