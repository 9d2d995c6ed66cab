"""Enrichment operators — capture-time enrichment re-expressed as joins.

Reference analogs (SURVEY §2.2):
  * GeoIP/ASN/OUI lookups at save time (capture/db.c:267-340,710-775)
      -> broadcast dimension joins
  * rules engine: hook-point matches running field-ops
    (capture/rules.c:403-428,535-542) -> when() column expressions
  * field ops incl. _dontSaveSPI / _dropBy* (capture/field.c:1281-1440)
      -> withColumn assignments / filters
  * WISE feed lookups (capture/plugins/wise.c:379-603) -> broadcast
    lookup join against a feed table
  * suricata alert correlation by key +/-30s (capture/plugins/
    suricata.c:104-170) -> interval (equi + range) join
  * drophash runtime ip:port drops (capture/drophash.c) -> anti-join

Scale shape: every dimension here is small relative to the fact table,
so each enrichment is a broadcast hash join — zero shuffle of the fact
side; the interval join is an equi-join on the entity key with a range
residual, so it shuffles once on the key, never a cross product.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field as dc_field

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str] | Column,
    *,
    how: str = "left",
) -> DataFrame:
    """Dimension enrichment: always broadcast the dim side (bounded size
    by construction — geo/OUI/nation-style tables)."""
    return fact.join(F.broadcast(dim), on, how)


# ---------------------------------------------------------------------------
# rules engine
# ---------------------------------------------------------------------------


@dataclass
class Rule:
    """One rule: a match predicate plus field-ops.

    Mirrors the reference rule file semantics (capture/rules.c): `when`
    is the compiled match expression; ops either tag, set a field, or
    drop the row (_dropBy*).
    """

    name: str
    when: Column
    add_tags: list[str] = dc_field(default_factory=list)
    set_fields: dict[str, Column] = dc_field(default_factory=dict)
    drop: bool = False


def apply_rules(df: DataFrame, rules: Sequence[Rule], *, tags_col: str = "tags") -> DataFrame:
    """Run all rules in order: drops filter, tags accumulate into a
    sorted array column, set-ops assign columns. Pure projection +
    filter — whole-stage codegen keeps this on the scan."""
    out = df
    for r in rules:
        if r.drop:
            out = out.filter(~F.coalesce(r.when, F.lit(False)))
    tag_entries = [
        F.when(r.when, F.lit(t)).otherwise(F.lit(None))
        for r in rules
        if not r.drop
        for t in r.add_tags
    ]
    if tag_entries:
        tags = F.array_sort(
            F.array_distinct(
                F.filter(F.array(*tag_entries), lambda x: x.isNotNull())
            )
        )
        out = out.withColumn(tags_col, tags)
    for r in rules:
        if r.drop:
            continue
        for col_name, value in r.set_fields.items():
            out = out.withColumn(col_name, F.when(r.when, value).otherwise(F.col(col_name)))
    return out


# ---------------------------------------------------------------------------
# WISE-style feed enrichment
# ---------------------------------------------------------------------------


def wise_enrich(
    fact: DataFrame,
    feed: DataFrame,
    *,
    key_col: str,
    key_type: str,
    feed_key: str = "key",
    feed_type: str = "key_type",
    value_cols: Sequence[str] = ("field", "value"),
) -> DataFrame:
    """WISE lookup: match fact[key_col] against feed rows of the given
    key_type; surviving feed columns ride along (ops that set fields).
    Feed tables are MB-scale -> broadcast."""
    f = feed.filter(F.col(feed_type) == key_type).select(
        F.col(feed_key).alias("__wise_key"), *value_cols
    )
    return fact.join(
        F.broadcast(f), fact[key_col].cast("string") == F.col("__wise_key"), "left"
    ).drop("__wise_key")


# ---------------------------------------------------------------------------
# interval (time-proximity) join
# ---------------------------------------------------------------------------


def interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: Column,
    left_ts: Column,
    right_lo: Column,
    right_hi: Column,
    how: str = "inner",
) -> DataFrame:
    """Equi-join on a key with a time-window residual: the suricata
    plugin's session<->alert correlation (same session hash, alert time
    within the session window +/- grace).

    The equi key carries the shuffle; the range is a cheap post-filter
    on each matched pair — never a cross product.
    """
    return left.join(right, on & (left_ts >= right_lo) & (left_ts <= right_hi), how)


def oui_enrich(
    fact: DataFrame,
    oui: DataFrame,
    *,
    mac_col: str,
    prefix_col: str = "mac_prefix",
    value_cols: Sequence[str] = ("manufacturer",),
) -> DataFrame:
    """OUI lookup (capture/db.c oui parse): MAC -> manufacturer by the
    first-3-octet prefix; the dim is tiny -> broadcast equi-join on the
    normalized prefix."""
    norm = F.lower(F.substring(F.regexp_replace(fact[mac_col], "-", ":"), 1, 8))
    dim = oui.select(
        F.lower(F.col(prefix_col)).alias("__oui_prefix"), *value_cols
    )
    return fact.join(
        F.broadcast(dim), norm == F.col("__oui_prefix"), "left"
    ).drop("__oui_prefix")


def yara_scan(df: DataFrame, rules: str, *, payload_col: str = "payload") -> DataFrame:
    """YARA payload scan (capture/yara.c) over the common rule subset
    (text/hex/regex strings, nocase, wildcards, boolean + N-of-them
    conditions) — a native matcher, since yara-python isn't in this
    container. Arrow-batched, rules compile once per executor; see
    moloch_spark.operators.yara for the engine."""
    from moloch_spark.operators.yara import yara_scan as _scan

    return _scan(df, rules, payload_col=payload_col)


def reverse_dns(
    df: DataFrame,
    *,
    ip_col: str,
    out_col: str = "rdns",
    resolver: dict[str, str] | None = None,
) -> DataFrame:
    """Reverse-DNS enrich (viewer/apiMisc.js:2020-2027).

    The Spark shape is real: an Arrow-batched UDF with a per-executor
    result cache, so each distinct IP resolves once per executor per
    batch run — the same memoization the viewer's dns.reverse callback
    path amounts to. `resolver` injects the lookup:
      * a dict (ip -> name) — deterministic, broadcast with the closure;
        what tests and air-gapped runs use
      * None — socket.gethostbyaddr (real PTR lookups; requires network,
        which THIS container lacks — lookups then resolve to NULL)
    """
    table = dict(resolver) if resolver is not None else None

    @F.pandas_udf("string")
    def rdns(ips: pd.Series) -> pd.Series:
        import socket

        cache: dict[str, str | None] = {}

        def look(ip):
            if ip is None:
                return None
            ip = str(ip)
            if ip not in cache:
                if table is not None:
                    cache[ip] = table.get(ip)
                else:
                    try:
                        cache[ip] = socket.gethostbyaddr(ip)[0]
                    except OSError:
                        cache[ip] = None
            return cache[ip]

        return ips.map(look)

    return df.withColumn(out_col, rdns(F.col(ip_col)))


def reverse_dns_stub(df: DataFrame, *, ip_col: str):
    """Back-compat alias for the round-1 stub name: the operator is now
    real (see reverse_dns); calling the stub without a resolver in an
    air-gapped container still yields NULLs rather than raising."""
    raise NotImplementedError(
        "use reverse_dns(df, ip_col=..., resolver=...) — dict resolver for "
        "deterministic runs, None for real PTR lookups on a networked cluster"
    )


# ---------------------------------------------------------------------------
# drophash — runtime drop filters
# ---------------------------------------------------------------------------


def drop_filter(fact: DataFrame, droplist: DataFrame, on: list[str]) -> DataFrame:
    """Anti-join against a (small, broadcast) drop list — the drophash
    runtime packet-drop table."""
    return fact.join(F.broadcast(droplist), on, "left_anti")
