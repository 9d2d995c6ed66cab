"""Hunts — batch content search over session payloads.

Reference (viewer/apiHunts.js): a hunt job scrolls matching sessions,
reads raw/reassembled packets, and matches ascii / asciicase / hex /
regex / hexregex patterns (RE2) against src and/or dst payloads
(apiHunts.js:13-47,49-113); results write huntId onto sessions, with an
incremental restart checkpoint on lastPacketTime (apiHunts.js:553-561).

Spark shape: a filter over the payload column(s) — ascii matches are
`contains` (codegen string search), regex is rlike, hex matches run on
the hex encoding of binary payloads. Incremental restart = a ts range
predicate, which prunes partitions at scale.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MATCH_TYPES = {"ascii", "asciicase", "regex", "hex", "hexregex"}


@dataclass
class HuntSpec:
    hunt_id: str
    match_type: str  # ascii | asciicase | regex | hex | hexregex
    pattern: str

    def __post_init__(self):
        if self.match_type not in MATCH_TYPES:
            raise ValueError(f"unknown match type {self.match_type!r}")


def _payload_pred(col: Column, spec: HuntSpec, *, is_binary: bool) -> Column:
    s = F.hex(col) if is_binary else col
    if spec.match_type == "ascii":
        # case-insensitive substring (reference lowercases both sides)
        return F.lower(s).contains(spec.pattern.lower())
    if spec.match_type == "asciicase":
        return s.contains(spec.pattern)
    if spec.match_type == "regex":
        return s.rlike(spec.pattern)
    if spec.match_type == "hex":
        # hex() yields uppercase; normalize the needle
        return F.hex(col).contains(spec.pattern.upper())
    if spec.match_type == "hexregex":
        return F.hex(col).rlike(spec.pattern.upper())
    raise AssertionError


def hunt(
    df: DataFrame,
    spec: HuntSpec,
    *,
    payload_cols: list[str],
    id_col: str,
    binary_cols: set[str] = frozenset(),
    since_ts: str | None = None,
    ts_col: str | None = None,
) -> DataFrame:
    """Run a hunt: rows whose ANY payload column matches, tagged with the
    hunt id. `since_ts` is the incremental-restart checkpoint."""
    out = df
    if since_ts is not None and ts_col is not None:
        out = out.filter(F.col(ts_col) > F.lit(since_ts).cast("timestamp"))
    pred = None
    for c in payload_cols:
        p = F.coalesce(
            _payload_pred(F.col(c), spec, is_binary=c in binary_cols), F.lit(False)
        )
        pred = p if pred is None else (pred | p)
    return out.filter(pred).select(
        F.col(id_col), F.lit(spec.hunt_id).alias("hunt_id")
    )
