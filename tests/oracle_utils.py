"""Local reimplementation of the driver's DuckDB-oracle comparison:
row-count + schema + order-insensitive value compare. Stricter than the
driver on purpose (exact value equality, including floats) so any
non-determinism shows up here first."""

from __future__ import annotations

import datetime as _dt
import math

import duckdb
import pandas as pd

from moloch_spark.sources.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).fetchdf()


def _canon(v):
    if v is None:
        return ("null",)
    if isinstance(v, float):
        if math.isnan(v):
            return ("nan",)
        return ("f", repr(v))
    if isinstance(v, (pd.Timestamp, _dt.datetime)):
        return ("t", pd.Timestamp(v).tz_localize(None).isoformat())
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return ("a", tuple(_canon(x) for x in v))
    if isinstance(v, bytes):
        return ("b", v)
    if pd.isna(v):
        return ("null",)
    if isinstance(v, (int,)) or type(v).__name__.startswith(("int", "uint")):
        return ("i", int(v))
    return ("s", str(v))


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    rows = [tuple(_canon(row[c]) for c in cols) for _, row in df[cols].iterrows()]
    return sorted(rows)


def assert_matches_oracle(spark_df, sql: str, sf_dir: str) -> None:
    got = spark_df.toPandas()
    want = run_oracle(sql, sf_dir)
    assert sorted(got.columns) == sorted(want.columns), (
        f"column mismatch: spark={sorted(got.columns)} oracle={sorted(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    g, w = canon_rows(got), canon_rows(want)
    for i, (a, b) in enumerate(zip(g, w)):
        assert a == b, f"row {i} differs:\n spark={a}\n oracle={b}"
