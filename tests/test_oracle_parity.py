"""Every registered query must hash-match its DuckDB oracle at sf0.01 —
the same gate the driver runs (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

from moloch_spark import queries as q
from tests.conftest import SF_CORRECT
from tests.oracle_utils import assert_matches_oracle

ALL = sorted(q.queries().keys())
WITH_ORACLE = [n for n in ALL if n in q.oracle_sql()]
ROWS_ONLY = [n for n in ALL if n not in q.oracle_sql()]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, name):
    df = q.queries()[name](spark, SF_CORRECT)
    assert_matches_oracle(df, q.oracle_sql()[name], SF_CORRECT)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    df = q.queries()[name](spark, SF_CORRECT)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as e

    out = e.entry(spark)
    assert out.count() > 0
