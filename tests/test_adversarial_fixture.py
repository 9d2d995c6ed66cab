"""Adversarial-fixture sweeps: every gate must stay oracle-green when
its source table contains degenerate rows — the latent class behind a
dozen shipped round-10 fixes.

Documents sweep: an EMPTY document, a NULL-text document, and a
single-character document. Contract under test: NULL text ≡ '' (a
missing body is an empty document, never a NULL that silently
propagates through sizes, digests, and concats on ONE side of the
oracle pair); plus the -0.0 char-entropy normalization.

Events sweep: a NULL event_type, a NULL user_id, and a NULL ts row.
Contracts under test: NULL-ts events cannot enter time-ordered session
analytics (dropped on BOTH sides — the engines' opposite NULL-ordering
window defaults can never meet); a NULL session key yields a NULL
session_id (concat, never concat_ws's silent member-skip); facet terms
exclude missing values (ES semantics); pair facets and graph edges
require both members; synthesis gates pin NULL inputs to sentinels
identically on both sides.

Both Spark and DuckDB read the same mutated parquet, so any hash
divergence here is a real operator/oracle asymmetry, not a fixture
artifact."""

from __future__ import annotations

import os
import shutil

import duckdb
import pytest

from moloch_spark.registry import all_oracles, all_queries

SRC = "/root/testdata/sf0.001"

# streaming gates pay ~3 s of Structured Streaming startup each; skip
# all but streaming_sessionize_closed, which is KEPT in the events
# sweep because the NULL-session-key and NULL-event-type fixes live in
# the streaming sessionizer's Python state fn (r10: 'nan#...' ids,
# mixed None/str type-set sort crash)
# streaming_packet_dedup is KEPT too (r11): its NULL-ts exclusion
# contract (dropDuplicatesWithinWatermark drops NULL event-times; the
# oracle filters ts IS NOT NULL to match) is exactly what this sweep
# exists to pin
SKIP = {
    "streaming_state_cap",
    "streaming_dedup_incremental",
}


@pytest.fixture(scope="module")
def adv_sf(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("adv_sf"))
    for f in os.listdir(SRC):
        if f != "documents.parquet":
            os.symlink(os.path.join(SRC, f), os.path.join(d, f))
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE t AS SELECT * FROM '{SRC}/documents.parquet'"
    )
    mx = con.execute("SELECT MAX(doc_id) FROM t").fetchone()[0]
    con.execute(f"INSERT INTO t VALUES ({mx + 1}, '', 'en', 'synthetic', 0)")
    con.execute(
        f"INSERT INTO t VALUES ({mx + 2}, NULL, 'en', 'synthetic', 0)"
    )
    con.execute(f"INSERT INTO t VALUES ({mx + 3}, 'x', 'en', 'synthetic', 1)")
    con.execute(f"COPY t TO '{d}/documents.parquet' (FORMAT PARQUET)")
    con.close()
    return d


@pytest.fixture(scope="module")
def adv_ev(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("adv_ev"))
    for f in os.listdir(SRC):
        if f != "events.parquet":
            os.symlink(os.path.join(SRC, f), os.path.join(d, f))
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM '{SRC}/events.parquet'")
    mx = con.execute("SELECT MAX(event_id) FROM t").fetchone()[0]
    con.execute(
        f"INSERT INTO t VALUES ({mx + 1}, TIMESTAMP '2024-01-02 03:04:05',"
        f" 7, NULL, 1.5, NULL)"
    )
    con.execute(
        f"INSERT INTO t VALUES ({mx + 2}, TIMESTAMP '2024-01-02 03:04:06',"
        f" NULL, 'click', NULL, '{{}}')"
    )
    con.execute(f"INSERT INTO t VALUES ({mx + 3}, NULL, 3, 'view', 2.5, '{{}}')")
    con.execute(f"COPY t TO '{d}/events.parquet' (FORMAT PARQUET)")
    con.close()
    return d


@pytest.fixture(scope="module")
def adv_li(tmp_path_factory) -> str:
    """lineitem with NULL-field rows (r11, VERDICT r10 ask #5): a NULL
    ship date, NULL measures, NULL group keys and a NULL order key —
    the TPC-H aggregation/join shapes must treat them identically on
    both engines (date-filtered aggs drop the NULL-date row; NULL keys
    group into their own bucket; a NULL join key matches nothing)."""
    d = str(tmp_path_factory.mktemp("adv_li"))
    for f in os.listdir(SRC):
        if f != "lineitem.parquet":
            os.symlink(os.path.join(SRC, f), os.path.join(d, f))
    con = duckdb.connect()
    con.execute(f"CREATE TABLE t AS SELECT * FROM '{SRC}/lineitem.parquet'")
    ok = con.execute("SELECT MAX(l_orderkey) FROM t").fetchone()[0]
    con.execute(
        f"INSERT INTO t VALUES ({ok}, 1, 1, 90, 1.0, 100.0, 0.05, 0.02,"
        f" 'N', 'O', NULL)"
    )
    con.execute(
        f"INSERT INTO t VALUES ({ok}, 1, 1, 91, NULL, NULL, NULL, NULL,"
        f" 'N', 'O', TIMESTAMP '1996-03-13 00:00:00')"
    )
    con.execute(
        f"INSERT INTO t VALUES ({ok}, 1, 1, 92, 2.0, 50.0, 0.0, 0.01,"
        f" NULL, NULL, TIMESTAMP '1996-03-13 00:00:00')"
    )
    con.execute(
        "INSERT INTO t VALUES (NULL, 1, 1, 93, 2.0, 50.0, 0.0, 0.01,"
        " 'N', 'O', TIMESTAMP '1996-03-13 00:00:00')"
    )
    con.execute(f"COPY t TO '{d}/lineitem.parquet' (FORMAT PARQUET)")
    con.close()
    return d


@pytest.fixture(scope="module")
def adv_emb(tmp_path_factory) -> str:
    d = str(tmp_path_factory.mktemp("adv_emb"))
    for f in os.listdir(SRC):
        if f != "embeddings.parquet":
            os.symlink(os.path.join(SRC, f), os.path.join(d, f))
    con = duckdb.connect()
    con.execute(
        f"CREATE TABLE t AS SELECT * FROM '{SRC}/embeddings.parquet'"
    )
    dim = con.execute("SELECT len(embedding) FROM t LIMIT 1").fetchone()[0]
    zeros = "[" + ",".join(["0.0"] * dim) + "]"
    con.execute("INSERT INTO t VALUES (500, NULL, 1)")
    con.execute(f"INSERT INTO t VALUES (501, {zeros}::FLOAT[], NULL)")
    # element-level invalidity (ADVICE r10): one NULL element and one
    # NaN element — both excluded by the extended usability contract
    nulled = "[NULL" + ",1.0" * (dim - 1) + "]"
    naned = "['nan'::FLOAT" + ",1.0" * (dim - 1) + "]"
    con.execute(f"INSERT INTO t VALUES (502, {nulled}::FLOAT[], 0)")
    con.execute(f"INSERT INTO t VALUES (503, {naned}::FLOAT[], 1)")
    con.execute(f"COPY t TO '{d}/embeddings.parquet' (FORMAT PARQUET)")
    con.close()
    return d


def _gates(table: str) -> list[str]:
    osql = all_oracles()
    return sorted(
        n for n, sql in osql.items() if table in sql and n not in SKIP
    )


@pytest.mark.parametrize("name", _gates("documents"))
def test_gate_survives_degenerate_documents(spark, name, adv_sf):
    from tests.oracle_utils import canon_rows, run_oracle

    df = all_queries()[name](spark, adv_sf)
    assert canon_rows(df.toPandas()) == canon_rows(
        run_oracle(all_oracles()[name], adv_sf)
    ), f"{name}: Spark/oracle diverge on empty/NULL/1-char documents"


@pytest.mark.parametrize("name", _gates("events"))
def test_gate_survives_degenerate_events(spark, name, adv_ev):
    from tests.oracle_utils import canon_rows, run_oracle

    df = all_queries()[name](spark, adv_ev)
    assert canon_rows(df.toPandas()) == canon_rows(
        run_oracle(all_oracles()[name], adv_ev)
    ), f"{name}: Spark/oracle diverge on NULL-field events"


@pytest.mark.parametrize("name", _gates("lineitem"))
def test_gate_survives_degenerate_lineitem(spark, name, adv_li):
    from tests.oracle_utils import canon_rows, run_oracle

    df = all_queries()[name](spark, adv_li)
    assert canon_rows(df.toPandas()) == canon_rows(
        run_oracle(all_oracles()[name], adv_li)
    ), f"{name}: Spark/oracle diverge on NULL-field lineitem rows"


@pytest.mark.parametrize("name", _gates("embeddings"))
def test_gate_survives_degenerate_embeddings(spark, name, adv_emb):
    """NULL, zero-norm, NULL-element and NaN-element vectors: excluded
    from every vector op by the
    usable_vectors entry contract (a NULL embedding crashes Arrow
    encoders; a zero vector has no direction, and ANSI mode
    DIVIDE_BY_ZEROs the first cosine against it)."""
    from tests.oracle_utils import canon_rows, run_oracle

    df = all_queries()[name](spark, adv_emb)
    assert canon_rows(df.toPandas()) == canon_rows(
        run_oracle(all_oracles()[name], adv_emb)
    ), f"{name}: Spark/oracle diverge on NULL/zero vectors"


def test_pca_survives_degenerate_embeddings(spark, adv_emb):
    # rows-only gate (no SQL oracle): must run, excluding the 4
    # unusable rows rather than crashing np.stack
    assert all_queries()["embedding_pca_whiten"](spark, adv_emb).count() == 500


def teardown_module(module):
    # the memoized index fixtures key on sf_dir; the tmp dir dies with
    # the test session, so drop nothing here — catalog probes re-miss
    shutil.rmtree("/tmp/adv_probe", ignore_errors=True)
