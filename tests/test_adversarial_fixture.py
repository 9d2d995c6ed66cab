"""Adversarial-fixture sweep: every documents-reading gate must stay
oracle-green when the corpus contains an EMPTY document, a NULL-text
document, and a single-character document — the latent class behind
three shipped round-10 fixes (empty-text posexplode phantoms, NULL-text
carve row-drops, -0.0 char entropy). The engine-wide contract under
test: NULL text ≡ '' (a missing body is an empty document, never a
NULL that silently propagates through sizes, digests, and concats on
ONE side of the oracle pair).

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

# streaming gates pay ~3 s of Structured Streaming startup each and
# never read the documents table's text column through an oracle that
# could NULL-diverge (events-driven); skip them for sweep cost
SKIP = {
    "streaming_sessionize_closed",
    "streaming_state_cap",
    "streaming_dedup_incremental",
    "streaming_packet_dedup",
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


def _doc_gates() -> list[str]:
    osql = all_oracles()
    return sorted(
        n
        for n, sql in osql.items()
        if "documents" in sql and n not in SKIP
    )


@pytest.mark.parametrize("name", _doc_gates())
def test_gate_survives_degenerate_documents(spark, name, adv_sf):
    from tests.oracle_utils import canon_rows, run_oracle

    df = all_queries()[name](spark, adv_sf)
    assert canon_rows(df.toPandas()) == canon_rows(
        run_oracle(all_oracles()[name], adv_sf)
    ), f"{name}: Spark/oracle diverge on empty/NULL/1-char documents"


def teardown_module(module):
    # the memoized index fixtures key on sf_dir; the tmp dir dies with
    # the test session, so drop nothing here — catalog probes re-miss
    shutil.rmtree("/tmp/adv_probe", ignore_errors=True)
