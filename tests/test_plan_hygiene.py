"""Plan hygiene sweep: no accidental nested-loop or cartesian joins in
any gate query. Queries that intentionally cross a broadcast-small side
against the corpus (ANN scoring, geo range demo) are whitelisted."""

from __future__ import annotations

import pytest

from moloch_spark.plans import formatted_plan
from moloch_spark.registry import all_oracles, all_queries

SF = "/root/testdata/sf0.001"

# intentional broadcast cross products: a bounded query set (≤5 vectors)
# against the corpus — the broadcast side is tiny by construction
INTENTIONAL_NESTED_LOOP = {
    "ann_brute_force_topk",
    "ann_lsh_bucketed_topk",
    "embedding_near_dups",
    # scalar-avg subquery: a 1-row aggregate broadcast against customer
    "tpch_q22_global_sales_opportunity",
    # fraction-of-total: the 1-row global total broadcast against vals
    "tpch_q11_important_stock",
}

SKIP = {"streaming_sessionize_closed"}  # starts a streaming job


@pytest.mark.parametrize("name", sorted(set(all_queries()) - SKIP))
def test_no_accidental_nested_loops(spark, name):
    df = all_queries()[name](spark, SF)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, f"{name}: cartesian product"
    if name not in INTENTIONAL_NESTED_LOOP:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join"
        )


def test_every_query_has_oracle_or_reason():
    qs, os_ = all_queries(), all_oracles()
    missing = set(qs) - set(os_)
    # the only rows-only query is the stateful streaming one
    assert missing == {"streaming_sessionize_closed"}, missing
