"""ANN quality gates: the approximate paths must actually find the
neighbors the brute-force baseline finds — structure-only assertions let
a broken hash family ship silently (round-1 gap).

Thresholds are pinned against the synthetic fixture, which is
near-adversarial for LSH (uniform random vectors: no cluster structure,
so top-10 cosine margins are thin). Measured on sf0.01:
LSH (L=12, b=8, 1-bit multiprobe) ~= 0.7, IVF (16 cells, nprobe=4) = 1.0.
"""

from __future__ import annotations

from moloch_spark.operators import similarity as S
from tests.conftest import SF_CORRECT


def _pairs(df):
    return {(r.qid, r.did) for r in df.collect()}


def test_ann_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    bf = _pairs(S.brute_force_topk(emb))
    assert len(bf) == 50  # 5 queries x top-10

    lsh = _pairs(S.lsh_bucket_topk(emb))
    ivf = _pairs(S.ann_ivf_topk(emb))

    recall_lsh = len(bf & lsh) / len(bf)
    recall_ivf = len(bf & ivf) / len(bf)
    assert recall_lsh >= 0.5, f"LSH recall@10 collapsed: {recall_lsh:.2f}"
    assert recall_ivf >= 0.9, f"IVF recall@10 collapsed: {recall_ivf:.2f}"


def test_lsh_single_table_is_why_we_multi_table(spark):
    """Regression guard for the design rationale: one table alone loses
    almost everything on this fixture, the L-table union must recover a
    large multiple of it."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    bf = _pairs(S.brute_force_topk(emb))
    single = _pairs(S.lsh_bucket_topk(emb, n_tables=1, multiprobe=False))
    multi = _pairs(S.lsh_bucket_topk(emb))
    assert len(bf & multi) > 2 * max(len(bf & single), 1)
