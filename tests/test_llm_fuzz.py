"""Hypothesis fuzz for the round-3 text/training operators: hostile or
degenerate documents must never crash a plan or produce NaN/out-of-
range outputs. Driver-side reference implementations double as the
semantic oracle where one exists (BPE)."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

TEXTS = st.lists(
    st.text(
        alphabet=st.characters(
            codec="utf-8", exclude_categories=("Cs",)
        ),
        max_size=120,
    ),
    min_size=1,
    max_size=12,
)

WORDY = st.lists(
    st.text(alphabet="ab c01 \n\t.!ü", min_size=0, max_size=80),
    min_size=1,
    max_size=10,
)


def _df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
    )


@settings(max_examples=15, deadline=None)
@given(texts=TEXTS)
def test_lm_scores_finite(spark, texts):
    from moloch_spark.operators import lm

    docs = _df(spark, texts)
    uni, bi = lm.train_bigram_lm(docs, min_count=1)
    rows = lm.perplexity(docs, uni, bi).collect()
    for r in rows:
        assert r.n_bigrams >= 1
        assert math.isfinite(r.avg_logprob) and r.avg_logprob <= 0.0
        assert abs(r.log_ppl + r.avg_logprob) < 1e-9


@settings(max_examples=15, deadline=None)
@given(texts=WORDY)
def test_bpe_train_fuzz_matches_reference(spark, texts):
    from moloch_spark.operators.bpe import bpe_train
    from tests.test_bpe import _ref_train

    got = bpe_train(_df(spark, texts), num_merges=6)
    assert got == _ref_train(texts, 6)


@settings(max_examples=10, deadline=None)
@given(texts=WORDY)
def test_bm25_invariants(spark, texts):
    """Ranks are dense 1..n per query, scores non-increasing within a
    query, self never returned."""
    from moloch_spark.operators import retrieval as R

    corpus = _df(spark, texts)
    out = R.bm25_topk(corpus, R.corpus_queries(corpus, modulus=1)).collect()
    by_q: dict = {}
    for r in out:
        assert r.doc_id != r.query_id
        assert math.isfinite(r.score)
        by_q.setdefault(r.query_id, []).append((r.rank, r.score))
    for ranks in by_q.values():
        ranks.sort()
        assert [r for r, _ in ranks] == list(range(1, len(ranks) + 1))
        scores = [s for _, s in ranks]
        assert all(a >= b for a, b in zip(scores, scores[1:]))


@settings(max_examples=10, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_pq_encode_fuzz(spark, vecs):
    """Codes always in range, and identical vectors get identical
    codes regardless of partitioning. Zero vectors are EXCLUDED by the
    usable-vector entry contract (r10) — hypothesis will shrink to
    [0.0]*8, which must vanish from the output, not encode."""
    from moloch_spark.operators import pq as Q

    books = Q.pq_codebooks(8, 2, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs + vecs)],
        ["vec_id", "embedding"],
    ).repartition(3)
    got = {r.vec_id: list(r.codes) for r in Q.pq_encode(df, books).collect()}
    n = len(vecs)
    for i, v in enumerate(vecs):
        if all(x == 0 for x in v):
            assert i not in got and i + n not in got
            continue
        assert got[i] == got[i + n]
        assert all(0 <= c < 4 for c in got[i])


@settings(max_examples=10, deadline=None)
@given(
    vecs=st.lists(
        st.lists(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, width=32
            ),
            min_size=8,
            max_size=8,
        ),
        min_size=1,
        max_size=24,
    ),
    per_cluster=st.integers(min_value=1, max_value=5),
)
def test_cluster_balanced_fuzz_invariants(spark, vecs, per_cluster):
    """cluster_balanced_sample invariants on arbitrary vectors: ranks
    are 1..n within each kept cluster, every cluster keeps exactly
    min(per_cluster, cluster size) rows, and total kept == sum of the
    per-cluster caps."""
    from moloch_spark.operators import curate as C
    from moloch_spark.operators.similarity import ivf_assign, ivf_centroids

    cents = ivf_centroids(8, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    ).repartition(3)
    kept = C.cluster_balanced_sample(
        df, cents, per_cluster=per_cluster
    ).collect()
    sizes: dict[int, int] = {}
    for r in ivf_assign(df, cents).collect():
        sizes[r["cell"]] = sizes.get(r["cell"], 0) + 1
    by_cell: dict[int, list[int]] = {}
    for r in kept:
        by_cell.setdefault(r["cell"], []).append(r["cluster_rank"])
    for cell, n in sizes.items():
        want = min(per_cluster, n)
        assert sorted(by_cell.get(cell, [])) == list(range(1, want + 1))
    assert len(kept) == sum(min(per_cluster, n) for n in sizes.values())
