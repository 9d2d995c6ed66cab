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


def test_int8_quant_recall_vs_brute_force(spark):
    """Scalar int8 quantization is near-lossless for cosine ranking:
    recall@10 against exact cosine must stay >= 0.9 (8 bits per dim on
    a uniform fixture loses at most borderline ties), and the codes
    must actually be int8-bounded."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    bf = _pairs(S.brute_force_topk(emb))
    q8 = _pairs(S.ann_int8_topk(emb))
    recall = len(bf & q8) / len(bf)
    assert recall >= 0.9, f"int8 recall@10 collapsed: {recall:.2f}"

    sc = S.int8_quant_model(emb)
    codes = S.int8_codes(emb, sc)
    bounds = codes.select(
        F.min(F.array_min("code")).alias("lo"),
        F.max(F.array_max("code")).alias("hi"),
    ).first()
    assert -127 <= bounds["lo"] and bounds["hi"] <= 127
    # the extreme of the range is actually hit (model isn't degenerate)
    assert bounds["lo"] == -127 or bounds["hi"] == 127


def test_ivf_int8_recall_vs_brute_force(spark):
    """The IVF+int8 composition (VERDICT r5 ask #4) keeps recall@10 >=
    0.85 against exact cosine: probe pruning and quantization losses
    must not compound destructively. Also pins that it loses nothing
    beyond what plain IVF (same cells/nprobe) already loses — the int8
    step is near-lossless inside the probed cells."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    bf = _pairs(S.brute_force_topk(emb))
    ivf8 = _pairs(S.ann_ivf_int8_topk(emb))
    recall = len(bf & ivf8) / len(bf)
    assert recall >= 0.85, f"IVF+int8 recall@10 collapsed: {recall:.2f}"

    ivf = _pairs(S.ann_ivf_topk(emb))
    recall_ivf = len(bf & ivf) / len(bf)
    assert recall >= recall_ivf - 0.1, (
        f"int8 in-cell scoring lost too much vs plain IVF: "
        f"{recall:.2f} vs {recall_ivf:.2f}"
    )


def test_lsh_single_table_is_why_we_multi_table(spark):
    """Regression guard for the design rationale: one table alone loses
    almost everything on this fixture, the L-table union must recover a
    large multiple of it."""
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    bf = _pairs(S.brute_force_topk(emb))
    single = _pairs(S.lsh_bucket_topk(emb, n_tables=1, multiprobe=False))
    multi = _pairs(S.lsh_bucket_topk(emb))
    assert len(bf & multi) > 2 * max(len(bf & single), 1)
