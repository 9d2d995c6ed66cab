"""Index alias indirection: atomic rebuild switchover (sources/alias).

Pins the contract that closes the documented rebuild-atomicity caveat
of build_bm25_index / build_ann_index: rebuild into a fresh prefix,
repoint one alias atomically, and a reader that resolves the alias
sees a whole index generation — never old model + new codes.
"""

from __future__ import annotations

import pytest

from moloch_spark.sources.alias import resolve_index_alias, set_index_alias


def test_alias_roundtrip_and_repoint(tmp_path):
    a = str(tmp_path / "docs_idx.alias")
    set_index_alias(a, "idx_g1")
    assert resolve_index_alias(a) == "idx_g1"
    set_index_alias(a, "idx_g2")
    assert resolve_index_alias(a) == "idx_g2"


def test_alias_missing_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        resolve_index_alias(str(tmp_path / "nope.alias"))


def test_bm25_rebuild_behind_alias_serves_whole_generations(spark, tmp_path):
    """End-to-end rebuild: generation 1 serves through the alias; a
    full rebuild lands in a FRESH prefix and one alias PUT switches
    serving; a reader that resolved g1 before the swap still gets g1's
    complete, self-consistent results (its tables are not touched)."""
    from moloch_spark.operators import retrieval as R

    corpus1 = spark.createDataFrame(
        [(i, f"alpha shared term{i % 7} body {i}") for i in range(40)],
        ["doc_id", "text"],
    )
    corpus2 = corpus1.filter("doc_id < 25")  # the re-crawled corpus
    queries = spark.createDataFrame(
        [(900, "alpha"), (900, "term3"), (901, "shared")],
        ["query_id", "qterm"],
    )
    a = str(tmp_path / "docs_idx.alias")
    try:
        R.build_bm25_index(spark, corpus1, "t_alias_g1",
                           str(tmp_path / "g1"), buckets=8)
        set_index_alias(a, "t_alias_g1")
        pre = resolve_index_alias(a)  # a reader mid-flight before the swap
        want_g1 = sorted(map(tuple, R.bm25_topk_indexed(
            spark, pre, queries, exclude_self=False).collect()))
        # the rebuild: fresh prefix, then ONE atomic alias PUT
        R.build_bm25_index(spark, corpus2, "t_alias_g2",
                           str(tmp_path / "g2"), buckets=8)
        set_index_alias(a, "t_alias_g2")
        # post-swap readers serve g2...
        post = resolve_index_alias(a)
        assert post == "t_alias_g2"
        assert spark.table(f"{post}_stats").first()["n_docs"] == 25
        # ...and the pre-swap reader finishes on intact, consistent g1
        still_g1 = sorted(map(tuple, R.bm25_topk_indexed(
            spark, pre, queries, exclude_self=False).collect()))
        assert still_g1 == want_g1
        assert spark.table(f"{pre}_stats").first()["n_docs"] == 40
    finally:
        for p in ("t_alias_g1", "t_alias_g2"):
            for t in ("postings", "dl", "stats"):
                spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_ann_rebuild_behind_alias_never_mixes_generations(spark, tmp_path):
    """The ANN counterpart: a retrained model (different scale +
    centroids) lands with its own codes in a fresh prefix; the alias
    swap is the only coupling, so no reader can score g2 codes with
    the g1 model."""
    import numpy as np

    from moloch_spark.operators import similarity as S

    rng = np.random.RandomState(7)
    emb = spark.createDataFrame(
        [(i, [float(v) for v in rng.randn(16)]) for i in range(256)],
        ["vec_id", "embedding"],
    ).repartition(4)
    a = str(tmp_path / "ann.alias")
    try:
        S.build_ann_index(spark, emb, "t_annalias_g1", str(tmp_path / "g1"),
                          n_cells=8, dim=16, buckets=8)
        set_index_alias(a, "t_annalias_g1")
        pre = resolve_index_alias(a)
        qs = emb.filter("vec_id < 4")
        want_g1 = sorted(map(tuple, S.ann_index_search(spark, qs, pre).collect()))
        # retrain on a drifted corpus (half the vectors, scaled) -> new
        # scale AND new codes, all under the fresh prefix
        from pyspark.sql import functions as F

        emb2 = emb.filter("vec_id < 128").select(
            "vec_id",
            F.expr("transform(embedding, x -> x * 3.0)").alias("embedding"),
        )
        S.build_ann_index(spark, emb2, "t_annalias_g2", str(tmp_path / "g2"),
                          n_cells=8, dim=16, buckets=8)
        set_index_alias(a, "t_annalias_g2")
        post = resolve_index_alias(a)
        assert post == "t_annalias_g2"
        assert spark.table(f"{post}_codes").count() == 128
        # the pre-swap reader's generation is intact and self-consistent
        assert sorted(map(tuple, S.ann_index_search(spark, qs, pre).collect())) == want_g1
    finally:
        for p in ("t_annalias_g1", "t_annalias_g2"):
            for t in ("codes", "model"):
                spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")
