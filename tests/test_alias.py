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


def test_bm25_paved_road_alias_build_and_serve(spark, tmp_path):
    """VERDICT r7 ask #3: alias indirection as the DEFAULT rebuild
    path. build_bm25_index(alias_path=) lands each build in a fresh
    writer-unique generation prefix and commits it with one alias PUT;
    bm25_topk_indexed(alias_path=) resolves once per query. A reader
    that resolved mid-rebuild (before the swap) finishes on the old
    generation's complete family; post-swap queries serve the new one
    — never a mix."""
    from moloch_spark.operators import retrieval as R

    corpus1 = spark.createDataFrame(
        [(i, f"alpha shared term{i % 7} body {i}") for i in range(40)],
        ["doc_id", "text"],
    )
    corpus2 = corpus1.filter("doc_id < 25")
    queries = spark.createDataFrame(
        [(900, "alpha"), (900, "term3"), (901, "shared")],
        ["query_id", "qterm"],
    )
    a = str(tmp_path / "docs_idx.alias")
    g1 = g2 = None
    try:
        g1 = R.build_bm25_index(
            spark, corpus1, "t_paved", str(tmp_path / "idx"),
            buckets=8, alias_path=a,
        )
        assert g1.startswith("t_paved_g")
        assert resolve_index_alias(a) == g1
        want_g1 = sorted(map(tuple, R.bm25_topk_indexed(
            spark, None, queries, exclude_self=False, alias_path=a
        ).collect()))
        # a reader resolves mid-rebuild (before the swap lands) ...
        pre = resolve_index_alias(a)
        g2 = R.build_bm25_index(
            spark, corpus2, "t_paved", str(tmp_path / "idx"),
            buckets=8, alias_path=a,
        )
        assert g2 != g1 and resolve_index_alias(a) == g2
        # ... and finishes on g1's complete, self-consistent family
        still_g1 = sorted(map(tuple, R.bm25_topk_indexed(
            spark, pre, queries, exclude_self=False
        ).collect()))
        assert still_g1 == want_g1
        assert spark.table(f"{pre}_stats").first()["n_docs"] == 40
        # post-swap serving goes to g2 through the same alias call
        post = R.bm25_topk_indexed(
            spark, None, queries, exclude_self=False, alias_path=a
        )
        assert {r.doc_id for r in post.collect()} <= set(range(25))
        assert spark.table(f"{g2}_stats").first()["n_docs"] == 25
    finally:
        for p in (g1, g2):
            if p:
                for t in ("postings", "dl", "stats"):
                    spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_ann_paved_road_alias_build_and_serve(spark, tmp_path):
    """The ANN counterpart, through the labeler composition too: a
    retrained generation (different scale + centroids + labels) swaps
    in atomically; knn_label_vote_indexed(alias_path=) rides the same
    single resolve."""
    import numpy as np
    from pyspark.sql import functions as F

    from moloch_spark.operators import similarity as S

    rng = np.random.RandomState(7)
    centers = rng.randn(2, 16) * 4.0
    emb = spark.createDataFrame(
        [
            (
                i,
                [float(v) for v in centers[i % 2] + rng.randn(16) * 0.5],
                None if i < 4 else i % 2,
            )
            for i in range(200)
        ],
        "vec_id long, embedding array<double>, label int",
    ).repartition(4)
    a = str(tmp_path / "ann.alias")
    g1 = g2 = None
    try:
        g1 = S.build_ann_index(
            spark, emb.filter(F.col("label").isNotNull()),
            "t_annpav", str(tmp_path / "ann"),
            n_cells=8, dim=16, buckets=8, carry_cols=("label",),
            alias_path=a,
        )
        assert resolve_index_alias(a) == g1
        qs = emb.filter("vec_id < 4")
        want = {
            r.qid: r.pred_label
            for r in S.knn_label_vote_indexed(
                spark, qs, None, nprobe=3, alias_path=a
            ).collect()
        }
        assert want == {q: q % 2 for q in range(4)}  # separable clusters
        # rebuild with flipped labels -> new generation, atomic swap
        flipped = emb.filter(F.col("label").isNotNull()).withColumn(
            "label", F.lit(1) - F.col("label")
        )
        g2 = S.build_ann_index(
            spark, flipped, "t_annpav", str(tmp_path / "ann"),
            n_cells=8, dim=16, buckets=8, carry_cols=("label",),
            alias_path=a,
        )
        assert g2 != g1 and resolve_index_alias(a) == g2
        got2 = {
            r.qid: r.pred_label
            for r in S.knn_label_vote_indexed(
                spark, qs, None, nprobe=3, alias_path=a
            ).collect()
        }
        assert got2 == {q: 1 - (q % 2) for q in range(4)}
    finally:
        for p in (g1, g2):
            if p:
                for t in ("codes", "model"):
                    spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_alias_records_history_and_vacuums_drained_generations(
    spark, tmp_path
):
    """Round 8: the swap records superseded prefixes in the alias body;
    vacuum_index_alias age-gates reclaim (never the current prefix),
    dry_run audits, and a re-point at the current prefix is a no-op."""
    import json
    import os
    import time

    from moloch_spark.operators import retrieval as R
    from moloch_spark.sources.alias import (
        superseded_index_prefixes,
        vacuum_index_alias,
    )

    corpus = spark.createDataFrame(
        [(i, f"w{i % 5} common body") for i in range(20)], ["doc_id", "text"]
    )
    a = str(tmp_path / "i.alias")
    g1 = g2 = None
    try:
        g1 = R.build_bm25_index(spark, corpus, "t_vac", str(tmp_path / "v"),
                                buckets=4, alias_path=a)
        g2 = R.build_bm25_index(spark, corpus, "t_vac", str(tmp_path / "v"),
                                buckets=4, alias_path=a)
        assert superseded_index_prefixes(a) == [g1]
        assert superseded_index_prefixes(a, older_than_s=3600) == []
        # young: retained (a reader may still be on g1)
        assert vacuum_index_alias(a, spark, ("postings", "dl", "stats")) == []
        assert spark.catalog.tableExists(f"{g1}_postings")
        # age the supersession out, audit, then reclaim
        body = json.loads(open(a).read())
        body["superseded"][0]["at"] = time.time() - 7200
        with open(a, "w") as f:
            json.dump(body, f)
        planned = vacuum_index_alias(
            a, spark, ("postings", "dl", "stats"), dry_run=True
        )
        assert planned == [g1]
        assert spark.catalog.tableExists(f"{g1}_postings")  # audit only
        g1_data = tmp_path / f"v_g{g1.split('_g')[-1]}_postings"
        g2_data = tmp_path / f"v_g{g2.split('_g')[-1]}_postings"
        assert g1_data.is_dir() and g2_data.is_dir()
        assert vacuum_index_alias(a, spark, ("postings", "dl", "stats")) == [g1]
        assert not spark.catalog.tableExists(f"{g1}_postings")
        assert spark.catalog.tableExists(f"{g2}_postings")   # current kept
        # the EXTERNAL parquet is reclaimed too, not just catalog rows
        assert not g1_data.exists()
        assert g2_data.is_dir()
        assert superseded_index_prefixes(a) == []            # history rewritten
        # idempotent + no-op re-point
        assert vacuum_index_alias(a, spark, ("postings", "dl", "stats")) == []
        from moloch_spark.sources.alias import resolve_index_alias, set_index_alias

        set_index_alias(a, g2)
        assert resolve_index_alias(a) == g2
        assert superseded_index_prefixes(a) == []
        assert os.path.exists(a)
    finally:
        for p in (g1, g2):
            if p:
                for t in ("postings", "dl", "stats"):
                    spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_alias_mutations_serialized_by_lock(tmp_path):
    """Round-8 self-review fix: alias read-modify-writes (swap AND
    vacuum rewrite) serialize on `<alias>.lock` — without it a vacuum
    rewrite racing a rebuild swap could clobber the current pointer
    back to a stale generation. A mutation blocks behind a held lock
    and applies only after release; the lock never leaks."""
    import os
    import threading

    import moloch_spark.sources.commit as C
    from moloch_spark.sources.alias import superseded_index_prefixes
    from moloch_spark.sources.fs import get_fs

    a = str(tmp_path / "x.alias")
    set_index_alias(a, "g1")
    assert not os.path.exists(a + ".lock")          # released after swap
    fs, root = get_fs(str(tmp_path))
    tok = C._acquire_manifest_lock(fs, root, name="x.alias.lock")
    t = threading.Thread(target=set_index_alias, args=(a, "g2"))
    t.start()
    t.join(0.7)
    assert t.is_alive()                              # blocked on the lock
    assert resolve_index_alias(a) == "g1"            # pointer untouched
    C._release_manifest_lock(fs, root, tok, name="x.alias.lock")
    t.join(30)
    assert not t.is_alive()
    assert resolve_index_alias(a) == "g2"            # applied after release
    assert superseded_index_prefixes(a) == ["g1"]
    assert not os.path.exists(a + ".lock")


def test_vacuum_rollback_reclaim_keys_on_latest_supersession(tmp_path):
    """Code-review r8: a prefix rolled back to and superseded AGAIN has
    two history entries; the age gate must key on the LATEST one, or
    the generation serving until seconds ago is reclaimed through its
    stale first entry while readers are still draining off it."""
    import json
    import time

    from moloch_spark.sources.alias import (
        superseded_index_prefixes,
        vacuum_index_alias,
    )

    a = str(tmp_path / "r.alias")
    set_index_alias(a, "genA")
    set_index_alias(a, "genB")   # A superseded (t1)
    set_index_alias(a, "genA")   # rollback: B superseded (t2)
    set_index_alias(a, "genC")   # A superseded AGAIN (t3)
    body = json.loads(open(a).read())
    assert [h["prefix"] for h in body["superseded"]] == [
        "genA", "genB", "genA",
    ]
    # age t1 and t2 out; t3 (A's LATEST) stays fresh
    body["superseded"][0]["at"] = time.time() - 7200
    body["superseded"][1]["at"] = time.time() - 7200
    with open(a, "w") as f:
        json.dump(body, f)
    # A is NOT drained (latest entry fresh); B is
    assert superseded_index_prefixes(a, older_than_s=900) == ["genB"]
    assert vacuum_index_alias(a, None, (), dry_run=True) == ["genB"]
    assert vacuum_index_alias(a, None, ()) == ["genB"]
    after = json.loads(open(a).read())
    assert after["prefix"] == "genC"
    assert [h["prefix"] for h in after["superseded"]] == ["genA", "genA"]


def test_sweep_orphan_index_generations(spark, tmp_path):
    """A build that crashes before its alias PUT leaves a generation
    the alias never learns about; the sweep finds it by the family's
    catalog naming pattern, age-gates it (a young orphan may be a
    build in flight), and reclaims tables AND external data. Known
    generations (current + superseded) are never touched."""
    import os

    from moloch_spark.operators import retrieval as R
    from moloch_spark.sources.alias import sweep_orphan_index_generations

    corpus = spark.createDataFrame(
        [(i, f"w{i % 5} body") for i in range(20)], ["doc_id", "text"]
    )
    a = str(tmp_path / "o.alias")
    g1 = orphan = None
    try:
        g1 = R.build_bm25_index(spark, corpus, "t_orphfam",
                                str(tmp_path / "f"), buckets=4, alias_path=a)
        # forge the crashed build: a fresh generation, no alias PUT
        orphan = R.build_bm25_index(
            spark, corpus, "t_orphfam_gdead00", str(tmp_path / "f_gdead00"),
            buckets=4,
        )
        assert orphan == "t_orphfam_gdead00"
        fam = ("postings", "dl", "stats")
        # young: protected (may be an in-flight build)
        assert sweep_orphan_index_generations(
            spark, a, "t_orphfam", fam, retain_s=3600
        ) == []
        assert spark.catalog.tableExists("t_orphfam_gdead00_postings")
        # audit, then reclaim past the grace
        assert sweep_orphan_index_generations(
            spark, a, "t_orphfam", fam, retain_s=0, dry_run=True
        ) == [orphan]
        assert spark.catalog.tableExists(f"{orphan}_postings")
        assert sweep_orphan_index_generations(
            spark, a, "t_orphfam", fam, retain_s=0
        ) == [orphan]
        assert not spark.catalog.tableExists(f"{orphan}_postings")
        assert not os.path.exists(str(tmp_path / "f_gdead00_postings"))
        # the alias-known generation survives at retain_s=0
        assert spark.catalog.tableExists(f"{g1}_postings")
    finally:
        for p in (g1, orphan):
            if p:
                for t in ("postings", "dl", "stats"):
                    spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_serving_requires_prefix_or_alias(spark):
    """ADVICE r8: both indexed serving functions fail FAST with a clear
    contract error when neither table_prefix nor alias_path is given,
    instead of an opaque 'Table None_postings not found' later."""
    from moloch_spark.operators import retrieval as R
    from moloch_spark.operators import similarity as S

    q = spark.createDataFrame([(1, "w")], ["query_id", "qterm"])
    with pytest.raises(ValueError, match="table_prefix or alias_path"):
        R.bm25_topk_indexed(spark, None, q)
    qe = spark.createDataFrame(
        [(1, [0.0] * 64)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="table_prefix or alias_path"):
        S.ann_index_search(spark, qe, None)


def test_sweep_orphan_ages_on_newest_family_activity(spark, tmp_path):
    """The in-flight-build grace gates on the NEWEST mtime across ALL
    family tables (ADVICE r8): a build whose postings table aged past
    retain_s but whose dl/stats are still being written must be
    protected — gating on the first resolvable table alone is the
    vacuum_store in-flight-writer bug one level up. Once EVERY table
    has aged, the orphan is reclaimed."""
    import os
    import time as _time

    from moloch_spark.operators import retrieval as R
    from moloch_spark.sources.alias import sweep_orphan_index_generations

    corpus = spark.createDataFrame(
        [(i, f"w{i % 5} body") for i in range(20)], ["doc_id", "text"]
    )
    a = str(tmp_path / "o.alias")
    fam = ("postings", "dl", "stats")
    g1 = orphan = None
    try:
        g1 = R.build_bm25_index(spark, corpus, "t_agefam",
                                str(tmp_path / "f"), buckets=4, alias_path=a)
        orphan = R.build_bm25_index(
            spark, corpus, "t_agefam_gmid00", str(tmp_path / "f_gmid00"),
            buckets=4,
        )
        old = _time.time() - 7200
        # postings aged 2h ago, dl/stats fresh: the family's newest
        # activity is NOW, so a 1h grace must protect it
        os.utime(str(tmp_path / "f_gmid00_postings"), (old, old))
        assert sweep_orphan_index_generations(
            spark, a, "t_agefam", fam, retain_s=3600
        ) == []
        assert spark.catalog.tableExists(f"{orphan}_postings")
        # every table aged: reclaimable
        for t in fam:
            os.utime(str(tmp_path / f"f_gmid00_{t}"), (old, old))
        assert sweep_orphan_index_generations(
            spark, a, "t_agefam", fam, retain_s=3600
        ) == [orphan]
        assert not spark.catalog.tableExists(f"{orphan}_postings")
    finally:
        for p in (g1, orphan):
            if p:
                for t in fam:
                    spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_sweep_orphan_defers_when_unageable(spark, tmp_path, monkeypatch):
    """When NO family table location resolves (e.g. DESCRIBE FORMATTED
    failed transiently for every table), the sweep must DEFER the
    generation to the next sweep — dropping blind would delete an
    in-flight build's catalog entries, the exact fail-unsafe branch
    ADVICE r8 flagged."""
    from moloch_spark.operators import retrieval as R
    from moloch_spark.sources import alias as A

    corpus = spark.createDataFrame(
        [(i, f"w{i % 5} body") for i in range(20)], ["doc_id", "text"]
    )
    a = str(tmp_path / "o.alias")
    fam = ("postings", "dl", "stats")
    g1 = orphan = None
    try:
        g1 = R.build_bm25_index(spark, corpus, "t_unagefam",
                                str(tmp_path / "f"), buckets=4, alias_path=a)
        orphan = R.build_bm25_index(
            spark, corpus, "t_unagefam_gblind0",
            str(tmp_path / "f_gblind0"), buckets=4,
        )
        monkeypatch.setattr(A, "_table_location", lambda *_: None)
        assert A.sweep_orphan_index_generations(
            spark, a, "t_unagefam", fam, retain_s=0
        ) == []
        assert spark.catalog.tableExists(f"{orphan}_postings")
    finally:
        for p in (g1, orphan):
            if p:
                for t in fam:
                    spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


@pytest.mark.parametrize("seed", [5, 99, 20260816])
def test_alias_lifecycle_randomized_model_check(tmp_path, seed):
    """Seeded random sequences of swap / rollback / no-op re-point /
    vacuum (zero and infinite retention) against a pure-Python model
    of the documented semantics. Invariants after every op: resolve
    returns the model's current prefix; the drained-prefix audit
    equals the model's distinct non-current history; a zero-retention
    vacuum reclaims exactly the model's distinct non-current prefixes
    and empties their history; an infinite-retention vacuum reclaims
    nothing. Pure fs level (tables=() — catalog reclaim is pinned by
    the dedicated tests), so 60 ops run in milliseconds."""
    import random

    from moloch_spark.sources.alias import (
        superseded_index_prefixes,
        vacuum_index_alias,
    )

    rng = random.Random(seed)
    a = str(tmp_path / "m.alias")
    current = "g0000"
    history: list[str] = []          # entry prefixes, in order
    seen = ["g0000"]                 # every prefix ever created
    set_index_alias(a, current)

    def check():
        assert resolve_index_alias(a) == current
        want_drained = sorted({p for p in history if p != current})
        assert superseded_index_prefixes(a) == want_drained
        assert (
            vacuum_index_alias(a, None, (), retain_s=10**9, dry_run=True)
            == []
        )
        assert (
            vacuum_index_alias(a, None, (), dry_run=True, retain_s=0)
            == want_drained
        )

    for step in range(60):
        op = rng.random()
        if op < 0.45:                       # swap to a NEW generation
            new = f"g{step + 1:04d}"
            seen.append(new)
            history.append(current)
            current = new
            set_index_alias(a, current)
        elif op < 0.6:                      # rollback to a past prefix
            target = rng.choice(seen)
            if target != current:
                history.append(current)
                current = target
            set_index_alias(a, target)      # no-op when target==current
        elif op < 0.7:                      # no-op re-point
            set_index_alias(a, current)
        elif op < 0.85:                     # infinite retention: no-op
            assert vacuum_index_alias(a, None, (), retain_s=10**9) == []
        else:                               # drain everything reclaimable
            want = sorted({p for p in history if p != current})
            assert vacuum_index_alias(a, None, (), retain_s=0) == want
            history = [p for p in history if p == current]
        check()


def test_sweep_orphan_partial_describe_failure_defers(spark, tmp_path, monkeypatch):
    """A failed DESCRIBE on an EXISTING table is 'unageable', not
    'never written': when the codes table has aged past retain_s but
    the model table's location probe fails transiently, the family
    must be deferred — dropping it would delete a finishing build
    (the partial-probe variant of the all-failed case)."""
    import os
    import time as _time

    from moloch_spark.operators import similarity as S
    from moloch_spark.sources import alias as A

    emb = spark.createDataFrame(
        [(i, [float(i % 3), 1.0] + [0.0] * 62) for i in range(12)],
        "vec_id long, embedding array<double>",
    )
    a = str(tmp_path / "o.alias")
    fam = ("codes", "model")
    g1 = orphan = None
    try:
        g1 = S.build_ann_index(spark, emb, "t_pdffam", str(tmp_path / "f"),
                               alias_path=a)
        orphan = S.build_ann_index(
            spark, emb, "t_pdffam_ghalf00", str(tmp_path / "f_ghalf00")
        )
        old = _time.time() - 7200
        for t in fam:
            os.utime(str(tmp_path / f"f_ghalf00_{t}"), (old, old))
        real = A._table_location

        def flaky(spark_, table):
            if table.endswith("_model"):
                return None  # DESCRIBE transiently failed
            return real(spark_, table)

        monkeypatch.setattr(A, "_table_location", flaky)
        assert A.sweep_orphan_index_generations(
            spark, a, "t_pdffam", fam, retain_s=0
        ) == []
        assert spark.catalog.tableExists(f"{orphan}_codes")
        # probe recovers: now genuinely aged on every table -> reclaimed
        monkeypatch.setattr(A, "_table_location", real)
        assert A.sweep_orphan_index_generations(
            spark, a, "t_pdffam", fam, retain_s=3600
        ) == [orphan]
    finally:
        for p in (g1, orphan):
            if p:
                for t in fam:
                    spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")
