

# ---------------------------------------------------------------------------
# PCA
# ---------------------------------------------------------------------------


def test_pca_matches_numpy(spark):
    import numpy as np

    from moloch_spark.operators import pca as P

    rng = np.random.RandomState(7)
    base = rng.randn(200, 3) @ np.array([[4, 0, 0], [0, 2, 0], [0, 0, 0.5]])
    x = np.hstack([base, np.zeros((200, 5))]) + rng.randn(200, 8) * 0.01
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(4)
    model = P.pca_fit(df, k=3)

    mean = x.mean(axis=0)
    cov = np.cov(x.T, bias=True)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    want = vecs[:, order].T.copy()
    for row in want:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    assert np.allclose(model["mean"], mean, atol=1e-9)
    assert np.allclose(model["eigvals"], vals[order], atol=1e-9)
    assert np.allclose(model["components"], want, atol=1e-6)

    out = {r.vec_id: r.pc for r in P.pca_project(df, model).collect()}
    wantp = np.round((x - mean) @ want.T, 4)
    got = np.array([out[i] for i in range(200)])
    assert np.allclose(got, wantp, atol=1e-3)


def test_pca_whiten_unit_variance(spark):
    import numpy as np

    from moloch_spark.operators import pca as P

    rng = np.random.RandomState(3)
    x = rng.randn(500, 4) * np.array([10.0, 3.0, 1.0, 0.2])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(4)
    model = P.pca_fit(df, k=4, whiten=True)
    pcs = np.array(
        [r.pc for r in P.pca_project(df, model).collect()]
    )
    v = pcs.var(axis=0)
    assert np.allclose(v, 1.0, atol=0.05)


# ---------------------------------------------------------------------------
# product quantization
# ---------------------------------------------------------------------------


def _pq_ref_encode(x, books):
    import numpy as np

    m = len(books)
    sub = len(books[0][0])
    out = []
    for s in range(m):
        B = np.asarray(books[s])
        xs = x[:, s * sub : (s + 1) * sub]
        sc = np.round((B * B).sum(axis=1)[None, :] - 2.0 * (xs @ B.T), 6)
        out.append(sc.argmin(axis=1))
    return np.stack(out, axis=1)


def test_pq_encode_matches_numpy(spark):
    import numpy as np

    from moloch_spark.operators import pq as Q

    rng = np.random.RandomState(11)
    x = rng.randn(100, 16)
    books = Q.pq_codebooks(16, 4, 8)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(3)
    got = {r.vec_id: list(r.codes) for r in Q.pq_encode(df, books).collect()}
    want = _pq_ref_encode(x, books)
    assert all(got[i] == list(want[i]) for i in range(100))


def test_pq_train_reduces_distortion(spark):
    import numpy as np

    from moloch_spark.operators import pq as Q

    rng = np.random.RandomState(5)
    x = rng.randn(300, 16) * 2.0
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(3)

    def distortion(books):
        codes = _pq_ref_encode(x, books)
        err = 0.0
        for s in range(len(books)):
            B = np.asarray(books[s])
            xs = x[:, s * 4 : (s + 1) * 4]
            err += ((xs - B[codes[:, s]]) ** 2).sum()
        return err

    d0 = distortion(Q.pq_codebooks(16, 4, 8))
    d1 = distortion(Q.pq_train(df, dim=16, m=4, n_codes=8, iters=3))
    assert d1 < d0 * 0.7


def test_pq_adc_recall_and_exact_lut(spark):
    """ADC distances must equal the numpy LUT sums exactly, and the
    top-10 must land in the query's cluster (PQ quantizes within-
    cluster vectors to the same codes, so within-cluster ORDER is
    deliberately lost — cluster membership is the recoverable
    signal)."""
    import numpy as np

    from moloch_spark.operators import pq as Q

    rng = np.random.RandomState(2)
    centers = rng.randn(10, 16) * 3
    x = np.vstack([c + rng.randn(30, 16) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(4)
    books = Q.pq_train(df, dim=16, m=4, n_codes=16, iters=3)
    out = Q.ann_pq_adc_topk(df, books, query_max_id=3, k=10).collect()

    codes = _pq_ref_encode(x, books)
    hits = 0
    for q in range(3):
        lut = []
        for s in range(4):
            B = np.asarray(books[s])
            qs = x[q, s * 4 : (s + 1) * 4]
            lut.append(np.round(((B - qs[None, :]) ** 2).sum(axis=1), 6))
        want_adc = np.round(
            sum(lut[s][codes[:, s]] for s in range(4)), 6
        )
        got = {r.did: r.adc for r in out if r.qid == q}
        for did, adc in got.items():
            assert abs(adc - want_adc[did]) < 1e-6
        cluster = set(range((q // 30) * 30, (q // 30) * 30 + 30))
        hits += len(set(got) & cluster)
    assert hits / 30 >= 0.9


def test_ivf_pq_composed_search(spark):
    """IVF-PQ must (a) only return candidates from the query's probed
    cells, (b) compute the same ADC values as flat PQ for those
    candidates, (c) recover the query's cluster on clustered data."""
    import numpy as np

    from moloch_spark.operators import pq as Q
    from moloch_spark.operators.similarity import kmeans_train

    rng = np.random.RandomState(4)
    centers = rng.randn(8, 16) * 4
    x = np.vstack([c + rng.randn(25, 16) * 0.3 for c in centers])
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(4)
    books = Q.pq_train(df, dim=16, m=4, n_codes=16, iters=2)
    cents = kmeans_train(df, n_cells=8, iters=3, dim=16)
    out = Q.ann_ivf_pq_topk(
        df, books, query_max_id=2, k=10, n_cells=8, nprobe=2, dim=16,
        centroids=cents,
    ).collect()
    flat = {
        (r.qid, r.did): r.adc
        for r in Q.ann_pq_adc_topk(df, books, query_max_id=2, k=200).collect()
    }
    hits = 0
    for r in out:
        assert abs(flat[(r.qid, r.did)] - r.adc) < 1e-9
        if r.did // 25 == r.qid // 25:
            hits += 1
    assert len(out) == 20 and hits / len(out) >= 0.9


# ---------------------------------------------------------------------------
# Persisted ANN index (VERDICT r6 #5)
# ---------------------------------------------------------------------------


def _ann_fixture(spark, n=512, dim=16, seed=11):
    import numpy as np

    rng = np.random.RandomState(seed)
    x = rng.randn(n, dim)
    return spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        ["vec_id", "embedding"],
    ).repartition(4)


def test_ann_index_serves_bit_identical_to_recompute(spark, tmp_path):
    """The persisted index is a physical layout, not a semantics change:
    ann_index_search over build_ann_index's tables must return the
    EXACT rows of the recompute path (same centroids, same scale, same
    tie-breaks) — which also inherits test_ann_recall's >=0.85 gate."""
    from moloch_spark.operators import similarity as S

    emb = _ann_fixture(spark)
    want = {
        (r.qid, r.rank): (r.did, r.qcosine)
        for r in S.ann_ivf_int8_topk(
            emb, n_cells=8, nprobe=3, dim=16
        ).collect()
    }
    try:
        S.build_ann_index(
            spark, emb, "t_annidx", str(tmp_path / "annidx"),
            n_cells=8, dim=16, buckets=8,
        )
        got_df = S.ann_index_search(
            spark, emb.filter("vec_id < 5"), "t_annidx", nprobe=3
        )
        got = {
            (r.qid, r.rank): (r.did, r.qcosine) for r in got_df.collect()
        }
        assert got == want

        # bucket pruning engages: the literal probe-cell IN hits only
        # the buckets holding those cells, never the whole codes table
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        import re

        m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
        assert m, plan
        assert int(m.group(1)) < int(m.group(2))
    finally:
        spark.sql("DROP TABLE IF EXISTS t_annidx_codes")
        spark.sql("DROP TABLE IF EXISTS t_annidx_model")


def test_ann_index_append_matches_full_build(spark, tmp_path):
    """append_ann_index folds a new batch using the PERSISTED model
    (scale + centroids) — search over build(half)+append(half) returns
    the same rows as search over build(full) with the same model; a
    re-derived scale would shift every code and break this."""
    from moloch_spark.operators import similarity as S

    emb = _ann_fixture(spark)
    first = emb.filter("vec_id < 256")
    rest = emb.filter("vec_id >= 256")
    try:
        # full build is the reference...
        S.build_ann_index(
            spark, emb, "t_annfull", str(tmp_path / "annfull"),
            n_cells=8, dim=16, buckets=8,
        )
        want = {
            (r.qid, r.rank): (r.did, r.qcosine)
            for r in S.ann_index_search(
                spark, emb.filter("vec_id < 5"), "t_annfull", nprobe=3
            ).collect()
        }
        # ...the appended index carries the FIRST half's persisted
        # model (append never re-derives it), so exact equivalence is
        # checked against a recompute pinned to that same model below;
        # vs the full-build reference only rank overlap is asserted.
        S.build_ann_index(
            spark, first, "t_annappend", str(tmp_path / "annappend"),
            n_cells=8, dim=16, buckets=8,
        )
        S.append_ann_index(spark, rest, "t_annappend", buckets=8)
        codes = spark.table("t_annappend_codes")
        assert codes.count() == 512
        assert codes.select("vec_id").distinct().count() == 512

        m_first = spark.table("t_annappend_model").first()
        got = {
            (r.qid, r.rank): (r.did, r.qcosine)
            for r in S.ann_index_search(
                spark, emb.filter("vec_id < 5"), "t_annappend", nprobe=3
            ).collect()
        }
        # equivalence against the recompute path pinned to the SAME
        # persisted (first-half) scale and centroids
        from pyspark.sql import functions as F

        scale = float(m_first["scale"])
        cents = [list(c) for c in m_first["centroids"]]
        scorer = S._cell_scores_udf(cents)
        vec = F.col("embedding").cast("array<double>")
        corpus = emb.select(
            F.col("vec_id"),
            S.int8_code_expr("embedding", scale).alias("code"),
            S._argmin_cell(scorer(vec)).alias("cell"),
        )
        q = (
            emb.filter("vec_id < 5")
            .withColumn("sc", scorer(vec))
            .select(
                F.col("vec_id").alias("qid"),
                S.int8_code_expr("embedding", scale).alias("qcode"),
                F.explode(
                    S._probe_cells(F.col("sc"), len(cents), 3)
                ).alias("pcell"),
            )
        )
        from moloch_spark.operators.dedup import cosine_expr
        from pyspark.sql import Window

        cand = corpus.join(
            F.broadcast(q),
            (F.col("cell") == F.col("pcell"))
            & (F.col("vec_id") != F.col("qid")),
        ).select(
            "qid",
            F.col("vec_id").alias("did"),
            cosine_expr(F.col("qcode"), F.col("code")).alias("qcosine"),
        )
        w = Window.partitionBy("qid").orderBy(
            F.col("qcosine").desc(), F.col("did").asc()
        )
        want_pinned = {
            (r.qid, r.rank): (r.did, r.qcosine)
            for r in cand.withColumn("rank", F.row_number().over(w))
            .filter("rank <= 10")
            .collect()
        }
        assert got == want_pinned
        # and the serving results stay high-quality: overlap with the
        # full-model reference (different scale, same data) >= 80%
        agree = sum(1 for kk in got if kk in want and got[kk][0] == want[kk][0])
        assert agree / len(want) >= 0.8
    finally:
        for t in ("t_annfull_codes", "t_annfull_model",
                  "t_annappend_codes", "t_annappend_model"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ann_index_append_stream_equals_batch_append(spark, tmp_path):
    """Continuous ANN maintenance: new vectors arriving THROUGH
    Structured Streaming (foreachBatch -> append_ann_index, one file
    per micro-batch) must leave the index byte-equivalent to the batch
    append of the same rows — same persisted model, same codes, same
    serving results."""
    from pyspark.sql import functions as F

    from moloch_spark.operators import similarity as S

    emb = _ann_fixture(spark)
    first = emb.filter("vec_id < 256")
    rest = emb.filter("vec_id >= 256")
    inbox = str(tmp_path / "inbox")
    for lo, hi in ((256, 384), (384, 512)):
        rest.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).coalesce(1).write.mode("append").parquet(inbox)
    try:
        S.build_ann_index(
            spark, first, "t_annstr_a", str(tmp_path / "a"),
            n_cells=8, dim=16, buckets=8,
        )
        S.build_ann_index(
            spark, first, "t_annstr_b", str(tmp_path / "b"),
            n_cells=8, dim=16, buckets=8,
        )
        S.append_ann_index(spark, rest, "t_annstr_a", buckets=8)
        stream = (
            spark.readStream.schema("vec_id long, embedding array<double>")
            .option("maxFilesPerTrigger", 1)
            .parquet(inbox)
        )
        q = (
            S.append_ann_index_stream(
                spark, stream, "t_annstr_b", str(tmp_path / "ckpt"),
                buckets=8,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.table("t_annstr_b_codes").count() == 512
        qs = emb.filter("vec_id < 5")
        a = sorted(
            map(tuple, S.ann_index_search(spark, qs, "t_annstr_a").collect())
        )
        b = sorted(
            map(tuple, S.ann_index_search(spark, qs, "t_annstr_b").collect())
        )
        assert a == b and len(a) == 50
    finally:
        for t in ("t_annstr_a_codes", "t_annstr_a_model",
                  "t_annstr_b_codes", "t_annstr_b_model"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_ann_stream_fold_replay_is_skipped(spark, tmp_path):
    """The ANN counterpart of the BM25 ledger test: a re-delivered
    epoch id is a no-op, a new epoch folds, and a restarted fold
    consults the same on-disk ledger."""
    from moloch_spark.operators import similarity as S
    from moloch_spark.streaming import ledger

    emb = _ann_fixture(spark)
    prefix, ckpt = "t_annledger", str(tmp_path / "ckpt")
    try:
        S.build_ann_index(
            spark, emb.filter("vec_id < 256"), prefix, str(tmp_path / "t"),
            n_cells=8, dim=16, buckets=8,
        )
        fold = S.ann_stream_fold(spark, prefix, ckpt, buckets=8)
        b1 = emb.filter("vec_id >= 256 and vec_id < 384")
        fold(b1, 0)
        assert spark.table(f"{prefix}_codes").count() == 384
        fold(b1, 0)  # replay
        assert spark.table(f"{prefix}_codes").count() == 384
        fold(emb.filter("vec_id >= 384"), 1)
        assert spark.table(f"{prefix}_codes").count() == 512
        assert ledger.committed_epoch(ckpt, prefix) == 1
        fold2 = S.ann_stream_fold(spark, prefix, ckpt, buckets=8)
        fold2(b1, 1)  # replay across restart
        assert spark.table(f"{prefix}_codes").count() == 512
    finally:
        for t in ("codes", "model"):
            spark.sql(f"DROP TABLE IF EXISTS {prefix}_{t}")


def test_repair_ann_index_restores_uniqueness(spark, tmp_path):
    """Worst-case crash recovery: the whole batch appended twice, then
    repair_ann_index rewrites a fresh prefix serving exactly what the
    uncorrupted index serves."""
    from moloch_spark.operators import similarity as S

    emb = _ann_fixture(spark)
    clean, dup, fixed = "t_annrp_clean", "t_annrp_dup", "t_annrp_fix"
    try:
        S.build_ann_index(spark, emb, clean, str(tmp_path / "c"),
                          n_cells=8, dim=16, buckets=8)
        # the corrupted twin: same full build, then one batch replayed
        # (re-encoded with the SAME persisted model, so its duplicate
        # rows are bit-identical to the ones they shadow)
        S.build_ann_index(spark, emb, dup, str(tmp_path / "d"),
                          n_cells=8, dim=16, buckets=8)
        S.append_ann_index(spark, emb.filter("vec_id >= 384"), dup,
                           buckets=8)  # the replay
        assert spark.table(f"{dup}_codes").count() == 640  # corrupted
        S.repair_ann_index(spark, dup, fixed, str(tmp_path / "f"), buckets=8)
        assert spark.table(f"{fixed}_codes").count() == 512
        qs = emb.filter("vec_id < 5")
        want = sorted(map(tuple,
                          S.ann_index_search(spark, qs, clean).collect()))
        got = sorted(map(tuple,
                         S.ann_index_search(spark, qs, fixed).collect()))
        assert got == want and len(got) == 50
    finally:
        for p in (clean, dup, fixed):
            for t in ("codes", "model"):
                spark.sql(f"DROP TABLE IF EXISTS {p}_{t}")


def test_knn_label_vote_matches_python_reference(spark):
    """knn_label_vote == a plain-Python kNN majority vote on the same
    vectors: exact cosine neighbors (self excluded, rounded ties to
    smaller did), majority label with ties to the smaller label."""
    import numpy as np

    from moloch_spark.operators import similarity as S

    rng = np.random.RandomState(5)
    X = rng.randn(80, 8)
    labels = [int(i % 3) for i in range(80)]
    emb = spark.createDataFrame(
        [(i, [float(v) for v in X[i]], labels[i]) for i in range(80)],
        ["vec_id", "embedding", "label"],
    ).repartition(4)
    got = {
        r["qid"]: (r["pred_label"], r["votes"], r["confidence"])
        for r in S.knn_label_vote(emb, query_max_id=5, k=7).collect()
    }
    for q in range(5):
        scores = []
        for d in range(80):
            if d == q:
                continue
            c = X[q] @ X[d] / (np.linalg.norm(X[q]) * np.linalg.norm(X[d]))
            scores.append((round(float(c), 4), d))
        top = sorted(scores, key=lambda t: (-t[0], t[1]))[:7]
        counts: dict[int, int] = {}
        for _, d in top:
            counts[labels[d]] = counts.get(labels[d], 0) + 1
        pred = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        assert got[q] == (pred[0], pred[1], round(pred[1] / 7.0, 4)), q


def test_knn_label_vote_ignores_unlabeled_rows(spark):
    """Unlabeled rows are the ones being labeled: they neither vote nor
    consume top-k slots — even when they are the closest vectors."""
    from moloch_spark.operators import similarity as S

    base = [1.0, 0.0, 0.0, 0.0]
    rows = [(0, base, None)]  # the unlabeled query
    # 5 unlabeled near-duplicates of the query: nearest by construction
    rows += [(10 + i, [1.0, 0.001 * (i + 1), 0.0, 0.0], None)
             for i in range(5)]
    # labeled rows, slightly farther: 3 of label 7, 2 of label 2
    rows += [(20 + i, [1.0, 0.2, 0.01 * i, 0.0], 7) for i in range(3)]
    rows += [(30 + i, [1.0, 0.3, 0.01 * i, 0.0], 2) for i in range(2)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    out = S.knn_label_vote(emb, query_max_id=1, k=5).collect()
    assert len(out) == 1
    r = out[0]
    # all 5 labeled rows vote (the 5 closer unlabeled rows don't count)
    assert (r["qid"], r["pred_label"], r["votes"]) == (0, 7, 3)
    assert r["confidence"] == 0.6


def test_knn_label_vote_indexed_agrees_with_brute(spark, tmp_path):
    """VERDICT r7 ask #2: the indexed labeler (persisted IVF+SQ8 over
    labeled rows, label as a carry column, ann_index_search neighbors,
    shared vote tail) must agree with the brute-force labeler on a
    separable fixture — the recall/agreement pin the gate's oracle
    can't express."""
    import numpy as np
    from pyspark.sql import functions as F

    from moloch_spark.operators import similarity as S

    rng = np.random.RandomState(5)
    centers = rng.randn(3, 16) * 4.0      # well-separated clusters
    rows = []
    for i in range(300):
        c = i % 3
        v = centers[c] + rng.randn(16) * 0.5
        label = None if i < 5 or i % 7 == 0 else c  # queries + holdout
        rows.append((i, [float(x) for x in v], label))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).repartition(4)
    brute = {
        r.qid: r.pred_label
        for r in S.knn_label_vote(emb, query_max_id=5).collect()
    }
    try:
        S.build_ann_index(
            spark,
            emb.filter(F.col("label").isNotNull()),
            "t_annlabel",
            str(tmp_path / "annlb"),
            n_cells=8,
            dim=16,
            buckets=8,
            carry_cols=("label",),
        )
        # the carry column rides the pruned codes scan
        assert "label" in spark.table("t_annlabel_codes").columns
        top = S.ann_index_search(
            spark, emb.filter("vec_id < 5"), "t_annlabel",
            nprobe=3, carry_cols=("label",),
        )
        assert top.columns == ["qid", "did", "qcosine", "rank", "label"]
        idx = {
            r.qid: r.pred_label
            for r in S.knn_label_vote_indexed(
                spark, emb.filter("vec_id < 5"), "t_annlabel", nprobe=3
            ).collect()
        }
    finally:
        for t in ("codes", "model"):
            spark.sql(f"DROP TABLE IF EXISTS t_annlabel_{t}")
    assert set(idx) == set(brute) == {0, 1, 2, 3, 4}
    # separable clusters: the indexed prediction must match brute
    # exactly (each query's true cluster label)
    assert idx == brute
    assert brute == {q: q % 3 for q in range(5)}
