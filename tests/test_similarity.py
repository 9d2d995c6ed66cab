

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
