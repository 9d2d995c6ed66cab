

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
