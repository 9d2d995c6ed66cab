"""PCA / whitening over the embedding column — the dimensionality
pre-pass of embedding pipelines (SemDeDup-style clustering dedups,
IVF-PQ index builds, and retrieval all routinely whiten or truncate
embeddings first).

Scale shape: the only distributed work is (1) the per-dimension mean
(one posexplode + map-combined groupBy(dim) — `dim` rows to the
driver) and (2) the Gram matrix, computed as PER-PARTITION numpy
X^T X partials inside mapInArrow and reduced with one map-combined
groupBy over (i, j) — exactly dim^2 rows reach the driver no matter
how many vectors there are (the treeAggregate shape). The
eigendecomposition is dim x dim on the driver (numpy), i.e. model-
sized, and projection back over the corpus is one scan with the
loading matrix broadcast into an Arrow-batched matmul.

Determinism: partial sums are FP-order sensitive at ~1e-12; eigh on a
symmetric matrix is deterministic for a given input; eigenvector SIGN
is fixed by convention (largest-|component| coordinate made positive)
so repeated fits agree. Projections are rounded to 4 decimals."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from moloch_spark.operators.dedup import usable_vectors


def gram_matrix(
    emb: DataFrame, *, vec_col: str = "embedding"
) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (sum_vec, gram, n): distributed Σx and Σ x x^T (numpy
    per-partition partials, one (i,j) map-combined shuffle, dim^2-row
    driver transfer)."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    first = emb.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("empty embedding table")
    dim = first["d"]

    def partials(batches):
        for b in batches:
            x = np.stack(b.column(0).to_pylist()).astype(np.float64)
            g = x.T @ x
            s = x.sum(axis=0)
            n = np.float64(len(x))
            i, j = np.meshgrid(np.arange(dim), np.arange(dim), indexing="ij")
            import pyarrow as pa

            yield pa.RecordBatch.from_pydict(
                {
                    "i": np.concatenate([i.ravel(), np.arange(dim), [-1]]),
                    "j": np.concatenate([j.ravel(), np.full(dim, -1), [-1]]),
                    "v": np.concatenate([g.ravel(), s, [n]]),
                }
            )

    rows = (
        emb.select(F.col(vec_col))
        .mapInArrow(partials, "i long, j long, v double")
        .groupBy("i", "j")
        .agg(F.sum("v").alias("v"))
        .collect()
    )
    gram = np.zeros((dim, dim))
    sum_vec = np.zeros(dim)
    n = 0
    for r in rows:
        if r["i"] == -1:
            n = int(r["v"])
        elif r["j"] == -1:
            sum_vec[r["i"]] = r["v"]
        else:
            gram[r["i"], r["j"]] = r["v"]
    return sum_vec, gram, n


def pca_fit(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    k: int = 8,
    whiten: bool = False,
    eps: float = 1e-9,
) -> dict:
    """-> {mean, components (k x dim), eigvals}: top-k principal
    directions of the embedding distribution. Covariance from the
    distributed Gram matrix; eigh + sign convention on the driver."""
    s, g, n = gram_matrix(emb, vec_col=vec_col)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    vals = vals[order].copy()
    # sign convention: the largest-|x| coordinate of each component is
    # made positive, so independent fits return identical loadings
    for row in comps:
        j = int(np.argmax(np.abs(row)))
        if row[j] < 0:
            row *= -1.0
    if whiten:
        comps = comps / np.sqrt(np.maximum(vals, eps))[:, None]
    return {"mean": mean, "components": comps, "eigvals": vals}


def pca_project(
    emb: DataFrame,
    model: dict,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    out_col: str = "pc",
) -> DataFrame:
    """-> (id, pc array<double>): center + project each vector onto the
    fitted components — one scan, loadings broadcast into an Arrow
    matmul, values rounded to 4 decimals."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    mean = model["mean"]
    comps = model["components"]

    @F.pandas_udf("array<double>")
    def proj(v: pd.Series) -> pd.Series:
        x = np.stack(v.to_numpy()).astype(np.float64) - mean
        p = np.round(x @ comps.T, 4)
        return pd.Series(list(p))

    return emb.select(F.col(id_col), proj(F.col(vec_col)).alias(out_col))
