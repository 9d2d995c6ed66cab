"""Product quantization (IVF-PQ's compression half) — Jegou et al.
2011, "Product Quantization for Nearest Neighbor Search": split each
embedding into M subvectors, quantize every subvector against its own
small codebook, and search with asymmetric distance computation (ADC):
the query precomputes an M x n_codes lookup table and every corpus
vector's distance is M table lookups summed — no float vector is ever
touched at query time, and the corpus index is M bytes-ish per vector
instead of dim floats. This is the memory layout that makes
billion-vector ANN fit a cluster.

Scale shape: encoding is scan-side (one Arrow matmul per subspace per
batch, zero shuffle); training is Lloyd's per subspace but batched so
every iteration remains ONE corpus scan + one model-sized (M * n_codes
* sub_dim rows) aggregation; ADC search broadcasts the per-query LUTs
(M * n_codes doubles each) and scores codes JVM-side, so the only
shuffle is the final per-query top-k window.

Determinism: the default codebooks are md5-seeded (ivf_centroids
pattern) so Spark, numpy and the SQL oracle agree bit-for-bit;
subspace ranking scores round to 6 decimals before argmin with ties to
the lowest code (the existing ANN convention)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

from moloch_spark.operators.dedup import usable_vectors


def pq_codebooks(dim: int, m: int, n_codes: int) -> list[list[list[float]]]:
    """Deterministic md5-seeded codebooks: m subspaces x n_codes codes
    x (dim/m) floats. Stands in for a trained quantizer when
    cross-engine reproducibility matters; pq_train fits real ones."""
    sub = dim // m
    books = []
    for s in range(m):
        codes = []
        for c in range(n_codes):
            row = []
            for j in range(sub):
                h = hashlib.md5(f"pq:{s}:{c}:{j}".encode()).digest()
                (v,) = struct.unpack(">I", h[:4])
                row.append((v / 2**31) - 1.0)
            codes.append(row)
        books.append(codes)
    return books


def _encode_udf(codebooks: list[list[list[float]]]):
    """Arrow-batched PQ encoder: per subspace, the ranking score
    |c|^2 - 2 v.c rounded to 6 (|v|^2 constant within a subspace row),
    argmin with first-match tie-break — the ivf_assign convention."""
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    c2 = [(b * b).sum(axis=1) for b in B]
    m = len(B)
    sub = B[0].shape[1]

    @F.pandas_udf("array<long>")
    def encode(v: pd.Series) -> pd.Series:
        X = np.stack(v.to_numpy()).astype(np.float64, copy=False)
        out = np.empty((len(X), m), dtype=np.int64)
        for s in range(m):
            xs = X[:, s * sub : (s + 1) * sub]
            scores = np.round(c2[s][None, :] - 2.0 * (xs @ B[s].T), 6)
            out[:, s] = scores.argmin(axis=1)
        return pd.Series(list(out))

    # pure function; the marker stops the optimizer duplicating the
    # m-subspace matmul below pushed-down filters (guide §4.4 — the
    # pq_encode_codes plan carried two ArrowEvalPython copies of it)
    return encode.asNondeterministic()


def pq_encode(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """-> (id, codes array<long> of length m): the compressed index."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    enc = _encode_udf(codebooks)
    return emb.select(
        F.col(id_col), enc(F.col(vec_col).cast("array<double>")).alias("codes")
    )


def pq_train(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    n_codes: int = 16,
    iters: int = 4,
) -> list[list[list[float]]]:
    """Lloyd's per subspace, ALL subspaces per scan: each iteration
    encodes the corpus once (scan-side), then recomputes every
    (sub, code, j) mean with one model-sized aggregation. Driver
    transfer per iteration = m * n_codes * sub_dim rows. Empty codes
    keep their previous centroid."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    sub = dim // m
    books = pq_codebooks(dim, m, n_codes)
    vec = F.col(vec_col).cast("array<double>")
    for _ in range(iters):
        coded = emb.select(vec.alias("v"), _encode_udf(books)(vec).alias("codes"))
        means = (
            coded.select(F.posexplode("v").alias("pos", "val"), "codes")
            .select(
                (F.col("pos") / sub).cast("int").alias("sub"),
                (F.col("pos") % sub).alias("j"),
                F.expr(f"codes[cast(pos / {sub} as int)]").alias("code"),
                "val",
            )
            .groupBy("sub", "code", "j")
            .agg(F.avg("val").alias("mean"))
            .collect()
        )
        new = [[list(c) for c in b] for b in books]
        for r in means:
            new[r["sub"]][r["code"]][r["j"]] = r["mean"]
        books = new
    return books


def ann_pq_adc_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_max_id: int = 5,
    k: int = 10,
) -> DataFrame:
    """ADC search: the bounded query set's vectors become per-query
    M x n_codes L2 lookup tables (model-sized, broadcast); every corpus
    vector is scored from its CODES alone — sum of M element_at lookups
    in JVM codegen, never touching the original floats — then one
    per-query top-k window. Approximate by construction; recall vs
    exact search is gated in tests/test_similarity.py."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    n_codes = B[0].shape[0]
    sub = B[0].shape[1]
    spark = emb.sparkSession

    qrows = (
        emb.filter(F.col(id_col) < query_max_id)
        .select(F.col(id_col), F.col(vec_col).cast("array<double>"))
        .collect()
    )
    luts = []
    for r in qrows:
        qv = np.asarray(r[1], dtype=np.float64)
        lut = np.empty(m * n_codes)
        for s in range(m):
            qs = qv[s * sub : (s + 1) * sub]
            lut[s * n_codes : (s + 1) * n_codes] = np.round(
                ((B[s] - qs[None, :]) ** 2).sum(axis=1), 6
            )
        luts.append((r[0], [float(x) for x in lut]))
    qdf = spark.createDataFrame(luts, [  # bounded: one row per query
        "qid", "lut",
    ])

    codes = pq_encode(emb, codebooks, vec_col=vec_col, id_col=id_col)
    cand = codes.crossJoin(F.broadcast(qdf)).filter(F.col(id_col) != F.col("qid"))
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            "lut", (s * n_codes + F.element_at("codes", s + 1) + 1).cast("int")
        ),
    )
    scored = cand.select(
        "qid", F.col(id_col).alias("did"), F.round(adc, 6).alias("adc")
    )
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("did").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "did", "adc", F.col("rank").cast("long").alias("rank"))
    )


def ann_ivf_pq_topk(
    emb: DataFrame,
    codebooks: list[list[list[float]]],
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_max_id: int = 5,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    dim: int = 64,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """The composed billion-scale ANN architecture (IVF-PQ, Jegou et
    al. 2011 §IV): corpus vectors live in their nearest coarse cell's
    inverted list and are stored only as PQ CODES; a query probes its
    nprobe nearest cells and ranks the candidates there by ADC — so
    query cost is (nprobe / n_cells) of the corpus in M-lookup
    arithmetic, and the index holds one `cell` int + M code bytes per
    vector. Plan: scan-side cell assign + PQ encode (zero shuffle),
    broadcast (query, probed-cell, LUT) rows, per-cell equi-join, ADC
    in codegen, salted two-phase top-k window."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    from moloch_spark.operators.similarity import (
        _argmin_cell,
        _cell_scores_udf,
        _probe_cells,
        ivf_centroids,
    )

    cents = centroids if centroids is not None else ivf_centroids(dim, n_cells)
    scorer = _cell_scores_udf(cents)
    vec = F.col(vec_col).cast("array<double>")

    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    n_codes = B[0].shape[0]
    sub = B[0].shape[1]
    enc = _encode_udf(codebooks)
    index = emb.select(
        F.col(id_col),
        _argmin_cell(scorer(vec)).alias("cell"),
        enc(vec).alias("codes"),
    )

    spark = emb.sparkSession
    # materialize the UDF scores as a COLUMN before _probe_cells: its
    # array_sort comparator is a higher-order lambda, and Spark rejects
    # a Python UDF referenced inside one (PLANS.md §21 trap class)
    qrows = (
        emb.filter(F.col(id_col) < query_max_id)
        .withColumn("sc", scorer(vec))
        .select(
            F.col(id_col).alias("qid"),
            vec.alias("qv"),
            _probe_cells(F.col("sc"), len(cents), nprobe).alias("pcells"),
        )
        .collect()
    )
    rows = []
    for r in qrows:
        qv = np.asarray(r["qv"], dtype=np.float64)
        lut = np.empty(m * n_codes)
        for s in range(m):
            qs = qv[s * sub : (s + 1) * sub]
            lut[s * n_codes : (s + 1) * n_codes] = np.round(
                ((B[s] - qs[None, :]) ** 2).sum(axis=1), 6
            )
        for cell in r["pcells"]:
            rows.append((r["qid"], int(cell), [float(x) for x in lut]))
    qdf = spark.createDataFrame(rows, ["qid", "pcell", "lut"])

    cand = index.join(
        F.broadcast(qdf),
        (F.col("cell") == F.col("pcell")) & (F.col(id_col) != F.col("qid")),
    )
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, s: acc
        + F.element_at(
            "lut", (s * n_codes + F.element_at("codes", s + 1) + 1).cast("int")
        ),
    )
    scored = cand.select(
        "qid", F.col(id_col).alias("did"), F.round(adc, 6).alias("adc")
    )
    salt = F.pmod(F.col("did"), F.lit(16))
    w1 = Window.partitionBy("qid", salt).orderBy(F.col("adc").asc(), F.col("did").asc())
    w = Window.partitionBy("qid").orderBy(F.col("adc").asc(), F.col("did").asc())
    return (
        scored.withColumn("r1", F.row_number().over(w1))
        .filter(F.col("r1") <= k)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "did", "adc", F.col("rank").cast("long").alias("rank"))
    )
