"""Approximate-nearest-neighbor search over an embedding column.

Two paths per the scale brief:
  * brute-force cosine top-k — the correctness baseline: broadcast the
    (small) query set, ONE scan of the corpus, per-query top-k via a
    window over (query, score). At 100 TB the scan dominates and
    parallelizes linearly; no shuffle of the corpus itself beyond the
    final top-k reduction.
  * LSH-bucketed (random hyperplanes) — the scale path: each vector gets
    a deterministic sign-bucket from fixed pseudo-random hyperplanes;
    queries only compare against their bucket (and optionally
    neighboring probes). Bucketing is scan-side; the only shuffle is the
    bucket equi-join.
"""

from __future__ import annotations

import hashlib
import struct
import uuid as _uuid

import numpy as _np
import pandas as _pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from moloch_spark.operators.dedup import cosine_expr, usable_vectors


def brute_force_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_max_id: int = 5,
    k: int = 10,
    corpus: DataFrame | None = None,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Exact cosine top-k for each query vector (id < query_max_id).

    Deterministic ranking: score rounded to 4 decimals, ties broken by
    corpus id ascending. `corpus` restricts the NEIGHBOR side to a
    different frame (queries still come from `emb`) and `carry_cols`
    passes corpus columns through to the result — so a consumer that
    needs per-neighbor attributes (knn_label_vote's labels) gets them
    from the ONE scoring scan instead of re-scanning the corpus."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    q = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    src = corpus if corpus is not None else emb
    scored = (
        src.join(F.broadcast(q), F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col).alias("did"),
            cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
            *carry_cols,
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("did").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "did",
            "cosine",
            F.col("rank").cast("long").alias("rank"),
            *carry_cols,
        )
    )


def int8_quant_model(
    emb: DataFrame, *, vec_col: str = "embedding"
) -> float:
    """-> the single symmetric scale 127/max|x| for int8 scalar
    quantization — the standard 4x memory cut for a 100 TB vector
    corpus. ONE scalar max-abs aggregation; max is order-independent,
    so the model — unlike a mean — is bit-identical on every engine
    and partitioning. The scale must be GLOBAL and the quantization
    UNSHIFTED (code ∝ x): a per-dimension shift/scale would change the
    directions of the vectors and wreck cosine ranking (measured:
    recall@10 0.74 per-dim-shifted vs 1.0 global on the fixture);
    Faiss avoids that by decoding per-dim codes back to floats before
    the distance — pure-int scoring needs proportional codes instead.
    Returns 0.0 for an all-zero corpus (codes then all 0)."""
    # vector-op entry contract: the model must be fit on USABLE vectors
    # only — a single NaN element in a 100 TB corpus would otherwise
    # poison the global max into NaN and quantize everything to garbage
    # (callers pass raw frames here, e.g. pinned-scale rebuilds)
    emb = usable_vectors(emb, vec_col)
    m = emb.select(
        F.max(
            F.array_max(
                F.transform(
                    F.col(vec_col).cast("array<double>"), lambda x: F.abs(x)
                )
            )
        ).alias("m")
    ).first()["m"]
    return 127.0 / m if m and m > 0 else 0.0


def int8_code_expr(vec_col: str, scale: float) -> Column:
    """Column expression quantizing `vec_col` to array<int> in
    [-127, 127] with the scalar model as a literal. floor(x*s + 0.5)
    instead of round() so both engines share one IEEE-deterministic
    rounding rule (round() half-away vs half-even varies by engine)."""
    return F.transform(
        F.col(vec_col).cast("array<double>"),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x * F.lit(scale) + F.lit(0.5)).cast("int"),
            ),
        ),
    )


def int8_codes(
    emb: DataFrame,
    scale: float,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """-> (id, code array<int>): scan-side quantization (int8_code_expr)."""
    return emb.select(
        F.col(id_col), int8_code_expr(vec_col, scale).alias("code")
    )


def ann_int8_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_max_id: int = 5,
    k: int = 10,
) -> DataFrame:
    """Approximate cosine top-k over int8-quantized vectors: the scan
    carries 64 bytes per vector instead of 256/512, the dot products
    are exact integer arithmetic (no summation-order noise at all),
    and the plan shape is brute_force_topk's (broadcast query codes,
    one corpus scan, per-query window). Recall vs exact cosine is
    gated in test_ann_recall."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    scale = int8_quant_model(emb, vec_col=vec_col)
    codes = int8_codes(emb, scale, id_col=id_col, vec_col=vec_col)
    q = codes.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("qid"), F.col("code").alias("qcode")
    )
    scored = codes.join(F.broadcast(q), F.col(id_col) != F.col("qid")).select(
        "qid",
        F.col(id_col).alias("did"),
        cosine_expr(F.col("qcode"), F.col("code")).alias("qcosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("qcosine").desc(), F.col("did").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "did", "qcosine", F.col("rank").cast("long").alias("rank"))
    )


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component j of plane p is
    a symmetric value derived from md5(p:j). Fixed across engines and
    runs — the property LSH needs (same partition function everywhere).
    """
    planes = []
    for p in range(n_planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{p}:{j}".encode()).digest()
            (v,) = struct.unpack(">I", h[:4])
            row.append((v / 2**31) - 1.0)  # [-1, 1)
        planes.append(row)
    return planes


def _lsh_tokens_udf(
    planes: list[list[float]], n_tables: int, n_planes: int, *, probes: bool
):
    """Arrow-batched LSH bucketing: ONE (batch x dim) @ (dim x L*b)
    matmul per Arrow batch, then numpy bit-packing into `"table:code"`
    token strings — ``probes=True`` additionally emits every 1-bit flip
    (the multiprobe set, (1+b) tokens per table).

    Everything lives in this UDF on purpose: the earlier JVM-side
    formulation (96 sign-bit when()s composed into 12 structs, x9 for
    probes) built an expression tree so large that CATALYST ANALYSIS —
    not execution — dominated at ~5 s per query on a 2 k-row corpus.
    One scan-side UDF keeps the Spark plan tiny and the math in BLAS."""
    P = _np.asarray(planes, dtype=_np.float64)

    @F.pandas_udf("array<string>")
    def tokens(v: _pd.Series) -> _pd.Series:
        X = _np.stack(v.to_numpy()).astype(_np.float64, copy=False)
        bits = (X @ P.T) >= 0  # (n, L*b)
        out = []
        for row in bits:
            toks = []
            for t in range(n_tables):
                b = row[t * n_planes : (t + 1) * n_planes]
                code = "".join("1" if x else "0" for x in b)
                toks.append(f"{t}:{code}")
                if probes:
                    for j in range(n_planes):
                        flip = code[:j] + ("0" if code[j] == "1" else "1") + code[j + 1 :]
                        toks.append(f"{t}:{flip}")
            out.append(toks)
        return _pd.Series(out)

    return tokens


def lsh_bucket_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_max_id: int = 5,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 12,
    multiprobe: bool = True,
    dim: int = 64,
) -> DataFrame:
    """ANN: multi-table random-hyperplane LSH with 1-bit multiprobe.

    A single sign-bucket table has near-zero recall on weakly-clustered
    data (a top-10 neighbor lands in the same 8-bit bucket only if ALL
    8 hyperplanes agree), so this uses the standard L-tables union: each
    vector gets ``n_tables`` independent 8-bit codes; a candidate is any
    corpus vector sharing a (table, code) pair with the query — or, with
    ``multiprobe``, a code at Hamming distance 1 (flip each bit once).
    Measured recall@10 vs brute force on the synthetic fixture: ~0.7
    with L=12/b=8/probe=1 (vs 0.02 single-table).

    Scale shape: bucketing is scan-side (one Arrow matmul against all
    L*b planes, then JVM-side code strings); the corpus is exploded x L
    (the classic LSH space trade), queries are broadcast, so the only
    shuffles are the candidate dedup and final top-k — never n^2.
    """
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    planes = _hyperplanes(dim, n_tables * n_planes)
    vec = F.col(vec_col).cast("array<double>")
    code_fn = _lsh_tokens_udf(planes, n_tables, n_planes, probes=False)
    probe_fn = _lsh_tokens_udf(planes, n_tables, n_planes, probes=multiprobe)

    corpus = emb.select(
        F.col(id_col), F.col(vec_col), F.explode(code_fn(vec)).alias("token")
    )
    q = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.explode(probe_fn(vec)).alias("token"),
    )
    cand = (
        corpus.join(F.broadcast(q), "token")
        .filter(F.col(id_col) != F.col("qid"))
        .dropDuplicates(["qid", id_col])
    )
    scored = cand.select(
        "qid",
        F.col(id_col).alias("did"),
        cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("did").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "did", "cosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse quantizer cells + probe-limited search
# ---------------------------------------------------------------------------


def _cell_scores_udf(centroids: list[list[float]]):
    """Arrow-batched cell scorer: one (batch × dim) @ (dim × K) BLAS
    matmul per Arrow batch, returning the K per-cell L2 ranking scores
    as one array<double> column.

    This replaced a K-way unrolled aggregate(zip_with(...)) expression
    tree: that tree exceeds what codegen handles, falls back to the
    interpreter, and allocates a 64-element struct array per (row,
    cell) — ~10× slower than this UDF even at 2 K rows, and the gap
    widens with corpus size. Scan-side either way (no shuffle); scores
    round to 6 decimals so Spark, numpy and the SQL oracle argmin over
    identical values."""
    C = _np.asarray(centroids, dtype=_np.float64)
    c2 = (C * C).sum(axis=1)

    @F.pandas_udf("array<double>")
    def cell_scores(v: _pd.Series) -> _pd.Series:
        X = _np.stack(v.to_numpy()).astype(_np.float64, copy=False)
        S = _np.round(c2[None, :] - 2.0 * (X @ C.T), 6)
        return _pd.Series(list(S))

    # asNondeterministic pins ONE evaluation: the optimizer otherwise
    # pushes downstream filters on the derived probe/cell columns below
    # this node while keeping the projection copy above it — two full
    # (batch × K) matmuls per row (two ArrowEvalPython nodes in the
    # ann_ivf_* gate plans; guide §4.4). The scorer is pure; the marker
    # only stops the duplication.
    return cell_scores.asNondeterministic()


def ivf_centroids(dim: int, n_cells: int) -> list[list[float]]:
    """Deterministic pseudo-random coarse centroids (md5-seeded, same
    values in every engine/run). Stands in for a trained quantizer when
    cross-engine reproducibility matters; kmeans_train fits real ones."""
    cells = []
    for c in range(n_cells):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"ivf:{c}:{j}".encode()).digest()
            (v,) = struct.unpack(">I", h[:4])
            row.append((v / 2**31) - 1.0)
        cells.append(row)
    return cells


def _argmin_cell(sc: Column) -> Column:
    """0-based index of the smallest score; double equality is safe
    because both sides are the same rounded value, and first-match
    (array_position) breaks ties to the lowest cell id."""
    return (F.array_position(sc, F.array_min(sc)) - 1).cast("long")


def _probe_cells(sc: Column, n_cells: int, nprobe: int) -> Column:
    """The nprobe cell ids with the smallest scores (ties → lower id),
    as a tiny per-row JVM-side sort of K (score, cell) structs."""
    idx = F.sequence(F.lit(0), F.lit(n_cells - 1))
    pairs = F.transform(
        idx,
        lambda i: F.struct(
            F.element_at(sc, i + 1).alias("s"),
            i.cast("long").alias("cell"),
        ),
    )
    return F.transform(F.slice(F.array_sort(pairs), 1, nprobe), lambda p: p["cell"])


def ivf_assign(
    emb: DataFrame,
    centroids: list[list[float]],
    *,
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-cell assignment: Arrow-batched score matmul + per-row
    argmin. Scan-side, zero shuffle, no K-fold row multiplication — the
    shape that survives a 100 TB corpus. Ties break to the lowest cell
    id (|v|^2 is constant per row, so the |c|^2 - 2 v.c ranking equals
    true L2 order)."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    sc = _cell_scores_udf(centroids)(F.col(vec_col).cast("array<double>"))
    return emb.withColumn("cell", _argmin_cell(sc))


def ann_ivf_topk(
    emb: DataFrame,
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
    """IVF search: corpus vectors live in their nearest cell's inverted
    list; each query probes only its `nprobe` closest cells and runs
    exact cosine there. Corpus cost per query drops from O(n) to
    O(n * nprobe / n_cells); the only shuffle is the (bounded,
    broadcast) probe-list equi-join plus the final top-k window over
    candidates."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    cents = centroids if centroids is not None else ivf_centroids(dim, n_cells)
    scorer = _cell_scores_udf(cents)
    vec = F.col(vec_col).cast("array<double>")
    corpus = emb.withColumn("cell", _argmin_cell(scorer(vec)))

    q = (
        emb.filter(F.col(id_col) < query_max_id)
        .withColumn("sc", scorer(vec))
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qvec"),
            F.explode(_probe_cells(F.col("sc"), len(cents), nprobe)).alias("pcell"),
        )
    )
    cand = corpus.join(
        F.broadcast(q),
        (F.col("cell") == F.col("pcell")) & (F.col(id_col) != F.col("qid")),
    )
    scored = cand.select(
        "qid",
        F.col(id_col).alias("did"),
        cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("did").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "did", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ann_ivf_int8_topk(
    emb: DataFrame,
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
    """IVF + int8 composition — the clustered 100 TB layout with the 4x
    scan-bandwidth cut applied INSIDE each inverted list (the Faiss
    `IVFx,SQ8` shape): cell assignment runs on the full-precision
    vectors (the coarse quantizer sees no quantization error), the
    per-cell candidate scoring runs on int8 codes (exact integer dots,
    64 bytes/vector). Per-query corpus cost is
    O(n * nprobe / n_cells) code-bytes — both the probe pruning and the
    bandwidth cut multiply. One scan computes cell + code side by side
    (no self-join of the corpus); queries broadcast; recall vs exact
    cosine is gated in test_ann_recall."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    cents = centroids if centroids is not None else ivf_centroids(dim, n_cells)
    scale = int8_quant_model(emb, vec_col=vec_col)
    scorer = _cell_scores_udf(cents)
    vec = F.col(vec_col).cast("array<double>")
    corpus = emb.select(
        F.col(id_col),
        int8_code_expr(vec_col, scale).alias("code"),
        _argmin_cell(scorer(vec)).alias("cell"),
    )
    q = (
        emb.filter(F.col(id_col) < query_max_id)
        .withColumn("sc", scorer(vec))
        .select(
            F.col(id_col).alias("qid"),
            int8_code_expr(vec_col, scale).alias("qcode"),
            F.explode(
                _probe_cells(F.col("sc"), len(cents), nprobe)
            ).alias("pcell"),
        )
    )
    cand = corpus.join(
        F.broadcast(q),
        (F.col("cell") == F.col("pcell")) & (F.col(id_col) != F.col("qid")),
    )
    scored = cand.select(
        "qid",
        F.col(id_col).alias("did"),
        cosine_expr(F.col("qcode"), F.col("code")).alias("qcosine"),
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("qcosine").desc(), F.col("did").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "did", "qcosine", F.col("rank").cast("long").alias("rank"))
    )


# ---------------------------------------------------------------------------
# Persisted ANN serving index (VERDICT r6 #5 — the BM25-index counterpart)
# ---------------------------------------------------------------------------


def build_ann_index(
    spark,
    emb: DataFrame,
    table_prefix: str,
    path_prefix: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    dim: int = 64,
    buckets: int = 16,
    centroids: list[list[float]] | None = None,
    scale: float | None = None,
    carry_cols: tuple[str, ...] = (),
    alias_path: str | None = None,
) -> str:
    """Write the DURABLE ANN serving index — the IVF+SQ8 layout a
    100 TB vector corpus queries without re-deriving the model per
    batch (ann_ivf_int8_topk recomputes scale + cell assignment from
    the raw embeddings every call: right for a correctness gate, wrong
    as the serving shape — retrieval.build_bm25_index is the template):

      <prefix>_codes  (id, cell, code array<int>)  bucketed+sorted by cell
      <prefix>_model  (scale, centroids)           one row

    One scan encodes cell + int8 code side by side (ivf/int8 exprs are
    scan-side; the only shuffle is the bucketed write's clustering).
    Bucketing the codes by cell means a query batch's `cell IN (...)`
    probe-list predicate BUCKET-PRUNES the scan — the engine opens only
    the buckets holding the probed cells, never the whole index — and
    the within-bucket sort adds row-group min/max pruning on top. The
    model row is the entire driver/executor transfer at query time.
    `buckets` is a layout contract (appends must pass the same value).

    Rebuild atomicity — the PAVED ROAD (VERDICT r7 Missing #3) is
    `alias_path=`: the build lands in a FRESH writer-unique generation
    prefix (`{table_prefix}_g<token>`) and finishes with ONE atomic
    set_index_alias PUT; serve through
    ann_index_search(alias_path=...), which resolves once per query,
    so a racing rebuild can never mix an old model with new codes
    (same protocol as build_bm25_index). Without `alias_path` the two
    tables are dropped and recreated IN PLACE — maintenance-window
    only under live readers. Appends (the steady-state path) touch
    only the codes table and are safe against concurrent reads either
    way. Returns the (generation) table prefix actually built.

    `carry_cols` copies per-row attribute columns into the codes table
    (brute_force_topk's carry_cols, persisted): a consumer that needs
    per-neighbor attributes — knn_label_vote_indexed's labels — reads
    them from the SAME bucket-pruned scan that serves the codes,
    instead of joining the bounded top-k back against the raw corpus
    (a second corpus-sized scan at 100 TB)."""
    if alias_path is not None:
        from moloch_spark.sources.alias import set_index_alias

        token = _uuid.uuid4().hex[:8]
        gen = build_ann_index(
            spark,
            emb,
            f"{table_prefix}_g{token}",
            f"{path_prefix}_g{token}",
            id_col=id_col,
            vec_col=vec_col,
            n_cells=n_cells,
            dim=dim,
            buckets=buckets,
            centroids=centroids,
            scale=scale,
            carry_cols=carry_cols,
        )
        set_index_alias(alias_path, gen, spark)  # the commit point
        return gen
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    cents = centroids if centroids is not None else ivf_centroids(dim, n_cells)
    if scale is None:
        # derived from THIS build's rows; pass an explicit scale to pin
        # the quant model across incremental builds (a build on a
        # corpus slice followed by appends must quantize in the same
        # space the serving comparisons assume)
        scale = int8_quant_model(emb, vec_col=vec_col)
    scorer = _cell_scores_udf(cents)
    vec = F.col(vec_col).cast("array<double>")
    codes = emb.select(
        F.col(id_col),
        _argmin_cell(scorer(vec)).alias("cell"),
        int8_code_expr(vec_col, scale).alias("code"),
        *carry_cols,
    )
    spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_codes")
    (
        codes.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "cell")
        .sortBy("cell", id_col)
        .option("path", f"{path_prefix}_codes")
        .saveAsTable(f"{table_prefix}_codes")
    )
    spark.sql(f"DROP TABLE IF EXISTS {table_prefix}_model")
    (
        spark.createDataFrame(
            [(float(scale), [[float(x) for x in c] for c in cents])],
            "scale double, centroids array<array<double>>",
        )
        .write.mode("overwrite")
        .format("parquet")
        .option("path", f"{path_prefix}_model")
        .saveAsTable(f"{table_prefix}_model")
    )
    _stamp_model_rev(spark, table_prefix)
    _drop_model_cache(table_prefix)  # in-place rebuild invalidates
    return table_prefix


_MODEL_CACHE: dict[tuple[str, str], tuple[float, list[list[float]]]] = {}


def _stamp_model_rev(spark, table_prefix: str) -> None:
    """Stamp a fresh `moloch.model_rev` into the model table's
    properties — bumped by EVERY model writer. The rev is part of the
    read cache's key, so an in-place rebuild at the SAME path done by
    ANOTHER process (same location, new content) still invalidates
    this process's cache on the next read — the retrieval stats-props
    pattern applied to cache coherence (ADVICE r10)."""
    spark.sql(
        f"ALTER TABLE {table_prefix}_model SET TBLPROPERTIES ("
        f"'moloch.model_rev' = '{_uuid.uuid4().hex}')"
    )


def _model_fingerprint(spark, table_prefix: str) -> str:
    """location + rev of the model table — driver-side catalog lookups
    only, no executor job. Raises if the catalog has no Location for
    the table (an anonymous/managed anomaly would otherwise weaken the
    cache key to rev-only)."""
    loc = None
    for r in spark.sql(
        f"DESCRIBE TABLE EXTENDED {table_prefix}_model"
    ).collect():
        if r["col_name"] == "Location":
            loc = r["data_type"]
            break
    if not loc:
        raise RuntimeError(
            f"{table_prefix}_model has no storage Location in the "
            "catalog — refusing to cache a model with a weak key"
        )
    rev = ""
    for r in spark.sql(
        f"SHOW TBLPROPERTIES {table_prefix}_model"
    ).collect():
        if r["key"] == "moloch.model_rev":
            rev = r["value"]
            break
    return f"{loc}#{rev}"


def _read_model(spark, table_prefix: str) -> tuple[float, list[list[float]]]:
    """(scale, centroids) for a generation prefix, memoized per process
    — the model row is immutable for a prefix's lifetime (appends
    encode with it VERBATIM by contract; rebuilds land in a fresh
    prefix on the alias road), so every serve after the first skips
    the 1-row model job (the retrieval._index_stats analog). The
    writers (build_ann_index in-place path, repair_ann_index) pop
    their entry, and the location in the key re-misses when a prefix
    is re-created at a new path."""
    key = (table_prefix, _model_fingerprint(spark, table_prefix))
    hit = _MODEL_CACHE.get(key)
    if hit is not None:
        return hit
    m = spark.table(f"{table_prefix}_model").first()
    val = (float(m["scale"]), [list(c) for c in m["centroids"]])
    _MODEL_CACHE[key] = val
    return val


def _drop_model_cache(table_prefix: str) -> None:
    for k in [k for k in _MODEL_CACHE if k[0] == table_prefix]:
        _MODEL_CACHE.pop(k, None)


def append_ann_index(
    spark,
    new_emb: DataFrame,
    table_prefix: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: int = 16,
    carry_cols: tuple[str, ...] = (),
) -> None:
    """Fold newly ingested vectors into the index WITHOUT rebuilding —
    the append_bm25_index analog. The new batch is encoded with the
    PERSISTED model (scale + centroids): re-deriving either would put
    old and new codes in different quantization/cell spaces and corrupt
    every cross-batch comparison, so the model is read back and applied
    verbatim; the encode cost is one scan of the NEW batch only, landed
    as a bucketed append (pruning layout unchanged). Re-train the model
    (full build) when drift warrants it — the Faiss re-train cadence
    decision, not an append-time one. Contract: new ids are not already
    indexed, `buckets` matches the build."""
    new_emb = usable_vectors(new_emb, vec_col)  # vector-op entry contract
    scale, cents = _read_model(spark, table_prefix)
    scorer = _cell_scores_udf(cents)
    vec = F.col(vec_col).cast("array<double>")
    codes = new_emb.select(
        F.col(id_col),
        _argmin_cell(scorer(vec)).alias("cell"),
        int8_code_expr(vec_col, scale).alias("code"),
        *carry_cols,  # layout contract: must match the build's set
    )
    (
        codes.write.mode("append")
        .format("parquet")
        .bucketBy(buckets, "cell")
        .sortBy("cell", id_col)
        .saveAsTable(f"{table_prefix}_codes")
    )


def append_ann_index_stream(
    spark,
    new_emb_stream,
    table_prefix: str,
    checkpoint: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: int = 16,
):
    """Continuous ANN index maintenance — the append_bm25_index_stream
    counterpart (retrieval.py:262): each micro-batch of newly ingested
    vectors folds into the durable codes table via append_ann_index
    (one encode scan of the batch with the PERSISTED model, bucketed
    append — the pruning layout and every existing code are untouched).
    Returns the writeStream handle; start with
    .trigger(availableNow=True) for catch-up or a processingTime
    trigger for steady ingest.

    Delivery contract mirrors the BM25 stream fold (retrieval.py):
    EXACTLY-ONCE for a re-delivered epoch — the checkpoint-dir epoch
    ledger (streaming/ledger.py) records each folded epoch and the
    fold skips replays. The single codes-table append is one parquet
    job (all-or-nothing at job commit), so the only residual window is
    a crash between that commit and the ledger PUT; restart then
    re-appends the batch once and repair_ann_index (dropDuplicates on
    vec_id into a fresh prefix) restores uniqueness. foreachBatch
    hands the batch a CLONED session; the fold encodes there (the
    model read is per-batch but one row), then refreshes the SERVING
    session's cached file listing so queries see the appended codes."""
    fold = ann_stream_fold(
        spark,
        table_prefix,
        checkpoint,
        id_col=id_col,
        vec_col=vec_col,
        buckets=buckets,
    )
    return (
        new_emb_stream.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
    )


def ann_stream_fold(
    spark,
    table_prefix: str,
    checkpoint: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    buckets: int = 16,
):
    """The (batch, epoch_id) callable append_ann_index_stream hands to
    foreachBatch, exposed so the replay/skip semantics are directly
    testable: consult the epoch ledger, fold, advance the ledger."""
    from moloch_spark.streaming import ledger

    def fold(batch, epoch_id):
        if batch.isEmpty():
            return
        if epoch_id <= ledger.committed_epoch(checkpoint, table_prefix, spark):
            return  # re-delivered epoch: already folded, skip
        append_ann_index(
            batch.sparkSession,
            batch,
            table_prefix,
            id_col=id_col,
            vec_col=vec_col,
            buckets=buckets,
        )
        ledger.record_epoch(checkpoint, table_prefix, epoch_id, spark)
        spark.catalog.refreshTable(f"{table_prefix}_codes")

    return fold


def repair_ann_index(
    spark,
    src_prefix: str,
    dst_prefix: str,
    dst_path_prefix: str,
    *,
    id_col: str = "vec_id",
    buckets: int = 16,
) -> None:
    """Restore vec_id uniqueness after a crash inside a stream fold
    (see append_ann_index_stream): duplicates are whole-batch replay
    artifacts encoded with the SAME persisted model, bit-identical to
    the rows they shadow, so dropDuplicates on the id is an exact
    repair. Rewrites codes into a FRESH prefix (same cell bucketing)
    and copies the model row; readers switch over — the rebuild-
    atomicity guidance build_ann_index documents. Cost: one scan of
    the codes table (no re-encode of the corpus)."""
    for t in ("codes", "model"):
        spark.sql(f"DROP TABLE IF EXISTS {dst_prefix}_{t}")
    codes = spark.table(f"{src_prefix}_codes").dropDuplicates([id_col])
    (
        codes.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "cell")
        .sortBy("cell", id_col)
        .option("path", f"{dst_path_prefix}_codes")
        .saveAsTable(f"{dst_prefix}_codes")
    )
    (
        spark.table(f"{src_prefix}_model")
        .write.mode("overwrite")
        .format("parquet")
        .option("path", f"{dst_path_prefix}_model")
        .saveAsTable(f"{dst_prefix}_model")
    )
    _stamp_model_rev(spark, dst_prefix)
    _drop_model_cache(dst_prefix)


def ann_index_search(
    spark,
    queries: DataFrame,
    table_prefix: str | None,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nprobe: int = 4,
    carry_cols: tuple[str, ...] = (),
    alias_path: str | None = None,
) -> DataFrame:
    """Serve top-k from the persisted index: read the one-row model,
    encode ONLY the query batch (cells from full-precision vectors,
    codes from the persisted scale — exactly the build-side split), and
    scan the codes table with the probe cells as a LITERAL `IN` so the
    bucketed layout prunes at the scan (a join key alone would not
    bucket-prune). The probe-cell collect is bounded by |queries| ×
    nprobe — a query-batch-sized transfer, same contract as
    retrieval.bm25_topk_indexed's term list. Per-query corpus cost is
    O(n · nprobe / n_cells) code-bytes over only the probed buckets.
    Output matches ann_ivf_int8_topk: (qid, did, qcosine, rank), plus
    any `carry_cols` persisted into the codes table at build time
    (per-neighbor attributes off the same pruned scan).

    `alias_path` is the paved road for rebuild-safe serving (VERDICT
    r7 Missing #3): resolved ONCE here, so the model and codes reads
    always come from the same generation — pass it instead of
    `table_prefix` when builds go through
    build_ann_index(alias_path=...)."""
    if alias_path is not None:
        from moloch_spark.sources.alias import resolve_index_alias

        table_prefix = resolve_index_alias(alias_path, spark)
    if table_prefix is None:
        raise ValueError(
            "ann_index_search: pass table_prefix or alias_path"
        )
    queries = usable_vectors(queries, vec_col)  # vector-op entry contract
    scale, cents = _read_model(spark, table_prefix)
    scorer = _cell_scores_udf(cents)
    vec = F.col(vec_col).cast("array<double>")
    q = (
        queries.withColumn("sc", scorer(vec))  # UDF column first: a
        # pandas UDF can't sit inside _probe_cells' lambda tree
        .select(
            F.col(id_col).alias("qid"),
            int8_code_expr(vec_col, scale).alias("qcode"),
            F.explode(
                _probe_cells(F.col("sc"), len(cents), nprobe)
            ).alias("pcell"),
        )
        .localCheckpoint(eager=True)
    )
    probe_cells = sorted(
        r["pcell"] for r in q.select("pcell").distinct().collect()
    )
    codes = spark.table(f"{table_prefix}_codes").filter(
        F.col("cell").isin(probe_cells)
    )
    cand = codes.join(
        F.broadcast(q),
        (F.col("cell") == F.col("pcell")) & (F.col(id_col) != F.col("qid")),
    )
    scored = cand.select(
        "qid",
        F.col(id_col).alias("did"),
        cosine_expr(F.col("qcode"), F.col("code")).alias("qcosine"),
        *carry_cols,
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("qcosine").desc(), F.col("did").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "qid",
            "did",
            "qcosine",
            F.col("rank").cast("long").alias("rank"),
            *carry_cols,
        )
    )


def kmeans_train(
    emb: DataFrame,
    *,
    vec_col: str = "embedding",
    n_cells: int = 8,
    iters: int = 5,
    dim: int = 64,
) -> list[list[float]]:
    """Lloyd's iterations as DataFrame jobs: broadcast centroid
    literals -> per-row argmin assignment (scan-side) -> new centroids
    via posexplode + (cell, pos) mean. Per iteration: one scan + one
    K*dim-sized aggregation; the only driver transfer is the K*dim
    model itself. Empty cells keep their previous centroid."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    cents = ivf_centroids(dim, n_cells)
    for _ in range(iters):
        assigned = ivf_assign(emb, cents, vec_col=vec_col)
        means = (
            assigned.select(
                "cell", F.posexplode(F.col(vec_col).cast("array<double>"))
            )
            .groupBy("cell", "pos")
            .agg(F.avg("col").alias("m"))
            .collect()
        )
        new = [list(c) for c in cents]
        for r in means:
            new[r.cell][r.pos] = r.m
        cents = new
    return cents


def knn_label_vote(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_max_id: int = 5,
    k: int = 10,
) -> DataFrame:
    """Weak labeling by nearest-neighbor vote — the label-densification
    step semi-supervised curation pipelines run (label a large corpus
    from a labeled seed set by majority vote of each point's k nearest
    labeled neighbors; also the standard kNN probe for embedding-space
    quality). Each query vector's prediction is the majority label
    among its k exact-cosine nearest LABELED neighbors (self and
    NULL-label rows excluded — unlabeled rows are the ones being
    labeled, so they neither vote nor consume top-k slots); vote ties
    break to the smaller label. Emits (qid, pred_label, votes,
    confidence = votes/k).

    Scale shape: the top-k comes from brute_force_topk's gate form
    (bounded query batch broadcast against ONE corpus scan restricted
    to labeled rows, the labels carried through that same scan — no
    second corpus pass for the vote). At 100 TB serve the neighbors
    from the persisted IVF+SQ8 index instead: knn_label_vote_indexed
    runs the SAME vote tail over ann_index_search neighbors."""
    emb = usable_vectors(emb, vec_col)  # vector-op entry contract
    top = brute_force_topk(
        emb, id_col=id_col, vec_col=vec_col,
        query_max_id=query_max_id, k=k,
        corpus=emb.filter(F.col(label_col).isNotNull()),
        carry_cols=(label_col,),
    )
    return _label_vote_tail(top, label_col, k)


def _label_vote_tail(top: DataFrame, label_col: str, k: int) -> DataFrame:
    """Majority vote over a (qid, ..., label) neighbor frame — the one
    vote definition shared by the brute-force and the indexed labeler
    (forking it would let the two paths silently diverge). Input is
    bounded (|queries| × k rows), so the groupBy/window tail is
    corpus-size-independent. Vote ties break to the smaller label."""
    votes = top.groupBy("qid", label_col).agg(
        F.count(F.lit(1)).alias("votes")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("votes").desc(), F.col(label_col).asc()
    )
    return (
        votes.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") == 1)
        .select(
            "qid",
            F.col(label_col).cast("int").alias("pred_label"),
            F.col("votes").cast("long").alias("votes"),
            F.round(F.col("votes") / F.lit(float(k)), 4).alias("confidence"),
        )
    )


def knn_label_vote_indexed(
    spark,
    queries: DataFrame,
    table_prefix: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 10,
    nprobe: int = 4,
    alias_path: str | None = None,
) -> DataFrame:
    """knn_label_vote served from the persisted IVF+SQ8 index — the
    100 TB composition VERDICT r7 Missing #2 asked for (reference
    analog: every serving query goes through the index, viewer/db.js).
    The index must have been built over the LABELED rows only with the
    label persisted as a carry column (build_ann_index(
    emb.filter(label IS NOT NULL), ..., carry_cols=(label_col,))):
    neighbor candidates then come off the bucket-pruned codes scan
    with their labels in the same rows — no second corpus pass, no
    join back to the raw embeddings — and the vote tail is the exact
    `_label_vote_tail` the brute-force labeler runs. Neighbor quality
    (hence label agreement) inherits ann_index_search's recall
    characteristics; test_similarity pins agreement against the
    brute-force labeler on the fixture."""
    top = ann_index_search(
        spark,
        queries,
        table_prefix,
        id_col=id_col,
        vec_col=vec_col,
        k=k,
        nprobe=nprobe,
        carry_cols=(label_col,),
        alias_path=alias_path,
    )
    return _label_vote_tail(top, label_col, k)
