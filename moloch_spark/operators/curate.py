"""Dataset-curation operators for training-data pipelines: deterministic
splits, reproducible global shuffle, sequence packing.

These are the curation steps between dedup/quality-filter and tokenizer
in an LLM data pipeline. Everything is *content-addressed* (seeded md5
of the document id), never RNG-based:

  * re-runs give identical splits/order (auditable, resumable);
  * split membership is stable under corpus growth — adding documents
    never moves an existing one between train and test (the property
    that prevents eval contamination across dataset versions);
  * Spark and the SQL oracle agree bit-for-bit (no engine RNG).

Scale design: the global shuffle order and the packing prefix-sum are
the only "inherently sequential" steps, so they use a two-phase rank:
the md5 key's first byte pre-buckets rows (256 buckets — a PREFIX of
the sort key, so bucket-major order == global key order); ranks are
computed per-bucket with a partitioned window, then shifted by
broadcast per-bucket offsets. No single-partition window ever sees the
corpus — the only global structure is the 256-row offset table. At
100 TB that is 256 parallel sorts of ~0.4% of the data each plus one
tiny broadcast, instead of one impossible full sort on one executor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def shuffle_key(id_col: Column, seed: str) -> Column:
    """Seeded content-addressed sort key (md5 hex; both engines agree)."""
    return F.md5(F.concat(F.lit(seed + ":"), id_col.cast("string")))


def split_bucket(id_col: Column, seed: str = "split:v1") -> Column:
    """Basis-point bucket in [0, 10000): 28-bit md5 prefix mod 1e4
    (same universal-hash base as the MinHash family, exact in BIGINT
    on both engines)."""
    h = F.conv(shuffle_key(id_col, seed).substr(1, 7), 16, 10).cast("long")
    return h % 10000


def assign_split(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    weights_bp: list[tuple[str, int]] = (
        ("train", 9000),
        ("val", 500),
        ("test", 500),
    ),
    seed: str = "split:v1",
) -> DataFrame:
    """Add a `split` column. Weights are basis points (must sum to
    10000) — integer thresholds, no float boundary ambiguity.
    Scan-side; zero shuffle."""
    assert sum(w for _, w in weights_bp) == 10000
    b = split_bucket(F.col(id_col), seed)
    edge = 0
    expr = None
    for name, w in weights_bp:
        edge += w
        expr = (
            F.when(b < edge, name) if expr is None else expr.when(b < edge, name)
        )
    return df.withColumn("split", expr)


def _two_phase_rank(
    df: DataFrame, id_col: str, seed: str, *, value_col: Column | None = None
) -> DataFrame:
    """Shared core: bucket-prefix two-phase global ordering.

    Adds `_key` (md5 sort key), `shuffle_rank` (1-based global rank in
    key order) and, when value_col is given, `_gsum` (exclusive global
    prefix sum of value_col in the same order)."""
    key = shuffle_key(F.col(id_col), seed)
    d = df.withColumn("_key", key).withColumn(
        "_b", F.conv(F.col("_key").substr(1, 2), 16, 10).cast("int")
    )
    aggs = [F.count(F.lit(1)).alias("_n")]
    if value_col is not None:
        d = d.withColumn("_v", value_col)
        aggs.append(F.sum("_v").alias("_vsum"))
    per_bucket = d.groupBy("_b").agg(*aggs)
    # 256-row prefix sums — constant-size regardless of corpus scale
    wb = Window.orderBy("_b").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "_b",
        F.coalesce(F.sum("_n").over(wb), F.lit(0)).alias("_off"),
        *(
            [F.coalesce(F.sum("_vsum").over(wb), F.lit(0)).alias("_voff")]
            if value_col is not None
            else []
        ),
    )
    w = Window.partitionBy("_b").orderBy("_key", id_col)
    out = d.join(F.broadcast(offsets), "_b").withColumn(
        "shuffle_rank", (F.col("_off") + F.row_number().over(w)).cast("long")
    )
    if value_col is not None:
        cum_excl = F.coalesce(
            F.sum("_v").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0),
        )
        out = out.withColumn("_gsum", (F.col("_voff") + cum_excl).cast("long"))
    return out


def global_shuffle(
    df: DataFrame, *, id_col: str = "doc_id", seed: str = "shuffle:v1"
) -> DataFrame:
    """Reproducible global shuffle: 1-based `shuffle_rank` in seeded-md5
    order. Equivalent to ORDER BY md5(seed:id) but distributed (see
    module docstring)."""
    return _two_phase_rank(df, id_col, seed).drop("_key", "_b", "_off")


def pack_sequences(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    tokens_col: Column | None = None,
    seq_len: int = 4096,
    seed: str = "pack:v1",
) -> DataFrame:
    """Concat-and-chunk packing: documents are laid out in reproducible
    shuffle order and cut into fixed `seq_len` token windows — the
    standard LLM pretraining packing step. Adds `shuffle_rank`,
    `start_tok` (global token offset of this document) and `chunk_id`
    (which training sequence the document starts in).

    tokens_col defaults to greatest(1, n_chars/4) — the chars/4
    heuristic; swap in a real tokenizer count column when available.
    """
    tokens = (
        tokens_col
        if tokens_col is not None
        else F.greatest(F.lit(1), (F.col("n_chars") / 4).cast("long"))
    )
    out = _two_phase_rank(df, id_col, seed, value_col=tokens)
    return (
        out.withColumn("start_tok", F.col("_gsum"))
        .withColumn("chunk_id", (F.col("start_tok") / seq_len).cast("long"))
        .drop("_key", "_b", "_off", "_voff", "_v", "_gsum")
    )


def weighted_sample(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    keep_prob: Column | None = None,
    seed: str = "sample:v1",
) -> DataFrame:
    """Deterministic importance sampling: keep a row iff its seeded
    md5 bucket (uniform in [0,1) at 1e-4 resolution) falls under its
    per-row keep probability — e.g. quality-weighted downsampling where
    high-quality documents survive at higher rates. Content-addressed
    like the other curation ops: re-runs and engines agree row-for-row,
    and membership is stable under corpus growth. Scan-side, zero
    shuffle. keep_prob defaults to least(1, n_chars/400) — longer docs
    kept preferentially; pass any [0,1] Column (a model score, a
    language weight) instead."""
    p = (
        keep_prob
        if keep_prob is not None
        else F.least(F.lit(1.0), F.col("n_chars") / 400.0)
    )
    u = split_bucket(F.col(id_col), seed) / 10000.0
    return df.filter(u < p)


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    total: int,
    *,
    domain_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix:v1",
) -> DataFrame:
    """Domain-weighted dataset mixing: draw ~``total`` rows with each
    domain's share proportional to its weight — the data-mixture step
    every pre-training pipeline runs (Pile/ROOTS-style sampling tables).

    Deterministic, not random: rows rank by seeded md5 within their
    domain (a partitioned window — the per-domain shuffle the rank needs
    anyway) and the top quota_d survive, where quota_d =
    floor(total * w_d / sum(w)) capped at the domain's row count (no
    redistribution of unmet quotas — intentional, so membership is
    stable when other domains grow). Re-runs and engines agree
    row-for-row; a domain missing from ``weights`` contributes nothing.
    """
    w_sum = float(sum(weights.values()))
    quota = None
    for dom, w in weights.items():
        q = int(total * float(w) / w_sum)
        quota = (quota.when if quota is not None else F.when)(
            F.col(domain_col) == dom, q
        )
    quota = quota.otherwise(F.lit(0)) if quota is not None else F.lit(0)
    return (
        _partitioned_rank(df, domain_col, id_col, seed)
        .withColumn("_q", quota)
        .filter(F.col("_rn") <= F.col("_q"))
        .drop("_q", "_rn", "_key", "_b", "_off")
    )


def _partitioned_rank(
    df: DataFrame, part_col: str, id_col: str, seed: str
) -> DataFrame:
    """Per-group md5 rank via the bucket-prefix two-phase scheme (the
    partitioned sibling of _two_phase_rank, shared by mixture_sample
    and cluster_balanced_sample): a single Window.partitionBy(group)
    would move a dominant group (the 90%-of-the-web domain, the
    boilerplate embedding cluster) to ONE partition; here ranking
    happens in (group, 256-bucket) slices and shifts by a broadcastable
    (groups x 256)-row offset table. The md5 bucket is a PREFIX of the
    sort key, so offset + local rank == the per-group rank. Adds `_rn`
    (1-based rank within part_col in seeded-md5 order) plus the
    scratch columns _key/_b/_off for the caller to drop."""
    d = df.withColumn("_key", shuffle_key(F.col(id_col), seed)).withColumn(
        "_b", F.conv(F.col("_key").substr(1, 2), 16, 10).cast("int")
    )
    per = d.groupBy(part_col, "_b").agg(F.count(F.lit(1)).alias("_n"))
    wb = (
        Window.partitionBy(part_col)
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = per.select(
        part_col, "_b", F.coalesce(F.sum("_n").over(wb), F.lit(0)).alias("_off")
    )
    w_rank = Window.partitionBy(part_col, "_b").orderBy("_key", id_col)
    return d.join(F.broadcast(offsets), [part_col, "_b"]).withColumn(
        "_rn", F.col("_off") + F.row_number().over(w_rank)
    )


def cluster_balanced_sample(
    emb: DataFrame,
    centroids: list[list[float]],
    *,
    per_cluster: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "cbal:v1",
) -> DataFrame:
    """Embedding-cluster diversity quota: assign every row to its
    nearest centroid and keep a deterministic per-cluster quota — the
    cluster-then-balance curation step (SemDeDup/DataComp-style
    pipelines cluster embeddings and cap each cluster so boilerplate-
    dense regions of embedding space can't dominate the training mix).
    mixture_sample balances by a LABEL column; this balances by
    LEARNED structure — fit real centroids with similarity.kmeans_train
    (model-sized driver transfer) or pass the deterministic
    ivf_centroids for cross-engine reproducibility.

    Ranking goes through _partitioned_rank (the scheme mixture_sample
    uses): cell assignment is scan-side (centroid literals, no
    shuffle), ranking happens in (cell, bucket) slices — a dominant
    cluster never lands on one reducer. Returns the kept rows as
    (id, cell, cluster_rank), content-addressed: membership is stable
    across re-runs, engines, and growth of OTHER clusters."""
    from moloch_spark.operators.similarity import ivf_assign

    assigned = (
        ivf_assign(emb, centroids, vec_col=vec_col)
        .select(id_col, "cell")
        # the assignment matmul is the dominant cost and feeds BOTH the
        # offset aggregation and the ranked join in _partitioned_rank —
        # materialize it once (the build_bm25_index postings pattern)
        # instead of pushing every vector through the scorer twice
        .localCheckpoint(eager=True)
    )
    return (
        _partitioned_rank(assigned, "cell", id_col, seed)
        .withColumn("cluster_rank", F.col("_rn").cast("long"))
        .filter(F.col("cluster_rank") <= per_cluster)
        .select(id_col, F.col("cell").cast("int").alias("cell"), "cluster_rank")
    )
