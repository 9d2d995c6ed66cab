"""Quality classifier — the GPT-3 / PaLM data-filtering shape (Brown
et al. 2020 §A: train a classifier to distinguish a curated reference
corpus from raw crawl, keep raw documents the classifier scores as
reference-like). Model: logistic regression over hashed bag-of-ngram
features (the importance.py feature space), trained IN-ENGINE by
full-batch gradient descent.

Scale shape, per training iteration: the weight vector (n_buckets
floats — a dimension) is BROADCAST; the gradient is one scan of the
labeled set — per-doc score via broadcast join + map-combined per-doc
sum, sigmoid residual, then a map-combined per-bucket sum — and the
driver receives exactly n_buckets rows (the kmeans-style bounded
transfer). Nothing iterates over the corpus driver-side and no stage
holds more than the bucket table. Scoring the full corpus afterwards
is one scan with the final broadcast weights.

Determinism: feature hashing reuses the md5-prefix idiom, training
data order never matters (gradients are commutative sums up to FP
reordering ~1e-12, absorbed by round(4) on emitted scores), and
init is all-zeros."""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

from moloch_spark.operators.importance import DEFAULT_BUCKETS, _bucket, _grams


def _doc_features(
    df: DataFrame,
    *,
    text_col: str,
    id_col: str,
    n_buckets: int,
    seed: str,
) -> DataFrame:
    """-> (id, bucket, x): L2-normalized hashed-ngram counts (each
    doc's feature vector has unit 2-norm — keeps long documents from
    dominating the gradient while leaving individual features at scale
    ~1/sqrt(distinct grams), an order of magnitude larger than L1
    normalization: margins actually move within few iterations)."""
    g = _grams(df, text_col=text_col, id_cols=(id_col,))
    cnt = (
        g.select(
            F.col(id_col),
            _bucket(F.col("gram"), n_buckets=n_buckets, seed=seed).alias("bucket"),
        )
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    tot = cnt.groupBy(id_col).agg(F.sqrt(F.sum(F.col("c") * F.col("c"))).alias("t"))
    return cnt.join(tot, id_col).select(
        id_col, "bucket", (F.col("c") / F.col("t")).alias("x")
    )


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "qlr:v1",
    iterations: int = 12,
    lr: float = 0.5,
) -> tuple[dict[int, float], float]:
    """-> (weights by bucket, bias): full-batch logistic regression,
    positive = the curated reference slice, negative = raw crawl.

    Updates are Adagrad (per-coordinate step lr*g/sqrt(sum g^2)): the
    L2-normalized gram features live at scale ~1/sqrt(doc grams) while
    the intercept lives at scale 1, so any single global step size
    either blows up the intercept or moves the gram weights glacially —
    per-coordinate scaling fixes both, and the accumulator state is
    just the driver-side dict that already holds the weights."""
    pos = _doc_features(
        positive, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    ).withColumn("y", F.lit(1.0))
    neg = _doc_features(
        negative, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    ).withColumn("y", F.lit(0.0))
    # (label, id) is the training key: the same doc may appear in both
    # slices (reference ⊂ crawl is common) without colliding. Bucket -1
    # is the INTERCEPT feature (x = 1 on every example) — folding the
    # bias into the weight table makes each GD iteration ONE action
    # (update math is identical to a separate bias term).
    labeled = pos.unionByName(neg).select(
        F.concat(
            F.col("y").cast("string"), F.lit(":"), F.col(id_col).cast("string")
        ).alias("k"),
        "bucket",
        "x",
        "y",
    )
    intercept = labeled.select(
        "k", F.lit(-1).alias("bucket"), F.lit(1.0).alias("x"), "y"
    ).distinct()
    feats = _prepartition_feats(labeled.unionByName(intercept))
    n_examples = intercept.count()
    w, bias = _train_on_feats(feats, n_examples, iterations=iterations, lr=lr)
    return w, bias


def _prepartition_feats(feats: DataFrame) -> DataFrame:
    """Hash-partition AND sort the labeled feature table by the example
    key BEFORE checkpointing it. localCheckpoint captures the physical
    partitioning/ordering in the LogicalRDD, so every GD iteration's
    per-example margin window (partitionBy k) is satisfied with ZERO
    exchange and ZERO sort — the per-iteration cost drops to one
    in-memory scan plus a 4096-row map-combined gradient agg. Without
    this the iteration loop re-shuffles and re-sorts the full feature
    table once per iteration.

    AQE must be OFF while the checkpoint plan executes: under
    AdaptiveSparkPlanExec the captured LogicalRDD reports Unknown
    partitioning (verified on 4.1 — EnsureRequirements then re-inserts
    the Exchange+Sort every iteration, exactly what this is removing);
    with AQE disabled for just this plan the checkpoint carries
    hashpartitioning(k)+sort and downstream windows/groupBys on k are
    exchange-free."""
    spark = feats.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return (
            feats.repartition("k")
            .sortWithinPartitions("k")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def _train_on_feats(
    feats: DataFrame, n_examples: int, *, iterations: int, lr: float
) -> tuple[dict[int, float], float]:
    """GD loop over a prepared (k, bucket, x, y) feature table (bucket
    -1 = intercept). Exposed so quality_filter can reuse the same
    checkpointed table for scoring."""
    w: dict[int, float] = {}
    gsq: dict[int, float] = {}
    spark = feats.sparkSession
    for _ in range(iterations):
        wdf = spark.createDataFrame(
            list(w.items()) or [(0, 0.0)], ["bucket", "wv"]
        )
        # per-example margin via a k-partitioned window instead of
        # groupBy(k) + join-back: ONE shuffle per iteration (the
        # gradient groupBy(bucket) map-combines on top of it)
        wk = Window.partitionBy("k")
        m = F.sum(F.col("x") * F.coalesce("wv", F.lit(0.0))).over(wk)
        resid = F.lit(1.0) / (F.lit(1.0) + F.exp(-m)) - F.col("y")
        grad_rows = (
            feats.join(F.broadcast(wdf), "bucket", "left")
            .select("bucket", (F.col("x") * resid).alias("xr"))
            .groupBy("bucket")
            .agg(F.sum("xr").alias("g"))
            .collect()
        )
        for r in grad_rows:
            g = r["g"] / n_examples
            gsq[r["bucket"]] = gsq.get(r["bucket"], 0.0) + g * g
            w[r["bucket"]] = w.get(r["bucket"], 0.0) - lr * g / (
                math.sqrt(gsq[r["bucket"]]) + 1e-8
            )
    return {k: v for k, v in w.items() if k != -1}, w.get(-1, 0.0)


def score_quality(
    corpus: DataFrame,
    weights: dict[int, float],
    bias: float,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "qlr:v1",
    keep_threshold: float = 0.5,
) -> DataFrame:
    """-> (id, quality, keep): sigmoid score under the trained model —
    one corpus scan with the weight table broadcast."""
    spark = corpus.sparkSession
    wdf = spark.createDataFrame(
        list(weights.items()) or [(0, 0.0)], ["bucket", "wv"]
    )
    feats = _doc_features(
        corpus, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    )
    scored = (
        feats.join(F.broadcast(wdf), "bucket", "left")
        .groupBy(id_col)
        .agg(F.sum(F.col("x") * F.coalesce("wv", F.lit(0.0))).alias("m"))
        .select(
            id_col,
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("m") + F.lit(bias)))), 4
            ).alias("quality"),
        )
    )
    return scored.withColumn("keep", F.col("quality") >= F.lit(keep_threshold))


def quality_filter(
    corpus: DataFrame,
    reference: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    iterations: int = 12,
) -> DataFrame:
    """End-to-end GPT-3-style pass: reference slice = positives, the
    rest of the corpus = negatives; train, then score everything.
    keep uses the BETTER-THAN-CHANCE rule — quality >= the positive
    class prior n_ref/n — because few GD iterations leave scores
    anchored near the prior; a fixed 0.5 would be vacuous whenever the
    classes are imbalanced (GPT-3's actual selection is likewise
    relative: Pareto sampling on the score, not a 0.5 cut).

    Since reference ∪ rest == corpus here, scoring REUSES the
    checkpointed training feature table (doc_id recovered from the
    training key) instead of featurizing the corpus a second time."""
    ref_ids = reference.select(id_col)
    rest = corpus.join(ref_ids, id_col, "left_anti")
    seed = "qlr:v1"
    pos = _doc_features(
        reference, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    ).withColumn("y", F.lit(1.0))
    neg = _doc_features(
        rest, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    ).withColumn("y", F.lit(0.0))
    labeled = pos.unionByName(neg).select(
        F.concat(
            F.col("y").cast("string"), F.lit(":"), F.col(id_col).cast("string")
        ).alias("k"),
        "bucket",
        "x",
        "y",
    )
    intercept = labeled.select(
        "k", F.lit(-1).alias("bucket"), F.lit(1.0).alias("x"), "y"
    ).distinct()
    feats = _prepartition_feats(labeled.unionByName(intercept))
    counts = intercept.groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_ref")
    ).collect()[0]
    n_all, n_ref = counts["n"], counts["n_ref"]
    w, b = _train_on_feats(feats, n_all, iterations=iterations, lr=0.5)

    spark = corpus.sparkSession
    wdf = spark.createDataFrame(list(w.items()) or [(0, 0.0)], ["bucket", "wv"])
    scored = (
        feats.filter(F.col("bucket") != -1)
        .join(F.broadcast(wdf), "bucket", "left")
        .groupBy("k")
        .agg(F.sum(F.col("x") * F.coalesce("wv", F.lit(0.0))).alias("m"))
        .select(
            F.split(F.col("k"), ":")[1].cast(corpus.schema[id_col].dataType).alias(id_col),
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("m") + F.lit(b)))), 4
            ).alias("quality"),
        )
    )
    return scored.withColumn(
        "keep", F.col("quality") >= F.lit(n_ref / max(n_all, 1))
    )


def reference_train(
    examples: list[tuple[list[tuple[int, float]], float]],
    *,
    iterations: int,
    lr: float,
    n_examples: int | None = None,
) -> tuple[dict[int, float], float]:
    """Driver-side reference implementation (same math incl. the
    intercept-as-bucket(-1) trick and Adagrad steps, plain Python) for
    tests: examples = [(sparse [(bucket, x)], y)]."""
    w: dict[int, float] = {}
    gsq: dict[int, float] = {}
    n = n_examples or len(examples)
    for _ in range(iterations):
        grad: dict[int, float] = {}
        for feats, y in examples:
            m = sum(x * w.get(bkt, 0.0) for bkt, x in feats) + w.get(-1, 0.0)
            resid = 1.0 / (1.0 + math.exp(-m)) - y
            for bkt, x in feats:
                grad[bkt] = grad.get(bkt, 0.0) + x * resid
            grad[-1] = grad.get(-1, 0.0) + resid
        for bkt, gs in grad.items():
            g = gs / n
            gsq[bkt] = gsq.get(bkt, 0.0) + g * g
            w[bkt] = w.get(bkt, 0.0) - lr * g / (math.sqrt(gsq[bkt]) + 1e-8)
    return {k: v for k, v in w.items() if k != -1}, w.get(-1, 0.0)
