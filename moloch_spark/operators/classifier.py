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
    # the L2 norm as a WINDOW over cnt, not a groupBy+join-back: a join
    # puts cnt on BOTH sides and Spark executes the whole gram lineage
    # (explode + md5 + groupBy) twice — measured 2x featurization cost
    w = Window.partitionBy(id_col)
    t = F.sqrt(F.sum(F.col("c") * F.col("c")).over(w))
    return cnt.select(id_col, "bucket", (F.col("c") / t).alias("x"))


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
    # intercept rows come from the INPUT id sets, not from
    # labeled.distinct(): distinct over labeled would re-execute the
    # whole gram lineage a second time inside the checkpoint job
    intercept = (
        positive.select(
            F.concat(F.lit("1.0:"), F.col(id_col).cast("string")).alias("k"),
            F.lit(1.0).alias("y"),
        )
        .unionByName(
            negative.select(
                F.concat(F.lit("0.0:"), F.col(id_col).cast("string")).alias("k"),
                F.lit(0.0).alias("y"),
            )
        )
        .distinct()
        .select("k", F.lit(-1).alias("bucket"), F.lit(1.0).alias("x"), "y")
    )
    # intercept's lineage is id-only (no gram explode), so counting it
    # first is cheap and sizes the checkpoint partitions to the data
    n_examples = intercept.count()
    feats = _prepartition_feats(
        labeled.unionByName(intercept),
        _n_feat_partitions(positive.sparkSession, n_examples),
    )
    w, bias = _train_on_feats(feats, n_examples, iterations=iterations, lr=lr)
    return w, bias


def _n_feat_partitions(spark, n_examples: int) -> int:
    """Right-size the checkpointed feature table's partition count to
    the DATA (≈75 feature rows per example, target ~50K rows per
    partition ≈ 700 examples) instead of inheriting
    spark.sql.shuffle.partitions: the GD loop re-scans this table once
    per iteration, and per-iteration wall time is TASK-OVERHEAD bound
    at small partition sizes (measured 1.37 -> 0.59 s/iter going 32 ->
    8 partitions on a 5K-example table). Clamped to 4x cluster
    parallelism so a capped 100K-example table still spreads."""
    want = max(2, -(-n_examples // 700))
    return min(want, spark.sparkContext.defaultParallelism * 4)


def _prepartition_feats(feats: DataFrame, n_partitions: int | None = None) -> DataFrame:
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
        part = (
            feats.repartition(n_partitions, "k")
            if n_partitions
            else feats.repartition("k")
        )
        return part.sortWithinPartitions("k").localCheckpoint(eager=True)
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
    # AQE off for the loop: the scanned table is an already
    # right-partitioned checkpoint and every agg is <= n_buckets rows,
    # so adaptive re-planning only adds per-iteration latency
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _gd_iterations(feats, n_examples, iterations, lr, w, gsq, spark)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)


def _gd_iterations(feats, n_examples, iterations, lr, w, gsq, spark):
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
            # quantize each iteration's gradient to 12 decimals: the
            # only cross-engine nondeterminism in the whole loop is
            # summation ORDER inside the margin/gradient aggregations
            # (~1e-15 absolute); rounding three orders above that
            # firewalls the drift at every iteration boundary, so an
            # independent engine unrolling the same iterations (the
            # DuckDB oracle) reproduces the weights BIT-exactly — the
            # dsir "round weights before the doc sum" discipline
            # applied to a training loop
            g = round(r["g"] / n_examples, 12)
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
    one corpus scan with the weight table broadcast. EVERY corpus doc
    gets a row: a doc whose text yields zero grams has no feature rows,
    so a per-doc intercept row (bucket -1, weight-less, contributes 0
    to the margin) is unioned in and it scores sigmoid(bias) — the
    model's prior. ADVICE r4."""
    spark = corpus.sparkSession
    wdf = spark.createDataFrame(
        list(weights.items()) or [(0, 0.0)], ["bucket", "wv"]
    )
    feats = _doc_features(
        corpus, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    ).unionByName(
        corpus.select(
            F.col(id_col), F.lit(-1).alias("bucket"), F.lit(0.0).alias("x")
        )
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
    max_negatives: int | None = 100_000,
) -> DataFrame:
    """End-to-end GPT-3-style pass: reference slice = positives, a
    bounded SAMPLE of the rest of the corpus = negatives; train, then
    score everything. keep uses the BETTER-THAN-CHANCE rule — quality
    >= the positive class prior n_ref/n_train — because few GD
    iterations leave scores anchored near the prior; a fixed 0.5 would
    be vacuous whenever the classes are imbalanced (GPT-3's actual
    selection is likewise relative: Pareto sampling on the score, not
    a 0.5 cut).

    max_negatives bounds the TRAINING set, never the scoring set: at
    100 TB every document as a negative example would make the
    checkpointed feature table corpus-sized in executor storage and
    re-scan it once per GD iteration. GPT-3's filter likewise trains
    on a sample and scores the corpus (Brown et al. 2020 App. A). The
    sample is a deterministic hash-mod slice (xxhash64 on the id, not
    .sample()) so the training set — and hence the model — is
    identical across re-runs and repartitionings.

    When the negative pool is already within the cap, reference ∪
    rest == corpus and scoring REUSES the checkpointed training
    feature table (doc_id recovered from the training key) instead of
    featurizing the corpus a second time; when sampling engages,
    scoring is one separate corpus scan with the weights broadcast."""
    seed = "qlr:v1"
    # label by broadcast membership instead of featurizing reference
    # and rest separately: ONE gram pass over the training pool, not two
    ref_flag = F.broadcast(
        reference.select(id_col).distinct().withColumn("__ref", F.lit(1))
    )
    pool = (
        corpus.join(ref_flag, id_col, "left")
        .withColumn(
            "y", F.when(F.col("__ref").isNotNull(), F.lit(1.0)).otherwise(F.lit(0.0))
        )
        .drop("__ref")
    )
    # corpus count is a parquet-metadata read; reference count is one
    # filtered scan — cheaper than aggregating the joined pool
    n_pool = corpus.count()
    n_ref_est = reference.select(id_col).distinct().count()
    n_rest = n_pool - n_ref_est
    sampled = max_negatives is not None and n_rest > max_negatives
    if sampled:
        pool = pool.filter(
            (F.col("y") == 1.0)
            | (
                F.pmod(F.xxhash64(F.col(id_col), F.lit(9172)), F.lit(n_rest))
                < F.lit(max_negatives)
            )
        )
    n_train_est = n_ref_est + (min(n_rest, max_negatives) if sampled else n_rest)
    # the training key IS the featurization id: featurize once on
    # k = "<y>:<id>" and recover y/id by splitting. The intercept rows
    # (bucket -1, x = 1, exempt from the L2 norm) are unioned in at the
    # COUNT level so one exchange partitions counts + intercepts by k
    # together — the window norm, the per-iteration margin window and
    # the gradient agg all reuse that single layout (two exchanges
    # total in featurization: the gram groupBy and this one).
    pool = pool.withColumn(
        "k",
        F.concat(F.col("y").cast("string"), F.lit(":"), F.col(id_col).cast("string")),
    )
    g = _grams(pool, text_col=text_col, id_cols=("k",))
    cnt = (
        g.select(
            F.col("k"),
            _bucket(F.col("gram"), n_buckets=n_buckets, seed=seed).alias("bucket"),
        )
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
    )
    icnt = pool.select("k", F.lit(-1).alias("bucket"), F.lit(1.0).alias("c"))
    wk = Window.partitionBy("k")
    norm = F.sqrt(
        F.sum(F.when(F.col("bucket") == -1, 0.0).otherwise(F.col("c") * F.col("c"))).over(wk)
    )
    spark = corpus.sparkSession
    parts = _n_feat_partitions(spark, n_train_est)
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        feats = (
            cnt.unionByName(icnt)
            .repartition(parts, F.col("k"))
            .sortWithinPartitions("k")
            .select(
                "k",
                "bucket",
                F.when(F.col("bucket") == -1, 1.0)
                .otherwise(F.col("c") / norm)
                .alias("x"),
                F.split(F.col("k"), ":")[0].cast("double").alias("y"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    # count off the CHECKPOINTED table — counting `intercept` directly
    # would re-run the whole featurization lineage a second time
    counts = feats.filter(F.col("bucket") == -1).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_ref")
    ).collect()[0]
    n_all, n_ref = counts["n"], counts["n_ref"]
    w, b = _train_on_feats(feats, n_all, iterations=iterations, lr=0.5)

    if sampled:
        # training covered only a slice: score the FULL corpus in one
        # scan with the weight table broadcast
        return score_quality(
            corpus, w, b,
            text_col=text_col, id_col=id_col, n_buckets=n_buckets,
            seed=seed, keep_threshold=n_ref / max(n_all, 1),
        )

    spark = corpus.sparkSession
    wdf = spark.createDataFrame(list(w.items()) or [(0, 0.0)], ["bucket", "wv"])
    # keep the intercept rows: they contribute 0 to the margin (their
    # bucket is absent from wdf -> coalesce 0) but guarantee every pool
    # doc — including gram-less ones — appears in the output. ADVICE r4.
    scored = (
        feats
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
            # same 12-decimal gradient quantization as _gd_iterations —
            # the two implementations stay bit-identical by contract
            g = round(gs / n, 12)
            gsq[bkt] = gsq.get(bkt, 0.0) + g * g
            w[bkt] = w.get(bkt, 0.0) - lr * g / (math.sqrt(gsq[bkt]) + 1e-8)
    return {k: v for k, v in w.items() if k != -1}, w.get(-1, 0.0)
