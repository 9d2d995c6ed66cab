"""End-to-end curation pipeline — the composed pass a training-data
run actually executes, as ONE declarative plan: quality gate → exact
(prefix-key) dedup → MinHash-LSH near-dup clustering → eval-set
decontamination. Each document gets the FIRST stage that rejected it
(or 'kept'), so the output is the full audit trail of the run.

This exists to prove the engine composes: every stage is one of the
already-gated operators (text tokens, min-per-group dedup,
lsh_candidate_pairs + connected_components, decontaminate) chained on
the SURVIVORS of the previous stage — the stage ordering (cheap row-
local filters first, pairwise work last, each on a shrinking pool) is
itself the 100 TB design: the LSH self-join and the gram semi-join
only ever see documents that survived the cheap scans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from moloch_spark.operators import dedup as D
from moloch_spark.operators.graph import connected_components
from moloch_spark.operators.text import tokens


def _checkpoint_by(df: DataFrame, key: str) -> DataFrame:
    """Hash-partition AND sort by `key` before lazily checkpointing.
    localCheckpoint captures the physical partitioning/ordering in the
    LogicalRDD, so every downstream join/groupBy/window on `key` over
    this table is satisfied with zero Exchange and zero Sort (the
    classifier._prepartition_feats pattern). AQE must be OFF while the
    checkpoint plan is compiled — under AdaptiveSparkPlanExec the
    captured LogicalRDD reports Unknown partitioning and
    EnsureRequirements re-inserts every Exchange this removes.
    Partition count scales with the cluster (defaultParallelism), not
    a constant tuned for either local mode or production."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        n = spark.sparkContext.defaultParallelism
        return (
            df.repartition(n, key)
            .sortWithinPartitions(key)
            .localCheckpoint(eager=False)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def curation_pipeline(
    corpus: DataFrame,
    eval_docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 20,
    max_words: int = 90,
    exact_prefix: int = 40,
    shingle_n: int = 3,
    decon_n: int = 13,
) -> DataFrame:
    """-> (id, stage) with stage in {quality, exact_dup, near_dup,
    contaminated, kept}: the first pipeline stage that dropped the doc.

    exact_prefix keys the exact-dedup stage on md5 of the text prefix
    (the URL-normalized / content-prefix dedup shape) rather than the
    full body; min-per-group keeps the smallest id as canonical."""
    tid, ttxt = F.col(id_col), F.col(text_col)
    base = corpus.select(tid, ttxt, F.size(tokens(text_col)).alias("_nw"))
    ok = F.col("_nw").between(min_words, max_words)
    pool1 = base.filter(ok).drop("_nw")

    key = F.md5(F.substring(ttxt, 1, exact_prefix)).alias("_k")
    keyed = pool1.select(tid, ttxt, key)
    keep = keyed.groupBy("_k").agg(F.min(tid).alias("_keep_id"))
    # lazy-materialize the keyed pool: it feeds three subtrees (the LSH
    # edge list, pool3, and the fate join) and would otherwise re-run
    # the scan+tokenize+group chain in each; partitioned by doc id so
    # the pool3 left-join and the fate join read it exchange-free
    keyed = _checkpoint_by(keyed.join(keep, "_k"), id_col)
    pool2 = keyed.filter(tid == F.col("_keep_id")).select(tid, ttxt)

    pairs = D.lsh_candidate_pairs(
        pool2, text_col=text_col, id_col=id_col, shingle_n=shingle_n
    )
    comps = connected_components(
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    ).select(F.col("node").alias(id_col), "component")
    pool3 = (
        pool2.join(comps, id_col, "left")
        .filter(F.col("component").isNull() | (F.col("component") == tid))
        .select(tid, ttxt)
    )
    _, flagged = D.decontaminate(
        pool3, eval_docs, text_col=text_col, id_col=id_col, n=decon_n
    )

    # single fate join — each stage table is computed exactly once in
    # one DAG (a per-stage UNION would re-evaluate the LSH/CC subtree
    # once per branch: measured 10.5 s -> ~4 s at sf0.1)
    fate = (
        base.join(keyed.select(tid, "_keep_id"), id_col, "left")
        .join(comps, id_col, "left")
        .join(flagged.select(tid, F.lit(True).alias("_cont")), id_col, "left")
        .select(
            tid,
            F.when(~ok, "quality")
            .when(F.col("_keep_id") != tid, "exact_dup")
            .when(
                F.col("component").isNotNull() & (F.col("component") != tid),
                "near_dup",
            )
            .when(F.col("_cont"), "contaminated")
            .otherwise("kept")
            .alias("stage"),
        )
    )
    return fate


def ccnet_pipeline(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
    train_modulus: int = 7,
) -> DataFrame:
    """The published CCNet pipeline (Wenzek et al. 2020) end-to-end as
    ONE declarative plan: (1) corpus-wide exact line dedup (drops
    repeated boilerplate lines, keep-first), (2) language ID on the
    CLEANED text, (3) a Stupid-Backoff LM trained on the cleaned
    doc_id % train_modulus == 0 slice scores every cleaned document,
    and (4) per-detected-language head/middle/tail perplexity thirds
    (integer rank arithmetic). Documents whose cleaned text has < 2
    tokens come back 'unscored' instead of vanishing — a curation run
    needs the full audit trail.

    -> (id, lines_total, lines_kept, lang_pred, log_ppl, lang_rank,
        ppl_bucket). Stage costs are the already-gated operators'
    (line_dedup / lang_id / ppl scoring shuffles); the composition adds
    only the final per-language rank."""
    from pyspark.sql import Window

    from moloch_spark.operators import lm
    from moloch_spark.operators.dedup import line_dedup
    from moloch_spark.operators.text import lang_pred_expr, with_lang_scores

    cleaned = line_dedup(docs, text_col=text_col, id_col=id_col)
    # partition the checkpointed cleaned table by doc id: every
    # downstream consumer (perplexity's per-doc mean, the scored join)
    # keys on it, so capturing hash(id)+sort removes their
    # Exchanges/Sorts (the plan carried 82 Exchanges, most of them
    # re-shuffles of this one table's lineage)
    cleaned = _checkpoint_by(
        cleaned.join(docs.select(F.col(id_col), F.col(lang_col)), id_col),
        id_col,
    )

    uni, bi = lm.train_bigram_lm(
        cleaned.filter(F.col(id_col) % train_modulus == 0),
        text_col="clean_text",
    )
    scored = lm.perplexity(cleaned, uni, bi, text_col="clean_text", id_col=id_col)

    # lang_pred is ROW-LOCAL (a staged-token stopword argmax) — compute
    # it inline on the cleaned scan instead of joining a separate
    # lang_id relation back on doc id (one zipper merge-join + sort
    # less; the former plan evaluated the cleaned lineage once more
    # just to re-attach a column it could have carried)
    base = (
        with_lang_scores(
            cleaned.select(id_col, "lines_total", "lines_kept", "clean_text"),
            "clean_text",
        )
        .select(
            id_col,
            "lines_total",
            "lines_kept",
            lang_pred_expr().alias("lang_pred"),
        )
        .join(scored.select(id_col, "log_ppl"), id_col, "left")
    )
    # rank in ONE window pass over base — no filtered copy, no join-
    # back: NULL log_ppl rows sort last within their language, so
    # row_number over the full partition equals the filtered rank for
    # every scored row (and is masked to NULL for unscored ones);
    # count("log_ppl") counts only scored rows for the thirds cut.
    w = Window.partitionBy("lang_pred").orderBy(
        F.col("log_ppl").asc_nulls_last(), F.col(id_col).asc()
    )
    wl = Window.partitionBy("lang_pred")
    scored_ok = F.col("log_ppl").isNotNull()
    ranked = (
        base.withColumn("rk", F.row_number().over(w))
        .withColumn("nl", F.count("log_ppl").over(wl))
    )
    return ranked.select(
        id_col,
        "lines_total",
        "lines_kept",
        "lang_pred",
        "log_ppl",
        F.when(scored_ok, F.col("rk")).cast("long").alias("lang_rank"),
        F.when(~scored_ok, "unscored")
        .when(F.col("rk") * 3 <= F.col("nl"), "head")
        .when(F.col("rk") * 3 <= F.col("nl") * 2, "middle")
        .otherwise("tail")
        .alias("ppl_bucket"),
    )
