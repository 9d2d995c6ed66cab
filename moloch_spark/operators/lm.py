"""N-gram language-model perplexity filtering — the CCNet quality gate
(Wenzek et al. 2020 score documents with a KenLM 5-gram model trained
on Wikipedia and keep the low-perplexity head/middle). The smoothing
here is Stupid Backoff (Brants et al. 2007, "Large Language Models in
Machine Translation" — the smoothing published specifically FOR
distributed web-scale counts: no discount renormalization pass, so the
model is just two count tables):

    S(w2 | w1) = c(w1 w2) / c(w1)          if c(w1 w2) > 0
               = 0.4 * c(w2) / N           otherwise (backoff)
               = 0.4 * floor               if w2 unseen entirely

A document's score is the mean log10 S over its bigrams; perplexity is
10^(-mean). Low perplexity == the document looks like the training
slice (CCNet keeps the lowest-perplexity fraction per language).

Scale shape: counting is two map-combined (gram) shuffles over the
TRAINING slice only (CCNet trains on a curated reference corpus, not
the crawl). The model is pruned to min_count (KenLM's --prune analog),
so the tables are broadcastable dimensions; scoring the full corpus is
then a scan-side bigram explode + two broadcast joins + one
map-combined per-doc mean — the corpus is never self-joined and
nothing scales with corpus size but the scan. At real vocabulary sizes
the bigram table may outgrow a broadcast; the joins degrade to
shuffled hash joins on the gram key and the plan is otherwise
unchanged.

Cross-engine determinism: counts are exact integers; log10 of integer
ratios is IEEE-identical in Spark and DuckDB; per-doc mean is rounded
to 4 decimals to absorb summation-order noise (importance.py
precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from moloch_spark.operators.text import tokens, word_ngrams

BACKOFF = 0.4


def train_bigram_lm(
    train: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 2,
) -> tuple[DataFrame, DataFrame]:
    """-> (unigrams (w, cnt, total), bigrams (w1w2, cnt)): the Stupid
    Backoff model of the training slice. Bigrams below min_count are
    pruned (they would be dominated by the backoff path anyway), which
    is what keeps the model dimension-table sized at scale."""
    toks = tokens(text_col)
    # lazy-materialize the raw unigram counts: the model table is
    # referenced once for `totals` here and THREE more times inside
    # perplexity() (w1 side, w2 side, the scalar N) — without the
    # checkpoint each broadcast re-runs the full training-slice
    # tokenize+explode+aggregate subtree (measured: ppl_lang_buckets'
    # plan carried 58 Exchanges, most of them these repeats). The
    # materialized table is model-sized (pruned vocab), never corpus-
    # sized, so this is the dimension-table persist the module
    # docstring promises, not a corpus cache.
    uni_counts = (
        train.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .localCheckpoint(eager=False)
    )
    totals = uni_counts.agg(F.sum("cnt").alias("total"))
    uni = uni_counts.crossJoin(F.broadcast(totals))
    bi = (
        # stage the token array so word_ngrams' two shifted slices read
        # a column instead of re-tokenizing (CollapseProject keeps a
        # multiply-referenced non-cheap alias as its own Project)
        train.withColumn("_toks", toks)
        .select(F.explode(word_ngrams(F.col("_toks"), 2)).alias("g"))
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        .filter(F.col("cnt") >= min_count)
    )
    return uni, bi


def perplexity(
    df: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """-> (id, n_bigrams, avg_logprob, log_ppl): per-document mean
    log10 Stupid-Backoff bigram probability and the log10-perplexity
    (= -avg_logprob; kept in log domain so the oracle hash never sees a
    10**x overflow). Documents with < 2 tokens score NULL."""
    # staged token column: see train_bigram_lm
    pairs = df.withColumn("_toks", tokens(text_col)).select(
        F.col(id_col), F.explode(word_ngrams(F.col("_toks"), 2)).alias("g")
    ).select(
        F.col(id_col),
        F.col("g"),
        # w1 = text before the single separator space; w2 = after.
        # tokens() guarantees no space inside a token.
        F.substring_index("g", " ", 1).alias("w1"),
        F.substring_index("g", " ", -1).alias("w2"),
    )
    bi = bigrams.select(F.col("g"), F.col("cnt").alias("bi_cnt"))
    uni1 = unigrams.select(F.col("w").alias("w1"), F.col("cnt").alias("c1"))
    uni2 = unigrams.select(F.col("w").alias("w2"), F.col("cnt").alias("c2"))
    floored = (
        pairs.join(F.broadcast(bi), "g", "left")
        .join(F.broadcast(uni1), "w1", "left")
        .join(F.broadcast(uni2), "w2", "left")
    )
    logp = F.when(
        F.col("bi_cnt").isNotNull() & F.col("c1").isNotNull(),
        F.log10(F.col("bi_cnt") / F.col("c1")),
    ).otherwise(
        F.log10(F.lit(BACKOFF))
        + F.log10(F.coalesce(F.col("c2"), F.lit(1)) / F.col("_n"))
    )
    # broadcast the scalar N once instead of carrying `total` through
    # the (possibly null-padded) unigram join
    n_row = unigrams.agg(F.max("total").alias("_n"))
    scored = floored.crossJoin(F.broadcast(n_row)).select(
        F.col(id_col), logp.alias("lp")
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_bigrams"),
        F.round(F.avg("lp"), 4).alias("avg_logprob"),
        F.round(-F.avg("lp"), 4).alias("log_ppl"),
    )


def ppl_filter(
    corpus: DataFrame,
    train: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
    keep_log_ppl: float = 4.0,
) -> DataFrame:
    """End-to-end CCNet-style pass: train on the reference slice, score
    the corpus, keep docs under the log-perplexity cutoff (CCNet uses
    per-language percentile cutoffs; a fixed cutoff keeps the gate
    deterministic). -> (id, n_bigrams, avg_logprob, log_ppl, keep)."""
    uni, bi = train_bigram_lm(train, text_col=text_col, min_count=min_count)
    out = perplexity(corpus, uni, bi, text_col=text_col, id_col=id_col)
    return out.select(
        id_col,
        "n_bigrams",
        "avg_logprob",
        "log_ppl",
        (F.col("log_ppl") <= F.lit(keep_log_ppl)).alias("keep"),
    )


def ppl_lang_buckets(
    corpus: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet's actual selection rule: bucket documents into head /
    middle / tail by PER-LANGUAGE perplexity percentile (Wenzek et al.
    2020 §4.3 — thresholds are per-language because a fixed global
    cutoff just selects the easiest language). Rank over a
    lang-partitioned window; ties on rounded log_ppl break by doc id,
    and the thirds cut uses INTEGER arithmetic (3*row_number vs count)
    because a percent_rank float comparison flips at the exact-1/3
    boundary between engines (their division intermediates differ).

    Scale: the window partitions by language — a bounded key set, but
    individual languages are huge, so rank-in-language at 100 TB would
    reuse the two-phase bucket-offset rank in operators/curate.py; the
    window form is the semantics the oracle can replay directly."""
    scored = perplexity(
        corpus, unigrams, bigrams, text_col=text_col, id_col=id_col
    )
    lang = corpus.select(F.col(id_col), F.col(lang_col).alias("lang"))
    w = Window.partitionBy("lang").orderBy(F.col("log_ppl").asc(), F.col(id_col).asc())
    wl = Window.partitionBy("lang")
    ranked = (
        scored.join(lang, id_col)
        .withColumn("rk", F.row_number().over(w))
        .withColumn("nl", F.count(F.lit(1)).over(wl))
    )
    bucket = (
        F.when(F.col("rk") * 3 <= F.col("nl"), "head")
        .when(F.col("rk") * 3 <= F.col("nl") * 2, "middle")
        .otherwise("tail")
    )
    return ranked.select(
        id_col,
        "lang",
        "log_ppl",
        F.col("rk").cast("long").alias("lang_rank"),
        bucket.alias("ppl_bucket"),
    )
