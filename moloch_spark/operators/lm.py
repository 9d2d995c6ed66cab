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

from pyspark.sql import DataFrame, functions as F

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
    uni = (
        train.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    totals = uni.agg(F.sum("cnt").alias("total"))
    uni = uni.crossJoin(F.broadcast(totals))
    bi = (
        train.select(F.explode(word_ngrams(toks, 2)).alias("g"))
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
    toks = tokens(text_col)
    pairs = df.select(
        F.col(id_col), F.explode(word_ngrams(toks, 2)).alias("g")
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
