"""Importance-weighted data selection — the published DSIR method
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): estimate hashed-n-gram language models for a TARGET
distribution (the data you want more of) and the RAW corpus, weight
each document by its log importance ratio log p_target / p_raw under
those models, and keep the top-scoring documents. This is the
large-scale replacement for training a quality classifier: two
counting passes plus one scoring pass, all expressible as DataFrame
aggregations.

Scale shape: the n-gram -> bucket hash collapses the unbounded vocab
to a fixed table of `n_buckets` rows, so the learned "model" is a
broadcastable dimension no matter how big the corpora are; the two
counting passes are map-combined (bucket) shuffles; scoring is a
scan-side explode + broadcast join + map-combined (doc) sum — the raw
corpus is never joined with itself and nothing grows with corpus size
except the scans.

Cross-engine determinism: buckets use the repo-wide md5-prefix idiom
(operators/curate.py) so the DuckDB oracle replays identical hashes;
scores are rounded to 4 decimals to absorb summation-order noise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from moloch_spark.operators.text import tokens, word_ngrams

DEFAULT_BUCKETS = 4096


def _bucket(gram: F.Column, *, n_buckets: int, seed: str) -> F.Column:
    h = F.conv(
        F.md5(F.concat(F.lit(seed + ":"), gram)).substr(1, 7), 16, 10
    ).cast("long")
    return (h % n_buckets).cast("int")


def _grams(df: DataFrame, *, text_col: str, id_cols: tuple[str, ...]) -> DataFrame:
    """Unigram + bigram stream per doc (DSIR's feature space)."""
    # staged token column: the unigram leg + the bigram leg's two
    # slices would otherwise re-tokenize 3x per row
    both = F.concat(
        word_ngrams(F.col("_toks"), 1), word_ngrams(F.col("_toks"), 2)
    )
    return df.withColumn("_toks", tokens(text_col)).select(
        *id_cols, F.explode(both).alias("gram")
    )


def hashed_ngram_counts(
    df: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "dsir:v1",
) -> DataFrame:
    """-> (bucket, cnt): the hashed bag-of-ngrams model of a corpus.
    One map-combined shuffle over at most n_buckets keys per task."""
    return (
        _grams(df, text_col=text_col, id_cols=())
        .select(_bucket(F.col("gram"), n_buckets=n_buckets, seed=seed).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def importance_weights(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    *,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """-> (bucket, weight): add-alpha smoothed log importance ratio
    log(p_target[b] / p_raw[b]). Both inputs are <= n_buckets rows, so
    everything here is dimension-table sized."""
    t = target_counts.select("bucket", F.col("cnt").alias("t_cnt"))
    r = raw_counts.select("bucket", F.col("cnt").alias("r_cnt"))
    # lazy-materialize the joined bucket table (<= n_buckets rows): it
    # is evaluated twice (once under the totals broadcast, once in the
    # output projection) and each evaluation re-runs BOTH corpus-wide
    # hashed-ngram aggregations without this
    joined = (
        t.join(r, "bucket", "full_outer")
        .select(
            "bucket",
            F.coalesce("t_cnt", F.lit(0)).alias("t_cnt"),
            F.coalesce("r_cnt", F.lit(0)).alias("r_cnt"),
        )
        .localCheckpoint(eager=False)
    )
    totals = joined.agg(
        F.sum("t_cnt").alias("t_total"), F.sum("r_cnt").alias("r_total")
    )
    a = F.lit(float(alpha))
    d = F.lit(float(n_buckets))
    return joined.crossJoin(F.broadcast(totals)).select(
        "bucket",
        F.round(
            F.log((F.col("t_cnt") + a) / (F.col("t_total") + a * d))
            - F.log((F.col("r_cnt") + a) / (F.col("r_total") + a * d)),
            6,
        ).alias("weight"),
    )


def importance_score(
    df: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    seed: str = "dsir:v1",
    length_normalize: bool = True,
) -> DataFrame:
    """-> (id, n_grams, score): per-doc summed importance weight,
    length-normalized by default (long documents otherwise dominate by
    gram count alone — the DSIR paper's per-example average). Weights
    are broadcast; the only shuffle is the map-combined per-doc sum."""
    grams = _grams(df, text_col=text_col, id_cols=(id_col,))
    scored = grams.select(
        F.col(id_col),
        _bucket(F.col("gram"), n_buckets=n_buckets, seed=seed).alias("bucket"),
    ).join(F.broadcast(weights), "bucket", "left")
    # sum the 6-decimal weights as EXACT integer micros: a double sum
    # is summation-order-dependent, and the last-ulp drift flipped
    # round(score, 4) at an exact .00005 boundary between engines (the
    # sf0.1 dsir FP tie, VERDICT r11 item 9). weight*1e6 is within
    # 1e-9 of an integer by construction (round(x, 6) upstream), so
    # both engines recover the same int64 and the per-doc sum is
    # order-independent and bit-identical; the final divide-then-round
    # then sees identical IEEE inputs everywhere.
    w_micros = F.round(F.coalesce("weight", F.lit(0.0)) * F.lit(1e6)).cast(
        "long"
    )
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams"),
        F.sum(w_micros).alias("_sum_u"),
    )
    total = F.col("_sum_u") / F.lit(1e6)
    score = total / F.col("n_grams") if length_normalize else total
    return agg.select(id_col, "n_grams", F.round(score, 4).alias("score"))


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: str = "dsir:v1",
) -> DataFrame:
    """End-to-end DSIR pass: fit both hashed models, weight, score the
    raw corpus. Returns (id, n_grams, score, keep) where keep marks
    docs scoring above the raw-corpus midpoint (score >= 0: the doc
    looks more like the target than like the average raw doc)."""
    w = importance_weights(
        hashed_ngram_counts(target, text_col=text_col, n_buckets=n_buckets, seed=seed),
        hashed_ngram_counts(raw, text_col=text_col, n_buckets=n_buckets, seed=seed),
        n_buckets=n_buckets,
        alpha=alpha,
    )
    out = importance_score(
        raw, w, text_col=text_col, id_col=id_col, n_buckets=n_buckets, seed=seed
    )
    return out.select(
        id_col, "n_grams", "score", (F.col("score") >= 0).alias("keep")
    )
