"""Count-min sketch over corpus n-grams — bounded-width approximate
counting for vocabularies that are unbounded at 100 TB.

Exact n-gram counting (text.corpus_ngram_stats) shuffles one key per
DISTINCT gram: fine when you want a top-K, but the keyspace — and the
shuffle — grows with the corpus. The CMS build shuffles at most
depth x width keys NO MATTER THE CORPUS SIZE (map-side combine caps
each task's output at the sketch size), and sketches merge by cell-wise
addition, so the same plan works per-partition, per-day, or
per-cluster and folds together.  Estimates carry the classic one-sided
guarantee: est >= exact always; est <= exact + eps*N with probability
1 - delta for width = e/eps, depth = ln(1/delta) (Cormode & Muthu 2005).

Determinism: row r of the sketch buckets by the md5-prefix idiom with
seed "{seed}:{r}" (importance._bucket), so Spark and the DuckDB oracle
compute identical cells.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from moloch_spark.operators.importance import _bucket
from moloch_spark.operators.text import tokens, word_ngrams


def _row_buckets(
    gram: F.Column, *, depth: int, width: int, seed: str
) -> F.Column:
    """Array of the gram's bucket in each of the depth hash rows."""
    return F.array(
        *[
            _bucket(gram, n_buckets=width, seed=f"{seed}:{r}")
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    *,
    text_col: str = "text",
    n: int = 2,
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms:v1",
) -> DataFrame:
    """-> (row, bucket, cnt): the sketch as a sparse table of at most
    depth*width cells. One scan; the shuffle carries <= depth*width
    keys per task after map-side combine, independent of vocabulary
    size — the whole point at 100 TB."""
    # staged token column: word_ngrams' shifted slices read the alias,
    # not n re-runs of split+filter (CollapseProject keeps it)
    g = df.withColumn("_toks", tokens(text_col)).select(
        F.explode(word_ngrams(F.col("_toks"), n)).alias("gram")
    )
    pairs = g.select(
        F.posexplode(
            _row_buckets(F.col("gram"), depth=depth, width=width, seed=seed)
        ).alias("row", "bucket")
    )
    return pairs.groupBy("row", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Cell-wise sum of independently-built sketches (same depth/width/
    seed) — the linearity that makes CMS work per-partition or per-day
    and fold afterwards."""
    it = iter(sketches)
    out = next(it)
    for s in it:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    *,
    gram_col: str = "gram",
    depth: int = 4,
    width: int = 1024,
    seed: str = "cms:v1",
) -> DataFrame:
    """-> (gram, est_cnt): min over the depth rows of the queried cells.
    The sketch (<= depth*width rows) is BROADCAST, so estimating any
    number of query grams is one scan with zero fact-side shuffle
    beyond the per-gram min agg."""
    q = queries.select(F.col(gram_col).alias("gram")).distinct()
    qb = q.select(
        "gram",
        F.posexplode(
            _row_buckets(F.col("gram"), depth=depth, width=width, seed=seed)
        ).alias("row", "bucket"),
    )
    j = qb.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return j.groupBy("gram").agg(
        F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est_cnt")
    )
