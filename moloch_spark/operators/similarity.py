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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from moloch_spark.operators.dedup import cosine_expr


def brute_force_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_max_id: int = 5,
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k for each query vector (id < query_max_id).

    Deterministic ranking: score rounded to 4 decimals, ties broken by
    corpus id ascending.
    """
    q = emb.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    scored = (
        emb.join(F.broadcast(q), F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col).alias("did"),
            cosine_expr(F.col("qvec"), F.col(vec_col)).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("did").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "did", "cosine", F.col("rank").cast("long").alias("rank"))
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


def lsh_bucket_topk(
    emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_max_id: int = 5,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """ANN: random-hyperplane sign buckets, exact cosine within bucket.

    Recall < 1 by design; the bucket join replaces the full cross
    product, so corpus cost is O(n) bucketing + per-bucket candidates.
    """
    planes = _hyperplanes(dim, n_planes)
    vec = F.col(vec_col).cast("array<double>")

    def sign_bit(plane: list[float]):
        lit = F.array(*[F.lit(x) for x in plane])
        dot = F.aggregate(
            F.zip_with(vec, lit, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        return F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0"))

    bucket = F.concat(*[sign_bit(p) for p in planes]).alias("bucket")
    bucketed = emb.select(F.col(id_col), F.col(vec_col), bucket)
    q = bucketed.filter(F.col(id_col) < query_max_id).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        F.col("bucket").alias("qbucket"),
    )
    cand = bucketed.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("qbucket")) & (F.col(id_col) != F.col("qid")),
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
