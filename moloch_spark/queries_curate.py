"""Curation gate queries: deterministic split / global shuffle /
sequence packing over `documents`, each hash-matched against a DuckDB
oracle computing the same content-addressed layout in plain SQL.

The md5-key trick (see operators.curate) means both engines produce
the exact same rank/offset for every document — these gates verify the
distributed two-phase rank equals a literal single ORDER BY.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from moloch_spark.operators import curate as C
from moloch_spark.registry import register
from moloch_spark.sources.tables import load_table
from moloch_spark.sources.tables import load_usable_embeddings as load_emb

# 28-bit md5-prefix bucket, basis points (mirror of curate.split_bucket)
_BP = (
    "CAST(('0x' || substr(md5('split:v1:' || CAST(doc_id AS VARCHAR)), 1, 7)) "
    "AS BIGINT) % 10000"
)


@register(
    "curate_split_assign",
    f"""
    SELECT CASE WHEN {_BP} < 9000 THEN 'train'
                WHEN {_BP} < 9500 THEN 'val' ELSE 'test' END AS split,
           CAST(COUNT(*) AS BIGINT) AS docs,
           CAST(SUM(n_chars) AS BIGINT) AS chars,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS langs
    FROM documents
    GROUP BY 1
    """,
)
def q_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test assignment is scan-side (no shuffle, no RNG);
    membership is stable under corpus growth so evals never leak."""
    docs = C.assign_split(load_table(spark, "documents", sf_dir))
    return docs.groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_chars").alias("chars"),
        F.count_distinct("lang").alias("langs"),
    )


@register(
    "curate_global_shuffle",
    """
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (
             ORDER BY md5('shuffle:v1:' || CAST(doc_id AS VARCHAR)), doc_id
           ) AS BIGINT) AS shuffle_rank
    FROM documents
    """,
)
def q_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The oracle is a literal global ORDER BY; the engine computes the
    identical rank with 256-way bucketed windows + broadcast offsets."""
    return C.global_shuffle(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "shuffle_rank"
    )


@register(
    "curate_pack_sequences",
    """
    WITH ordered AS (
      SELECT doc_id,
             GREATEST(1, n_chars // 4) AS toks,
             md5('pack:v1:' || CAST(doc_id AS VARCHAR)) AS k
      FROM documents
    )
    SELECT doc_id,
           CAST(ROW_NUMBER() OVER (ORDER BY k, doc_id) AS BIGINT) AS shuffle_rank,
           CAST(COALESCE(SUM(toks) OVER (ORDER BY k, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                AS BIGINT) AS start_tok,
           CAST(COALESCE(SUM(toks) OVER (ORDER BY k, doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) // 4096
                AS BIGINT) AS chunk_id
    FROM ordered
    """,
)
def q_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing layout: global token offsets and 4096-
    token training-sequence ids, computed without any full sort."""
    return C.pack_sequences(load_table(spark, "documents", sf_dir)).select(
        "doc_id", "shuffle_rank", "start_tok", "chunk_id"
    )


_U = (
    "CAST(('0x' || substr(md5('sample:v1:' || CAST(doc_id AS VARCHAR)), 1, 7)) "
    "AS BIGINT) % 10000 / 10000.0"
)


@register(
    "curate_weighted_sample",
    f"""
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars
    FROM documents
    WHERE {_U} < LEAST(1.0, n_chars / 400.0)
    GROUP BY 1
    """,
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted downsampling: keep probability scales with doc
    length (stand-in for a quality score); membership is md5-decided so
    both engines — and every re-run — keep exactly the same rows."""
    docs = C.weighted_sample(load_table(spark, "documents", sf_dir))
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("kept"),
        F.sum("n_chars").alias("kept_chars"),
    )


@register(
    "curate_mixture_sample",
    """
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY md5('mix:v1:' || CAST(doc_id AS VARCHAR)), doc_id
             ) AS rn
      FROM documents
    )
    SELECT doc_id, source FROM ranked
    WHERE (source = 'src0' AND rn <= 30)
       OR (source = 'src1' AND rn <= 20)
       OR (source = 'src2' AND rn <= 10)
    ORDER BY doc_id
    """,
)
def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-weighted mixture: target 60 rows at weights 3:2:1 over
    three sources (quotas 30/20/10; src quotas above the domain's actual
    row count cap implicitly — the sf0.01 fixture has 25 rows per
    source, exercising the cap). md5-decided membership: both engines
    and every re-run pick identical rows."""
    docs = load_table(spark, "documents", sf_dir)
    out = C.mixture_sample(
        docs, {"src0": 3.0, "src1": 2.0, "src2": 1.0}, total=60
    )
    return out.select("doc_id", "source")


def _cbal_sql(
    n_cells: int = 16, dim: int = 64, per_cluster: int = 20,
    seed: str = "cbal:v1",
) -> str:
    """Oracle for cluster_balanced_sample: the SHARED ivf_assign replay
    (queries_llm._ivf_cell_rank_ctes — one definition of the
    assignment oracle across the ANN gates and this one) followed by
    the per-cluster md5 quota rank."""
    from moloch_spark.queries_llm import _ivf_cell_rank_ctes

    return f"""
    WITH b AS (SELECT vec_id, embedding::DOUBLE[] AS ed
               FROM embeddings WHERE embedding IS NOT NULL AND NOT coalesce(list_aggregate(list_transform(embedding::DOUBLE[], x -> x IS NULL OR isnan(x)), 'bool_or'), false) AND list_aggregate(list_transform(embedding::DOUBLE[], x -> x*x), 'sum') > 0),
    {_ivf_cell_rank_ctes(n_cells, dim)},
    assign AS (SELECT vec_id, cell FROM cell_rank WHERE rn = 1),
    ranked AS (
      SELECT vec_id, CAST(cell AS INT) AS cell,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY cell
               ORDER BY md5('{seed}:' || CAST(vec_id AS VARCHAR)), vec_id
             ) AS BIGINT) AS cluster_rank
      FROM assign
    )
    SELECT vec_id, cell, cluster_rank FROM ranked
    WHERE cluster_rank <= {per_cluster}
    ORDER BY vec_id
    """


@register("curate_cluster_balanced", _cbal_sql())
def q_cluster_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cluster diversity quota (curate.cluster_balanced_
    sample): every vector is assigned to its nearest coarse centroid
    scan-side, and each cluster keeps a deterministic md5-ranked quota
    of 20 — the cluster-then-balance curation step that stops dense
    boilerplate regions of embedding space from dominating a training
    mix. The gate runs the deterministic ivf_centroids for oracle
    replay (production fits real ones with similarity.kmeans_train —
    same assignment path); ranking uses the (cell, 256-bucket)
    two-phase scheme, so no cluster ever lands on a single reducer."""
    from moloch_spark.operators import similarity as S

    emb = load_emb(spark, sf_dir)
    return C.cluster_balanced_sample(
        emb, S.ivf_centroids(64, 16), per_cluster=20
    )
