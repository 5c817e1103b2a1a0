"""Battery entries: similarity search over ``embeddings``.

Scores are quantized-int cosine (functions.vectors): every input to the
double math is an exact int64, so Spark and DuckDB produce bit-identical
doubles — float-path cosine would differ in summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import dedup as D
from implementation_of_an_etl_process_spark.operators import similarity as S

_N_QUERY_VECS = 20

_QUANT = "[CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT) FOR x IN embedding]"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def similarity_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    return S.brute_force_topk(
        emb.filter(F.col("vec_id") < _N_QUERY_VECS).select("vec_id", "embedding")
        .withColumnRenamed("vec_id", "qid").withColumnRenamed("embedding", "qvec"),
        emb.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        ),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=5,
    ).orderBy("qid", "rank")


SIMILARITY_TOPK_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, {_QUANT} AS qv FROM embeddings WHERE vec_id < {_N_QUERY_VECS}
), c AS (
  SELECT vec_id AS cid, {_QUANT} AS cv FROM embeddings
), scored AS (
  SELECT qid, cid,
         ROUND(
           CAST(list_sum([qv[i] * cv[i] FOR i IN range(1, len(qv) + 1)]) AS DOUBLE)
           / (sqrt(CAST(list_sum([x * x FOR x IN qv]) AS DOUBLE))
              * sqrt(CAST(list_sum([x * x FOR x IN cv]) AS DOUBLE))), 6) AS score
  FROM q, c WHERE qid <> cid
), ranked AS (
  SELECT qid, cid, score,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC)
              AS INTEGER) AS rank
  FROM scored
)
SELECT qid, cid, score, rank FROM ranked WHERE rank <= 5 ORDER BY qid, rank
"""


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All embedding pairs above a (deliberately low) cosine threshold —
    exercises the exact all-pairs near-dup path with a non-empty result
    on this corpus (max pairwise cosine ≈ 0.51)."""
    return D.embedding_cosine_pairs(
        _emb(spark, sf_dir), "vec_id", "embedding", threshold=0.4
    ).orderBy("id_a", "id_b")


EMBEDDING_PAIRS_SQL = f"""
WITH v AS (
  SELECT vec_id, {_QUANT} AS q FROM embeddings
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         ROUND(
           CAST(list_sum([a.q[i] * b.q[i] FOR i IN range(1, len(a.q) + 1)]) AS DOUBLE)
           / (sqrt(CAST(list_sum([x * x FOR x IN a.q]) AS DOUBLE))
              * sqrt(CAST(list_sum([x * x FOR x IN b.q]) AS DOUBLE))), 6) AS cosine
  FROM v a, v b WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.4 ORDER BY id_a, id_b
"""


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate IVF path — rows-only check (recall is probabilistic);
    tests pin recall against the brute-force baseline."""
    emb = _emb(spark, sf_dir)
    return S.ivf_topk(
        emb.filter(F.col("vec_id") < _N_QUERY_VECS),
        emb,
        query_id="vec_id",
        query_vec="embedding",
        corpus_id="vec_id",
        corpus_vec="embedding",
        k=5,
        n_cells=16,
        n_probe=8,
    ).orderBy("qid", "rank")


QUERIES = {
    "similarity_topk_cosine": similarity_topk_cosine,
    "embedding_cosine_pairs": embedding_cosine_pairs,
    "similarity_ivf_topk": similarity_ivf_topk,
}

ORACLES = {
    "similarity_topk_cosine": SIMILARITY_TOPK_SQL,
    "embedding_cosine_pairs": EMBEDDING_PAIRS_SQL,
    # similarity_ivf_topk: rows-only by design
}
