"""Battery entries: similarity search over ``embeddings``.

Scores are quantized-int cosine (functions.vectors): every input to the
double math is an exact int64, so Spark and DuckDB produce bit-identical
doubles — float-path cosine would differ in summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import dedup as D
from implementation_of_an_etl_process_spark.sources.parquet import read_table
from implementation_of_an_etl_process_spark.operators import similarity as S
from implementation_of_an_etl_process_spark.operators.tfidf import IDF_SCALE

_N_QUERY_VECS = 20

_QUANT = "[CAST(round(CAST(x AS DOUBLE) * 10000, 0) AS BIGINT) FOR x IN embedding]"


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return read_table(spark, sf_dir, "embeddings")


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


_EMB_DIM = 64  # fixed across all test scale factors (checked below)


def _check_dim(emb: DataFrame) -> None:
    """Fail loudly if the embedding width drifts from the constant the
    LSH plane literals and oracle SQL are generated for — a silent
    mismatch would null-pad zip_with and collapse every Spark bucket
    while the oracle kept real ones. One-row metadata read, bounded."""
    row = emb.select(F.size("embedding").alias("d")).first()
    if row is not None and row["d"] != _EMB_DIM:
        raise ValueError(
            f"embeddings dim {row['d']} != expected {_EMB_DIM}; regenerate "
            "the plane/centroid literals (similarity.py _EMB_DIM)"
        )
_LSH_PLANES = 4
_LSH_SETS = 3
_PAIR_THRESHOLD = 0.4


def embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via random-hyperplane LSH (the 100 TB path: bucket
    equi-join + candidate-scoped exact verify — NO cross join in the
    plan), unioned over 3 plane sets for recall. The hyperplanes are
    deterministic ±1 literals generated driver-side, and the oracle
    embeds the SAME matrix, so the comparison is hash-exact: both
    engines find the identical candidate set and identical cosines.
    (The exhaustive all-pairs variant remains in the operator with
    ``n_planes=None`` for verification-scale runs; tests measure LSH
    recall against it.)"""
    emb = _emb(spark, sf_dir)
    _check_dim(emb)
    return D.embedding_cosine_pairs(
        emb,
        "vec_id",
        "embedding",
        threshold=_PAIR_THRESHOLD,
        n_planes=_LSH_PLANES,
        n_plane_sets=_LSH_SETS,
        dim=_EMB_DIM,
    ).orderBy("id_a", "id_b")


def _embedding_lsh_sql() -> str:
    """DuckDB mirror of the LSH path: same ±1 plane literals, same
    bucket assignment, same same-bucket candidate join, same quantized
    cosine — an independent re-implementation, not a weaker check."""
    set_selects = []
    for l in range(_LSH_SETS):
        plane_terms = []
        for p in range(_LSH_PLANES):
            signs = D.plane_signs(l, p, _EMB_DIM)
            arr = "[" + ", ".join(str(s) for s in signs) + "]"
            plane_terms.append(
                f"(CASE WHEN list_sum([q[i] * ({arr})[i] "
                f"FOR i IN range(1, len(q) + 1)]) > 0 "
                f"THEN {2 ** p} ELSE 0 END)"
            )
        bucket = " + ".join(plane_terms)
        set_selects.append(
            f"SELECT vec_id, {l} AS s, {bucket} AS bkt FROM v"
        )
    sets_union = "\n  UNION ALL ".join(set_selects)
    return f"""
WITH v AS (
  SELECT vec_id, {_QUANT} AS q FROM embeddings
), sets AS (
  {sets_union}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM sets a JOIN sets b ON a.s = b.s AND a.bkt = b.bkt
  WHERE a.vec_id < b.vec_id
), scored AS (
  SELECT id_a, id_b,
         ROUND(
           CAST(list_sum([va.q[i] * vb.q[i] FOR i IN range(1, len(va.q) + 1)]) AS DOUBLE)
           / (sqrt(CAST(list_sum([x * x FOR x IN va.q]) AS DOUBLE))
              * sqrt(CAST(list_sum([x * x FOR x IN vb.q]) AS DOUBLE))), 6) AS cosine
  FROM cand JOIN v va ON id_a = va.vec_id JOIN v vb ON id_b = vb.vec_id
)
SELECT id_a, id_b, cosine FROM scored
WHERE cosine >= {_PAIR_THRESHOLD} ORDER BY id_a, id_b
"""


EMBEDDING_PAIRS_SQL = _embedding_lsh_sql()


def semantic_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al. 2023,
    arXiv:2303.09540): embedding-space near-dup pairs -> connected
    components -> keep the min-id representative per component, return
    the surviving vector ids. The full composition of the 100 TB
    pieces: hyperplane-LSH candidate generation (no cross join),
    candidate-scoped exact cosine verify, O(diameter) distributed
    min-label propagation, and a broadcast anti-join to drop losers.
    The oracle rebuilds the identical pair set (same ±1 plane literals)
    and recomputes components via a recursive transitive-closure CTE —
    both engines must agree on exactly which vectors remain.
    SemDeDup proper clusters first and thresholds within clusters; the
    LSH buckets play that cluster role here (candidate scoping), with
    the same keep-one-per-similarity-component semantics."""
    emb = _emb(spark, sf_dir)
    _check_dim(emb)
    pairs = D.embedding_cosine_pairs(
        emb,
        "vec_id",
        "embedding",
        threshold=_PAIR_THRESHOLD,
        n_planes=_LSH_PLANES,
        n_plane_sets=_LSH_SETS,
        dim=_EMB_DIM,
    )
    return (
        D.drop_near_duplicates(emb.select("vec_id"), "vec_id", pairs)
        .select("vec_id")
        .orderBy("vec_id")
    )


def _semantic_dedup_sql() -> str:
    # the LSH pair query (identical plane literals) as a CTE body, its
    # final ORDER BY dropped (CTE output order is meaningless)
    pairs_body = _embedding_lsh_sql().rsplit("ORDER BY", 1)[0]
    return f"""
WITH RECURSIVE pairs AS (
  {pairs_body}
), edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL SELECT id_b, id_a FROM pairs
), reach(node, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
), comp AS (
  SELECT node, MIN(r) AS cluster FROM reach GROUP BY node
)
SELECT vec_id FROM embeddings
WHERE vec_id NOT IN (SELECT node FROM comp WHERE node <> cluster)
ORDER BY vec_id
"""


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


_IVF_PERQ_FLOOR = 1  # measured min per-query hits@5 is 2 at every sf


def similarity_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k under a full value-hash oracle: the raw approximate
    rows have no exact SQL twin, so the entry emits each query's
    DETERMINISTIC result invariants instead — exactly k results, ranks
    exactly 1..k (count + rank-sum + distinct candidates pin the set),
    and a per-query recall floor against the in-plan brute-force
    baseline (every query must keep >=1 true top-5 neighbor; the
    aggregate >=70% gate is ``similarity_ivf_recall``). Violations emit
    the measured value, so the hash mismatch shows the offending number.
    """
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    ivf = S.ivf_topk(
        q,
        emb,
        query_id="vec_id",
        query_vec="embedding",
        corpus_id="vec_id",
        corpus_vec="embedding",
        k=5,
        n_cells=16,
        n_probe=8,
        dim=_EMB_DIM,
    )
    exact = S.brute_force_topk(
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=5,
    )
    hits = (
        ivf.join(exact, ["qid", "cid"], "left_semi")
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("_h"))
    )
    per_q = ivf.groupBy("qid").agg(
        F.count(F.lit(1)).cast("int").alias("n_results"),
        F.sum("rank").cast("int").alias("rank_sum"),
        F.countDistinct("cid").cast("int").alias("n_candidates"),
    )
    return (
        per_q.join(hits, "qid", "left")
        .select(
            "qid",
            "n_results",
            "rank_sum",
            "n_candidates",
            F.least(F.coalesce(F.col("_h"), F.lit(0)), F.lit(_IVF_PERQ_FLOOR))
            .cast("int")
            .alias("hits_floor"),
        )
        .orderBy("qid")
    )


# DATA ASSUMPTIONS behind the literal 5/15/5 (k=5, rank_sum=1+..+5,
# n_candidates=k): every query's 8 probed cells (of 16) must together
# hold >= k corpus vectors, i.e. corpus size >> k per probed cell. The
# driver's embeddings tables satisfy this by orders of magnitude at
# every sf (smallest: sf0.001 with 500 vectors -> ~31/cell x 8 cells
# probed vs k=5), and hits_floor=1 has measured margin (min per-query
# hits@5 is 2 at every sf). A regenerated corpus small or skewed enough
# to leave a probed region under k vectors would fail this gate BY
# DESIGN — that is the gate detecting the assumption break, not an IVF
# bug; re-derive the literals if the testdata contract ever changes.
IVF_TOPK_SQL = f"""
SELECT vec_id AS qid, 5 AS n_results, 15 AS rank_sum, 5 AS n_candidates,
       {_IVF_PERQ_FLOOR} AS hits_floor
FROM embeddings WHERE vec_id < {_N_QUERY_VECS} ORDER BY qid
"""


_IVF_RECALL_FLOOR_PCT = 70  # measured 76% at every sf (deterministic path)


def similarity_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loud recall gate for the IVF path: recall@5 vs the exact
    brute-force baseline, computed in-plan (semi join on the two result
    sets). Emits the pinned floor when recall clears it, else the
    MEASURED percentage — so a recall regression hash-mismatches the
    constant oracle and shows the offending number in the diff.
    Centroids come from the DISTRIBUTED trainer (seeded Spark ML KMeans
    on a deterministic bounded sample DataFrame — no vector ever
    reaches the driver); the md5-hyperplane default path stays the
    engine-portable oracle exercised by ``similarity_ivf_topk``."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    cents = S.train_ivf_centroids(
        emb,
        corpus_vec="embedding",
        corpus_id="vec_id",
        n_cells=16,
        n_train=4096,
    )
    ivf = S.ivf_topk(
        q,
        emb,
        query_id="vec_id",
        query_vec="embedding",
        corpus_id="vec_id",
        corpus_vec="embedding",
        k=5,
        n_probe=8,
        dim=_EMB_DIM,
        centroids=cents,
    )
    exact = S.brute_force_topk(
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=5,
    )
    hits = ivf.join(exact, ["qid", "cid"], "left_semi")
    return (
        hits.agg(F.count(F.lit(1)).alias("_hits"))
        # n_queries counts the QUERY SET (from the exact side) — counting
        # distinct qids over the hits would spuriously fail the gate when
        # one query has zero IVF/exact overlap but overall recall is fine
        .crossJoin(
            exact.agg(
                F.count(F.lit(1)).alias("_total"),
                F.countDistinct("qid").alias("_nq"),
            )
        )
        .select(
            F.col("_nq").cast("int").alias("n_queries"),
            F.when(
                (F.col("_hits") * 100 / F.col("_total"))
                >= _IVF_RECALL_FLOOR_PCT,
                F.lit(_IVF_RECALL_FLOOR_PCT),
            )
            .otherwise(F.floor(F.col("_hits") * 100 / F.col("_total")))
            .cast("int")
            .alias("recall_pct_floor"),
        )
    )


IVF_RECALL_SQL = f"""
SELECT {_N_QUERY_VECS} AS n_queries,
       {_IVF_RECALL_FLOOR_PCT} AS recall_pct_floor
"""


def similarity_ivf_arrow_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the VECTORIZED IVF path (`ivf_topk_arrow` —
    matmul cell assignment AND probe scoring, no join; the 86x-at-2M
    throughput path, BASELINE_NOTES r6): recall@5 vs the float-scored
    Arrow brute force, same loud-failure contract as the expression
    gate — emits the pinned floor when cleared, else the measured
    percentage so a regression shows its number in the hash diff."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    cents = S.train_ivf_centroids(
        emb,
        corpus_vec="embedding",
        corpus_id="vec_id",
        n_cells=16,
        n_train=4096,
    )
    ivf = S.ivf_topk_arrow(
        q,
        emb,
        query_id="vec_id",
        query_vec="embedding",
        corpus_id="vec_id",
        corpus_vec="embedding",
        k=5,
        n_probe=8,
        dim=_EMB_DIM,
        centroids=cents,
    )
    exact = S.brute_force_topk_arrow(
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=5,
    )
    hits = ivf.join(exact, ["qid", "cid"], "left_semi")
    return (
        hits.agg(F.count(F.lit(1)).alias("_hits"))
        .crossJoin(
            exact.agg(
                F.count(F.lit(1)).alias("_total"),
                F.countDistinct("qid").alias("_nq"),
            )
        )
        .select(
            F.col("_nq").cast("int").alias("n_queries"),
            F.when(
                (F.col("_hits") * 100 / F.col("_total"))
                >= _IVF_RECALL_FLOOR_PCT,
                F.lit(_IVF_RECALL_FLOOR_PCT),
            )
            .otherwise(F.floor(F.col("_hits") * 100 / F.col("_total")))
            .cast("int")
            .alias("recall_pct_floor"),
        )
    )


IVF_ARROW_RECALL_SQL = IVF_RECALL_SQL


_PQ_RECALL_FLOOR_PCT = 90  # measured: 100% sf0.01 / 99% sf0.1 (m=16 K=64 shortlist=50 + exact re-rank; uniform-random embeddings are the PQ worst case — m=8/K=16 measured only 54-67%)


def similarity_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the product-quantization path (train -> encode
    8-byte codes -> ADC shortlist -> exact re-rank): recall@5 vs the
    brute-force baseline, same loud-failure contract as the IVF gate.
    Codebooks train DISTRIBUTED (one seeded Spark ML KMeans fit per
    subspace over the sampled DataFrame — the build path collects no
    vectors, only the few-KB cluster centers); the bounded driver-side
    numpy trainer remains as the deterministic test oracle
    (tests/test_similarity.py)."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    books = S.train_pq_codebooks_distributed(
        emb,
        corpus_vec="embedding",
        corpus_id="vec_id",
        m=16,
        n_codes=64,
        dim=_EMB_DIM,
    )
    encoded = S.encode_pq(
        emb, books, corpus_id="vec_id", corpus_vec="embedding"
    )
    pq = S.pq_topk(
        q,
        emb,
        encoded,
        books,
        query_id="vec_id",
        query_vec="embedding",
        corpus_id="vec_id",
        corpus_vec="embedding",
        k=5,
        shortlist=50,
    )
    exact = S.brute_force_topk(
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=5,
    )
    hits = pq.join(exact, ["qid", "cid"], "left_semi")
    return (
        hits.agg(F.count(F.lit(1)).alias("_hits"))
        .crossJoin(
            exact.agg(
                F.count(F.lit(1)).alias("_total"),
                F.countDistinct("qid").alias("_nq"),
            )
        )
        .select(
            F.col("_nq").cast("int").alias("n_queries"),
            F.when(
                (F.col("_hits") * 100 / F.col("_total"))
                >= _PQ_RECALL_FLOOR_PCT,
                F.lit(_PQ_RECALL_FLOOR_PCT),
            )
            .otherwise(F.floor(F.col("_hits") * 100 / F.col("_total")))
            .cast("int")
            .alias("recall_pct_floor"),
        )
    )


PQ_RECALL_SQL = f"""
SELECT {_N_QUERY_VECS} AS n_queries,
       {_PQ_RECALL_FLOOR_PCT} AS recall_pct_floor
"""


# measured 94% sf0.001 / 94% sf0.01 / 96% sf0.1 at 16 cells, 12
# probes, m=16 K=64, shortlist=50 + exact re-rank. Unlike flat PQ
# (which scans every code), IVF-PQ recall is CAPPED by coarse-probe
# coverage — and the synthetic embeddings are uniform-random, the
# worst case for any coarse quantizer (8/16 probes measured only
# 82%: true neighbors land in unprobed cells at ~the unprobed mass
# fraction). 12/16 probes clears the flat-PQ 90% bar with margin
# here; a real (clustered) corpus gets the same recall at far
# smaller probe fractions — that gap is data structure, not the
# operator.
_IVFPQ_RECALL_FLOOR_PCT = 90


def similarity_ivfpq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall gate for the COMPOSED IVF-PQ path (`encode_ivfpq` /
    `ivfpq_topk` — coarse inverted lists -> in-list ADC -> exact
    re-rank, the standard 10^9-vector ANN stack): recall@5 vs the
    brute-force baseline, same loud-failure contract as the IVF/PQ
    gates — emits the pinned floor when cleared, else the measured
    percentage so a regression shows its number in the hash diff.
    Both training stages are the DISTRIBUTED trainers (seeded Spark ML
    KMeans over bounded sample DataFrames; no vector collect), and the
    codebooks train on coarse RESIDUALS — the textbook IVFADC layout
    the operator defaults to."""
    emb = _emb(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    cents = S.train_ivf_centroids(
        emb,
        corpus_vec="embedding",
        corpus_id="vec_id",
        n_cells=16,
        n_train=4096,
    )
    books = S.train_pq_codebooks_distributed(
        emb,
        corpus_vec="embedding",
        corpus_id="vec_id",
        m=16,
        n_codes=64,
        dim=_EMB_DIM,
        centroids=cents,
    )
    index = S.encode_ivfpq(
        emb, books, cents, corpus_id="vec_id", corpus_vec="embedding"
    )
    pq = S.ivfpq_topk(
        q,
        emb,
        index,
        books,
        cents,
        query_id="vec_id",
        query_vec="embedding",
        corpus_id="vec_id",
        corpus_vec="embedding",
        k=5,
        n_probe=12,
        shortlist=50,
    )
    exact = S.brute_force_topk(
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=5,
    )
    hits = pq.join(exact, ["qid", "cid"], "left_semi")
    return (
        hits.agg(F.count(F.lit(1)).alias("_hits"))
        .crossJoin(
            exact.agg(
                F.count(F.lit(1)).alias("_total"),
                F.countDistinct("qid").alias("_nq"),
            )
        )
        .select(
            F.col("_nq").cast("int").alias("n_queries"),
            F.when(
                (F.col("_hits") * 100 / F.col("_total"))
                >= _IVFPQ_RECALL_FLOOR_PCT,
                F.lit(_IVFPQ_RECALL_FLOOR_PCT),
            )
            .otherwise(F.floor(F.col("_hits") * 100 / F.col("_total")))
            .cast("int")
            .alias("recall_pct_floor"),
        )
    )


IVFPQ_RECALL_SQL = f"""
SELECT {_N_QUERY_VECS} AS n_queries,
       {_IVFPQ_RECALL_FLOOR_PCT} AS recall_pct_floor
"""


def similarity_ivfpq_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for the PERSISTED IVF-PQ index lifecycle
    (`write_ivfpq_index` / `append_ivfpq_index` / `ivfpq_query_index`):
    builds the index as base-write + frozen-model append, retries an
    already-committed batch_id (must no-op via the `_batches.json`
    ledger — the foreachBatch exactly-once contract), and queries the
    persisted index. Emits, alongside the recall floor, two invariant
    bits the oracle pins to 1: the retried append added no rows, and
    the persisted-index results are row-identical to a one-shot
    in-memory encode (incrementality can't cost accuracy — encoding is
    deterministic per vector under a frozen model). Index dir is
    rebuilt from scratch every call (overwrite) so the entry is
    self-contained and deterministic."""
    import hashlib
    import os
    import tempfile

    emb = _emb(spark, sf_dir)
    cents = S.train_ivf_centroids(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        n_cells=16, n_train=4096,
    )
    books = S.train_pq_codebooks_distributed(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        m=16, n_codes=64, dim=_EMB_DIM, centroids=cents,
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    idx = os.path.join(tempfile.gettempdir(), f"ivfpq_inc_{tag}")
    third = F.pmod(F.col("vec_id"), F.lit(3))
    S.write_ivfpq_index(
        emb.filter(third != 0), idx, books, cents,
        corpus_id="vec_id", corpus_vec="embedding",
    )
    batch = emb.filter(third == 0)
    S.append_ivfpq_index(batch, idx, corpus_vec="embedding", batch_id=0)
    codes_path = os.path.join(idx, "codes")
    n_after = spark.read.parquet(codes_path).count()
    S.append_ivfpq_index(batch, idx, corpus_vec="embedding", batch_id=0)
    retry_noop = int(
        spark.read.parquet(codes_path).count() == n_after
        and n_after == emb.count()
    )
    kw = dict(
        query_id="vec_id", query_vec="embedding",
        corpus_id="vec_id", corpus_vec="embedding",
        k=5, n_probe=12, shortlist=50,
    )
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    inc = S.ivfpq_query_index(spark, idx, q, emb, **kw)
    oneshot = S.ivfpq_topk(
        q, emb,
        S.encode_ivfpq(
            emb, books, cents, corpus_id="vec_id", corpus_vec="embedding"
        ),
        books, cents, **kw,
    )
    identical = int(
        inc.exceptAll(oneshot).count() == 0
        and oneshot.exceptAll(inc).count() == 0
    )
    exact = S.brute_force_topk(
        q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
        query_id="qid", query_vec="qvec",
        corpus_id="cid", corpus_vec="cvec", k=5,
    )
    hits = inc.join(exact, ["qid", "cid"], "left_semi").count()
    total = exact.count()
    pct = hits * 100 // max(total, 1)
    return spark.range(1).select(
        F.lit(_N_QUERY_VECS).cast("int").alias("n_queries"),
        F.lit(
            _IVFPQ_RECALL_FLOOR_PCT
            if pct >= _IVFPQ_RECALL_FLOOR_PCT
            else pct
        ).cast("int").alias("recall_pct_floor"),
        F.lit(identical).cast("int").alias("oneshot_identical"),
        F.lit(retry_noop).cast("int").alias("retry_noop"),
    )


IVFPQ_INCREMENTAL_SQL = f"""
SELECT {_N_QUERY_VECS} AS n_queries,
       {_IVFPQ_RECALL_FLOOR_PCT} AS recall_pct_floor,
       1 AS oneshot_identical,
       1 AS retry_noop
"""


def similarity_ivfpq_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE gate for the persisted ANN index
    (`delete_from_ivfpq_index` — the takedown/GDPR lifecycle): build
    the index on the full corpus, tombstone every vec_id % 4 == 0,
    and pin four invariants the oracle fixes to constants: (a) no
    deleted id appears in any top-k; (b) the tombstoned index answers
    ROW-IDENTICALLY to an index that never held the victims (deletes
    are exact, not approximate); (c) re-deleting the same ids plus an
    unknown id is a no-op; (d) after compaction the tombstones are
    applied physically (rows gone, `_deletes` cleared) with results
    unchanged. Index dir rebuilt every call so the entry is
    self-contained."""
    import hashlib
    import os
    import tempfile

    emb = _emb(spark, sf_dir)
    cents = S.train_ivf_centroids(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        n_cells=16, n_train=4096,
    )
    books = S.train_pq_codebooks_distributed(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        m=16, n_codes=64, dim=_EMB_DIM, centroids=cents,
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    idx = os.path.join(tempfile.gettempdir(), f"ivfpq_del_{tag}")
    kw = dict(corpus_id="vec_id", corpus_vec="embedding")
    S.write_ivfpq_index(emb, idx, books, cents, **kw)
    victims = emb.filter(F.pmod(F.col("vec_id"), F.lit(4)) == 0).select(
        F.col("vec_id").alias("cid")
    )
    n_victims = victims.count()
    stats = S.delete_from_ivfpq_index(spark, idx, victims)
    again = S.delete_from_ivfpq_index(spark, idx, victims)
    redelete_noop = int(
        stats["deleted"] == n_victims and again["deleted"] == 0
    )
    qkw = dict(
        query_id="vec_id", query_vec="embedding",
        corpus_id="vec_id", corpus_vec="embedding",
        k=5, n_probe=12, shortlist=50,
    )
    q = emb.filter(F.col("vec_id") < _N_QUERY_VECS)
    got = S.ivfpq_query_index(spark, idx, q, emb, **qkw)
    no_deleted = int(
        got.filter(F.pmod(F.col("cid"), F.lit(4)) == 0).count() == 0
    )
    ref = os.path.join(tempfile.gettempdir(), f"ivfpq_delref_{tag}")
    survivors = emb.filter(F.pmod(F.col("vec_id"), F.lit(4)) != 0)
    S.write_ivfpq_index(survivors, ref, books, cents, **kw)
    want = S.ivfpq_query_index(spark, ref, q, emb, **qkw)
    rebuilt_identical = int(
        got.exceptAll(want).count() == 0
        and want.exceptAll(got).count() == 0
    )
    S.compact_ivfpq_index(spark, idx)
    post = S.ivfpq_query_index(spark, idx, q, emb, **qkw)
    compact_applied = int(
        not os.path.exists(os.path.join(idx, "_deletes"))
        and post.exceptAll(want).count() == 0
        and want.exceptAll(post).count() == 0
    )
    return spark.range(1).select(
        F.lit(no_deleted).cast("int").alias("no_deleted_in_topk"),
        F.lit(rebuilt_identical).cast("int").alias("rebuilt_identical"),
        F.lit(redelete_noop).cast("int").alias("redelete_noop"),
        F.lit(compact_applied).cast("int").alias("compact_applied"),
    )


IVFPQ_DELETE_SQL = """
SELECT 1 AS no_deleted_in_topk,
       1 AS rebuilt_identical,
       1 AS redelete_noop,
       1 AS compact_applied
"""


def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding space, computed in the
    exploded (label, dim) plane: posexplode the quantized vector and
    aggregate int64 sums per (label, dim). Fully distributed — the
    shuffle key is (label, dim), so a 100 TB corpus spreads each
    label's mass over n_dims reducers instead of hot-spotting one, and
    nothing is ever collected. Centroid components are emitted both as
    the exact integer sum and the rounded mean (oracle-exact)."""
    from implementation_of_an_etl_process_spark.functions.vectors import (
        quantize_vec,
    )

    return (
        _emb(spark, sf_dir)
        .select("label", F.posexplode(quantize_vec("embedding")).alias("dim", "v"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("v").alias("sum_q"),
        )
        .select(
            "label",
            "dim",
            "n_vecs",
            "sum_q",
            # Integer-exact round-half-away-from-zero (sum can be
            # negative): sign(s) * ((2|s| + n) div (2n)). Operands of
            # the div are non-negative, so truncating `div` (Spark) and
            # flooring `//` (DuckDB oracle) agree bit-for-bit; no double
            # division reaches the hashed output.
            F.expr(
                "CAST(sign(sum_q) AS BIGINT)"
                " * ((2 * abs(sum_q) + n_vecs) div (2 * n_vecs))"
            ).alias("centroid_q"),
        )
        .orderBy("label", "dim")
    )


LABEL_CENTROIDS_SQL = f"""
WITH q AS (
  SELECT label, {_QUANT} AS qv FROM embeddings
), flat AS (
  SELECT label, CAST(gs.i AS INTEGER) AS dim, qv[gs.i + 1] AS v
  FROM q, generate_series(0, 63) AS gs(i)
)
SELECT label, dim, COUNT(*) AS n_vecs, CAST(SUM(v) AS BIGINT) AS sum_q,
       CAST(CAST(sign(SUM(v)) AS BIGINT)
            * ((2 * abs(SUM(v)) + COUNT(*)) // (2 * COUNT(*)))
            AS BIGINT) AS centroid_q
FROM flat
GROUP BY label, dim
ORDER BY label, dim
"""


_KM_K = 4
_KM_ITERS = 2
_KM_SCALE = 10**6


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd k-means over the embedding table in exact int64 fixed
    point (`operators/clustering.py::kmeans_fixed_point`) — the
    clustering family (semantic-dedup buckets, topic balancing, IVF
    coarse quantizers) under the same value gate as everything else:
    2 full assign/update iterations, deterministically seeded by the
    4 smallest vec_ids, and the ORACLE re-runs both iterations as
    unrolled CTEs — like the PageRank gate, an iterative algorithm
    hash-matching because every step is integer."""
    from implementation_of_an_etl_process_spark.operators.clustering import (
        kmeans_fixed_point,
    )

    return kmeans_fixed_point(
        _emb(spark, sf_dir),
        "vec_id",
        "embedding",
        k=_KM_K,
        iterations=_KM_ITERS,
        scale=_KM_SCALE,
    ).orderBy("vec_id")


def _kmeans_oracle() -> str:
    dim = 64
    head = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
             x -> CAST(round(CAST(x AS DOUBLE) * {_KM_SCALE}) AS BIGINT))
           AS v
  FROM embeddings
), c0 AS (
  SELECT (ROW_NUMBER() OVER (ORDER BY vec_id)) - 1 AS cid, v
  FROM (SELECT vec_id, v FROM q ORDER BY vec_id LIMIT {_KM_K})
)"""
    steps = []
    for t in range(1, _KM_ITERS + 1):
        steps.append(f""",
d{t} AS (
  SELECT q.vec_id, c.cid,
         CAST(list_sum(list_transform(range(1, {dim + 1}),
              i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT) AS d
  FROM q, c{t - 1} c
), a{t} AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM d{t}
  ) WHERE rn = 1
), upd{t} AS (
  SELECT a.cid, gs.i AS dim, CAST(SUM(q.v[gs.i]) // COUNT(*) AS BIGINT) AS s
  FROM a{t} a JOIN q USING (vec_id),
       (SELECT unnest(generate_series(1, {dim})) AS i) gs
  GROUP BY a.cid, gs.i
), c{t} AS (
  SELECT cid, list(s ORDER BY dim) AS v FROM upd{t} GROUP BY cid
  UNION ALL
  SELECT c.cid, c.v FROM c{t - 1} c
  WHERE c.cid NOT IN (SELECT cid FROM upd{t})
)""")
    # final assignment against the post-iteration centroids
    final = f""",
df AS (
  SELECT q.vec_id, c.cid,
         CAST(list_sum(list_transform(range(1, {dim + 1}),
              i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT) AS d
  FROM q, c{_KM_ITERS} c
), af AS (
  SELECT vec_id, cid, d FROM (
    SELECT vec_id, cid, d,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn
    FROM df
  ) WHERE rn = 1
)
SELECT vec_id, CAST(cid AS INTEGER) AS cluster, CAST(d AS BIGINT) AS dist_q
FROM af ORDER BY vec_id
"""
    return head + "".join(steps) + final


KMEANS_SQL = _kmeans_oracle()


def similarity_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED vector search — "top-k among vectors WHERE <metadata
    predicate>" (here ``label % 3 == 0``), the retrieval shape every
    vector store is asked for. The hashed baseline is exact brute-force
    cosine over the qualifying corpus only; the same filter is ALSO
    pushed into the persisted IVF-PQ index as an ``allowed_ids``
    semi-join BEFORE the ADC shortlist (filtering after the shortlist
    would starve k on selective predicates), probed exhaustively so the
    exact re-rank must return the identical (query, neighbor) top-k
    SET — pinned as an invariant bit."""
    import hashlib
    import os
    import tempfile

    emb = _emb(spark, sf_dir)
    allowed = emb.filter(F.pmod(F.col("label"), F.lit(3)) == 0)
    brute = S.brute_force_topk(
        emb.filter(F.col("vec_id") < _N_QUERY_VECS)
        .select("vec_id", "embedding")
        .withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("embedding", "qvec"),
        allowed.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        ),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=5,
    )
    cents = S.train_ivf_centroids(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        n_cells=8, n_train=1024,
    )
    books = S.train_pq_codebooks_distributed(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        m=8, n_codes=32, dim=_EMB_DIM, centroids=cents,
    )
    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    idx = os.path.join(tempfile.gettempdir(), f"ivfpq_filt_{tag}")
    S.write_ivfpq_index(
        emb, idx, books, cents, corpus_id="vec_id", corpus_vec="embedding"
    )
    via_index = S.ivfpq_query_index(
        spark,
        idx,
        emb.filter(F.col("vec_id") < _N_QUERY_VECS),
        emb,
        query_id="vec_id",
        query_vec="embedding",
        corpus_id="vec_id",
        corpus_vec="embedding",
        k=5,
        n_probe=8,  # = n_cells: exhaustive probe -> exact among allowed
        shortlist=10**6,
        allowed_ids=allowed.select("vec_id"),
    )
    pairs_brute = {(r["qid"], r["cid"]) for r in brute.collect()}
    pairs_index = {(r["qid"], r["cid"]) for r in via_index.collect()}
    same = int(pairs_brute == pairs_index)
    return brute.orderBy("qid", "rank").select(
        "*", F.lit(same).alias("index_path_identical")
    )


SIMILARITY_FILTERED_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, {_QUANT} AS qv FROM embeddings
  WHERE vec_id < {_N_QUERY_VECS}
), c AS (
  SELECT vec_id AS cid, {_QUANT} AS cv FROM embeddings WHERE label % 3 = 0
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
SELECT qid, cid, score, rank, 1 AS index_path_identical
FROM ranked WHERE rank <= 5 ORDER BY qid, rank
"""


_HYBRID_TERMS = ("vector", "stream", "merge", "hash")
_HYBRID_POOL = 50  # per-system candidate pool fed into the fusion
_HYBRID_K = 20


def hybrid_retrieval_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HYBRID retrieval — the standard two-tower retrieval stack: a
    lexical ranking (integer-exact BM25 over the documents table) and
    a semantic ranking (exact cosine against doc 0's embedding; the
    embeddings table is id-aligned with documents) fused by Reciprocal
    Rank Fusion (`operators/tfidf.py::rrf_fuse` — integer `scale div
    (60 + rank)`, so the fused score is engine-exact). Scores from the
    two systems are incomparable; their RANKS fuse. Output: top-20
    fused docs with the per-doc system count."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        bm25_topk,
        rrf_fuse,
    )
    from implementation_of_an_etl_process_spark.plans import spread

    docs = spread(
        read_table(spark, sf_dir, "documents")
    ).select("doc_id", "text")
    emb = _emb(spark, sf_dir)
    bm25 = bm25_topk(docs, list(_HYBRID_TERMS), k=_HYBRID_POOL)
    w = Window.orderBy(F.desc("score_q"), F.col("doc_id").asc())
    bm25_ranked = bm25.select(
        "doc_id", F.row_number().over(w).cast("int").alias("rank")
    )
    cos_ranked = S.brute_force_topk(
        emb.filter(F.col("vec_id") == 0)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        ),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=_HYBRID_POOL,
    ).select(F.col("cid").alias("doc_id"), "rank")
    return rrf_fuse(
        [bm25_ranked, cos_ranked], "doc_id", topk=_HYBRID_K
    )


_HYBRID_IN = ", ".join(f"'{t}'" for t in _HYBRID_TERMS)

HYBRID_RETRIEVAL_SQL = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
  FROM documents
), tok2 AS (
  SELECT doc_id, term FROM tok WHERE term <> ''
), lens AS (
  SELECT doc_id, COUNT(*) AS len FROM tok2 GROUP BY doc_id
), stats AS (
  SELECT (SELECT COUNT(*) FROM documents) AS n_docs,
         (SELECT SUM(len) FROM lens) AS total_len
), tf AS (
  SELECT doc_id, term, COUNT(*) AS tf
  FROM tok2 WHERE term IN ({_HYBRID_IN})
  GROUP BY doc_id, term
), dfq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
), idf AS (
  SELECT term, n_docs, total_len,
         CAST(round(ln(1 + (n_docs - df + 0.5) / (df + 0.5)) * {IDF_SCALE})
              AS BIGINT) AS idf_q
  FROM dfq, stats
), sc AS (
  SELECT tf.doc_id,
         CAST(CAST(idf_q AS HUGEINT) * (2200 * tf.tf) * total_len
              // (CAST(1000 AS HUGEINT) * tf.tf * total_len
                  + 300 * total_len + 900 * l.len * n_docs)
              AS BIGINT) AS s
  FROM tf JOIN idf USING (term) JOIN lens l ON l.doc_id = tf.doc_id
), bm25 AS (
  SELECT doc_id, SUM(s) AS score_q FROM sc GROUP BY doc_id
  ORDER BY score_q DESC, doc_id LIMIT {_HYBRID_POOL}
), bm25r AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (ORDER BY score_q DESC, doc_id ASC)
              AS INTEGER) AS rank
  FROM bm25
), q AS (
  SELECT vec_id AS qid, {_QUANT} AS qv FROM embeddings WHERE vec_id = 0
), c AS (
  SELECT vec_id AS cid, {_QUANT} AS cv FROM embeddings
), scored AS (
  SELECT qid, cid,
         ROUND(
           CAST(list_sum([qv[i] * cv[i] FOR i IN range(1, len(qv) + 1)]) AS DOUBLE)
           / (sqrt(CAST(list_sum([x * x FOR x IN qv]) AS DOUBLE))
              * sqrt(CAST(list_sum([x * x FOR x IN cv]) AS DOUBLE))), 6) AS score
  FROM q, c WHERE qid <> cid
), cosr AS (
  SELECT cid AS doc_id, rank FROM (
    SELECT cid, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, cid ASC)
                     AS INTEGER) AS rank
    FROM scored
  ) WHERE rank <= {_HYBRID_POOL}
), fused AS (
  SELECT doc_id,
         CAST(SUM(1000000 // (60 + rank)) AS BIGINT) AS rrf_q,
         CAST(COUNT(*) AS BIGINT) AS n_systems
  FROM (SELECT * FROM bm25r UNION ALL SELECT * FROM cosr)
  GROUP BY doc_id
)
SELECT doc_id, rrf_q, n_systems
FROM fused
ORDER BY rrf_q DESC, doc_id
LIMIT {_HYBRID_K}
"""


_EVAL_K = 10


def retrieval_metrics_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality EVALUATION as a first-class operator
    (`operators/tfidf.py::retrieval_metrics`): rank the corpus by
    exact cosine for the 20 query vectors, define relevance as label
    agreement (the embeddings table's label column — a query's
    relevant set is every other vector with its label), and report
    per-query first-relevant rank, integer MRR (scale div rank),
    hits@10, the relevant-set size, integer recall@10, and binary
    NDCG@10 from the fixed-point discount table (shared constants in
    plan and oracle — no float log in either engine). Queries whose
    top-10 contains no relevant doc still get a row with zeros —
    dropping them would inflate every averaged metric. The oracle
    replays ranking, relevance join, and metrics in SQL."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        retrieval_metrics,
    )

    emb = _emb(spark, sf_dir)
    ranking = S.brute_force_topk(
        emb.filter(F.col("vec_id") < _N_QUERY_VECS)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        ),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=_EVAL_K,
    )
    q_lab = emb.filter(F.col("vec_id") < _N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("_ql")
    )
    qrels = (
        q_lab.join(
            emb.select(
                F.col("vec_id").alias("cid"), F.col("label").alias("_cl")
            ),
            F.col("_ql") == F.col("_cl"),
        )
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    return retrieval_metrics(ranking, qrels, k=_EVAL_K)


def retrieval_map_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`retrieval_metrics_eval` with AVERAGE PRECISION@k added
    (``include_ap=True`` — MAP's per-query term, the one classic IR
    metric the set was missing): for the i-th relevant hit at rank r
    the precision contribution is ``scale * i div r``, and ``ap_q``
    divides the sum by the trec-style ``min(n_relevant, k)``. Same
    cosine ranking, label-agreement qrels, and constant tables as the
    base entry, so a divergence between the two rows isolates the AP
    path; the oracle replays the per-hit index window (over the
    qrels-joined top-k only) and the identical integer divisions."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        retrieval_metrics,
    )

    emb = _emb(spark, sf_dir)
    ranking = S.brute_force_topk(
        emb.filter(F.col("vec_id") < _N_QUERY_VECS)
        .select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
        emb.select(
            F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
        ),
        query_id="qid",
        query_vec="qvec",
        corpus_id="cid",
        corpus_vec="cvec",
        k=_EVAL_K,
    )
    q_lab = emb.filter(F.col("vec_id") < _N_QUERY_VECS).select(
        F.col("vec_id").alias("qid"), F.col("label").alias("_ql")
    )
    qrels = (
        q_lab.join(
            emb.select(
                F.col("vec_id").alias("cid"), F.col("label").alias("_cl")
            ),
            F.col("_ql") == F.col("_cl"),
        )
        .filter(F.col("qid") != F.col("cid"))
        .select("qid", "cid")
    )
    return retrieval_metrics(ranking, qrels, k=_EVAL_K, include_ap=True)


def _fused_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hybrid entry's RRF-fused top-20, ranked 1..20 for doc 0 —
    shared by both eval entries so they score the same retrieval."""
    fused = hybrid_retrieval_docs(spark, sf_dir)
    w = Window.orderBy(F.desc("rrf_q"), F.col("doc_id").asc())
    return fused.select(
        F.lit(0).cast("long").alias("qid"),
        F.col("doc_id").alias("cid"),
        F.row_number().over(w).cast("int").alias("rank"),
    )


def retrieval_graded_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRADED-relevance eval of the hybrid ranking (the r13 linear-gain
    NDCG path under the oracle gate): relevance grades come from
    metadata agreement with the query doc — 3 when both source and
    lang match, 2 for source only, 1 for lang only — the tiered
    notion of 'how right' a retrieval is that a curation pipeline
    actually has (same collection beats same language). DCG sums
    grade * w_rank over the retrieved relevants; IDCG places the
    query's grades descending against the first weights (window over
    the labeled set only). The oracle replays grading, both sums, and
    the division with the identical constant tables."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        retrieval_metrics,
    )

    ranking = _fused_ranking(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    # the query doc's metadata is TWO scalars — fetch once and grade
    # with literal comparisons (a 1-row crossJoin planned as a
    # CartesianProduct here, tripping the plan invariants for nothing)
    row = docs.filter(F.col("doc_id") == 0).select("source", "lang").first()
    qs, ql = row["source"], row["lang"]
    qrels = (
        docs.filter(F.col("doc_id") != 0)
        .filter((F.col("source") == qs) | (F.col("lang") == ql))
        .select(
            F.lit(0).cast("long").alias("qid"),
            F.col("doc_id").alias("cid"),
            F.when(
                (F.col("source") == qs) & (F.col("lang") == ql), F.lit(3)
            )
            .when(F.col("source") == qs, F.lit(2))
            .otherwise(F.lit(1))
            .alias("grade"),
        )
    )
    return retrieval_metrics(
        ranking, qrels, k=_EVAL_K, grade_col="grade"
    )


def retrieval_exp_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`retrieval_graded_ndcg_eval` under the standard IR
    EXPONENTIAL gain (r13 verdict item 6): gain = 2^grade - 1, so the
    source+lang tier (grade 3 → gain 7) dominates the way the burges
    formulation intends, while the fixed-point discount table and the
    integer-division NDCG stay shared verbatim between plan and
    oracle. The gain is ONE 64-bit shift per labeled row in both
    engines — no float pow anywhere. Everything else (fused ranking,
    metadata grading, qrels shape) is identical to the linear entry,
    so a divergence between the two rows isolates the gain path."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        retrieval_metrics,
    )

    ranking = _fused_ranking(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    row = docs.filter(F.col("doc_id") == 0).select("source", "lang").first()
    qs, ql = row["source"], row["lang"]
    qrels = (
        docs.filter(F.col("doc_id") != 0)
        .filter((F.col("source") == qs) | (F.col("lang") == ql))
        .select(
            F.lit(0).cast("long").alias("qid"),
            F.col("doc_id").alias("cid"),
            F.when(
                (F.col("source") == qs) & (F.col("lang") == ql), F.lit(3)
            )
            .when(F.col("source") == qs, F.lit(2))
            .otherwise(F.lit(1))
            .alias("grade"),
        )
    )
    return retrieval_metrics(
        ranking, qrels, k=_EVAL_K, grade_col="grade", gain="exp"
    )


def hybrid_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end eval of the COMPOSED hybrid stack (r12's RRF fusion
    scored by r13's metrics): the fused BM25+cosine ranking for doc 0
    is ranked 1..20, relevance is same-``source`` membership (the
    curation notion of a correct retrieval for the documents table),
    and `retrieval_metrics` reports first-relevant rank, integer MRR,
    hits@10, integer recall@10, and fixed-point NDCG@10 — one row, the
    retrieval-stack health check a pipeline dashboards. The oracle
    recomposes fusion, ranking, qrels, and every metric in SQL with
    the same shared constant tables."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        retrieval_metrics,
    )

    ranking = _fused_ranking(spark, sf_dir)
    docs = read_table(spark, sf_dir, "documents")
    qsrc = docs.filter(F.col("doc_id") == 0).select(
        F.col("source").alias("_qs")
    )
    qrels = (
        docs.join(F.broadcast(qsrc), F.col("source") == F.col("_qs"))
        .filter(F.col("doc_id") != 0)
        .select(
            F.lit(0).cast("long").alias("qid"),
            F.col("doc_id").alias("cid"),
        )
    )
    return retrieval_metrics(ranking, qrels, k=_EVAL_K)


def _ndcg_rows() -> tuple[str, str]:
    """Literal VALUES rows for the shared fixed-point NDCG tables —
    generated by the SAME helper the operator embeds in its plan, so
    engine and oracle sum identical constants."""
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        ndcg_ideal_table,
        ndcg_weight_table,
    )

    wt = ", ".join(
        f"({r + 1}, {w})"
        for r, w in enumerate(ndcg_weight_table(_EVAL_K))
    )
    icg = ", ".join(
        f"({m + 1}, {iw})"
        for m, iw in enumerate(ndcg_ideal_table(_EVAL_K))
    )
    return wt, icg


_NDCG_WT_ROWS, _NDCG_ICG_ROWS = _ndcg_rows()

RETRIEVAL_EVAL_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, {_QUANT} AS qv, label AS ql FROM embeddings
  WHERE vec_id < {_N_QUERY_VECS}
), c AS (
  SELECT vec_id AS cid, {_QUANT} AS cv, label AS cl FROM embeddings
), scored AS (
  SELECT qid, cid,
         ROUND(
           CAST(list_sum([qv[i] * cv[i] FOR i IN range(1, len(qv) + 1)]) AS DOUBLE)
           / (sqrt(CAST(list_sum([x * x FOR x IN qv]) AS DOUBLE))
              * sqrt(CAST(list_sum([x * x FOR x IN cv]) AS DOUBLE))), 6) AS score
  FROM q, c WHERE qid <> cid
), ranked AS (
  SELECT qid, cid,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC)
              AS INTEGER) AS rank
  FROM scored
), top AS (
  SELECT qid, cid, rank FROM ranked WHERE rank <= {_EVAL_K}
), qrels AS (
  SELECT q.qid, c.cid FROM q JOIN c ON q.ql = c.cl AND q.qid <> c.cid
), per_rel AS (
  SELECT qid, COUNT(*) AS n_relevant FROM qrels GROUP BY qid
), wt(r, w) AS (
  VALUES {_NDCG_WT_ROWS}
), icg(m, iw) AS (
  VALUES {_NDCG_ICG_ROWS}
), hits AS (
  SELECT t.qid, MIN(t.rank) AS first_rel_rank, COUNT(*) AS hits_at_k,
         SUM(w.w) AS dcg
  FROM top t
  JOIN qrels r ON t.qid = r.qid AND t.cid = r.cid
  JOIN wt w ON w.r = t.rank
  GROUP BY t.qid
)
SELECT p.qid,
       CAST(COALESCE(h.first_rel_rank, 0) AS INTEGER) AS first_rel_rank,
       CAST(COALESCE(1000000 // h.first_rel_rank, 0) AS BIGINT) AS mrr_q,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_relevant AS BIGINT) AS n_relevant,
       CAST(1000000 * COALESCE(h.hits_at_k, 0) // p.n_relevant AS BIGINT)
         AS recall_q,
       CAST(1000000 * COALESCE(h.dcg, 0) // i.iw AS BIGINT) AS ndcg_q
FROM per_rel p
LEFT JOIN hits h ON p.qid = h.qid
JOIN icg i ON i.m = LEAST(p.n_relevant, {_EVAL_K})
ORDER BY p.qid
"""


# the MAP sibling replays RETRIEVAL_EVAL_SQL with a hitrows CTE (per-hit
# index = row_number over the qrels-joined top-k in rank order) feeding
# both the shared aggregates and the AP sum — integer-exact with the
# same scale constant and the trec-style min(n_relevant, k) denominator
RETRIEVAL_MAP_SQL = f"""
WITH q AS (
  SELECT vec_id AS qid, {_QUANT} AS qv, label AS ql FROM embeddings
  WHERE vec_id < {_N_QUERY_VECS}
), c AS (
  SELECT vec_id AS cid, {_QUANT} AS cv, label AS cl FROM embeddings
), scored AS (
  SELECT qid, cid,
         ROUND(
           CAST(list_sum([qv[i] * cv[i] FOR i IN range(1, len(qv) + 1)]) AS DOUBLE)
           / (sqrt(CAST(list_sum([x * x FOR x IN qv]) AS DOUBLE))
              * sqrt(CAST(list_sum([x * x FOR x IN cv]) AS DOUBLE))), 6) AS score
  FROM q, c WHERE qid <> cid
), ranked AS (
  SELECT qid, cid,
         CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY score DESC, cid ASC)
              AS INTEGER) AS rank
  FROM scored
), top AS (
  SELECT qid, cid, rank FROM ranked WHERE rank <= {_EVAL_K}
), qrels AS (
  SELECT q.qid, c.cid FROM q JOIN c ON q.ql = c.cl AND q.qid <> c.cid
), per_rel AS (
  SELECT qid, COUNT(*) AS n_relevant FROM qrels GROUP BY qid
), wt(r, w) AS (
  VALUES {_NDCG_WT_ROWS}
), icg(m, iw) AS (
  VALUES {_NDCG_ICG_ROWS}
), hitrows AS (
  SELECT t.qid, t.rank,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.qid ORDER BY t.rank ASC)
              AS BIGINT) AS hi
  FROM top t
  JOIN qrels r ON t.qid = r.qid AND t.cid = r.cid
), hits AS (
  SELECT h.qid, MIN(h.rank) AS first_rel_rank, COUNT(*) AS hits_at_k,
         SUM(w.w) AS dcg,
         SUM(1000000 * h.hi // h.rank) AS apsum
  FROM hitrows h
  JOIN wt w ON w.r = h.rank
  GROUP BY h.qid
)
SELECT p.qid,
       CAST(COALESCE(h.first_rel_rank, 0) AS INTEGER) AS first_rel_rank,
       CAST(COALESCE(1000000 // h.first_rel_rank, 0) AS BIGINT) AS mrr_q,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_relevant AS BIGINT) AS n_relevant,
       CAST(1000000 * COALESCE(h.hits_at_k, 0) // p.n_relevant AS BIGINT)
         AS recall_q,
       CAST(1000000 * COALESCE(h.dcg, 0) // i.iw AS BIGINT) AS ndcg_q,
       CAST(COALESCE(h.apsum, 0) // LEAST(p.n_relevant, {_EVAL_K}) AS BIGINT)
         AS ap_q
FROM per_rel p
LEFT JOIN hits h ON p.qid = h.qid
JOIN icg i ON i.m = LEAST(p.n_relevant, {_EVAL_K})
ORDER BY p.qid
"""


# the hybrid-eval oracle recomposes the hybrid SQL's fusion CTEs (same
# text, its final projection dropped), then ranks, joins same-source
# qrels, and replays every metric with the shared constant tables
_HYBRID_SPLIT = HYBRID_RETRIEVAL_SQL.rsplit(
    "SELECT doc_id, rrf_q, n_systems", 1
)
# fail at IMPORT, loudly, if the donor SQL's final projection is ever
# reworded — otherwise rsplit returns the whole string and both
# composed oracles become unparseable with a confusing runtime error
# (r13 advice)
assert len(_HYBRID_SPLIT) == 2, (
    "HYBRID_RETRIEVAL_SQL's final projection was reworded — update "
    "the rsplit anchor in _HYBRID_EVAL_BODY (queries/similarity.py)"
)
_HYBRID_EVAL_BODY = _HYBRID_SPLIT[0]

HYBRID_EVAL_SQL = (
    _HYBRID_EVAL_BODY
    + f""", lim AS (
  SELECT doc_id, rrf_q FROM fused
  ORDER BY rrf_q DESC, doc_id LIMIT {_HYBRID_K}
), ranked2 AS (
  SELECT CAST(0 AS BIGINT) AS qid, doc_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY rrf_q DESC, doc_id ASC)
              AS INTEGER) AS rank
  FROM lim
), top2 AS (
  SELECT qid, cid, rank FROM ranked2 WHERE rank <= {_EVAL_K}
), qrels2 AS (
  SELECT CAST(0 AS BIGINT) AS qid, doc_id AS cid FROM documents
  WHERE source = (SELECT source FROM documents WHERE doc_id = 0)
    AND doc_id <> 0
), per_rel2 AS (
  SELECT qid, COUNT(*) AS n_relevant FROM qrels2 GROUP BY qid
), wt2(r, w) AS (
  VALUES {_NDCG_WT_ROWS}
), icg2(m, iw) AS (
  VALUES {_NDCG_ICG_ROWS}
), hits2 AS (
  SELECT t.qid, MIN(t.rank) AS first_rel_rank, COUNT(*) AS hits_at_k,
         SUM(w.w) AS dcg
  FROM top2 t
  JOIN qrels2 r ON t.qid = r.qid AND t.cid = r.cid
  JOIN wt2 w ON w.r = t.rank
  GROUP BY t.qid
)
SELECT p.qid,
       CAST(COALESCE(h.first_rel_rank, 0) AS INTEGER) AS first_rel_rank,
       CAST(COALESCE(1000000 // h.first_rel_rank, 0) AS BIGINT) AS mrr_q,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_relevant AS BIGINT) AS n_relevant,
       CAST(1000000 * COALESCE(h.hits_at_k, 0) // p.n_relevant AS BIGINT)
         AS recall_q,
       CAST(1000000 * COALESCE(h.dcg, 0) // i.iw AS BIGINT) AS ndcg_q
FROM per_rel2 p
LEFT JOIN hits2 h ON p.qid = h.qid
JOIN icg2 i ON i.m = LEAST(p.n_relevant, {_EVAL_K})
ORDER BY p.qid
"""
)


GRADED_NDCG_SQL = (
    _HYBRID_EVAL_BODY
    + f""", lim AS (
  SELECT doc_id, rrf_q FROM fused
  ORDER BY rrf_q DESC, doc_id LIMIT {_HYBRID_K}
), ranked3 AS (
  SELECT CAST(0 AS BIGINT) AS qid, doc_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY rrf_q DESC, doc_id ASC)
              AS INTEGER) AS rank
  FROM lim
), top3 AS (
  SELECT qid, cid, rank FROM ranked3 WHERE rank <= {_EVAL_K}
), qm AS (
  SELECT source AS qs, lang AS ql FROM documents WHERE doc_id = 0
), qrels3 AS (
  SELECT CAST(0 AS BIGINT) AS qid, d.doc_id AS cid,
         CAST(CASE WHEN d.source = qm.qs AND d.lang = qm.ql THEN 3
                   WHEN d.source = qm.qs THEN 2
                   ELSE 1 END AS BIGINT) AS g
  FROM documents d, qm
  WHERE d.doc_id <> 0 AND (d.source = qm.qs OR d.lang = qm.ql)
), per_rel3 AS (
  SELECT qid, COUNT(*) AS n_relevant FROM qrels3 GROUP BY qid
), wt3(r, w) AS (
  VALUES {_NDCG_WT_ROWS}
), ideal3 AS (
  SELECT qid, SUM(x.g * w.w) AS iw FROM (
    SELECT qid, g,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY g DESC, cid ASC
           ) AS INTEGER) AS r
    FROM qrels3
  ) x JOIN wt3 w ON w.r = x.r
  WHERE x.r <= {_EVAL_K}
  GROUP BY qid
), hits3 AS (
  SELECT t.qid, MIN(t.rank) AS first_rel_rank, COUNT(*) AS hits_at_k,
         SUM(r.g * w.w) AS dcg
  FROM top3 t
  JOIN qrels3 r ON t.qid = r.qid AND t.cid = r.cid
  JOIN wt3 w ON w.r = t.rank
  GROUP BY t.qid
)
SELECT p.qid,
       CAST(COALESCE(h.first_rel_rank, 0) AS INTEGER) AS first_rel_rank,
       CAST(COALESCE(1000000 // h.first_rel_rank, 0) AS BIGINT) AS mrr_q,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_relevant AS BIGINT) AS n_relevant,
       CAST(1000000 * COALESCE(h.hits_at_k, 0) // p.n_relevant AS BIGINT)
         AS recall_q,
       CAST(1000000 * COALESCE(h.dcg, 0) // i.iw AS BIGINT) AS ndcg_q
FROM per_rel3 p
LEFT JOIN hits3 h ON p.qid = h.qid
JOIN ideal3 i ON i.qid = p.qid
ORDER BY p.qid
"""
)


EXP_NDCG_SQL = (
    _HYBRID_EVAL_BODY
    + f""", lim AS (
  SELECT doc_id, rrf_q FROM fused
  ORDER BY rrf_q DESC, doc_id LIMIT {_HYBRID_K}
), ranked4 AS (
  SELECT CAST(0 AS BIGINT) AS qid, doc_id AS cid,
         CAST(ROW_NUMBER() OVER (ORDER BY rrf_q DESC, doc_id ASC)
              AS INTEGER) AS rank
  FROM lim
), top4 AS (
  SELECT qid, cid, rank FROM ranked4 WHERE rank <= {_EVAL_K}
), qm AS (
  SELECT source AS qs, lang AS ql FROM documents WHERE doc_id = 0
), qrels4 AS (
  -- same tiered grades as the linear entry; gv is the exp gain the
  -- operator computes: (1 << g) - 1, an integer shift in both engines
  SELECT qid, cid, (CAST(1 AS BIGINT) << g) - 1 AS gv FROM (
    SELECT CAST(0 AS BIGINT) AS qid, d.doc_id AS cid,
           CAST(CASE WHEN d.source = qm.qs AND d.lang = qm.ql THEN 3
                     WHEN d.source = qm.qs THEN 2
                     ELSE 1 END AS BIGINT) AS g
    FROM documents d, qm
    WHERE d.doc_id <> 0 AND (d.source = qm.qs OR d.lang = qm.ql)
  )
), per_rel4 AS (
  SELECT qid, COUNT(*) AS n_relevant FROM qrels4 GROUP BY qid
), wt4(r, w) AS (
  VALUES {_NDCG_WT_ROWS}
), ideal4 AS (
  SELECT qid, SUM(x.gv * w.w) AS iw FROM (
    SELECT qid, gv,
           CAST(ROW_NUMBER() OVER (
             PARTITION BY qid ORDER BY gv DESC, cid ASC
           ) AS INTEGER) AS r
    FROM qrels4
  ) x JOIN wt4 w ON w.r = x.r
  WHERE x.r <= {_EVAL_K}
  GROUP BY qid
), hits4 AS (
  SELECT t.qid, MIN(t.rank) AS first_rel_rank, COUNT(*) AS hits_at_k,
         SUM(r.gv * w.w) AS dcg
  FROM top4 t
  JOIN qrels4 r ON t.qid = r.qid AND t.cid = r.cid
  JOIN wt4 w ON w.r = t.rank
  GROUP BY t.qid
)
SELECT p.qid,
       CAST(COALESCE(h.first_rel_rank, 0) AS INTEGER) AS first_rel_rank,
       CAST(COALESCE(1000000 // h.first_rel_rank, 0) AS BIGINT) AS mrr_q,
       CAST(COALESCE(h.hits_at_k, 0) AS BIGINT) AS hits_at_k,
       CAST(p.n_relevant AS BIGINT) AS n_relevant,
       CAST(1000000 * COALESCE(h.hits_at_k, 0) // p.n_relevant AS BIGINT)
         AS recall_q,
       CAST(1000000 * COALESCE(h.dcg, 0) // i.iw AS BIGINT) AS ndcg_q
FROM per_rel4 p
LEFT JOIN hits4 h ON p.qid = h.qid
JOIN ideal4 i ON i.qid = p.qid
ORDER BY p.qid
"""
)


QUERIES = {
    "kmeans_embeddings": kmeans_embeddings,
    "similarity_filtered_topk": similarity_filtered_topk,
    "hybrid_retrieval_docs": hybrid_retrieval_docs,
    "hybrid_retrieval_eval": hybrid_retrieval_eval,
    "retrieval_graded_ndcg_eval": retrieval_graded_ndcg_eval,
    "retrieval_exp_ndcg_eval": retrieval_exp_ndcg_eval,
    "retrieval_metrics_eval": retrieval_metrics_eval,
    "retrieval_map_eval": retrieval_map_eval,
    "embedding_label_centroids": embedding_label_centroids,
    "similarity_pq_recall": similarity_pq_recall,
    "similarity_topk_cosine": similarity_topk_cosine,
    "embedding_cosine_pairs": embedding_cosine_pairs,
    "semantic_dedup_survivors": semantic_dedup_survivors,
    "similarity_ivf_topk": similarity_ivf_topk,
    "similarity_ivf_recall": similarity_ivf_recall,
    "similarity_ivf_arrow_recall": similarity_ivf_arrow_recall,
    "similarity_ivfpq_recall": similarity_ivfpq_recall,
    "similarity_ivfpq_incremental": similarity_ivfpq_incremental,
    "similarity_ivfpq_delete": similarity_ivfpq_delete,
}

ORACLES = {
    "kmeans_embeddings": KMEANS_SQL,
    "similarity_filtered_topk": SIMILARITY_FILTERED_SQL,
    "hybrid_retrieval_docs": HYBRID_RETRIEVAL_SQL,
    "hybrid_retrieval_eval": HYBRID_EVAL_SQL,
    "retrieval_graded_ndcg_eval": GRADED_NDCG_SQL,
    "retrieval_exp_ndcg_eval": EXP_NDCG_SQL,
    "retrieval_metrics_eval": RETRIEVAL_EVAL_SQL,
    "retrieval_map_eval": RETRIEVAL_MAP_SQL,
    "embedding_label_centroids": LABEL_CENTROIDS_SQL,
    "similarity_pq_recall": PQ_RECALL_SQL,
    "similarity_topk_cosine": SIMILARITY_TOPK_SQL,
    "embedding_cosine_pairs": EMBEDDING_PAIRS_SQL,
    "semantic_dedup_survivors": SEMANTIC_DEDUP_SQL,
    "similarity_ivf_topk": IVF_TOPK_SQL,
    "similarity_ivf_recall": IVF_RECALL_SQL,
    "similarity_ivf_arrow_recall": IVF_ARROW_RECALL_SQL,
    "similarity_ivfpq_recall": IVFPQ_RECALL_SQL,
    "similarity_ivfpq_incremental": IVFPQ_INCREMENTAL_SQL,
    "similarity_ivfpq_delete": IVFPQ_DELETE_SQL,
}
