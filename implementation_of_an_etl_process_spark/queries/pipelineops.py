"""Battery entries: training-data pipeline operators over ``documents``
(operators.pipeline) — vocabulary, deterministic splits, sequence
packing, stratified sampling. Every entry is hash-checked against a
DuckDB oracle that reimplements the operator independently (same
md5-bucket arithmetic, same window frames).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators import pipeline as P
from implementation_of_an_etl_process_spark.sources.parquet import read_table

_BUCKET_SQL = (
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT "
    f"% {P.HASH_BUCKETS}"
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from implementation_of_an_etl_process_spark.plans import spread

    return spread(read_table(spark, sf_dir, "documents"))


# --- vocabulary ------------------------------------------------------------


def vocab_topk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.vocab_topk(_docs(spark, sf_dir), "text", k=50)


VOCAB_TOPK_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS token
  FROM documents
)
SELECT token, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occurrences
FROM tok GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT 50
"""


# --- deterministic split ---------------------------------------------------


def doc_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split assignment is a pure function of doc_id (md5 bucket), so
    the per-split counts are engine-independent constants — the oracle
    recomputes the assignment from scratch in SQL."""
    return (
        P.hash_split(_docs(spark, sf_dir), "doc_id")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("split")
    )


DOC_SPLIT_SQL = f"""
WITH b AS (
  SELECT CASE WHEN {_BUCKET_SQL} < 100 THEN 'val'
              WHEN {_BUCKET_SQL} < 200 THEN 'test'
              ELSE 'train' END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs FROM b GROUP BY split ORDER BY split
"""


# --- sequence packing ------------------------------------------------------

_PACK_BUDGET = 512


def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return P.pack_sequences(
        _docs(spark, sf_dir),
        "doc_id",
        "text",
        budget=_PACK_BUDGET,
        partition_by="lang",
    ).orderBy("lang", "doc_id")


PACK_SEQUENCES_SQL = rf"""
WITH t AS (
  SELECT lang, doc_id,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
           AS n_tokens
  FROM documents
), c AS (
  SELECT lang, doc_id, n_tokens,
         CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT)
           AS start_offset
  FROM t
)
SELECT lang, doc_id, n_tokens, start_offset,
       start_offset // {_PACK_BUDGET} AS pack_id
FROM c ORDER BY lang, doc_id
"""


# --- stratified sampling ---------------------------------------------------

_SAMPLE_RATES = {"en": 0.2, "de": 1.0, "fr": 1.0, "es": 0.5, "zh": 1.0}


def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Down-sample the dominant language, keep the rest — the standard
    training-mix rebalancing move, deterministic by id hash."""
    return (
        P.stratified_sample(
            _docs(spark, sf_dir), "doc_id", "lang", _SAMPLE_RATES
        )
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def _stratified_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{v}' THEN {int(r * P.HASH_BUCKETS)}"
        for v, r in sorted(_SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang FROM documents
WHERE {_BUCKET_SQL} < (CASE {cases} ELSE 0 END)
ORDER BY doc_id
"""


STRATIFIED_SAMPLE_SQL = _stratified_sql()


def pretrain_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed pretraining pass — exact dedup (min-id survivor) ->
    quality filter (alpha_ratio >= 0.5, n_tokens >= 5) -> deterministic
    hash split — in ONE lazy plan, returning per-(split, lang) corpus
    stats. Each stage reuses a battery-proven operator; the oracle
    recomposes all three in SQL, so a regression anywhere in the chain
    (or in how the stages compose) breaks the hash. One groupBy(text)
    shuffle for dedup + one final stats shuffle; quality/split are
    shuffle-free Column expressions."""
    from implementation_of_an_etl_process_spark.operators.dedup import (
        drop_exact_duplicates,
    )
    from implementation_of_an_etl_process_spark.operators.text import (
        quality_scores,
    )

    docs = _docs(spark, sf_dir)
    deduped = drop_exact_duplicates(docs, ["text"], "doc_id")
    scored = quality_scores(deduped, "text")
    kept = scored.filter(
        (F.col("alpha_ratio") >= 0.5) & (F.col("n_tokens") >= 5)
    )
    return (
        P.hash_split(kept, "doc_id")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("split", "lang")
    )


PRETRAIN_PIPELINE_SQL = rf"""
WITH reps AS (
  SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY text
), kept AS (
  SELECT d.doc_id, d.lang, d.text FROM documents d
  JOIN reps ON d.doc_id = reps.doc_id
), q AS (
  SELECT doc_id, lang,
         CAST(len(regexp_split_to_array(trim(text), '\s+')) AS INTEGER)
           AS n_tokens,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g'))
                        AS DOUBLE) / length(text)
              ELSE 0.0 END AS alpha_ratio
  FROM kept
), f AS (
  SELECT * FROM q WHERE alpha_ratio >= 0.5 AND n_tokens >= 5
), b AS (
  SELECT lang, n_tokens,
         CASE WHEN {_BUCKET_SQL} < 100 THEN 'val'
              WHEN {_BUCKET_SQL} < 200 THEN 'test'
              ELSE 'train' END AS split
  FROM f
)
SELECT split, lang, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM b GROUP BY split, lang ORDER BY split, lang
"""


def shuffle_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every epoch of a
    pretraining run wants the corpus in a pseudorandom order that is
    reproducible across reruns and engines — rank by md5(seed || id),
    a uniformly-distributed key with no hot ranges. The rank itself is
    ``operators.pipeline.global_rank`` (range-partition + parallel
    per-partition windows + bounded offsets), NOT a bare global Window,
    which would drag the whole corpus into one task."""
    seed = "epoch0:"
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 2000).select(
        "doc_id",
        F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string"))).alias(
            "_key"
        ),
    )
    return (
        P.global_rank(d, ["_key", "doc_id"], out_col="shuffle_pos")
        .select("doc_id", F.col("shuffle_pos").cast("int").alias("shuffle_pos"))
        .orderBy("shuffle_pos")
    )


SHUFFLE_ORDER_SQL = """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (
         ORDER BY md5('epoch0:' || CAST(doc_id AS VARCHAR)), doc_id
       ) AS INTEGER) AS shuffle_pos
FROM documents WHERE doc_id < 2000
ORDER BY shuffle_pos
"""


def doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length distribution — the histogram every packing /
    batching decision is sized from. Fixed integer bucketing (256-char
    buckets, integer division: no float-boundary ambiguity), decimal-
    exact mean length per bucket; pure codegen, one small shuffle."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy((F.col("n_chars") / 256).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("bucket")
    )


DOC_LENGTH_HIST_SQL = """
SELECT CAST(n_chars // 256 AS BIGINT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY 1
ORDER BY bucket
"""


# --- trained quality classifier (model-based corpus filtering) -------------

_QC_AGREE_FLOOR_PCT = 90


def quality_classifier_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loud gate for the TRAINED quality filter (the fastText-style
    stage of a pretraining pipeline): weak labels from the heuristic
    screen, seeded Spark ML decision tree fit on the deterministic
    'train' split, agreement measured on the held-out buckets. The
    held-out count and the label prevalence are exact SQL-recomputable
    facts (md5-bucket split + the same ratio arithmetic); agreement
    uses the floor contract — the pinned floor when cleared, else the
    MEASURED percentage so a model regression shows its number in the
    hash diff. ML training is not SQL-expressible; everything AROUND
    it is pinned exactly.
    """
    from implementation_of_an_etl_process_spark.operators import qualityml as QM

    labeled = P.hash_split(
        QM.weak_quality_labels(_docs(spark, sf_dir), "text"), "doc_id"
    )
    model = QM.train_quality_classifier(
        labeled.filter(F.col("split") == "train")
    )
    scored = QM.score_quality(
        model, labeled.filter(F.col("split") != "train")
    )
    agree = F.sum(
        (F.col("quality_pred") == F.col("quality_label")).cast("int")
    )
    return scored.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("quality_label").cast("long").alias("_npos"),
        agree.alias("_agree"),
    ).select(
        F.col("_n").alias("n_heldout"),
        F.col("_npos").alias("n_pos_labels"),
        F.when(
            F.col("_agree") * 100 / F.col("_n") >= _QC_AGREE_FLOOR_PCT,
            F.lit(_QC_AGREE_FLOOR_PCT),
        )
        .otherwise(F.floor(F.col("_agree") * 100 / F.col("_n")))
        .cast("int")
        .alias("agreement_pct_floor"),
    )


_QC_STOPS = (
    "'the','a','an','and','or','of','to','in','is','are','was','for',"
    "'on','with','as','at','by','it','this','that'"
)

QUALITY_CLASSIFIER_SQL = rf"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
), lbl AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 20
                   AND CAST(len(list_filter(toks, x -> x IN ({_QC_STOPS})))
                            AS DOUBLE) / NULLIF(len(toks), 0) >= 0.08
              THEN 1 ELSE 0 END AS quality_label,
         {_BUCKET_SQL} AS b
  FROM t
)
SELECT COUNT(*) AS n_heldout,
       CAST(SUM(quality_label) AS BIGINT) AS n_pos_labels,
       {_QC_AGREE_FLOOR_PCT} AS agreement_pct_floor
FROM lbl WHERE b < 200
"""


# --- weighted sampling without replacement (A-ES) --------------------------


def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted document sample (Efraimidis-Spirakis A-ES,
    operators/pipeline.py::weighted_sample): longer documents
    proportionally likelier, without replacement, deterministic by
    portable hash — the standard quality-weighted subsetting move.
    Zero-shuffle: the top-k is TakeOrderedAndProject."""
    return (
        P.weighted_sample(
            _docs(spark, sf_dir), "doc_id", "n_chars", 100, seed="ws1"
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


WEIGHTED_SAMPLE_SQL = """
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         CAST(round(ln((('0x' || substr(md5('ws1:' || CAST(doc_id AS VARCHAR)),
                                 1, 8))::UBIGINT + 1) / 4294967296.0)
                    / GREATEST(n_chars, 1) * 1000000000000.0)
              AS BIGINT) AS aes_key
  FROM documents
), top AS (
  SELECT doc_id, lang, n_chars FROM keyed
  ORDER BY aes_key DESC, doc_id ASC LIMIT 100
)
SELECT doc_id, lang, n_chars FROM top ORDER BY doc_id
"""


def weighted_sample_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group A-ES sampling (operators/pipeline.py::
    weighted_sample_per_group): the 20 length-weighted winners PER
    LANGUAGE — the stratified subsetting move ("best k per
    language/source") a mixture pipeline runs after global curation.
    One shuffle on the group key; identical quantized keys on both
    engines. Runs the SALTED path (salt=4) against the UNSALTED
    oracle — the hash match is the proof that salting is exact."""
    return (
        P.weighted_sample_per_group(
            _docs(spark, sf_dir), "doc_id", "n_chars", "lang", 20,
            seed="wg1", salt=4,
        )
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


WEIGHTED_SAMPLE_PER_LANG_SQL = """
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         CAST(round(ln((('0x' || substr(md5('wg1:' || CAST(doc_id AS VARCHAR)),
                                 1, 8))::UBIGINT + 1) / 4294967296.0)
                    / GREATEST(n_chars, 1) * 1000000000000.0)
              AS BIGINT) AS aes_key
  FROM documents
), ranked AS (
  SELECT doc_id, lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY aes_key DESC, doc_id ASC) AS rn
  FROM keyed
)
SELECT doc_id, lang, n_chars FROM ranked WHERE rn <= 20 ORDER BY doc_id
"""


# --- Z-order (Morton) layout key --------------------------------------------


def zorder_key_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order clustering key (operators/layout.py::zorder_key)
    over the events table's natural pruning dimensions — user and
    event day. The key itself is what the oracle can gate bit-for-bit
    (pure integer interleave in both engines); the LAYOUT effect —
    files tight in both dimensions, conjunctive range predicates
    skipping most of them — is measured in tests/test_layout.py."""
    from implementation_of_an_etl_process_spark.operators import layout as L

    ev = read_table(spark, sf_dir, "events")
    day = F.datediff(F.to_date("ts"), F.lit("1970-01-01"))
    return ev.select(
        "event_id",
        F.col("user_id"),
        day.alias("day"),
        L.zorder_key([F.col("user_id"), day], bits=12).alias("zkey"),
    ).orderBy("event_id")


def _zorder_sql() -> str:
    from implementation_of_an_etl_process_spark.operators.layout import (
        zorder_key_sql,
    )

    z = zorder_key_sql(["user_id", "day"], bits=12)
    return f"""
WITH ev AS (
  SELECT event_id, user_id,
         (CAST(ts AS DATE) - DATE '1970-01-01') AS day
  FROM events
)
SELECT event_id, user_id, day, {z} AS zkey
FROM ev ORDER BY event_id
"""


ZORDER_KEY_SQL = _zorder_sql()


QUERIES = {
    "vocab_topk_documents": vocab_topk_documents,
    "weighted_sample_docs": weighted_sample_docs,
    "weighted_sample_per_lang": weighted_sample_per_lang,
    "zorder_key_events": zorder_key_events,
    "quality_classifier_gate": quality_classifier_gate,
    "shuffle_order_docs": shuffle_order_docs,
    "doc_length_histogram": doc_length_histogram,
    "doc_split_counts": doc_split_counts,
    "pack_sequences_docs": pack_sequences_docs,
    "stratified_sample_docs": stratified_sample_docs,
    "pretrain_pipeline_stats": pretrain_pipeline_stats,
}

ORACLES = {
    "vocab_topk_documents": VOCAB_TOPK_SQL,
    "weighted_sample_docs": WEIGHTED_SAMPLE_SQL,
    "weighted_sample_per_lang": WEIGHTED_SAMPLE_PER_LANG_SQL,
    "zorder_key_events": ZORDER_KEY_SQL,
    "quality_classifier_gate": QUALITY_CLASSIFIER_SQL,
    "shuffle_order_docs": SHUFFLE_ORDER_SQL,
    "doc_length_histogram": DOC_LENGTH_HIST_SQL,
    "doc_split_counts": DOC_SPLIT_SQL,
    "pack_sequences_docs": PACK_SEQUENCES_SQL,
    "stratified_sample_docs": STRATIFIED_SAMPLE_SQL,
    "pretrain_pipeline_stats": PRETRAIN_PIPELINE_SQL,
}
