"""Data selection via hashed n-gram importance resampling (DSIR).

Implements the scoring core of DSIR — "Data Selection for Language
Models via Importance Resampling" (Xie, Santurkar, Ma, Liang, NeurIPS
2023, arXiv:2302.03169): represent documents as hashed n-gram
count vectors, fit bag-of-words importance weights
``log p_target(bucket) / p_raw(bucket)`` from a small target corpus
versus the raw pool, score every raw document by its total
log-likelihood ratio, and keep the top slice (the paper resamples with
Gumbel noise; the deterministic top-k variant here is the
reproducible/oracle-friendly choice and the common production
simplification). The reference engine has no analog (scope ends at
join/aggregate, `ETL.java:1`); this is part of the mandated
training-data-pipeline surface.

Scale shape (100 TB):
- featurization is one narrow pass per document (explode n-grams,
  hash, count) followed by a (doc, bucket) partial-aggregated count —
  candidates never pair up, nothing is quadratic;
- the weight table is AT MOST ``n_buckets`` rows (fixed, e.g. 10k) —
  always broadcastable, independent of corpus size;
- scoring is one broadcast join + per-doc sum: embarrassingly
  parallel, shuffled only by doc id for the final aggregate.

Oracle-parity conventions (repo-wide, see operators/tfidf.py):
- the bucket hash is the PORTABLE md5-prefix hash (first 8 hex chars →
  uint32 → mod n_buckets) so DuckDB reproduces bucket assignment
  bit-for-bit;
- the log-ratio is quantized to an int64 microscale BEFORE the per-doc
  sum, making scores summation-order independent and exactly
  reproducible under any partitioning; the single ``ln`` call operates
  on a ratio of exact integers, identical in both engines (the idf
  convention).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.functions.text_exprs import tokens

#: microscale for the quantized log-ratio weights (repo convention)
DSIR_SCALE = 1_000_000


def _bucket(col: Column, n_buckets: int) -> Column:
    """Portable feature-hash bucket: first 32 bits of md5, mod B.
    DuckDB mirror: ``('0x' || substr(md5(g), 1, 8))::UBIGINT % B``."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def _flat_grams(text_col: str, max_n: int) -> Column:
    """One array of all 1..max_n-grams (space-joined lowercase
    whitespace tokens) — the shared featurization expression."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")

    def gram_expr(n: int) -> Column:
        # n-grams via the shared zipped shifted-slice build (see
        # text_exprs.ngram_join: 4.7x the slice-per-index transform,
        # value-identical; empty-array guard included)
        from implementation_of_an_etl_process_spark.functions.text_exprs import (
            ngram_join,
        )

        return ngram_join(toks, n)

    return F.flatten(F.array(*[gram_expr(n) for n in range(1, max_n + 1)]))


def hashed_ngram_counts(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 10_000,
    max_n: int = 2,
) -> DataFrame:
    """(id, bucket, cnt): hashed 1..max_n-gram counts per document —
    the DSIR feature vector in sparse (bucket, count) form. N-grams are
    space-joined lowercase whitespace tokens; hashing collisions are
    part of the method (they regularize, per the paper §3.1)."""
    return (
        docs.select(
            F.col(id_col),
            F.explode(_flat_grams(text_col, max_n)).alias("g"),
        )
        .filter(F.col("g") != "")
        .select(id_col, _bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_bucket_histogram(
    docs: DataFrame,
    text_col: str,
    *,
    is_target: Column,
    n_buckets: int = 10_000,
    max_n: int = 2,
) -> DataFrame:
    """(bucket, tc, rc): target- and raw-side hashed n-gram OCCURRENCE
    sums in ONE corpus pass — no per-document grouping, so the map-side
    partial aggregate reduces each task's output to at most
    ``n_buckets`` rows and the exchange is bucket-sized regardless of
    corpus size (the weight fit never needs per-doc features)."""
    occ = docs.select(
        is_target.alias("_is_t"),
        F.explode(_flat_grams(text_col, max_n)).alias("g"),
    ).filter(F.col("g") != "")
    return (
        occ.select("_is_t", _bucket(F.col("g"), n_buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(
            F.sum(F.when(F.col("_is_t"), 1).otherwise(0)).alias("tc"),
            F.sum(F.when(~F.col("_is_t"), 1).otherwise(0)).alias("rc"),
        )
    )


def dsir_logratio_weights(
    target_counts: DataFrame,
    raw_counts: DataFrame,
    *,
    n_buckets: int = 10_000,
    totals: tuple[int, int] | None = None,
) -> DataFrame:
    """(bucket, w_q): quantized log-likelihood-ratio weights
    ``round(ln(p_target(b) / p_raw(b)) * DSIR_SCALE)`` with add-one
    smoothing over the ``n_buckets`` hash space:

        p(b) = (cnt_b + 1) / (total + n_buckets)

    Inputs are (id, bucket, cnt) relations from
    :func:`hashed_ngram_counts`. The two ratios are combined into ONE
    ``ln`` over a ratio of exact int64 products, so both engines
    evaluate the identical double. Output is bounded by n_buckets rows
    — broadcastable at any corpus size.
    """
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("tc"))
    r = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("rc"))
    if totals is not None:
        # caller already knows the scalar totals (dsir_select computes
        # both in ONE aggregate over its persisted feature relation) —
        # no extra jobs here
        t_tot, r_tot = totals
    else:
        # standalone path: one job for both totals (union of two
        # single-row aggregates, not two separate collects)
        t_tot, r_tot = [
            row[0] or 0
            for row in target_counts.agg(F.sum("cnt"))
            .unionAll(raw_counts.agg(F.sum("cnt")))
            .collect()
        ]
    both = (
        t.join(r, "bucket", "full")
        .select(
            "bucket",
            F.coalesce("tc", F.lit(0)).alias("tc"),
            F.coalesce("rc", F.lit(0)).alias("rc"),
        )
    )
    return _weights_from_histogram(both, n_buckets, (int(t_tot), int(r_tot)))


def _weights_from_histogram(
    hist: DataFrame, n_buckets: int, totals: tuple[int, int]
) -> DataFrame:
    """(bucket, w_q) from a (bucket, tc, rc) histogram — the shared
    quantized log-ratio formula: one Spark-side ``ln`` on a ratio of
    exact int64 products, identical in any engine (products stay
    < 2^53 for corpora up to ~10^9 features per side at B=10k; shard
    the totals beyond that)."""
    t_tot, r_tot = totals
    num = (F.col("tc") + 1) * F.lit(int(r_tot) + n_buckets)
    den = (F.col("rc") + 1) * F.lit(int(t_tot) + n_buckets)
    return hist.select(
        "bucket",
        F.round(F.log(num.cast("double") / den.cast("double")) * DSIR_SCALE)
        .cast("long")
        .alias("w_q"),
    )


def dsir_scores(
    doc_counts: DataFrame,
    weights: DataFrame,
    id_col: str,
) -> DataFrame:
    """(id, n_feats, score_q): per-document importance score — the
    int64 sum of cnt * w_q over the document's hashed features (the
    total quantized log-likelihood ratio). Weight table is broadcast
    (bounded by n_buckets); one shuffle keyed by doc id."""
    return (
        doc_counts.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_feats"),
            F.sum(F.col("cnt") * F.col("w_q")).alias("score_q"),
        )
    )


def dsir_select(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    *,
    is_target: Column,
    k: int,
    n_buckets: int = 10_000,
    max_n: int = 2,
    strategy: str = "two_pass",
) -> DataFrame:
    """End-to-end DSIR top-k selection: fit weights target-vs-raw, score
    every raw document, return the k highest-scoring (id, n_feats,
    score_q) rows ordered by (score_q DESC, id) — integer columns only,
    deterministic under ties. Both strategies produce IDENTICAL rows
    (4M-doc set-equality asserted in tools/fullscale_dsir.py); either
    way the returned frame is an eagerly-checkpointed bounded top-k —
    collecting it runs no further corpus work.

    ``strategy="two_pass"`` (default — the 100 TB shape): pass 1
    aggregates the (bucket, tc, rc) OCCURRENCE histogram straight off
    the gram stream (map-side combine bounds the exchange at n_buckets
    rows per task; no per-doc grouping, nothing persisted) and pins it
    (<= n_buckets rows); totals and the broadcastable weight table
    derive from the histogram with no further corpus work. Pass 2
    re-streams only the RAW documents' gram occurrences through a
    broadcast weight join into the per-doc sum — per-occurrence w_q
    summation is exactly sum(cnt * w_q). Two corpus scans total, and
    the only shuffles are bucket-sized (pass 1) and one-row-per-doc
    (pass 2).

    ``strategy="persist"``: featurize ONCE into the (id, bucket, cnt,
    _is_t) relation persisted MEMORY_AND_DISK and derive everything
    from the cache (the round-6 fix for Catalyst replaying the
    featurization per consumer). One corpus scan, but the cached
    relation is ~corpus-sized (one row per (doc, distinct bucket)) —
    measured at 4M docs the persist's memory pressure costs more than
    the second scan it saves (fullscale_dsir A/B), which is why
    two_pass is the default; persist remains right when the feature
    relation is small or feeds further reuse."""
    if strategy == "two_pass":
        hist = dsir_bucket_histogram(
            docs,
            text_col,
            is_target=is_target,
            n_buckets=n_buckets,
            max_n=max_n,
        ).localCheckpoint(eager=True)  # corpus pass 1; <= n_buckets rows
        tot = hist.agg(F.sum("tc").alias("t"), F.sum("rc").alias("r")).collect()[0]
        weights = _weights_from_histogram(
            hist, n_buckets, (int(tot["t"] or 0), int(tot["r"] or 0))
        )
        raw_occ = (
            docs.filter(~is_target)
            .select(
                F.col(id_col),
                F.explode(_flat_grams(text_col, max_n)).alias("g"),
            )
            .filter(F.col("g") != "")
            .select(id_col, _bucket(F.col("g"), n_buckets).alias("bucket"))
        )
        scored = (
            raw_occ.join(F.broadcast(weights), "bucket")
            .groupBy(id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_feats"),
                F.sum("w_q").alias("score_q"),
            )
        )
        return (
            scored.orderBy(F.desc("score_q"), id_col)
            .limit(k)
            .localCheckpoint(eager=True)  # corpus pass 2
        )
    if strategy != "persist":
        raise ValueError(f"unknown strategy {strategy!r}")
    from pyspark import StorageLevel

    feats = hashed_ngram_counts(
        docs, id_col, text_col, n_buckets=n_buckets, max_n=max_n
    )
    flagged = feats.join(
        docs.select(F.col(id_col), is_target.alias("_is_t")), id_col
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        # job 1 (fills the cache): BOTH scalar totals in one aggregate
        tot = flagged.agg(
            F.sum(F.when(F.col("_is_t"), F.col("cnt"))).alias("t"),
            F.sum(F.when(~F.col("_is_t"), F.col("cnt"))).alias("r"),
        ).collect()[0]
        weights = dsir_logratio_weights(
            flagged.filter(F.col("_is_t")).select(id_col, "bucket", "cnt"),
            flagged.filter(~F.col("_is_t")).select(id_col, "bucket", "cnt"),
            n_buckets=n_buckets,
            totals=(int(tot["t"] or 0), int(tot["r"] or 0)),
        )
        raw_feats = flagged.filter(~F.col("_is_t")).select(
            id_col, "bucket", "cnt"
        )
        # job 2 (reads the cache): weight fit + scoring + bounded top-k,
        # materialized executor-side so unpersist can't trigger a replay
        return (
            dsir_scores(raw_feats, weights, id_col)
            .orderBy(F.desc("score_q"), id_col)
            .limit(k)
            .localCheckpoint(eager=True)
        )
    finally:
        flagged.unpersist()
