"""Training-data pipeline operators: the corpus-preparation steps that
sit between raw documents and a tokenizer at 100 TB scale.

- ``vocab_topk``: corpus vocabulary with counts, top-k. One shuffle on
  the token (classic wordcount: fully map-side combined — the exchange
  carries one row per distinct token per task, not per occurrence).
- ``hash_split``: deterministic train/val/test assignment from a
  content-stable hash of the document id. No randomness, no state: any
  worker, any retry, any engine assigns the same split — the property
  that makes splits reproducible across reruns and auditable in SQL.
- ``pack_sequences``: GPT-style document packing — concatenate the
  corpus in a deterministic order, cut every ``budget`` tokens; a
  document's pack is the chunk its first token lands in. Expressed as
  a window cumulative sum; ``partition_by`` shards the packing (the
  scale path: one global ORDER BY is a single-sequencer at 100 TB, so
  pack per language/source shard — which is also what training mixes
  want).
- ``stratified_sample``: per-stratum deterministic sampling by hash
  threshold (keep iff h(id) mod D < rate*D). Unlike ``df.sample``,
  membership is a pure function of the row — stable across retries,
  reproducible for lineage audits, and exactly mirrorable in SQL.

All four are pure DataFrame/Column compositions — no UDFs, no
collect; the only Python is literal arithmetic at plan-build time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.functions.text_exprs import tokens

# Denominator for hash-bucket assignment. 10_000 gives basis-point
# resolution for split weights / sample rates.
HASH_BUCKETS = 10_000
# A-ES priority keys are quantized to int64 at this scale before the
# top-k so both engines select by exact-integer comparison (see
# weighted_sample).
AES_KEY_SCALE = 10**12


def id_hash_bucket(col: Column | str, *, buckets: int = HASH_BUCKETS) -> Column:
    """Deterministic bucket in [0, buckets) from the decimal rendering
    of an id: first 8 md5 hex chars as an int (engine-portable — DuckDB:
    ``('0x'||substr(md5(CAST(id AS VARCHAR)),1,8))::UBIGINT % buckets``).
    """
    c = F.col(col) if isinstance(col, str) else col
    h = F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")
    return F.pmod(h, F.lit(buckets))


def vocab_topk(
    df: DataFrame,
    text_col: str,
    *,
    k: int = 100,
    min_count: int = 1,
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k corpus vocabulary: (token, n_docs, n_occurrences), ordered
    by occurrences desc then token asc (deterministic tie-break)."""
    tok = df.select(
        F.col(id_col).alias("_vid"), F.explode(tokens(text_col)).alias("token")
    )
    return (
        tok.groupBy("token")
        .agg(
            F.countDistinct("_vid").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
        )
        .filter(F.col("n_occurrences") >= min_count)
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(k)
    )


def hash_split(
    df: DataFrame,
    id_col: str,
    *,
    val_pct: int = 100,
    test_pct: int = 100,
) -> DataFrame:
    """Append a ``split`` column: 'val' for the first ``val_pct``
    buckets, 'test' for the next ``test_pct``, 'train' for the rest
    (percentages in basis points of :data:`HASH_BUCKETS`)."""
    b = id_hash_bucket(id_col)
    return df.withColumn(
        "split",
        F.when(b < val_pct, F.lit("val"))
        .when(b < val_pct + test_pct, F.lit("test"))
        .otherwise(F.lit("train")),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    budget: int,
    partition_by: str | None = None,
) -> DataFrame:
    """(id, n_tokens, start_offset, pack_id): concatenate documents in
    ``id_col`` order (within ``partition_by`` shards if given) and cut
    every ``budget`` tokens; ``pack_id`` is the chunk the document
    STARTS in. A document longer than the budget spans chunks — exactly
    what block-wise pretraining tokenization does."""
    n_tok = F.size(tokens(text_col))
    w = (
        W.partitionBy(partition_by) if partition_by else W.partitionBy()
    ).orderBy(F.col(id_col).asc()).rowsBetween(W.unboundedPreceding, W.currentRow)
    out_cols = ([partition_by] if partition_by else []) + [id_col]
    cum = F.sum(n_tok).over(w)
    return df.select(
        *out_cols,
        n_tok.alias("n_tokens"),
        (cum - n_tok).alias("start_offset"),
        F.floor((cum - n_tok) / budget).alias("pack_id"),
    )


def global_rank(
    df: DataFrame,
    key_cols: list[str],
    *,
    out_col: str = "pos",
    n_parts: int | None = None,
) -> DataFrame:
    """Scalable 1-based global rank by ``key_cols`` (must be a total
    order): range-partition on the keys, rank WITHIN each partition
    (parallel per-partition windows), then add each partition's offset.

    This is the distributed zipWithIndex shape — a bare
    ``Window.orderBy`` without partitionBy moves EVERY row to one task
    and cannot scale. The per-partition counts are a bounded
    driver-side list (one int per partition, same contract as a
    broadcast); the data is localCheckpoint'd so the counting job and
    the ranking job see the identical partitioning."""
    spark = df.sparkSession
    n = n_parts or int(spark.conf.get("spark.sql.shuffle.partitions"))
    d = (
        df.repartitionByRange(n, *key_cols)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in d.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    omap = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = W.partitionBy("_pid").orderBy(*[F.col(c).asc() for c in key_cols])
    return d.withColumn(
        out_col, F.row_number().over(w) + omap[F.col("_pid")]
    ).drop("_pid")


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff its id-hash bucket falls under its stratum's
    rate. ``rates`` maps stratum value -> fraction in [0,1]."""
    b = id_hash_bucket(id_col)
    thresh: Column = F.lit(int(default_rate * HASH_BUCKETS))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(rate * HASH_BUCKETS))
        ).otherwise(thresh)
    return df.filter(b < thresh)


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    *,
    seed: str = "ws1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — Efraimidis & Spirakis
    A-ES ("Weighted random sampling with a reservoir", IPL 2006): each
    row gets priority u^(1/w) for a uniform u, and the k largest
    priorities form an exact without-replacement
    probability-proportional-to-size sample. Used here with the
    monotone-equivalent key ln(u)/w (all <= 0, larger is better),
    which avoids the pow and keeps the expression trivially portable.
    (ln(u) is at most ln(2**-32) ~ -22.2 in magnitude, so the scaled
    key fits comfortably in int64 at AES_KEY_SCALE=1e12.)

    Deterministic and engine-portable: u = (h + 1) / 2**32 with h the
    first 8 md5 hex chars of ``seed || ':' || id`` (the module's
    portable-hash convention, :func:`id_hash_bucket`) — the DuckDB
    oracle reproduces the exact same keys. Weights are clamped to
    >= 1; ties break on id. The double key is QUANTIZED to int64 at
    ``AES_KEY_SCALE`` (micro-quantization, the repo's SURPRISAL_SCALE
    convention) before the top-k, so a 1-ulp libm divergence between
    JVM Math.log and DuckDB's log on a key straddling the k-th-place
    boundary cannot flip the selected row — selection compares exact
    integers on both engines.

    Scale shape: zero shuffles — the top-k compiles to
    TakeOrderedAndProject (per-partition k-bounded heaps merged on the
    driver), so cost is one scan + O(k) memory regardless of corpus
    size; this is the reason to prefer A-ES over "sort all rows by
    priority", which pays a full range shuffle for the same sample.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    c = F.col(id_col)
    return (
        df.withColumn("_aes_key", _aes_key(id_col, weight_col, seed))
        .orderBy(F.col("_aes_key").desc(), c.asc())
        .limit(k)
        .drop("_aes_key")
    )


def _aes_key(id_col: str, weight_col: str, seed: str) -> Column:
    """The quantized A-ES priority (see :func:`weighted_sample`)."""
    c = F.col(id_col)
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), c.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    u = (h + F.lit(1)).cast("double") / F.lit(float(1 << 32))
    return F.round(
        F.log(u)
        / F.greatest(F.col(weight_col), F.lit(1)).cast("double")
        * F.lit(float(AES_KEY_SCALE))
    ).cast("long")


def weighted_sample_per_group(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    group_col: str,
    k: int,
    *,
    seed: str = "wg1",
    salt: int | None = None,
) -> DataFrame:
    """A-ES weighted sampling without replacement, k PER GROUP — the
    stratified form every mixture pipeline wants ("best 10k docs per
    language/source, length-weighted"). Same quantized portable
    priority as :func:`weighted_sample`; the top-k-per-group is a
    rank-over-window, so the cost is ONE shuffle on the group key (the
    minimum any per-group semantics can pay without a pre-bucketed
    layout) and the per-partition sort is k-independent. Ties break on
    id; rows keep their columns.

    Scale note vs the global sampler: the global one is zero-shuffle
    (TakeOrderedAndProject); per-group cannot be, but the window
    carries only rank state — no collect, no per-group materialization
    beyond the winners. Measured at 50M rows / 20 groups: 9.6s vs the
    global path's 6.6s — the +45% is the group shuffle.

    Few-huge-groups caveat, RESOLVED by Catalyst on Spark 4: a
    rank-then-``filter(_rn <= k)`` plan gets a map-side
    ``WindowGroupLimit`` BEFORE the group-key Exchange (asserted in
    tests/test_plans.py), so every map task sorts its own partition in
    parallel and ships only its local top-k per group — the exchange
    carries <= n_map_tasks x n_groups x k rows and the "n_groups
    window tasks" only merge that bounded set. The group count
    therefore does NOT cap the heavy sort's parallelism. Measured at
    50M rows / 4 groups over staged keys (ABAB min, idle host): plain
    window 3.4s vs explicit salt=8 two-stage 3.8s — salting is
    REDUNDANT here, kept only as an escape hatch for engines/planners
    without the rewrite (pass ``salt=s`` to split each group into s
    deterministic sub-groups; EXACT by construction — every global
    top-k row is top-k within its own sub-group, and the battery gate
    ``weighted_sample_per_lang`` hash-checks the salted path against
    the unsalted oracle)."""
    if k < 1:
        raise ValueError("k must be >= 1")
    keyed = df.withColumn("_aes_key", _aes_key(id_col, weight_col, seed))
    if salt is not None and salt > 1:
        w1 = W.partitionBy(group_col, "_aes_salt").orderBy(
            F.col("_aes_key").desc(), F.col(id_col).asc()
        )
        keyed = (
            keyed.withColumn(
                "_aes_salt",
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt)),
            )
            .withColumn("_rn", F.row_number().over(w1))
            .filter(F.col("_rn") <= k)
            .drop("_aes_salt", "_rn")
        )
    w = W.partitionBy(group_col).orderBy(
        F.col("_aes_key").desc(), F.col(id_col).asc()
    )
    return (
        keyed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_aes_key", "_rn")
    )


def materialize_mixture(
    df: DataFrame,
    source_col: str,
    text_col: str,
    *,
    token_budget: int,
    alpha: float = 0.7,
    id_col: str = "doc_id",
    pow_scale: int = 1_000,
) -> DataFrame:
    """Materialize an alpha-sampled training mixture: turn per-source
    temperature weights (p_i = n_i^alpha / sum n_j^alpha, the same
    recipe ``source_mixture_weights`` reports) plus a total
    ``token_budget`` into the actual doc-copy list a tokenizer would
    consume. A source whose target exceeds its size is REPEATED
    (epochs), the fractional remainder is filled by deterministic
    hash sampling — so membership is a pure function of the row, and
    any engine/retry materializes the identical mixture.

    Output: one row per (document, epoch) copy —
    ``(id, source, epoch, n_tokens)`` with epoch 0-based.

    All selection arithmetic is integer: the per-source repeat rate in
    hash-bucket units is r = (target_tokens * BUCKETS) div n_tokens_src
    with target_tokens = pw_q * budget div tot_pw computed in
    DECIMAL(38,0) (pw_q * budget overflows int64 once a source holds
    ~10^13 tokens at a 100 TB corpus); a doc gets r div BUCKETS full
    copies plus one more iff its md5 bucket < r mod BUCKETS. All
    operands are non-negative so Spark's truncating ``div`` and
    DuckDB's flooring ``//`` agree.

    Scale shape: one map-side-combined aggregate to the per-source
    table (one row per source — broadcast back by construction), a
    scalar total, then a narrow per-row explode of at most
    ceil(rate) copies. No window, no global sort, no collect; output
    size is ~budget tokens regardless of corpus size.
    """
    n_tok = F.size(tokens(text_col))
    per = (
        df.groupBy(source_col)
        .agg(F.sum(n_tok).cast("long").alias("_n_tokens_src"))
        .withColumn(
            "_pw_q",
            F.round(F.pow(F.col("_n_tokens_src"), F.lit(alpha)) * pow_scale)
            .cast("long"),
        )
    )
    # total alpha-mass via a global window over the per-source table
    # (rows = distinct sources, bounded small) — NOT a separate
    # aggregate of `per`: Catalyst does not dedupe the shared subtree,
    # so per.agg() would re-scan the corpus a third time. The plan
    # audit pins two corpus scans (the minimum: rates depend on a
    # global aggregate, the copy list on per-doc rows).
    rates = (
        per.withColumn(
            "_tot_pw", F.sum("_pw_q").over(W.partitionBy())
        )
        .withColumn(
            "_target",
            F.expr(
                f"CAST(_pw_q AS DECIMAL(38,0)) * {token_budget} div _tot_pw"
            ),
        )
        .withColumn(
            "_r",
            F.expr(
                f"CAST(_target AS DECIMAL(38,0)) * {HASH_BUCKETS}"
                " div _n_tokens_src"
            ),
        )
        .select(source_col, "_r")
    )
    n_copies = F.expr(f"_r div {HASH_BUCKETS}") + (
        id_hash_bucket(id_col) < F.pmod(F.col("_r"), F.lit(HASH_BUCKETS))
    ).cast("long")
    return (
        df.select(id_col, source_col, n_tok.alias("n_tokens"))
        .join(F.broadcast(rates), source_col)
        .withColumn("_copies", n_copies)
        .filter(F.col("_copies") > 0)
        .select(
            id_col,
            source_col,
            F.explode(
                F.sequence(F.lit(0), F.col("_copies") - 1)
            ).alias("epoch"),
            "n_tokens",
        )
    )
