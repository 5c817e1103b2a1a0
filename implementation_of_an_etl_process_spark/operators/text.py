"""Text analysis operators: token counting, quality scoring, language
identification, document fingerprinting.

All pure Column expressions (codegen'd JVM execution) — at 100 TB these
run inside the parquet scan stage with zero extra shuffles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.functions.text_exprs import (
    rolling_hash,
    tokens,
)

# A BPE-ish pre-tokenization: letter runs, digit runs, punctuation runs.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"

# Tiny multilingual marker lists for the n-gram/stopword language
# heuristic. Deterministic and engine-portable by construction.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "es"),
    "zh": ("de", "shi", "le", "bu"),
}

EN_STOPWORDS = (
    "the a an and or of to in is are was for on with as at by it this that",
)


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count via regex pre-tokenization of lowercased
    text (letter runs / digit runs / punctuation runs)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(F.lower(c), F.lit(BPE_ISH_PATTERN), 0))


def quality_scores(df: DataFrame, text_col: str) -> DataFrame:
    """Append quality-signal columns used by corpus filtering pipelines:
    character/token counts, mean token length, punctuation density,
    alpha density, stopword ratio. Ratios are double divisions of exact
    int counts (engine-deterministic)."""
    c = F.col(text_col)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(c)
    stop_list = EN_STOPWORDS[0].split()
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop_list)))
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_alpha = F.length(F.regexp_replace(c, r"[^A-Za-z]", ""))
    return (
        df.withColumn("n_chars", n_chars.cast("int"))
        .withColumn("n_tokens", n_tokens)
        .withColumn(
            "mean_token_len",
            F.when(
                n_tokens > 0,
                (n_chars - (n_tokens - 1)).cast("double") / n_tokens.cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "stopword_ratio",
            F.when(
                n_tokens > 0, n_stop.cast("double") / n_tokens.cast("double")
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "punct_ratio",
            F.when(
                n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "alpha_ratio",
            F.when(
                n_chars > 0, n_alpha.cast("double") / n_chars.cast("double")
            ).otherwise(F.lit(0.0)),
        )
    )


def lang_id(col: Column | str) -> Column:
    """Marker-word language heuristic: count per-language marker tokens,
    pick the argmax (ties resolved by fixed language order). Returns
    'und' when no marker occurs."""
    toks = tokens(col)
    counts = {
        lang: F.size(F.filter(toks, lambda t: t.isin(*markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    langs = list(LANG_MARKERS)
    best_lang = F.lit("und")
    best_count = F.lit(0)
    # Fixed iteration order makes tie-breaking deterministic: earlier
    # languages win ties (strict > comparison against running best).
    for lang in langs:
        cnt = counts[lang]
        is_better = cnt > best_count
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_count = F.when(is_better, cnt).otherwise(best_count)
    return best_lang


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Document fingerprints: md5 of normalized text (exact-dup key) and
    the polynomial rolling hash (order-sensitive content hash)."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.trim(F.col(text_col)))).alias("md5"),
        rolling_hash(text_col).alias("roll_hash"),
    )


# Micro-quantization for surprisal (matches the repo-wide 1e6 scale).
SURPRISAL_SCALE = 1_000_000


def unigram_surprisal(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document unigram surprisal — the cheap, model-free analog of
    the LM-perplexity quality filter (CCNet-style): low average
    surprisal = boilerplate/repetitive text, unusually high = noise.

    Two-pass corpus-statistics shape:
    1. unigram counts over the whole corpus (shuffle keyed by term —
       output is vocabulary-sized, orders of magnitude below corpus
       size);
    2. join surprisal back onto the token stream and aggregate per doc
       (shuffle keyed by doc id). The vocab side is left to AQE: it
       broadcasts when it fits, hash-joins when a 100 TB corpus's
       vocabulary doesn't.

    surprisal(term) = -ln(cnt/total), micro-quantized to int64 BEFORE
    the per-doc sum so results are summation-order independent and
    oracle-exact (repo convention, see operators/tfidf.py).

    Output: (id, n_tokens, sum_surprisal_q, avg_surprisal_q), one row
    per document that has at least one token.
    """
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias(
            "term"
        ),
    ).filter(F.col("term") != "")
    # Materialize the vocabulary once (localCheckpoint: executor-side
    # storage, lineage truncated, auto-cleaned when the frame is GC'd).
    # The corpus is then tokenized exactly twice — the two-pass minimum:
    # once here, once for the join-back — and the corpus-total scalar
    # is a cheap sum over the checkpointed vocab, not a third pass.
    # Folding the scalar into the expression (vs a single-row broadcast
    # join) keeps the plan free of BroadcastNestedLoopJoin.
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint(eager=True)
    )
    total = vocab.agg(F.sum("cnt")).collect()[0][0]
    vq = vocab.select(
        "term",
        F.round(
            F.log(F.lit(float(total)) / F.col("cnt")) * SURPRISAL_SCALE
        )
        .cast("long")
        .alias("sup_q"),
    )
    return (
        tok.join(vq, "term")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("sup_q").alias("sum_surprisal_q"),
        )
        .select(
            id_col,
            "n_tokens",
            "sum_surprisal_q",
            # Integer-exact round-half-away-from-zero: (2s + n) div (2n)
            # (sum is non-negative here; sign() kept for generality).
            # No double division anywhere in the hashed output, so the
            # value cannot drift if an oracle engine rounds half-to-even.
            F.expr(
                "CAST(sign(sum_surprisal_q) AS BIGINT)"
                " * ((2 * abs(sum_surprisal_q) + n_tokens)"
                " div (2 * n_tokens))"
            ).alias("avg_surprisal_q"),
        )
    )


def adjacent_word_pairs(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The (id, w1, w2) adjacent-word-pair relation — built inside each
    row (array fold over the token array, no positional self-join).
    Shared by the bigram LM and the co-occurrence graph builders.

    Guard: F.sequence(2, n) DESCENDS for n < 2 (out-of-bounds
    element_at); docs with < 2 tokens have no pairs by contract. The
    tokenize is LET-BOUND (functions/text_exprs.py::let). Measured A/B
    at 1M docs: NEUTRAL here (65-69s both ways — downstream shuffles
    dominate, and codegen subexpression elimination already hoists the
    flat single-lambda reference), unlike winnowing's nested-HOF case
    where the bind is 11x; kept for defensive consistency."""
    from implementation_of_an_etl_process_spark.functions.text_exprs import (
        let,
    )

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    return docs.where(F.size(toks) >= 2).select(
        F.col(id_col),
        F.explode(
            let(
                toks,
                lambda ts: F.transform(
                    F.sequence(F.lit(2), F.size(ts)),
                    lambda j: F.struct(
                        F.element_at(ts, (j - F.lit(1)).cast("int")).alias(
                            "w1"
                        ),
                        F.element_at(ts, j.cast("int")).alias("w2"),
                    ),
                ),
            )
        ).alias("bg"),
    ).select(id_col, "bg.w1", "bg.w2")


def bigram_lm_score(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Per-document negative log-likelihood under a corpus-trained
    add-one-smoothed BIGRAM language model — the full CCNet-style
    LM-perplexity quality filter (Wenzek et al., "CCNet: Extracting
    High Quality Monolingual Datasets from Web Crawl Data", LREC 2020,
    uses a 5-gram KenLM; the bigram order keeps the model table
    corpus-derivable in one pass while exercising the identical
    pipeline shape). Low average NLL = repetitive/boilerplate, high =
    noise; both tails get cut in a real curation pass
    (:func:`unigram_surprisal` is the model-free proxy of this).

    Model: P(w2|w1) = (B(w1,w2) + 1) / (C(w1) + V), where B = corpus
    bigram count, C(w1) = occurrences of w1 as a context
    (= sum_w2 B(w1,w2)), V = distinct tokens appearing in any bigram.
    Everything derives from ONE bigram-count table, so training is a
    single tokenize pass + one vocabulary-sided shuffle.

    ``min_count`` bounds the MODEL table (CCNet-style pruning): bigrams
    seen fewer than ``min_count`` times are dropped from the model
    before C/V are derived, and pairs not in the pruned model score the
    smoothed-unseen NLL ln(C(w1) + V) (with C(w1) = 0 for contexts that
    vanished entirely) — add-one smoothing already prices unseen pairs,
    so pruning changes the model's SIZE class, not its shape. Zipf says
    roughly half a web corpus's unique bigrams are hapax: at 100 TB the
    unpruned model is O(10^9-10^10) rows, ``min_count=2`` halves it for
    one extra filter. Default 1 keeps the exact unpruned model (and the
    inner-join scoring plan).

    Scale shape (100 TB):
    - bigrams are built INSIDE each row (array fold over the token
      array, no positional self-join, no window);
    - the model table is unique-bigram-sized (far below corpus size);
      C and V are aggregates OVER that table, not extra corpus passes;
    - scoring re-tokenizes the corpus once and joins by (w1, w2) —
      vocabulary-sided, AQE broadcasts it when it fits;
    - NLL is micro-quantized to int64 per BIGRAM before the per-doc
      sum (summation-order independent, oracle-exact; repo convention,
      see SURPRISAL_SCALE).

    Output: (id, n_bigrams, sum_nll_q, avg_nll_q), one row per document
    with >= 2 tokens.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    pairs = adjacent_word_pairs(docs, id_col=id_col, text_col=text_col)
    # (empty-token filter happens BEFORE adjacency, so bigrams span the
    # filtered sequence — the oracle mirrors this with list_filter)
    model = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("b"))
    if min_count > 1:
        model = model.filter(F.col("b") >= min_count)
    model = model.localCheckpoint(eager=True)
    v = (
        model.select(F.col("w1").alias("w"))
        .union(model.select(F.col("w2").alias("w")))
        .distinct()
        .count()
    )
    ctx = model.groupBy("w1").agg(F.sum("b").alias("c"))
    scored = model.join(ctx, "w1").select(
        "w1",
        "w2",
        F.round(
            F.log(
                (F.col("c") + F.lit(v)).cast("double")
                / (F.col("b") + F.lit(1)).cast("double")
            )
            * SURPRISAL_SCALE
        )
        .cast("long")
        .alias("nll_q"),
    )
    if min_count > 1:
        # pruned model: unmatched pairs take the smoothed-unseen NLL
        # ln(C(w1) + V) (b = 0 in the add-one formula); both joins stay
        # vocabulary-sided and the per-bigram quantization contract is
        # unchanged. min_count=1 keeps the inner-join plan below (every
        # corpus pair is in the model, so the left joins would be a
        # plan-only regression there).
        # greatest(.., 1) guards the degenerate fully-pruned model
        # (V = 0 would make ln undefined); NLL 0 is the only coherent
        # score when no model survives
        unseen_q = (
            F.round(
                F.log(
                    F.greatest(
                        F.coalesce(F.col("c"), F.lit(0)) + F.lit(v),
                        F.lit(1),
                    ).cast("double")
                )
                * SURPRISAL_SCALE
            )
            .cast("long")
        )
        scored_pairs = (
            pairs.join(scored.select("w1", "w2", "nll_q"), ["w1", "w2"], "left")
            .join(ctx, "w1", "left")
            .select(
                id_col, F.coalesce(F.col("nll_q"), unseen_q).alias("nll_q")
            )
        )
    else:
        scored_pairs = pairs.join(scored, ["w1", "w2"])
    return (
        scored_pairs
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("nll_q").alias("sum_nll_q"),
        )
        .select(
            id_col,
            "n_bigrams",
            "sum_nll_q",
            # integer-exact round-half-away-from-zero (repo convention)
            F.expr(
                "CAST(sign(sum_nll_q) AS BIGINT)"
                " * ((2 * abs(sum_nll_q) + n_bigrams)"
                " div (2 * n_bigrams))"
            ).alias("avg_nll_q"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    "Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD
    2003) — the MOSS algorithm: hash every word k-gram, slide a window
    of ``w`` consecutive hashes, select each window's minimum
    (rightmost on ties), keep the distinct (hash, position)
    selections. GUARANTEE: two documents sharing any run of
    >= w + k - 1 tokens share at least one fingerprint — a local
    property MinHash can't give (its collisions are probabilistic).

    Portable hashing (first 8 md5 hex chars of the space-joined gram,
    the module's engine convention) so the oracle reproduces every
    fingerprint bit-for-bit. Documents with fewer than k tokens yield
    no row; documents with fewer than w grams use one window over all
    grams (the natural degeneration).

    Pure Column expressions per document (transform/slice folds — the
    O(m*w) work happens inside codegen, no UDF, no shuffle); output is
    the exploded (id, fp_hash, fp_pos) relation.
    """
    from implementation_of_an_etl_process_spark.functions.text_exprs import (
        let,
    )

    raw_words = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    n = F.size(raw_words)

    def _hashes(words):
        # grams via the zipped shifted-slice build (text_exprs.
        # ngram_join: 4.7x the slice-per-index transform), hashed
        # element-wise — same strings, same order
        from implementation_of_an_etl_process_spark.functions.text_exprs import (
            ngram_join,
        )

        return F.transform(
            ngram_join(words, k),
            lambda g: F.conv(
                F.substring(F.md5(g), 1, 8), 16, 10
            ).cast("long"),
        )

    # both binds matter: the tokenize would otherwise re-run per GRAM
    # and the md5 gram array per WINDOW (Catalyst has no CSE across
    # HOF lambdas — measured 84.3s -> 7.6s at 50k docs; see
    # functions/text_exprs.py::let)
    m = n - k + 1  # gram count
    wl = F.least(F.lit(w), m)  # window length (degenerate: all grams)
    n_win = F.greatest(m - w + 1, F.lit(1))
    sels = let(
        let(raw_words, _hashes),
        lambda hs: F.transform(
            F.sequence(F.lit(1), n_win),
            lambda j: let(
                F.slice(hs, j, wl),
                lambda sub: F.struct(
                    F.array_min(sub).alias("fp_hash"),
                    (
                        j
                        + (
                            wl
                            - F.array_position(
                                F.reverse(sub), F.array_min(sub)
                            )
                            + 1
                        )
                        - 1
                    ).cast("long").alias("fp_pos"),
                ),
            ),
        ),
    )
    return (
        docs.where(n >= k)
        .select(F.col(id_col), F.explode(F.array_distinct(sels)).alias("fp"))
        .select(id_col, F.col("fp.fp_hash"), F.col("fp.fp_pos"))
    )


def winnow_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """Near-dup / partial-overlap pairs from winnowing fingerprints:
    inverted index on fp_hash, pairs counted by DISTINCT shared hash
    values, kept at >= ``min_shared``. ``max_df`` drops fingerprints
    appearing in more than that many documents (stop-gram cutoff — the
    same hot-posting bound the TF-IDF index uses; a fingerprint shared
    by half the corpus identifies boilerplate, not overlap, and its
    posting list would drive the self-join quadratic).

    Scale shape: one explode+distinct per doc (fingerprints), one
    df-capped inverted-index self-join keyed by fp_hash, one pair
    aggregate — never an all-pairs product.
    """
    fps = winnow_fingerprints(
        docs, id_col=id_col, text_col=text_col, k=k, w=w
    )
    postings = fps.select(F.col(id_col).alias("_id"), "fp_hash").distinct()
    df_ok = (
        postings.groupBy("fp_hash")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("fp_hash")
    )
    p = postings.join(df_ok, "fp_hash")
    a = p.select(F.col("_id").alias("id_a"), "fp_hash")
    b = p.select(F.col("_id").alias("id_b"), "fp_hash")
    return (
        a.join(b, "fp_hash")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )
