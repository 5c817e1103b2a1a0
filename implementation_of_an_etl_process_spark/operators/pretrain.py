"""Pretraining-corpus hygiene operators: benchmark-contamination
screening, repetition scoring, PII redaction, URL/boilerplate
stripping, and paragraph-level deduplication.

These are the document-level filters an LLM training-data pipeline
runs between raw ingest and tokenization (the reference engine stops
at OLAP aggregation — ``ETL.java`` has no text surface — so this whole
module is generalization, not parity). Everything is built from
codegen'd Column expressions plus explode/groupBy shapes that
partial-aggregate, so each operator is one fact-side shuffle at most:

- contamination: the benchmark n-gram set is DISTINCT-ed and hash-joined
  (broadcast when small — eval suites are tiny next to a corpus).
- repetition: per-(doc, word) counts partial-aggregate map-side; the
  per-doc top-k is a bounded window over already-reduced rows.
- redaction/stripping: pure regexp Column expressions, zero shuffles.
- paragraph dedup: one shuffle keyed by chunk hash; first-occurrence
  choice is deterministic (global (doc, position) order).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.functions.text_exprs import (
    ngram_join,
)

__all__ = [
    "word_ngrams",
    "bloom_filter_build",
    "bloom_membership",
    "bloom_merge",
    "contamination_overlap",
    "repetition_stats",
    "pii_redact",
    "strip_urls",
    "canonicalize_url",
    "html_main_text",
    "paragraph_dedup",
    "chunk_documents",
    "duplicate_spans",
    "duplicate_span_stats",
    "remove_duplicate_spans",
]


def word_ngrams(text: Column | str, n: int, sep: str = " ") -> Column:
    """Array of word ``n``-grams (space-joined strings) of ``text``.

    Pure Column expression (sequence/transform/slice stay inside
    whole-stage codegen). Shorter-than-``n`` texts yield an empty array
    rather than a sequence error.
    """
    t = F.col(text) if isinstance(text, str) else text
    # zipped shifted-slice build (see text_exprs.ngram_join: 4.7x the
    # slice-per-index transform, value-identical)
    return ngram_join(F.split(t, sep), n, sep)


def _bloom_probes(value: Column, *, m_bits: int, k: int) -> Column:
    """Array of k (word_idx, mask) probe structs for ``value``.

    Position j = pmod(portable_hash64('bj:' || value), m_bits); word =
    position div 64, mask = 1 << (position % 64). ``m_bits`` must be a
    power of two so Spark's SIGNED pmod and DuckDB's UNSIGNED modulo
    agree (2^64 ≡ 0 mod m ⇒ the signed and unsigned readings of the
    same 64 hash bits are congruent mod m).
    """
    from implementation_of_an_etl_process_spark.operators.dedup import (
        portable_hash64,
    )

    probes = []
    for j in range(k):
        pos = F.pmod(
            portable_hash64(F.concat(F.lit(f"b{j}:"), value)),
            F.lit(m_bits).cast("long"),
        )
        # pos is non-negative: div/mod 64 are pure bit ops (>> 6, & 63).
        # call_function: the python shiftleft() wrapper only takes a
        # literal shift amount; the SQL function accepts a Column.
        probes.append(
            F.struct(
                F.shiftright(pos, 6).alias("word_idx"),
                F.call_function(
                    "shiftleft",
                    F.lit(1).cast("long"),
                    pos.bitwiseAND(F.lit(63).cast("long")).cast("int"),
                ).alias("mask"),
            )
        )
    return F.array(*probes)


def _check_bloom_params(m_bits: int, k: int) -> None:
    if m_bits < 64 or m_bits & (m_bits - 1):
        raise ValueError(f"m_bits must be a power of two >= 64: {m_bits}")
    if not 1 <= k <= 16:
        raise ValueError(f"k must be in [1, 16]: {k}")


def bloom_filter_build(
    values: DataFrame,
    value_col: str,
    *,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Build a portable Bloom filter over ``values[value_col]`` as a
    RELATION: (word_idx long, bits long), at most m_bits/64 rows.

    Why: `contamination_overlap` joins candidates against the DISTINCT
    benchmark n-gram set — broadcastable while eval suites are small,
    but a full contamination corpus (every published benchmark × all
    paraphrase expansions, or "every document we ever served") can be
    GBs of n-grams. The Bloom relation is **O(m_bits) regardless of
    how many values went in** — 2 KB..2 MB — so the probe side joins
    against a broadcast bitset and the corpus never shuffles, at the
    price of a bounded false-positive rate
    (~(1 - e^{-kn/m})^k; size m for your n). The build is one
    map-side-combined `bit_or` aggregate, so it is mergeable across
    partitions, batches, and days exactly like any distributive
    aggregate (union new values = build over the delta + bit_or the
    two relations).

    Portability: md5-derived positions (``portable_hash64``), so a
    DuckDB oracle reconstructs the identical bitset word-for-word.
    """
    _check_bloom_params(m_bits, k)
    return (
        values.select(
            F.explode(
                _bloom_probes(F.col(value_col), m_bits=m_bits, k=k)
            ).alias("p")
        )
        .groupBy(F.col("p.word_idx").alias("word_idx"))
        .agg(F.bit_or("p.mask").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union two Bloom filters built with identical (m_bits, k): the
    bitsets OR together — the per-batch/per-day summary pattern (build
    over the delta, merge into the running filter), same contract as
    ``operators/sketch.py::cms_merge``."""
    return (
        a.unionByName(b)
        .groupBy("word_idx")
        .agg(F.bit_or("bits").alias("bits"))
    )


def bloom_membership(
    probes: DataFrame,
    bloom: DataFrame,
    value_col: str,
    *,
    m_bits: int = 1 << 17,
    k: int = 4,
    out_col: str = "maybe_member",
) -> DataFrame:
    """``probes`` plus a boolean ``out_col``: True iff value_col's k
    Bloom positions are ALL set in ``bloom`` (maybe-present), False =
    definitely absent. Row-preserving (1:1 with ``probes``).

    Shape: k BROADCAST left joins against the <= m/64-row bitset
    relation — ZERO shuffles of the probe side and no re-aggregation.
    (The first cut exploded the k probes and grouped them back per
    probe row; at 149M grams that groupBy was a 600M-row shuffle
    costing more than the exact gram join it replaces — measured
    197.7s vs 128.4s. The k-join form keeps the probe side streaming.)
    """
    _check_bloom_params(m_bits, k)
    keys = list(probes.columns)
    arr = _bloom_probes(F.col(value_col), m_bits=m_bits, k=k)
    out = probes.select(
        "*",
        *[F.element_at(arr, j + 1).alias(f"_p{j}") for j in range(k)],
    )
    cond = F.lit(True)
    for j in range(k):
        bj = bloom.select(
            F.col("word_idx").alias(f"_w{j}"), F.col("bits").alias(f"_b{j}")
        )
        out = out.join(
            F.broadcast(bj), out[f"_p{j}.word_idx"] == bj[f"_w{j}"], "left"
        )
        cond = cond & (
            F.col(f"_b{j}").isNotNull()
            & (
                F.col(f"_b{j}").bitwiseAND(F.col(f"_p{j}.mask"))
                == F.col(f"_p{j}.mask")
            )
        )
    return out.select(*keys, cond.alias(out_col))


def contamination_overlap(
    candidates: DataFrame,
    benchmark: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
    flag_threshold: float = 0.2,
) -> DataFrame:
    """Benchmark-contamination screen: for every candidate document,
    the fraction of its distinct word ``n``-grams that appear anywhere
    in the benchmark set.

    Output: (id, n_ngrams, n_hits, overlap, contaminated). A document
    shorter than ``n`` words has n_ngrams=0 and overlap 0.0.

    Scale shape: the benchmark side reduces to DISTINCT n-grams before
    the join — for real eval suites that is kilobytes-to-megabytes, so
    the join broadcasts and the candidate side never shuffles; the
    per-doc ratio aggregates on the already-exploded partitions.
    """
    bench_grams = (
        benchmark.select(
            F.explode(word_ngrams(text_col, n)).alias("_gram")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    cand = candidates.select(
        F.col(id_col),
        F.explode_outer(
            F.array_distinct(word_ngrams(text_col, n))
        ).alias("_gram"),
    )
    joined = cand.join(bench_grams, "_gram", "left")
    out = joined.groupBy(id_col).agg(
        F.count("_gram").alias("n_ngrams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hits"),
    )
    overlap = F.when(
        F.col("n_ngrams") > 0, F.col("n_hits") / F.col("n_ngrams")
    ).otherwise(F.lit(0.0))
    return out.select(
        id_col,
        "n_ngrams",
        "n_hits",
        overlap.alias("overlap"),
        (overlap >= flag_threshold).alias("contaminated"),
    )


def repetition_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    mode: str = "shuffle",
) -> DataFrame:
    """Gopher-style repetition signals per document: total words, the
    frequency share of the single most common word, the share of the
    top-2 words, and the duplicate-3-gram fraction.

    Ties in word frequency break lexicographically so the top-2 sum is
    deterministic. The 3-gram dup fraction never leaves the row
    (array_distinct on the ngram array), so that signal is shuffle-free;
    in the default ``mode="shuffle"`` the word shares cost one
    partial-aggregated shuffle on (doc, word).

    ``mode="narrow"`` computes the identical values (same tie-break,
    same integer counts, so bit-identical doubles) with ZERO shuffle:
    per-row distinct-word counts via higher-order functions and an
    array_sort comparator. Per-row cost is O(distinct x length) string
    comparisons. Measured at 4M 40-word docs (interleaved min-of-2,
    BASELINE_NOTES): shuffle 181.3s vs narrow 204.1s — within host
    noise of each other, because partial aggregation already reduces
    the exchange to one row per distinct (doc, word). Shuffle stays
    the default; narrow's value is eliminating the exchange entirely
    (e.g. inside a streaming micro-batch, or stacked with other
    narrow stages in one codegen pass), not wall time.
    """
    if mode not in ("shuffle", "narrow"):
        raise ValueError(f"unknown mode {mode!r}")
    tri = word_ngrams(text_col, 3)
    if mode == "narrow":
        w = F.split(F.col(text_col), " ")
        counts = F.transform(
            F.array_distinct(w),
            lambda x: F.struct(
                F.size(F.filter(w, lambda y: y == x)).alias("c"),
                x.alias("w"),
            ),
        )
        srt = F.array_sort(
            counts,
            lambda l, r: F.when(l["c"] != r["c"], r["c"] - l["c"]).otherwise(
                F.when(l["w"] < r["w"], F.lit(-1))
                .when(l["w"] > r["w"], F.lit(1))
                .otherwise(F.lit(0))
            ),
        )
        top1 = srt[F.lit(0)]["c"]
        top2 = top1 + F.when(
            F.size(srt) > 1, srt[F.lit(1)]["c"]
        ).otherwise(F.lit(0))
        # cast + null filter keep narrow a bit-identical drop-in for
        # shuffle: explode() drops null-text docs there, and the
        # summed count is int64 while size() is int32
        n_words = F.size(w).cast("long")
        n3 = F.size(tri)
        d3 = F.size(tri) - F.size(F.array_distinct(tri))
        return docs.filter(F.col(text_col).isNotNull()).select(
            F.col(id_col),
            n_words.alias("n_words"),
            (top1 / n_words).alias("top_word_frac"),
            (top2 / n_words).alias("top2_word_frac"),
            F.when(n3 > 0, d3 / n3).otherwise(F.lit(0.0)).alias(
                "dup_3gram_frac"
            ),
        )
    base = docs.select(
        F.col(id_col),
        F.split(F.col(text_col), " ").alias("_w"),
        F.size(tri).alias("_n3"),
        (F.size(tri) - F.size(F.array_distinct(tri))).alias("_d3"),
    )
    per_word = (
        base.select(id_col, "_n3", "_d3", F.explode("_w").alias("_word"))
        .groupBy(id_col, "_n3", "_d3", "_word")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    rn = F.row_number().over(
        W.partitionBy(id_col).orderBy(F.col("_c").desc(), F.col("_word").asc())
    )
    ranked = per_word.withColumn("_rn", rn)
    return (
        ranked.groupBy(id_col, "_n3", "_d3")
        .agg(
            F.sum("_c").alias("n_words"),
            F.max(F.when(F.col("_rn") == 1, F.col("_c"))).alias("_top1"),
            F.sum(F.when(F.col("_rn") <= 2, F.col("_c"))).alias("_top2"),
        )
        .select(
            id_col,
            "n_words",
            (F.col("_top1") / F.col("n_words")).alias("top_word_frac"),
            (F.col("_top2") / F.col("n_words")).alias("top2_word_frac"),
            F.when(F.col("_n3") > 0, F.col("_d3") / F.col("_n3"))
            .otherwise(F.lit(0.0))
            .alias("dup_3gram_frac"),
        )
    )


# Conservative RE2/Java-portable PII patterns (no lookaround).
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}-\d{3}-\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}

URL_PATTERN = r"https?://[^\s]+"


def pii_redact(
    docs: DataFrame, *, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Redact emails / SSNs / phone numbers / IPv4s to ``<KIND>``
    placeholders and count each kind per row. Pure regexp Column
    expressions — no shuffle, no Python in the hot path.

    SSN runs before the (overlapping) phone pattern; counts are taken
    on the original text so they reflect pre-redaction occurrences.
    """
    out = docs
    for kind, pat in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{kind}",
            F.size(F.regexp_extract_all(F.col(text_col), F.lit(pat), 0)),
        )
    cleaned = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        cleaned = F.regexp_replace(cleaned, pat, f"<{kind.upper()}>")
    return out.withColumn(out_col, cleaned)


def strip_urls(
    docs: DataFrame, *, text_col: str = "text", out_col: str = "clean_text"
) -> DataFrame:
    """Remove URLs and collapse the leftover whitespace; report the URL
    count and cleaned length. Shuffle-free Column expressions."""
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), URL_PATTERN, ""), r"\s+", " "
        )
    )
    return docs.withColumn(
        "n_urls",
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(URL_PATTERN), 0)),
    ).withColumn(out_col, cleaned)


def paragraph_dedup(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 20,
) -> DataFrame:
    """Paragraph-level (fixed word-window) exact dedup across the
    corpus: split each document into consecutive ``chunk_words``-word
    chunks, keep only the globally-first occurrence of each distinct
    chunk (ordered by (doc id, position)), and report per-document
    survival.

    Output: (id, n_chunks, n_kept, kept_frac). One shuffle keyed by
    chunk content; the window input is one row per (chunk, doc,
    position), already minimal. At corpus scale substitute the chunk
    string with its hash to shrink the shuffle payload — kept exact
    here so the oracle can reproduce it verbatim.
    """
    w = F.split(F.col(text_col), " ")
    chunks = F.transform(
        F.sequence(
            F.lit(0), F.floor((F.size(w) - 1) / chunk_words).cast("int")
        ),
        lambda i: F.array_join(
            F.slice(w, i * chunk_words + 1, chunk_words), " "
        ),
    )
    exploded = docs.select(
        F.col(id_col), F.posexplode(chunks).alias("pos", "chunk")
    )
    first = F.row_number().over(
        W.partitionBy("chunk").orderBy(F.col(id_col).asc(), F.col("pos").asc())
    )
    return (
        exploded.withColumn("_rn", first)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("_rn") == 1, 1).otherwise(0)).alias("n_kept"),
        )
        .select(
            id_col,
            "n_chunks",
            "n_kept",
            (F.col("n_kept") / F.col("n_chunks")).alias("kept_frac"),
        )
    )


def chunk_documents(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 16,
    stride: int = 12,
) -> DataFrame:
    """Sliding-window chunking with overlap — the retrieval/context-
    window prep step (RAG indexing, long-doc pretraining windows): a
    chunk of ``chunk_size`` words starts every ``stride`` words, so
    consecutive chunks overlap by ``chunk_size - stride`` words. A
    final short chunk is emitted whenever any token remains past the
    last full window (every token lands in >=1 chunk).

    Output: one row per (doc, chunk) —
    ``(id, chunk_id, start_token, n_chunk_tokens, chunk_md5)`` with
    ``start_token`` 1-based; the md5 stands in for the chunk text so
    downstream chunk-level dedup/indexing shuffles a 32-byte key, not
    the payload.

    Scale shape: pure Column expressions (sequence/transform/slice
    inside whole-stage codegen) + one posexplode — a narrow map, zero
    shuffles; output partitioning inherits the input's. The reference
    engine has no text surface (``ETL.java`` stops at OLAP
    aggregation); this is mandated-extension scope.
    """
    if chunk_size <= 0 or stride <= 0:
        raise ValueError("chunk_size and stride must be positive")
    if stride > chunk_size:
        raise ValueError(
            f"stride {stride} > chunk_size {chunk_size} would drop tokens"
        )
    w = F.split(F.col(text_col), " ")
    starts = F.sequence(
        F.lit(0), F.floor((F.size(w) - 1) / stride).cast("int")
    )
    chunks = F.transform(starts, lambda k: F.slice(w, k * stride + 1, chunk_size))
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "toks")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id").cast("long") * stride + 1).alias("start_token"),
        F.size("toks").cast("long").alias("n_chunk_tokens"),
        F.md5(F.array_join("toks", " ")).alias("chunk_md5"),
    )


def _dup_tokens(text_col: str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the module's
    shared tokenization, kept arity-safe (one-arg lambda: element)."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Substring-level (duplicate-span) dedup detection, the third
    granularity next to document-level (``dedup.py``) and
    paragraph-level (``paragraph_dedup``): find every maximal token
    span that is part of some ``k``-token window occurring at least
    ``min_count`` times anywhere in the corpus — including twice
    inside ONE document (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", ACL 2022, motivates exactly this
    substring tier; their suffix-array ExactSubstr is single-machine,
    this is the distributed k-window formulation of the same contract:
    with stride-1 windows, a duplicated substring of length >= k is
    covered by duplicated windows exactly).

    Returns one row per merged span: ``(id, span_start, span_end)``
    with 1-based inclusive token positions; overlapping and
    token-adjacent duplicated windows are merged into maximal spans.

    Scale shape (100 TB): the window pass is a pure-Column shingle
    scan (sequence/slice/md5 inside whole-stage codegen, one explode —
    no shuffle); duplicate detection is ONE groupBy on the 128-bit
    window hash (map-side partial aggregation; the hash key space is
    uniform, so no hot reducer — a boilerplate span duplicated across
    millions of docs is reduced map-side like any other key); the join
    back is a semi join scoped to candidate hashes only (duplicate
    windows are typically a small fraction of the corpus, so the
    reduced hash set broadcasts and the probe side never shuffles —
    plan-verified; the window derivation is recomputed on the probe
    scan rather than cached, two cheap narrow scans beating the
    materialization of ~(len-k) rows per doc); the
    interval merge is a per-document sort of that document's OWN
    duplicated windows — bounded by doc length, never corpus-wide.
    Reference scope note: ``ETL.java`` has no text surface; this is
    mandated-extension scope.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    if min_count < 2:
        raise ValueError("min_count < 2 would flag every window")
    base = docs.select(F.col(id_col), _dup_tokens(text_col).alias("ts"))
    wp = (
        base.where(F.size("ts") >= k)
        .select(
            id_col,
            F.explode(
                # grams via the zipped shifted-slice build (text_exprs.
                # ngram_join), indexed by the two-arg transform lambda
                # (0-based i -> position p = i+1, as before)
                F.transform(
                    ngram_join(F.col("ts"), k),
                    lambda g, i: F.struct(
                        (i + 1).cast("long").alias("p"),
                        F.md5(g).alias("h"),
                    ),
                )
            ).alias("w"),
        )
        .select(id_col, "w.p", "w.h")
    )
    hot = (
        wp.groupBy("h")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= min_count)
        .select("h")
    )
    dwin = wp.join(hot, "h", "left_semi").select(
        id_col, "p", (F.col("p") + (k - 1)).alias("e")
    )
    wdoc = W.partitionBy(id_col).orderBy("p")
    brk = dwin.withColumn(
        "is_new",
        F.when(
            F.col("p")
            > F.coalesce(
                F.max("e").over(
                    wdoc.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(-1),
            )
            + 1,
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    isl = brk.withColumn("island", F.sum("is_new").over(wdoc))
    return (
        isl.groupBy(id_col, "island")
        .agg(
            F.min("p").alias("span_start"),
            F.max("e").alias("span_end"),
        )
        .drop("island")
    )


def duplicate_span_stats(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
    frac_scale: int = 1_000_000,
) -> DataFrame:
    """Per-document duplicate-span summary over :func:`duplicate_spans`
    — the filterable quality signal (drop or trim docs whose training
    tokens are mostly corpus-duplicated boilerplate).

    Output per input doc (docs with no duplicated span included, with
    zeros): ``(id, n_tokens, dup_span_count, dup_token_count,
    dup_frac_q)``; ``dup_frac_q`` is the duplicated-token fraction
    micro-quantized with the repo's integer-exact half-away rounding
    ``(2*a*scale + b) DIV (2*b)`` — no float ever reaches the hashed
    output (both quantities are non-negative, so no sign adjustment).
    """
    spans = duplicate_spans(
        docs, id_col=id_col, text_col=text_col, k=k, min_count=min_count
    )
    per_doc = spans.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("_nspan"),
        F.sum(F.col("span_end") - F.col("span_start") + 1).alias("_ntok"),
    )
    base = docs.select(
        F.col(id_col), F.size(_dup_tokens(text_col)).cast("long").alias("n_tokens")
    )
    return (
        base.join(per_doc, id_col, "left")
        .withColumn("_dup", F.coalesce(F.col("_ntok"), F.lit(0)).cast("long"))
        .withColumn("_nt", F.greatest(F.col("n_tokens"), F.lit(1)))
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("_nspan"), F.lit(0))
            .cast("long")
            .alias("dup_span_count"),
            F.col("_dup").alias("dup_token_count"),
            # Integer-exact round-half-away: (2a*scale + b) div (2b);
            # both operands non-negative, so no sign adjustment.
            F.expr(f"(2 * _dup * {frac_scale} + _nt) div (2 * _nt)")
            .cast("long")
            .alias("dup_frac_q"),
        )
    )


def excise_token_spans(
    docs: DataFrame,
    spans: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    start_col: str = "span_start",
    end_col: str = "span_end",
    one_based: bool = True,
) -> DataFrame:
    """Rebuild each document's text with every token inside any of the
    given (id, start, end) token spans dropped — the generic excision
    primitive behind :func:`remove_duplicate_spans`, and the cutter
    span-level DECONTAMINATION composes with the positional text
    index's ``return_positions=True`` match offsets (cut the
    contaminated n-gram, keep the document). Spans are inclusive;
    ``one_based=False`` accepts 0-based offsets (the text index's
    convention) and shifts them once here. Tokenization is the
    module's shared lower/trim/whitespace-split, identical to the
    text index's, so offsets line up.

    Per-doc span lists are bounded by doc length (collect_list here is
    executor-side per-group state, not a driver collect). The rebuild
    is pure Column work: positions surviving the interval set are kept
    in order and re-joined. Overlapping/adjacent spans are MERGED
    (sort + fold) before the keep-list filter — without the merge the
    per-token ``exists`` scans every raw span, and the heaviest-hit
    docs (one span per duplicated bigram ⇒ spans ≈ doc length) made
    the rebuild quadratic in doc length (r13 advice); the merged set
    is bounded by the number of DISJOINT cut regions instead.

    Output: ``(id, clean_text, n_removed_tokens)`` — one row per input
    doc; docs with no spans pass through with 0 removed."""
    off = 0 if one_based else 1
    span_t = "array<struct<span_start:bigint,span_end:bigint>>"
    sp = (
        spans.select(
            F.col(id_col),
            (F.col(start_col) + F.lit(off)).cast("long").alias("_s"),
            (F.col(end_col) + F.lit(off)).cast("long").alias("_e"),
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_s").alias("span_start"),
                        F.col("_e").alias("span_end"),
                    )
                )
            ).alias("_raw")
        )
        # classic interval merge as a fold over the start-sorted list:
        # a span overlapping or ADJACENT to the running last interval
        # (start <= last_end + 1 — adjacency merges because excision
        # is token-granular) extends it; otherwise it opens a new one.
        # element_at(acc, -1) on the empty accumulator is NULL, so the
        # overlap predicate is null → the otherwise-branch (append)
        # runs — no size() special case needed for the first span.
        .select(
            F.col(id_col),
            F.aggregate(
                "_raw",
                F.expr(f"CAST(array() AS {span_t})"),
                lambda acc, s: F.when(
                    s["span_start"]
                    <= F.try_element_at(acc, F.lit(-1))["span_end"] + F.lit(1),
                    F.concat(
                        F.slice(acc, F.lit(1), F.size(acc) - F.lit(1)),
                        F.array(
                            F.struct(
                                F.try_element_at(acc, F.lit(-1))["span_start"].alias(
                                    "span_start"
                                ),
                                F.greatest(
                                    F.try_element_at(acc, F.lit(-1))["span_end"],
                                    s["span_end"],
                                ).alias("span_end"),
                            )
                        ),
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            ).alias("_sp"),
        )
    )
    base = docs.select(F.col(id_col), _dup_tokens(text_col).alias("ts"))
    joined = base.join(sp, id_col, "left").withColumn(
        "_sp", F.coalesce(F.col("_sp"), F.array())
    )
    # Empty/whitespace-only docs tokenize to a 0-element array;
    # sequence(1, 0) is the DESCENDING [1, 0] and element_at on the
    # empty array throws INVALID_ARRAY_INDEX_IN_ELEMENT_AT — emit the
    # empty keep-list for those instead of building the sequence.
    keep_pos = F.when(
        F.size("ts") > 0,
        F.filter(
            F.sequence(F.lit(1), F.size("ts")),
            lambda p: ~F.exists(
                "_sp",
                lambda s: (p >= s["span_start"]) & (p <= s["span_end"]),
            ),
        ),
    ).otherwise(F.array().cast("array<int>"))
    return joined.select(
        id_col,
        F.array_join(
            F.transform(keep_pos, lambda p: F.element_at("ts", p)),
            " ",
        ).alias("clean_text"),
        (F.size("ts") - F.size(keep_pos)).cast("long").alias(
            "n_removed_tokens"
        ),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 50,
    min_count: int = 2,
) -> DataFrame:
    """Strict-removal cleanup: rebuild each document's text with every
    token covered by a duplicated span dropped (the conservative
    policy — keeping one canonical occurrence per duplicated substring
    requires a global owner election across documents; callers wanting
    that join :func:`duplicate_spans` and elect owners themselves).
    Delegates the rebuild to :func:`excise_token_spans`.

    Output: ``(id, clean_text, n_removed_tokens)``.
    """
    spans = duplicate_spans(
        docs, id_col=id_col, text_col=text_col, k=k, min_count=min_count
    )
    return excise_token_spans(
        docs, spans, id_col=id_col, text_col=text_col
    )


def canonicalize_url(url: Column | str) -> Column:
    """Canonical form of an absolute URL — the dedup-prep
    normalization a web corpus runs before URL-level dedup, as a pure
    Column expression (shuffle-free, engine-portable regex):

    1. drop the fragment (FIRST, so a ``?`` inside a fragment can't
       masquerade as a query);
    2. lowercase scheme and host;
    3. strip a ``www.`` host prefix and the scheme's default port
       (:80 http, :443 https);
    4. drop a trailing slash (empty path renders as ``/``);
    5. drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``) and
       sort the remaining query parameters.

    Inputs are expected to be ``scheme://host[:port][/path][?q][#f]``;
    anything unparseable passes through with only fragment/case
    normalization of the scheme (garbage in, stable garbage out)."""
    u = F.regexp_replace(
        F.col(url) if isinstance(url, str) else url, r"#.*$", ""
    )
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[^:]+://([^/?#]+)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")) \
        .when(scheme == "https", F.regexp_replace(host, r":443$", "")) \
        .otherwise(host)
    path = F.regexp_extract(u, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(q, "&"),
            lambda p: (p != "")
            & ~p.rlike(r"^(utm_[^=]*|fbclid|gclid)(=|$)"),
        )
    )
    qs = F.array_join(kept, "&")
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
    return F.when(scheme == "", u).otherwise(canon)


def html_main_text(
    df: DataFrame,
    html_col: str = "html",
    *,
    min_words: int = 5,
    out_col: str = "main_text",
) -> DataFrame:
    """Boilerplate removal for crawled HTML — the crawl->text step a
    web corpus runs before every other text operator, as shuffle-free
    Column expressions (a line-density simplification of the
    jusText/trafilatura family: no DOM, deterministic, oracle-
    predictable):

    1. drop ``<script>``/``<style>`` blocks (two separate patterns —
       no regex backreferences, so the expression stays portable to
       RE2-based engines);
    2. convert block-level tag boundaries to newlines, every other tag
       to a space, and decode the minimal entity set;
    3. keep lines with >= ``min_words`` whitespace words (nav bars,
       headings, and footers die here), collapse whitespace.

    Adds ``out_col`` (kept lines joined by newline), ``n_kept_lines``,
    and ``n_main_words``.
    """
    h = F.col(html_col)
    h = F.regexp_replace(h, r"(?is)<script[^>]*>.*?</script>", " ")
    h = F.regexp_replace(h, r"(?is)<style[^>]*>.*?</style>", " ")
    h = F.regexp_replace(
        h, r"(?i)</?(p|br|div|li|tr|h[1-6]|ul|ol|table)[^>]*>", "\n"
    )
    h = F.regexp_replace(h, r"<[^>]+>", " ")
    for ent, ch in (
        ("&lt;", "<"),
        ("&gt;", ">"),
        ("&quot;", '"'),
        ("&#39;", "'"),
        ("&nbsp;", " "),
        ("&amp;", "&"),  # amp last, per the usual decode order
    ):
        h = F.replace(h, F.lit(ent), F.lit(ch))
    lines = F.transform(
        F.split(h, r"\n"),
        lambda l: F.trim(F.regexp_replace(l, r"\s+", " ")),
    )
    kept = F.filter(
        lines,
        lambda l: F.size(F.filter(F.split(l, " "), lambda w: w != ""))
        >= F.lit(min_words),
    )
    return (
        df.withColumn(out_col, F.array_join(kept, "\n"))
        .withColumn("n_kept_lines", F.size(kept))
        .withColumn(
            "n_main_words",
            F.size(
                F.filter(
                    F.split(F.col(out_col), r"\s+"), lambda w: w != ""
                )
            ),
        )
    )
