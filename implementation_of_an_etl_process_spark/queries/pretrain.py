"""Battery entries for the pretraining-hygiene operators
(``operators/pretrain.py``): benchmark contamination, repetition
scoring, PII redaction, URL stripping, paragraph-level dedup — all on
the ``documents`` table with exact DuckDB oracles.

Determinism notes specific to this module:
- the synthetic corpus has a 31-word vocabulary and 10-99-word docs, so
  the battery uses 3-gram contamination and 3-word "paragraph" chunks —
  at those sizes the sf0.01 corpus produces genuinely mixed
  distributions (avg 3-gram benchmark overlap ~1.9% with a 96% outlier;
  ~19% duplicate chunks). The operators themselves default to
  corpus-realistic 8-gram / 20-word settings.
- documents.text contains no PII or URLs, so the redaction entries
  inject deterministic doc_id-derived PII/URLs with identical concat
  expressions on both sides, then prove the redaction by md5 of the
  cleaned text.
- every ratio divides two exact integers in double on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.operators.pretrain import (
    contamination_overlap,
    paragraph_dedup,
    pii_redact,
    repetition_stats,
    strip_urls,
)
from implementation_of_an_etl_process_spark.queries.relational import _t


def contamination_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    cand = docs.filter(F.col("doc_id") % 50 != 0)
    return contamination_overlap(
        cand, bench, n=3, flag_threshold=0.1
    ).orderBy("doc_id")


CONTAMINATION_SQL = """
WITH bmx AS (
  -- series bound derived from the longest benchmark doc (no fixed
  -- cap: the Spark side's word_ngrams is uncapped, so a corpus with
  -- longer docs must not silently lose tail grams on the oracle side)
  SELECT MAX(len(string_split(text, ' '))) AS m
  FROM documents WHERE doc_id % 50 = 0
), bench AS (
  SELECT DISTINCT array_to_string(w[g.x:g.x+2], ' ') AS gram
  FROM (SELECT string_split(text, ' ') AS w FROM documents
        WHERE doc_id % 50 = 0),
       (SELECT unnest(generate_series(1, (SELECT m FROM bmx))) AS x) g
  WHERE g.x <= len(w) - 2
), cand AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' ')))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE doc_id % 50 <> 0)
), per AS (
  SELECT c.doc_id, COUNT(*) AS n_ngrams, COUNT(b.gram) AS n_hits
  FROM cand c LEFT JOIN bench b USING (gram)
  GROUP BY c.doc_id
)
SELECT doc_id, n_ngrams, n_hits,
       n_hits * 1.0 / n_ngrams AS overlap,
       n_hits * 1.0 / n_ngrams >= 0.1 AS contaminated
FROM per
ORDER BY doc_id
"""


def repetition_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return repetition_stats(_t(spark, sf_dir, "documents")).orderBy("doc_id")


REPETITION_SQL = """
WITH base AS (
  SELECT doc_id, string_split(text, ' ') AS w FROM documents
), tri AS (
  SELECT doc_id,
         GREATEST(len(w) - 2, 0) AS _n3,
         GREATEST(len(w) - 2, 0)
           - len(list_distinct(list_transform(
               generate_series(1, len(w) - 2),
               i -> array_to_string(w[i:i+2], ' ')))) AS _d3
  FROM base
), per_word AS (
  SELECT doc_id, word, COUNT(*) AS _c
  FROM (SELECT doc_id, unnest(w) AS word FROM base)
  GROUP BY 1, 2
), ranked AS (
  SELECT doc_id, _c,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY _c DESC, word ASC) AS _rn
  FROM per_word
), agg AS (
  SELECT doc_id, SUM(_c) AS n_words,
         MAX(CASE WHEN _rn = 1 THEN _c END) AS _top1,
         SUM(CASE WHEN _rn <= 2 THEN _c END) AS _top2
  FROM ranked GROUP BY doc_id
)
SELECT a.doc_id, CAST(n_words AS BIGINT) AS n_words,
       _top1 * 1.0 / n_words AS top_word_frac,
       _top2 * 1.0 / n_words AS top2_word_frac,
       CASE WHEN _n3 > 0 THEN _d3 * 1.0 / _n3 ELSE 0.0 END
         AS dup_3gram_frac
FROM agg a JOIN tri t ON a.doc_id = t.doc_id
ORDER BY a.doc_id
"""

# Deterministic doc_id-derived PII / URL injection, expressed with the
# same concat on both sides (documents.text itself is PII-free).
def _pii_suffix_spark():
    return F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example.com or 555-867-5309 ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" from 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )

_PII_SUFFIX_SQL = (
    "text || ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example.com or 555-867-5309 ssn 123-45-'"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
)


def pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _pii_suffix_spark().alias("text")
    )
    out = pii_redact(docs)
    return out.select(
        "doc_id",
        "n_email",
        "n_ssn",
        "n_phone",
        "n_ipv4",
        F.length("clean_text").alias("clean_len"),
        F.md5(F.col("clean_text")).alias("clean_md5"),
    ).orderBy("doc_id")


PII_SQL = f"""
WITH injected AS (
  SELECT doc_id, {_PII_SUFFIX_SQL} AS text FROM documents
), redacted AS (
  SELECT doc_id, text,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(text,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
            '<EMAIL>', 'g'),
          '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b', '<SSN>', 'g'),
        '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b', '<PHONE>', 'g'),
      '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b',
      '<IPV4>', 'g') AS clean_text
  FROM injected
)
SELECT doc_id,
  len(regexp_extract_all(text,
      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS n_email,
  len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{2}}-\\d{{4}}\\b')) AS n_ssn,
  len(regexp_extract_all(text, '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS n_phone,
  len(regexp_extract_all(text,
      '\\b\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\.\\d{{1,3}}\\b')) AS n_ipv4,
  CAST(length(clean_text) AS INTEGER) AS clean_len,
  md5(clean_text) AS clean_md5
FROM redacted
ORDER BY doc_id
"""

def _url_suffix_spark():
    return F.concat(
        F.col("text"),
        F.lit(" see https://example.com/d/"),
        F.col("doc_id").cast("string"),
        F.lit("?ref=aa and http://foo.bar/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit(" done"),
    )

_URL_SUFFIX_SQL = (
    "text || ' see https://example.com/d/' || CAST(doc_id AS VARCHAR)"
    " || '?ref=aa and http://foo.bar/' || CAST(doc_id % 7 AS VARCHAR)"
    " || ' done'"
)


def strip_urls_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", _url_suffix_spark().alias("text")
    )
    out = strip_urls(docs)
    return out.select(
        "doc_id",
        "n_urls",
        F.length("clean_text").alias("clean_len"),
        F.md5(F.col("clean_text")).alias("clean_md5"),
    ).orderBy("doc_id")


STRIP_URLS_SQL = f"""
WITH injected AS (
  SELECT doc_id, {_URL_SUFFIX_SQL} AS text FROM documents
), cleaned AS (
  SELECT doc_id, text,
         trim(regexp_replace(
             regexp_replace(text, 'https?://[^\\s]+', '', 'g'),
             '\\s+', ' ', 'g')) AS clean_text
  FROM injected
)
SELECT doc_id,
       len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_urls,
       CAST(length(clean_text) AS INTEGER) AS clean_len,
       md5(clean_text) AS clean_md5
FROM cleaned
ORDER BY doc_id
"""


def paragraph_dedup_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    return paragraph_dedup(
        _t(spark, sf_dir, "documents"), chunk_words=3
    ).orderBy("doc_id")


PARAGRAPH_DEDUP_SQL = """
WITH ch AS (
  SELECT doc_id, g.x AS pos,
         array_to_string(w[g.x * 3 + 1 : g.x * 3 + 3], ' ') AS chunk
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       (SELECT unnest(generate_series(0, 1000)) AS x) g
  WHERE g.x <= (len(w) - 1) // 3
), ranked AS (
  SELECT doc_id, pos, chunk,
         ROW_NUMBER() OVER (PARTITION BY chunk
                            ORDER BY doc_id ASC, pos ASC) AS _rn
  FROM ch
)
SELECT doc_id, COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN _rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       SUM(CASE WHEN _rn = 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*)
         AS kept_frac
FROM ranked
GROUP BY doc_id
ORDER BY doc_id
"""


_CHUNK_SIZE = 16
_CHUNK_STRIDE = 12


def chunk_overlap_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap (`operators/pretrain.py::
    chunk_documents`): 16-word windows every 12 words, one row per
    (doc, chunk) with the 1-based start offset, actual token count
    (the tail window is short), and the chunk-text md5 — the
    RAG-indexing / long-doc window-prep primitive. Zero shuffles; the
    orderBy here is battery determinism only."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        chunk_documents,
    )

    return chunk_documents(
        _t(spark, sf_dir, "documents"),
        chunk_size=_CHUNK_SIZE,
        stride=_CHUNK_STRIDE,
    ).orderBy("doc_id", "chunk_id")


CHUNK_OVERLAP_SQL = f"""
WITH mx AS (
  -- series bound derived from the longest document (no fixed cap: a
  -- corpus with longer docs than anticipated must not silently lose
  -- its tail windows on the oracle side)
  SELECT MAX((len(string_split(text, ' ')) - 1) // {_CHUNK_STRIDE}) AS m
  FROM documents
),
ch AS (
  SELECT doc_id, g.x AS chunk_id,
         w[g.x * {_CHUNK_STRIDE} + 1 :
           g.x * {_CHUNK_STRIDE} + {_CHUNK_SIZE}] AS toks
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       (SELECT unnest(generate_series(0, (SELECT m FROM mx))) AS x) g
  WHERE g.x <= (len(w) - 1) // {_CHUNK_STRIDE}
)
SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
       CAST(chunk_id * {_CHUNK_STRIDE} + 1 AS BIGINT) AS start_token,
       CAST(len(toks) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(toks, ' ')) AS chunk_md5
FROM ch
ORDER BY doc_id, chunk_id
"""


_SPAN_K = 8


def dup_span_stats_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplicate-span detection (`operators/pretrain.py
    ::duplicate_span_stats`, Lee et al. ACL 2022): per doc, the count
    and token mass of maximal spans covered by an 8-token window that
    occurs >=2 times anywhere in the corpus (intra-doc repeats count),
    plus the integer-exact micro-quantized duplicated fraction. k=8
    fits the synthetic corpus's 10-99-word docs (the operator default
    is the paper-realistic 50); at sf0.01 the planted duplicate docs
    give 47/500 docs with nonzero spans, several at frac 1.0."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        duplicate_span_stats,
    )

    return duplicate_span_stats(
        _t(spark, sf_dir, "documents"), k=_SPAN_K
    ).orderBy("doc_id")


DUP_SPAN_SQL = rf"""
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(trim(text)), '\s+'),
                     t -> t <> '') AS ts
  FROM documents
), wins AS (
  SELECT doc_id,
         unnest([{{'p': i,
                   'h': md5(array_to_string(ts[i:i+{_SPAN_K}-1], ' '))}}
                 FOR i IN range(1, len(ts) - {_SPAN_K} + 2)]) AS w
  FROM toks WHERE len(ts) >= {_SPAN_K}
), wp AS (
  SELECT doc_id, w.p AS p, w.h AS h FROM wins
), dups AS (
  SELECT h FROM wp GROUP BY h HAVING COUNT(*) >= 2
), dwin AS (
  SELECT doc_id, p, p + {_SPAN_K} - 1 AS e FROM wp JOIN dups USING (h)
), brk AS (
  SELECT doc_id, p, e,
         CASE WHEN p > COALESCE(MAX(e) OVER (
                  PARTITION BY doc_id ORDER BY p
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) + 1
              THEN 1 ELSE 0 END AS is_new
  FROM dwin
), isl AS (
  SELECT doc_id, p, e,
         SUM(is_new) OVER (PARTITION BY doc_id ORDER BY p) AS island
  FROM brk
), spans AS (
  SELECT doc_id, island, MIN(p) AS s, MAX(e) AS e
  FROM isl GROUP BY doc_id, island
), per_doc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nspan,
         CAST(SUM(e - s + 1) AS BIGINT) AS ntok
  FROM spans GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(len(t.ts) AS BIGINT) AS n_tokens,
       CAST(COALESCE(p.nspan, 0) AS BIGINT) AS dup_span_count,
       CAST(COALESCE(p.ntok, 0) AS BIGINT) AS dup_token_count,
       CAST((2 * COALESCE(p.ntok, 0) * 1000000 + GREATEST(len(t.ts), 1))
            // (2 * GREATEST(len(t.ts), 1)) AS BIGINT) AS dup_frac_q
FROM toks t LEFT JOIN per_doc p USING (doc_id)
ORDER BY t.doc_id
"""


_BPE_MERGES = 24


def bpe_tokenize_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loud gate for the distributed BPE tokenizer (`operators/bpe.py`,
    Sennrich et al. ACL 2016): trains 24 merges on the documents corpus
    with the DISTRIBUTED trainer (one corpus shuffle to the word-count
    table, one vocab aggregate + a single collected argmax row per
    merge), encodes every document, and checks two things against the
    pure-python reference recomputed from the collected word-count
    table (31 distinct words at battery scale — a gate-scale-only
    collect, like the recall gates' exact baselines):

    - ``merges_match``: the learned merge SEQUENCE is identical;
    - ``tokens_match``: sum of per-doc BPE token counts equals
      sum(cnt * len(py_encode(word))) — which proves the distinct-word
      encode, the join back BY WORD, and the per-doc reassembly
      conserve every token.

    On failure the mismatching side emits measured values (-1 sentinel
    for merges, the measured total for tokens) so the battery diff
    shows the regression rather than a bare hash flip. ``n_words`` is
    corpus-derived and checked by real SQL.
    """
    from implementation_of_an_etl_process_spark.operators.bpe import (
        encode_bpe,
        py_encode_word,
        py_train_bpe,
        train_bpe,
        word_count_table,
    )

    docs = _t(spark, sf_dir, "documents")
    merges = train_bpe(docs, n_merges=_BPE_MERGES)
    wc = {
        r["word"]: r["cnt"] for r in word_count_table(docs).collect()
    }  # gate-scale only: the synthetic vocab is 31 words
    py_merges = py_train_bpe(wc, _BPE_MERGES)
    merges_match = merges == py_merges
    expect_tokens = sum(
        c * len(py_encode_word(w, py_merges)) for w, c in wc.items()
    )
    got = encode_bpe(docs, merges).agg(
        F.sum("n_bpe_tokens").alias("_tok"),
        F.count(F.lit(1)).alias("_docs"),
    )
    return got.crossJoin(
        docs.agg(F.countDistinct(F.lower(F.trim("text"))).alias("_x"))
    ).select(
        F.lit(len(wc)).cast("long").alias("n_words"),
        # Emit the constant the oracle expects when the learned merge
        # SEQUENCE matches the python reference (a legitimate early
        # stop matches too — both sides stop identically), -1 when it
        # doesn't; sequence equality itself is asserted Spark-side.
        F.lit(_BPE_MERGES if merges_match else -1)
        .cast("int")
        .alias("merges_match_n"),
        F.when(F.col("_tok") == expect_tokens, F.lit(1))
        .otherwise(-F.col("_tok"))
        .cast("long")
        .alias("tokens_match"),
        F.col("_docs").cast("long").alias("n_docs"),
    )


BPE_GATE_SQL = rf"""
SELECT CAST((SELECT COUNT(DISTINCT t) FROM (
          SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS t
          FROM documents) WHERE t <> '') AS BIGINT) AS n_words,
       CAST({_BPE_MERGES} AS INT) AS merges_match_n,
       CAST(1 AS BIGINT) AS tokens_match,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS n_docs
"""


_BLOOM_M = 1 << 14
_BLOOM_K = 4


def bloom_contamination_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The contamination screen re-expressed through a portable BLOOM
    bitset (`operators/pretrain.py::bloom_filter_build` /
    `bloom_membership`): the benchmark's distinct 3-grams collapse to a
    <= m/64-row bit_or relation, and every candidate gram probes the
    broadcast bitset instead of joining the full benchmark n-gram set —
    the O(fixed-size) screen a GB-scale contamination corpus needs.
    Output (doc_id, n_grams, n_maybe) is integer-exact: the oracle
    reconstructs the SAME bitset word-for-word (md5-derived positions,
    power-of-two modulus) and replays the probes, so Bloom false
    positives — part of the semantics — match too."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        bloom_filter_build,
        bloom_membership,
        word_ngrams,
    )

    docs = _t(spark, sf_dir, "documents")
    bench_grams = (
        docs.filter(F.col("doc_id") % 50 == 0)
        .select(F.explode(word_ngrams("text", 3)).alias("gram"))
        .distinct()
    )
    bloom = bloom_filter_build(
        bench_grams, "gram", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    cand = docs.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams("text", 3))).alias("gram"),
    )
    flagged = bloom_membership(
        cand, bloom, "gram", m_bits=_BLOOM_M, k=_BLOOM_K
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("maybe_member"), 1).otherwise(0)).alias(
                "n_maybe"
            ),
        )
        .orderBy("doc_id")
    )


# The DuckDB rendering of ``_bloom_probes``' hash math: position j of
# a gram = (md5-derived unsigned 64-bit hash of 'bj:' || gram) mod m;
# word = pos >> 6, mask = 1 << (pos & 63) with the bit-63 literal
# special-cased (DuckDB's BIGINT << 63 differs from the signed fold).
_BLOOM_HASH = (
    f"CAST(('0x' || substr(md5('b' || j || ':' || gram), 1, 16))::UBIGINT"
    f" % {_BLOOM_M} AS BIGINT)"
)

BLOOM_CONTAMINATION_SQL = f"""
WITH js AS (
  SELECT unnest(generate_series(0, {_BLOOM_K - 1})) AS j
), bmx AS (
  -- bound derived from the longest benchmark doc, same rationale as
  -- the chunk oracle: the Spark side (word_ngrams) is uncapped
  SELECT MAX(len(string_split(text, ' '))) AS m
  FROM documents WHERE doc_id % 50 = 0
), bench AS (
  SELECT DISTINCT array_to_string(w[g.x:g.x+2], ' ') AS gram
  FROM (SELECT string_split(text, ' ') AS w FROM documents
        WHERE doc_id % 50 = 0),
       (SELECT unnest(generate_series(1, (SELECT m FROM bmx))) AS x) g
  WHERE g.x <= len(w) - 2
), bench_pos AS (
  SELECT {_BLOOM_HASH} AS h FROM bench, js
), bloom AS (
  SELECT (h >> 6) AS word_idx,
         bit_or(CASE WHEN (h & 63) = 63
                     THEN CAST(-9223372036854775808 AS BIGINT)
                     ELSE (CAST(1 AS BIGINT) << CAST((h & 63) AS INTEGER))
                END) AS bits
  FROM bench_pos GROUP BY 1
), cand AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
             generate_series(1, len(w) - 2),
             i -> array_to_string(w[i:i+2], ' ')))) AS gram
  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents
        WHERE doc_id % 50 <> 0)
), cand_pos AS (
  SELECT doc_id, gram, {_BLOOM_HASH} AS h FROM cand, js
), per_gram AS (
  SELECT doc_id, gram,
         MIN(CASE WHEN b.bits IS NOT NULL
                   AND (b.bits & (CASE WHEN (p.h & 63) = 63
                        THEN CAST(-9223372036854775808 AS BIGINT)
                        ELSE (CAST(1 AS BIGINT)
                              << CAST((p.h & 63) AS INTEGER)) END))
                     = (CASE WHEN (p.h & 63) = 63
                        THEN CAST(-9223372036854775808 AS BIGINT)
                        ELSE (CAST(1 AS BIGINT)
                              << CAST((p.h & 63) AS INTEGER)) END)
                  THEN 1 ELSE 0 END) AS all_set
  FROM cand_pos p LEFT JOIN bloom b ON b.word_idx = (p.h >> 6)
  GROUP BY doc_id, gram
)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(all_set) AS BIGINT) AS n_maybe
FROM per_gram GROUP BY doc_id ORDER BY doc_id
"""


QUERIES = {
    "contamination_ngram_overlap": contamination_ngram_overlap,
    "bloom_contamination_docs": bloom_contamination_docs,
    "repetition_stats_docs": repetition_stats_docs,
    "pii_redaction": pii_redaction,
    "strip_urls_docs": strip_urls_docs,
    "paragraph_dedup_frac": paragraph_dedup_frac,
    "chunk_overlap_docs": chunk_overlap_docs,
    "dup_span_stats_docs": dup_span_stats_docs,
    "bpe_tokenize_gate": bpe_tokenize_gate,
}

ORACLES = {
    "contamination_ngram_overlap": CONTAMINATION_SQL,
    "bloom_contamination_docs": BLOOM_CONTAMINATION_SQL,
    "repetition_stats_docs": REPETITION_SQL,
    "pii_redaction": PII_SQL,
    "strip_urls_docs": STRIP_URLS_SQL,
    "paragraph_dedup_frac": PARAGRAPH_DEDUP_SQL,
    "chunk_overlap_docs": CHUNK_OVERLAP_SQL,
    "dup_span_stats_docs": DUP_SPAN_SQL,
    "bpe_tokenize_gate": BPE_GATE_SQL,
}
