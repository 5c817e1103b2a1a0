#!/usr/bin/env python
"""Full-scale LLM-data-ops measurement: synthesize a multi-million-doc
Zipfian corpus ENTIRELY Spark-side (no driver data, seeded, exactly
reproducible), plant known exact and near duplicates, and measure the
pretraining operators end-to-end:

- exact dedup (md5 groupBy) — expected group count is known by
  construction;
- MinHash-LSH near-dup pairs — recall of the planted near-dups is
  measured against the closed-form banding probability;
- unigram surprisal (two-pass corpus statistics);
- tf-idf: linear index build at full scale + top-k pairs on a slice,
  demonstrating the df-band pruning on a REALISTIC (Zipfian) vocabulary
  — unlike the deliberately dense 31-term sf tables, posting lists here
  are short and the candidate space collapses (see operators/tfidf.py);
- trained quality classifier (operators/qualityml.py): weak-label,
  fit (distributed treeAggregate), and score a multi-million-doc
  corpus — no feature row reaches the driver; fit/inference rates and
  held-out agreement are recorded. Labels are planted (a deterministic
  1/3 of docs get a stopword prefix, making them 'prose'), so the
  expected agreement is 100% — the leg measures SCALE behavior, the
  sf0.01 battery gate measures label realism.

Corpus model: each doc is ``words`` draws from a log-uniform
(Zipf-like, P(rank w) ~ 1/w) vocabulary of ``vocab`` terms, derived
from xxhash64 of (seed_id, position) — pure Column expressions, fully
parallel. Docs with id % 100 == 50 are EXACT copies of id-2 (which is
pristine, mod 48); docs with id % 100 == 99 are near-copies of id-1
(pristine, mod 98) with the last word replaced (shingle-k=3 Jaccard
~= (W-4)/(W+2) ~= 0.85 at W=40, above the 0.8 verify threshold).

Usage: python tools/fullscale_docs.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"
WORDS = 40
VOCAB = 50_000
SLICE = 100_000  # tf-idf pairwise slice


def synth_corpus(spark, n_docs: int) -> DataFrame:
    """(doc_id, text): seeded Zipf-ish word soup with planted dups."""
    base = spark.range(n_docs).select(F.col("id").alias("doc_id"))
    mod = F.col("doc_id") % 100
    seed = (
        F.when(mod == 50, F.col("doc_id") - 2)
        .when(mod == 99, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
    )

    def word(seed_col, i):
        # u in [0,1) from a 64-bit hash; rank = floor(exp(u ln V)) is
        # log-uniform: P(rank=w) ~ 1/(w ln V) — Zipf(1)-shaped
        u = (
            F.pmod(F.xxhash64(seed_col * WORDS + i, F.lit(421)), F.lit(1_000_000))
            / 1_000_000.0
        )
        rank = F.floor(F.exp(u * float(__import__("math").log(VOCAB)))).cast("long")
        return F.concat(F.lit("w"), rank.cast("string"))

    words = F.transform(
        F.sequence(F.lit(0), F.lit(WORDS - 1)),
        lambda i: word(seed, i),
    )
    # near-dup rows: replace the LAST word with an id-derived word
    words = F.when(
        mod == 99,
        F.concat(F.slice(words, 1, WORDS - 1), F.array(word(F.col("doc_id"), F.lit(WORDS - 1)))),
    ).otherwise(words)
    return base.select("doc_id", F.array_join(words, " ").alias("text"))


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import dedup as D
    from implementation_of_an_etl_process_spark.operators.text import (
        unigram_surprisal,
    )
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        tfidf_topk_pairs,
        tfidf_weights,
    )

    spark = get_spark("fullscale-docs")
    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")

    t0 = time.monotonic()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs in {time.monotonic() - t0:.1f}s "
          f"({os.popen(f'du -sh {path}').read().split()[0]})", flush=True)

    # --- exact dedup ------------------------------------------------------
    t0 = time.monotonic()
    groups = D.exact_dedup_groups(docs, ["text"], "doc_id")
    n_groups = groups.count()
    n_dup_rows = n - n_groups
    t = time.monotonic() - t0
    # id%100==50 copies id-2 exactly; expected dup rows ~= n/100
    print(f"exact_dedup: {n_groups} groups ({n_dup_rows} dup rows, "
          f"expect ~{n // 100}) in {t:.1f}s = {n / t / 1e6:.2f}M docs/s",
          flush=True)

    # --- MinHash-LSH near-dup recall -------------------------------------
    t0 = time.monotonic()
    pairs = D.minhash_lsh_pairs(docs, "doc_id", "text").persist()
    n_pairs = pairs.count()
    t = time.monotonic() - t0
    planted = pairs.filter(
        (F.col("id_b") == F.col("id_a") + 1) & (F.col("id_b") % 100 == 99)
    ).count()
    expect_planted = max(1, n // 100)  # avoid div-by-zero on tiny runs
    print(f"minhash_lsh: {n_pairs} pairs in {t:.1f}s = "
          f"{n / t / 1e3:.0f}k docs/s; planted near-dup recall "
          f"{planted}/{expect_planted} = {planted / expect_planted:.4f} "
          f"(banding bound ~0.997 at J~0.85)", flush=True)
    pairs.unpersist()

    # --- unigram surprisal ------------------------------------------------
    t0 = time.monotonic()
    stats = unigram_surprisal(docs)
    n_scored = stats.count()
    t = time.monotonic() - t0
    print(f"unigram_surprisal: {n_scored} docs scored in {t:.1f}s = "
          f"{n / t / 1e6:.2f}M docs/s", flush=True)

    # --- tf-idf: linear index build at full scale ------------------------
    t0 = time.monotonic()
    w = tfidf_weights(docs, min_df=2, max_df_frac=0.01)
    n_postings = w.count()
    t = time.monotonic() - t0
    print(f"tfidf_index: {n_postings} postings over {n} docs in {t:.1f}s "
          f"= {n / t / 1e6:.2f}M docs/s (df-band <=1% of corpus)",
          flush=True)

    # --- trained quality classifier at full scale -------------------------
    from implementation_of_an_etl_process_spark.operators import qualityml as QM

    # plant learnable labels: 1/3 of docs gain an 8-stopword prefix
    # (stopword_ratio 8/48 = 0.167 >= 0.08 -> weak label 1; the rest of
    # the word-soup corpus has ratio 0 -> label 0)
    qdocs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("the a an and of to in is "), F.col("text")),
        ).otherwise(F.col("text")),
    )
    labeled = QM.weak_quality_labels(qdocs, "text")
    train = labeled.filter(F.col("doc_id") % 10 < 8)
    heldout = labeled.filter(F.col("doc_id") % 10 >= 8)
    t0 = time.monotonic()
    model = QM.train_quality_classifier(train)
    t_fit = time.monotonic() - t0
    n_train = int(n * 0.8)
    t0 = time.monotonic()
    scored = QM.score_quality(model, heldout)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (F.col("quality_pred") == F.col("quality_label")).cast("long")
        ).alias("agree"),
    ).collect()[0]
    t_score = time.monotonic() - t0
    print(
        f"qualityml: fit {n_train} rows in {t_fit:.1f}s = "
        f"{n_train / t_fit / 1e6:.2f}M docs/s; scored {agg['n']} held-out "
        f"in {t_score:.1f}s = {agg['n'] / t_score / 1e6:.2f}M docs/s; "
        f"agreement {agg['agree']}/{agg['n']} = "
        f"{agg['agree'] / agg['n'] * 100:.2f}% (gate floor 90%)",
        flush=True,
    )

    # --- sliding-window chunking (RAG/context-window prep) ---------------
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        chunk_documents,
    )

    t0 = time.monotonic()
    chunk_agg = chunk_documents(docs, chunk_size=16, stride=12).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_chunk_tokens").alias("total_tokens"),
        F.approx_count_distinct("chunk_md5").alias("approx_uniq"),
    ).collect()[0]
    t = time.monotonic() - t0
    print(
        f"chunking(16/12): {chunk_agg['n_chunks']} chunks "
        f"({chunk_agg['total_tokens']} token-slots, "
        f"~{chunk_agg['approx_uniq']} distinct md5) in {t:.1f}s = "
        f"{chunk_agg['n_chunks'] / t / 1e6:.2f}M chunks/s, "
        f"{n / t / 1e3:.0f}k docs/s (zero-shuffle narrow map)",
        flush=True,
    )

    # --- substring-level duplicate-span dedup ----------------------------
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        duplicate_span_stats,
    )

    t0 = time.monotonic()
    span_agg = duplicate_span_stats(docs, k=8).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("dup_frac_q") == 1_000_000).cast("long")).alias(
            "full"
        ),
        F.sum((F.col("dup_frac_q") == 975_000).cast("long")).alias(
            "prefix39"
        ),
        F.sum("dup_token_count").alias("dup_tokens"),
    ).collect()[0]
    t = time.monotonic() - t0
    # planted: exact-copy pairs (id%100 in {48,50} linked) are BOTH
    # fully covered -> frac 1.0; near-dup pairs (%100 in {98,99}) share
    # words 1..39 -> span [1,39] on both sides -> frac 39/40 = 0.975.
    # Random 8-gram window collisions in 50k-Zipf word soup are ~0.
    print(
        f"dup_spans(k=8): {span_agg['n']} docs, "
        f"{span_agg['full']} full-dup (expect ~{2 * (n // 100)}), "
        f"{span_agg['prefix39']} prefix-39 (expect ~{2 * (n // 100)}), "
        f"{span_agg['dup_tokens']} dup tokens in {t:.1f}s = "
        f"{n / t / 1e3:.0f}k docs/s "
        f"({(n * 33) // 1_000_000}M window hashes)",
        flush=True,
    )

    # --- distributed BPE tokenizer ---------------------------------------
    from implementation_of_an_etl_process_spark.operators.bpe import (
        encode_bpe,
        py_encode_word,
        train_bpe,
        word_count_table,
    )

    t0 = time.monotonic()
    merges = train_bpe(docs, n_merges=20)
    t_fit = time.monotonic() - t0
    t0 = time.monotonic()
    bpe_agg = encode_bpe(docs, merges).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_bpe_tokens").alias("tok"),
        F.sum("n_words").alias("words"),
    ).collect()[0]
    t_enc = time.monotonic() - t0
    # conservation check against the python reference replayed over the
    # word-count table (vocab-bounded collect: ~50k rows — tool-scale)
    wc = {r["word"]: r["cnt"] for r in word_count_table(docs).collect()}
    expect_tok = sum(c * len(py_encode_word(w, merges)) for w, c in wc.items())
    print(
        f"bpe: {len(merges)} merges trained on {len(wc)}-word vocab in "
        f"{t_fit:.1f}s; encoded {bpe_agg['n']} docs "
        f"({bpe_agg['words']} words -> {bpe_agg['tok']} units, "
        f"python-reference expects {expect_tok}: "
        f"{'MATCH' if bpe_agg['tok'] == expect_tok else 'MISMATCH'}) in "
        f"{t_enc:.1f}s = {bpe_agg['words'] / t_enc / 1e6:.1f}M words/s",
        flush=True,
    )

    # --- tf-idf pairwise on a slice: df-banding on Zipfian data ----------
    sl = docs.filter(F.col("doc_id") < SLICE)
    t0 = time.monotonic()
    top = tfidf_topk_pairs(sl, k=50, min_df=2, max_df_frac=0.001)
    rows = top.collect()
    t = time.monotonic() - t0
    top_planted = sum(
        1 for r in rows
        if (r["doc2"] == r["doc1"] + 1 and r["doc2"] % 100 == 99)
        or (r["doc2"] == r["doc1"] + 2 and r["doc2"] % 100 == 50)
    )
    print(f"tfidf_topk[{SLICE} docs]: top-50 in {t:.1f}s; "
          f"{top_planted}/50 of the top pairs are planted duplicates",
          flush=True)

    # --- mixture materialization to a token budget -----------------------
    # Deterministic skewed source assignment (8 sources, cubed-uniform
    # bands, ~12:1 size ratio) so alpha-temperature upweighting drives
    # real epoch repeats on the small sources and downsampling on the
    # big one. Budget = 1x corpus token mass.
    from implementation_of_an_etl_process_spark.operators.pipeline import (
        materialize_mixture,
    )

    srcd = docs.withColumn(
        "source",
        F.concat(
            F.lit("src"),
            F.floor(F.pow((F.col("doc_id") % 4096) / 4096.0, 3.0) * 8)
            .cast("int")
            .cast("string"),
        ),
    )
    # --- filter gauntlet: quality + lang-id + repetition + PII in ONE
    # narrow pass (no shuffle until the final stats aggregate) ----------
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        pii_redact,
        repetition_stats,
    )
    from implementation_of_an_etl_process_spark.operators.text import (
        lang_id,
        quality_scores,
    )

    t0 = time.monotonic()
    gauntlet = (
        pii_redact(quality_scores(docs, "text").withColumn(
            "lang_g", lang_id("text")
        ))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (
                    (F.col("alpha_ratio") >= 0.5)
                    & (F.col("n_tokens") >= 5)
                ).cast("long")
            ).alias("kept"),
            F.sum("n_email").alias("emails"),
            F.count_distinct("lang_g").alias("langs"),
        )
        .collect()[0]
    )
    t = time.monotonic() - t0
    print(
        f"filter_gauntlet: {gauntlet['n']} docs through quality+langid+"
        f"pii in {t:.1f}s = {n / t / 1e6:.2f}M docs/s "
        f"({gauntlet['kept']} kept by the quality gate, "
        f"{gauntlet['emails']} emails redacted, "
        f"{gauntlet['langs']} langs seen; single narrow pass)",
        flush=True,
    )

    t0 = time.monotonic()
    rep_agg = repetition_stats(docs).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("dup_3gram_frac").alias("max_rep"),
    ).collect()[0]
    t = time.monotonic() - t0
    print(
        f"repetition_stats: {rep_agg['n']} docs in {t:.1f}s = "
        f"{n / t / 1e6:.2f}M docs/s (max dup-3gram frac "
        f"{rep_agg['max_rep']:.3f})",
        flush=True,
    )

    # --- BM25 retrieval -------------------------------------------------
    from implementation_of_an_etl_process_spark.operators.tfidf import (
        bm25_topk,
    )

    t0 = time.monotonic()
    hits = bm25_topk(
        docs, ["w5", "w17", "w123", "w999"], k=100
    ).collect()
    t = time.monotonic() - t0
    print(
        f"bm25: top-{len(hits)} of {n} docs for a 4-term query in "
        f"{t:.1f}s = {n / t / 1e6:.2f}M docs/s "
        f"(max score_q {hits[0]['score_q']}, "
        f"{hits[0]['n_terms_matched']} terms matched)",
        flush=True,
    )

    budget = n * WORDS
    t0 = time.monotonic()
    mix = (
        materialize_mixture(srcd, "source", "text", token_budget=budget)
        .agg(
            F.count(F.lit(1)).alias("copies"),
            F.sum("n_tokens").alias("tok"),
            F.max("epoch").alias("max_epoch"),
        )
        .collect()[0]
    )
    t = time.monotonic() - t0
    print(
        f"mixture(budget={budget}): {mix['copies']} doc-copies, "
        f"{mix['tok']} tokens materialized "
        f"({mix['tok'] * 100 // budget}% of budget), max epoch "
        f"{mix['max_epoch']}, in {t:.1f}s = {n / t / 1e6:.2f}M docs/s",
        flush=True,
    )

    # --- mixture -> pack: the composed last-mile tokenizer-prep pass -----
    from implementation_of_an_etl_process_spark.operators.pipeline import (
        pack_sequences,
    )

    t0 = time.monotonic()
    withtext = (
        materialize_mixture(srcd, "source", "text", token_budget=budget)
        .join(srcd.select("doc_id", "text"), "doc_id")
        .withColumn(
            "copy_key", F.col("epoch") * 10_000_000 + F.col("doc_id")
        )
    )
    pk = (
        pack_sequences(
            withtext, "copy_key", "text", budget=512, partition_by="source"
        )
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.sum("n_tokens").alias("tokens"),
            F.count_distinct("source", "pack_id").alias("n_packs"),
        )
        .collect()[0]
    )
    t = time.monotonic() - t0
    print(
        f"mixture->pack: {pk['n_copies']} doc-copies / {pk['tokens']} "
        f"tokens into {pk['n_packs']} 512-token packs in {t:.1f}s = "
        f"{pk['n_copies'] / t / 1e3:.0f}k copies/s "
        f"(closed form ~{pk['tokens'] // 512} packs + <=1 tail per "
        f"source shard)",
        flush=True,
    )


if __name__ == "__main__":
    main()
