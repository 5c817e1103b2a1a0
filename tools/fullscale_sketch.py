#!/usr/bin/env python
"""Full-scale legs for the round-9 sketch operators on the 4M-doc
Zipfian corpus (tools/fullscale_docs.py):

- Bloom contamination screen vs the exact distinct-gram join
  (`operators/pretrain.py::bloom_filter_build`/`bloom_membership` vs
  `contamination_overlap`): same benchmark slice, same candidates —
  wall-clock A/B plus the guarantee check (bloom n_maybe >= exact
  n_hits per doc: false positives only, never negatives).
- Count-min sketch over every corpus token
  (`operators/sketch.py::cms_build`): the sketch relation stays
  <= depth x width rows however many tokens go in; the vocabulary's
  estimates must all be >= the exact counts.

Usage: python tools/fullscale_sketch.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"
BLOOM_M = 1 << 26  # 64 Mbit = 8 MB = 1M int64 words
BLOOM_K = 4
NGRAM = 3


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        bloom_filter_build,
        bloom_membership,
        contamination_overlap,
        word_ngrams,
    )
    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )
    from tools.fullscale_docs import synth_corpus

    spark = get_spark("fullscale-sketch")

    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(WORKDIR, exist_ok=True)
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    cand = docs.filter(F.col("doc_id") % 50 != 0)

    # --- Bloom screen vs exact distinct-gram join --------------------------
    t0 = time.monotonic()
    bench_grams = (
        bench.select(F.explode(word_ngrams("text", NGRAM)).alias("gram"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_bench = bench_grams.count()
    bloom = bloom_filter_build(
        bench_grams, "gram", m_bits=BLOOM_M, k=BLOOM_K
    ).localCheckpoint(eager=True)
    n_words = bloom.count()
    t_build = time.monotonic() - t0
    print(
        f"bloom build: {n_bench} distinct benchmark {NGRAM}-grams -> "
        f"{n_words} filter words ({n_words * 8 / 1e6:.1f} MB fixed) in "
        f"{t_build:.1f}s",
        flush=True,
    )

    t0 = time.monotonic()
    cand_grams = cand.select(
        "doc_id",
        F.explode(F.array_distinct(word_ngrams("text", NGRAM))).alias(
            "gram"
        ),
    )
    bl = (
        bloom_membership(cand_grams, bloom, "gram", m_bits=BLOOM_M, k=BLOOM_K)
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("maybe_member"), 1).otherwise(0)).alias(
                "n_maybe"
            ),
        )
    )
    bl_tot = bl.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_grams").alias("grams"),
        F.sum("n_maybe").alias("maybe"),
    ).first()
    t_bloom = time.monotonic() - t0
    print(
        f"bloom probe: {bl_tot['docs']} docs / {bl_tot['grams']} grams, "
        f"{bl_tot['maybe']} maybe-hits in {t_bloom:.1f}s",
        flush=True,
    )

    t0 = time.monotonic()
    ex = contamination_overlap(cand, bench, n=NGRAM, flag_threshold=0.2)
    ex_tot = ex.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_ngrams").alias("grams"),
        F.sum("n_hits").alias("hits"),
    ).first()
    t_exact = time.monotonic() - t0
    print(
        f"exact gram-join screen: {ex_tot['docs']} docs / "
        f"{ex_tot['grams']} grams, {ex_tot['hits']} hits in {t_exact:.1f}s",
        flush=True,
    )
    assert bl_tot["docs"] == ex_tot["docs"]
    assert bl_tot["grams"] == ex_tot["grams"]
    assert bl_tot["maybe"] >= ex_tot["hits"]  # FPs only, never negatives
    fp = (bl_tot["maybe"] - ex_tot["hits"]) / max(bl_tot["grams"], 1)
    print(
        f"bloom guarantee holds: maybe >= exact; corpus FP rate "
        f"{fp:.2e} at m={BLOOM_M} bits, k={BLOOM_K}",
        flush=True,
    )

    # --- CMS over every token ----------------------------------------------
    t0 = time.monotonic()
    toks = docs.select(
        F.explode(F.split(F.trim("text"), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    sketch = cms_build(toks, "token", depth=4, width=1024).localCheckpoint(
        eager=True
    )
    n_cells = sketch.count()
    t_cms = time.monotonic() - t0
    exact = toks.groupBy("token").agg(F.count(F.lit(1)).alias("exact_cnt"))
    est = cms_estimate(exact, sketch, "token", depth=4, width=1024)
    bad = est.filter(F.col("est") < F.col("exact_cnt")).count()
    n_vocab = exact.count()
    total_toks = toks.count()
    assert bad == 0, bad
    print(
        f"cms: {total_toks} tokens -> {n_cells}-cell sketch in "
        f"{t_cms:.1f}s; est >= exact for all {n_vocab} vocabulary tokens",
        flush=True,
    )


if __name__ == "__main__":
    main()
