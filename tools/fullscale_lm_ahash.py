#!/usr/bin/env python
"""Full-scale legs for the round-8 operator families:

- bigram-LM perplexity filter (operators/text.py::bigram_lm_score) on
  the 4M-doc Zipfian corpus from tools/fullscale_docs.py — model-table
  build plus full-corpus scoring, with closed-form row/bigram-count
  asserts (every doc has exactly WORDS-1 bigrams);
- perceptual-hash image dedup (operators/multimodal.py::ahash_ppm +
  operators/dedup.py::hamming_banded_pairs) over 500k synthetic 16x16
  P6 payloads built in-plan with xxhash-random pixels and planted
  near-copies (every 10th image nudges 4 pixels of its predecessor) —
  hash rate, banded-pair time, planted recall, and a 1k-sample
  bit-exactness check against the python reference.

Usage: python tools/fullscale_lm_ahash.py [n_docs] [n_images] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_IMAGES = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
WORKDIR = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fullscale_docs"


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import (
        multimodal as M,
    )
    from implementation_of_an_etl_process_spark.operators.dedup import (
        hamming_banded_pairs,
    )
    from implementation_of_an_etl_process_spark.operators.multimodal import (
        ahash64_grid,
    )
    from implementation_of_an_etl_process_spark.operators.text import (
        bigram_lm_score,
    )
    from tools.fullscale_docs import WORDS, synth_corpus

    spark = get_spark("fullscale-lm-ahash")

    # --- bigram LM --------------------------------------------------------
    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(WORKDIR, exist_ok=True)
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs in {time.monotonic() - t0:.1f}s", flush=True)

    t0 = time.monotonic()
    scored = bigram_lm_score(docs)
    agg = scored.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_bigrams").alias("n_bigrams"),
        F.min("avg_nll_q").alias("min_avg"),
        F.max("avg_nll_q").alias("max_avg"),
    ).first()
    t = time.monotonic() - t0
    assert agg["n_docs"] == n, agg
    assert agg["n_bigrams"] == n * (WORDS - 1), agg
    assert agg["min_avg"] > 0
    print(
        f"bigram_lm: {n} docs / {agg['n_bigrams']} bigrams scored in "
        f"{t:.1f}s = {n / t / 1e3:.0f}k docs/s "
        f"(avg NLL_q range {agg['min_avg']}..{agg['max_avg']})",
        flush=True,
    )

    # --- min_count model bounding (round-9) --------------------------------
    # How much does CCNet-style pruning shrink the MODEL table (the one
    # localCheckpointed relation) on this corpus, and what does the
    # pruned-path scoring cost end to end?
    from implementation_of_an_etl_process_spark.operators.text import (
        adjacent_word_pairs,
    )

    t0 = time.monotonic()
    mstats = (
        adjacent_word_pairs(docs)
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("b"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(F.when(F.col("b") >= 2, 1).otherwise(0)).alias("kept2"),
        )
        .first()
    )
    print(
        f"bigram model: {mstats['rows']} unique bigrams, min_count=2 "
        f"keeps {mstats['kept2']} "
        f"({mstats['kept2'] / mstats['rows']:.1%}) — measured in "
        f"{time.monotonic() - t0:.1f}s",
        flush=True,
    )
    t0 = time.monotonic()
    agg2 = (
        bigram_lm_score(docs, min_count=2)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bigrams").alias("n_bigrams"),
        )
        .first()
    )
    t2 = time.monotonic() - t0
    assert agg2["n_docs"] == n and agg2["n_bigrams"] == agg["n_bigrams"]
    print(
        f"bigram_lm min_count=2: scored in {t2:.1f}s = "
        f"{n / t2 / 1e3:.0f}k docs/s (same doc/bigram counts)",
        flush=True,
    )

    # --- aHash image dedup -------------------------------------------------
    base = F.col("img_id") - F.when(F.col("img_id") % 10 == 9, 1).otherwise(0)
    cp = F.col("img_id") % 10 == 9

    def v(p):
        raw = F.pmod(F.xxhash64(base * 256 + p, F.lit(7)), F.lit(95))
        return (
            F.pmod(raw + F.when(cp & (p < 4), 1).otherwise(0), F.lit(95))
            + 32
        ).cast("int")

    raster = F.array_join(
        F.transform(
            F.sequence(F.lit(0), F.lit(255)),
            lambda p: F.repeat(F.char(v(p)), 3),
        ),
        "",
    )
    imgs = spark.range(N_IMAGES).select(
        F.col("id").alias("img_id"),
        F.encode(F.concat(F.lit("P6\n16 16\n255\n"), raster), "UTF-8").alias(
            "blob"
        ),
    )
    media = M.attach_media_meta(imgs, "img_id", "blob", "image")

    t0 = time.monotonic()
    sig = media.transform(M.ahash_ppm).localCheckpoint(eager=True)
    n_sig = sig.count()
    t_hash = time.monotonic() - t0
    assert n_sig == N_IMAGES
    print(
        f"ahash: {n_sig} images decoded+hashed in {t_hash:.1f}s = "
        f"{n_sig / t_hash / 1e3:.0f}k img/s",
        flush=True,
    )

    # 1k-sample bit-exactness vs the python reference
    import numpy as np

    sample = (
        media.join(sig, "media_id")
        .filter(F.col("media_id") % (max(N_IMAGES // 1000, 1)) == 0)
        .select("media_id", "payload", "ahash")
        .collect()
    )
    for r in sample:
        p = bytes(r["payload"])
        raster_b = p.split(b"\n", 3)[3]
        g = (
            np.frombuffer(raster_b, np.uint8, 768)
            .reshape(16, 16, 3)
            .astype(np.int64)
            .sum(axis=2)
        )
        assert ahash64_grid(g) == r["ahash"], r["media_id"]
    print(f"ahash: {len(sample)}-sample python recompute bit-exact", flush=True)

    t0 = time.monotonic()
    pairs = hamming_banded_pairs(sig, "media_id", "ahash", max_hamming=3)
    planted = pairs.filter(
        (F.col("id_b") - F.col("id_a") == 1) & (F.col("id_b") % 10 == 9)
    ).count()
    total = pairs.count()
    t_pairs = time.monotonic() - t0
    n_planted = N_IMAGES // 10
    print(
        f"ahash pairs: {total} total, planted recall "
        f"{planted}/{n_planted} = {planted / n_planted:.3f} in "
        f"{t_pairs:.1f}s (xxhash-random patterns: non-planted pairs are "
        f"hash accidents, expected ~0)",
        flush=True,
    )
    assert planted / n_planted > 0.5  # nudges can flip >3 cells sometimes

    # --- collapse-guard A/B (round-9: the auto gate) -----------------------
    # The guard's worth depends on whether exact-duplicate signatures
    # exist; "auto" probes count vs count-distinct and decides. Measure
    # all three modes on this corpus and assert identical pair sets.
    t0 = time.monotonic()
    nodup = hamming_banded_pairs(
        sig, "media_id", "ahash", max_hamming=3, collapse_exact=False
    )
    total_off = nodup.count()
    t_off = time.monotonic() - t0
    t0 = time.monotonic()
    auto = hamming_banded_pairs(
        sig, "media_id", "ahash", max_hamming=3, collapse_exact="auto"
    )
    total_auto = auto.count()
    t_auto = time.monotonic() - t0
    assert total_off == total_auto == total, (total, total_off, total_auto)
    sym = pairs.select("id_a", "id_b").exceptAll(
        nodup.select("id_a", "id_b")
    ).count() + nodup.select("id_a", "id_b").exceptAll(
        pairs.select("id_a", "id_b")
    ).count()
    assert sym == 0, sym
    n_dist = sig.select("ahash").distinct().count()
    print(
        f"ahash guard A/B: {N_IMAGES} sigs ({n_dist} distinct) -> pairs "
        f"guard-on {t_pairs:.1f}s / guard-off {t_off:.1f}s / auto "
        f"{t_auto:.1f}s (identical {total} pairs each)",
        flush=True,
    )


if __name__ == "__main__":
    main()
