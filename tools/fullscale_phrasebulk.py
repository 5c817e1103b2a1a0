#!/usr/bin/env python
"""Full-scale leg for BULK multi-phrase matching
(`textindex.multi_phrase_query_index_df`) — the benchmark-
contamination shape at benchmark scale: hundreds of probe bigrams
matched against the whole corpus in ONE pruned positions scan.

Requires the positional index built by tools/fullscale_textindex.py
(``txtidx_pos_<n>`` under the workdir) — reuses it rather than paying
another build.

Probe-set design matters and is part of what this leg documents. A
phrase query's cost is the sum of its TERMS' position postings, so:

- CONTENT n-grams (mid/tail Zipf ranks — what real benchmark
  contamination probes look like after stopword filtering) are the
  intended operating point: hundreds of phrases share one pruned
  scan and the exploded volume is the mid-rank postings.
- STOPWORD n-grams (head ranks) are the documented degenerate
  regime: a bigram of two top-Zipf words makes most of the corpus a
  candidate, so the cost approaches a corpus-scale position explode
  REGARDLESS of engine — the leg times ONE such phrase to put a
  number on it. Production guidance (mirrors the tf-idf df-band
  cutoff): drop or separately handle probe n-grams whose terms
  exceed a df threshold; they carry no contamination signal anyway.

Usage: python tools/fullscale_phrasebulk.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import (
        textindex as TI,
    )

    spark = get_spark("fullscale-phrasebulk")
    idx = os.path.join(WORKDIR, f"txtidx_pos_{N_DOCS}")
    if not os.path.exists(os.path.join(idx, "meta.json")):
        raise SystemExit(
            f"positional index missing at {idx} — run "
            "tools/fullscale_textindex.py first"
        )

    def content_phrases(n: int, lo: int = 800, hi: int = 6000):
        """n deterministic mid/tail-rank probe bigrams — the content
        n-gram regime (seeded arithmetic, no RNG)."""
        out = []
        for i in range(n):
            a = lo + (i * 37) % (hi - lo)
            b = lo + (i * 101 + 13) % (hi - lo)
            out.append(f"w{a} w{b}")
        return sorted(set(out))

    for n in (100, 400, 800):
        phrases = content_phrases(n)
        pdf = spark.createDataFrame([(p,) for p in phrases], "phrase string")
        t0 = time.monotonic()
        agg = (
            # explicit None: this leg measures the UNGUARDED cost of
            # content-term probes (the guarded 0.05 leg is below)
            TI.multi_phrase_query_index_df(spark, idx, pdf, max_term_df=None)
            .groupBy("phrase")
            .agg(F.count(F.lit(1)).alias("n_docs_hit"))
        )
        n_hit = agg.count()
        t = time.monotonic() - t0
        print(
            f"content bigrams: {len(phrases)} probes -> bulk match in "
            f"{t:.1f}s ({n_hit} phrases with hits)"
        )

    # guarded bulk leg (r13): the df-cutoff recipe is now ENFORCED by
    # the operator (max_term_df), not documented in this docstring — a
    # probe set salted with head-rank (stopword) bigrams must run at
    # content-probe cost, with the operator printing the dropped count
    # loudly on stderr
    salted = content_phrases(400) + [
        "w1 w2", "w2 w3", "w1 w3", "w3 w4", "w2 w5",
    ]
    pdf = spark.createDataFrame([(p,) for p in salted], "phrase string")
    t0 = time.monotonic()
    agg = (
        TI.multi_phrase_query_index_df(spark, idx, pdf, max_term_df=0.05)
        .groupBy("phrase")
        .agg(F.count(F.lit(1)).alias("n_docs_hit"))
    )
    kept = {r["phrase"] for r in agg.collect()}
    t = time.monotonic() - t0
    assert not kept & {"w1 w2", "w2 w3", "w1 w3", "w3 w4", "w2 w5"}
    print(
        f"guarded bulk (max_term_df=0.05): {len(salted)} probes incl. 5 "
        f"head-rank bigrams -> {t:.1f}s, {len(kept)} phrases with hits "
        "(head-rank probes dropped by the operator guard — see the "
        "stderr count above)"
    )

    # the degenerate stopword regime, one phrase, timed and documented
    t0 = time.monotonic()
    hot = TI.phrase_query_index(spark, idx, "w1 w2", k=50).collect()
    t_hot = time.monotonic() - t0
    print(
        f"degenerate stopword bigram 'w1 w2': {t_hot:.1f}s for top-50 "
        f"(most docs are candidates — the df-cutoff guidance case); "
        f"{len(hot)} rows"
    )

    # spot-check: the bulk path agrees with the single-phrase path
    probe = "w12 w47"
    bulk = {
        (r["doc_id"], r["n_occurrences"])
        for r in TI.multi_phrase_query_index_df(
            spark,
            idx,
            spark.createDataFrame([(probe,)], "phrase string"),
            k=50,
        ).collect()
    }
    single = {
        (r["doc_id"], r["n_occurrences"])
        for r in TI.phrase_query_index(spark, idx, probe, k=50).collect()
    }
    print(f"bulk == single for {probe!r}: {bulk == single}")


if __name__ == "__main__":
    main()
