#!/usr/bin/env python
"""Full-scale DSIR selection A/B: the round-6 weak mark was the corpus
n-gram featurization being replayed once per consumer (~5 passes — two
scalar-total collects inside the weight fit plus the t/r/raw branches
of the scoring query).  Round 7 persists the (id, bucket, cnt, _is_t)
relation MEMORY_AND_DISK, folds both totals into ONE aggregate, and
eagerly checkpoints the bounded top-k so the cache can be released
before returning (operators/selection.py::dsir_select).

This leg measures before/after on the 4M-doc Zipfian corpus
(tools/fullscale_docs.py synth, ~316M 1-2-grams per featurization
pass): A = the old unpersisted wiring (reconstructed inline from the
same public pieces), B = the fixed dsir_select.  Correctness parity is
gated at sf0.01 by the battery oracle (dsir_selection_docs); here both
variants must simply agree on the selected id set.

Usage: python tools/fullscale_dsir.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from tools.fullscale_docs import synth_corpus

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"
K = 10_000
N_BUCKETS = 10_000


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.selection import (
        dsir_logratio_weights,
        dsir_scores,
        dsir_select,
        hashed_ngram_counts,
    )

    spark = get_spark("fullscale-dsir")
    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs in {time.monotonic() - t0:.1f}s", flush=True)

    is_t = F.col("doc_id") % 40 == 7  # ~2.5% target slice

    # --- C: two_pass (default; histogram + broadcast-weight scoring) ------
    t0 = time.monotonic()
    sel_c = dsir_select(
        docs, "doc_id", "text", is_target=is_t, k=K, n_buckets=N_BUCKETS,
        strategy="two_pass",
    )
    ids_c = {r["doc_id"] for r in sel_c.collect()}
    t_c = time.monotonic() - t0
    print(
        f"dsir_select two_pass (default): top-{K} of {n} docs in "
        f"{t_c:.1f}s ({n / t_c:,.0f} docs/s)",
        flush=True,
    )

    # --- B: persist strategy (one featurization pass, corpus-sized cache) -
    t0 = time.monotonic()
    sel = dsir_select(
        docs, "doc_id", "text", is_target=is_t, k=K, n_buckets=N_BUCKETS,
        strategy="persist",
    )
    ids_b = {r["doc_id"] for r in sel.collect()}
    t_b = time.monotonic() - t0
    print(
        f"dsir_select persist (1 pass + corpus-sized cache): "
        f"{t_b:.1f}s ({n / t_b:,.0f} docs/s)",
        flush=True,
    )
    assert ids_c == ids_b, "two_pass != persist id set"

    if os.environ.get("DSIR_SKIP_OLD"):
        print(f"two_pass vs persist: {t_b / t_c:.2f}x; old wiring skipped "
              "(quiet-measured separately)", flush=True)
        return

    # --- A: round-6 wiring (unpersisted; Catalyst replays the pass) -------
    t0 = time.monotonic()
    feats = hashed_ngram_counts(
        docs, "doc_id", "text", n_buckets=N_BUCKETS, max_n=2
    )
    flagged = feats.join(
        docs.select(F.col("doc_id"), is_t.alias("_is_t")), "doc_id"
    )
    w = dsir_logratio_weights(
        flagged.filter(F.col("_is_t")).select("doc_id", "bucket", "cnt"),
        flagged.filter(~F.col("_is_t")).select("doc_id", "bucket", "cnt"),
        n_buckets=N_BUCKETS,
    )
    raw = flagged.filter(~F.col("_is_t")).select("doc_id", "bucket", "cnt")
    old = (
        dsir_scores(raw, w, "doc_id")
        .orderBy(F.desc("score_q"), "doc_id")
        .limit(K)
    )
    ids_a = {r["doc_id"] for r in old.collect()}
    t_a = time.monotonic() - t0
    print(
        f"old wiring (unpersisted, replayed passes): {t_a:.1f}s "
        f"({n / t_a:,.0f} docs/s) -> speedup {t_a / t_b:.2f}x",
        flush=True,
    )
    assert ids_a == ids_b, (
        f"variant disagreement: {len(ids_a ^ ids_b)} ids differ"
    )
    print(f"all three variants identical ({len(ids_b)} ids)", flush=True)


if __name__ == "__main__":
    main()
