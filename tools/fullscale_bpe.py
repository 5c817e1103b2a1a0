#!/usr/bin/env python
"""Full-scale BPE training: the round-6 watch item was the per-merge
driver round-trip (~3s of fixed job scheduling per merge) making
production vocab sizes a days-long loop.  Round 7's prefix-disjoint
batched merge selection (operators/bpe.py::_select_batch, provably
identical to the sequential argmax) amortizes that fixed cost across
up to ``batch_merges`` merges per job round.

This leg trains >= 500 merges on the 4M-doc Zipfian corpus
(tools/fullscale_docs.py synth; ~50k-word vocabulary) and records
wall-clock per merge for batch_merges=32 vs the classic m=1 loop on a
prefix of the same schedule (the m=1 leg runs 24 merges and
extrapolates — running 500 sequentially is exactly the problem).

Usage: python tools/fullscale_bpe.py [n_docs] [n_merges] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.fullscale_docs import synth_corpus

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
N_MERGES = int(sys.argv[2]) if len(sys.argv) > 2 else 500
WORKDIR = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fullscale_docs"
M1_PREFIX = 24


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.bpe import train_bpe

    spark = get_spark("fullscale-bpe")
    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs in {time.monotonic() - t0:.1f}s", flush=True)

    t0 = time.monotonic()
    batched = train_bpe(docs, n_merges=N_MERGES, batch_merges=32)
    t_b = time.monotonic() - t0
    print(
        f"batched (32/round): {len(batched)} merges in {t_b:.1f}s "
        f"({t_b / max(len(batched), 1):.2f}s/merge)",
        flush=True,
    )

    t0 = time.monotonic()
    seq = train_bpe(docs, n_merges=M1_PREFIX, batch_merges=1)
    t_s = time.monotonic() - t0
    per = t_s / max(len(seq), 1)
    print(
        f"classic m=1 prefix: {len(seq)} merges in {t_s:.1f}s "
        f"({per:.2f}s/merge -> {per * len(batched) / 60:.1f} min "
        f"extrapolated for {len(batched)})",
        flush=True,
    )
    assert seq == batched[: len(seq)], "batched prefix != sequential"
    print("batched prefix identical to sequential", flush=True)


if __name__ == "__main__":
    main()
