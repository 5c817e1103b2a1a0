#!/usr/bin/env python
"""Steady-state measurement of the persisted-index ingest loop at full
scale: stream the synthetic Zipfian corpus (tools/fullscale_docs.py's
generator) through ``write_dedup_index`` + ``incremental_dedup_indexed``
in N batches and record per-batch wall time against batch number.

The claim under test (operators/dedup.py::incremental_dedup_indexed):
each ingest batch costs O(batch + banding candidates) — history is
touched only through the md5 semi-join, the (band, bucket) equi-join
against the band-partitioned stored relation, and candidate-scoped
text point reads. If the per-batch classify time is FLAT as the index
grows from 1 to N-1 batches, the claim holds; if it grows linearly,
the index reads aren't pruning.

Batch assignment is doc_id % N (interleaved), so the planted duplicates
(id%100==50 exact-copies id-2; id%100==99 near-copies id-1) land in a
LATER batch than their source and exercise the exact/near tiers against
genuine history: with N=20, every mod-50 doc arrives in batch 10 with
its source already indexed from batch 8, and every mod-99 doc in batch
19 against batch 18. Expected verdicts are therefore closed-form:
batch 10 classifies its 1/5 mod-50 slice 'exact', batch 19 its mod-99
slice 'near' (banding bound ~0.997 at J~0.85), all else 'novel'.

Usage: python tools/fullscale_ingest.py [n_docs] [n_batches] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

FUSED = "--fused" in sys.argv
_pos = [a for a in sys.argv[1:] if a != "--fused"]
N_DOCS = int(_pos[0]) if len(_pos) > 0 else 4_000_000
N_BATCHES = int(_pos[1]) if len(_pos) > 1 else 20
WORKDIR = _pos[2] if len(_pos) > 2 else "/tmp/fullscale_docs"


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.dedup import (
        incremental_dedup_indexed,
        ingest_batch,
        write_dedup_index,
    )
    from tools.fullscale_docs import synth_corpus

    spark = get_spark("fullscale-ingest")
    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)

    idx = os.path.join(WORKDIR, "ingest_index")
    store = os.path.join(WORKDIR, "ingest_corpus")
    for p in (idx, store):
        shutil.rmtree(p, ignore_errors=True)

    print(
        f"ingest loop: {N_DOCS} docs in {N_BATCHES} interleaved batches "
        f"({'FUSED ingest_batch' if FUSED else 'two-call loop'})",
        flush=True,
    )
    rows = []
    for b in range(N_BATCHES):
        batch = docs.filter(F.col("doc_id") % N_BATCHES == b)
        verdicts = {"exact": 0, "near": 0, "novel": 0}
        if FUSED and b > 0:
            # fused path: t_classify covers the history-read setup plus
            # ingest_batch (classify AND index append — one shared
            # signature pass); t_append covers ONLY the corpus-store
            # write. The hist read sits INSIDE the timed window in both
            # modes so the A/B per-batch totals compare like-for-like.
            t0 = time.monotonic()
            hist = spark.read.parquet(store)
            v = ingest_batch(spark, idx, hist, batch, "doc_id", "text")
            verdicts.update(
                {
                    r["verdict"]: r["n"]
                    for r in v.groupBy("verdict")
                    .agg(F.count(F.lit(1)).alias("n"))
                    .collect()
                }
            )
            t_classify = time.monotonic() - t0
            t0 = time.monotonic()
            batch.write.mode("append").parquet(store)
            t_append = time.monotonic() - t0
        else:
            t0 = time.monotonic()
            if b > 0:
                hist = spark.read.parquet(store)
                v = incremental_dedup_indexed(
                    spark, idx, hist, batch, "doc_id", "text"
                )
                verdicts.update(
                    {
                        r["verdict"]: r["n"]
                        for r in v.groupBy("verdict")
                        .agg(F.count(F.lit(1)).alias("n"))
                        .collect()
                    }
                )
            t_classify = time.monotonic() - t0
            t0 = time.monotonic()
            write_dedup_index(
                batch, idx, "doc_id", "text",
                mode="append" if b else "overwrite",
            )
            batch.write.mode("append").parquet(store)
            t_append = time.monotonic() - t0
        rows.append((b, t_classify, t_append, verdicts))
        print(
            f"batch {b:3d}: classify {t_classify:6.1f}s  append "
            f"{t_append:6.1f}s  exact={verdicts['exact']} "
            f"near={verdicts['near']} novel={verdicts['novel']}",
            flush=True,
        )

    # steady-state comparison over the all-novel batches only (the two
    # planted-dup batches pay for candidate verification by design)
    mid = [
        r
        for r in rows[1:]
        if (r[3]["exact"] + r[3]["near"])
        <= 0.01 * max(1, sum(r[3].values()))
    ]
    early = [t for b, t, _, _ in mid if b <= N_BATCHES // 3]
    late = [t for b, t, _, _ in mid if b > 2 * N_BATCHES // 3]
    if early and late:
        e, l = sum(early) / len(early), sum(late) / len(late)
        print(
            f"steady-state check: mean classify early-third {e:.1f}s vs "
            f"late-third {l:.1f}s (ratio {l / e:.2f} — flat ratio ~1 "
            f"means O(batch) holds)",
            flush=True,
        )
    tot_c = sum(t for _, t, _, _ in rows[1:])
    tot_a = sum(t for _, _, t, _ in rows[1:])
    print(
        f"totals over batches 1..{N_BATCHES - 1}: classify {tot_c:.1f}s  "
        f"append {tot_a:.1f}s  per-batch total "
        f"{(tot_c + tot_a) / (N_BATCHES - 1):.1f}s",
        flush=True,
    )
    du = os.popen(f"du -sh {idx}").read().split()[0]
    print(f"final index size: {du}", flush=True)


if __name__ == "__main__":
    main()
