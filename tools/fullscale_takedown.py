#!/usr/bin/env python
"""Full-scale leg for the composed cross-index takedown
(`operators/takedown.py::takedown_docs`): ONE doc-id set removed from
the corpus parquet + BM25 text index + dedup history index (+ the
IVF-PQ ANN index when the lifecycle tool's 2M index is present on the
same workdir) in one call, at 2M docs.

What it measures (the operational questions a takedown/GDPR flow asks):

- build cost of the three derived stores (context, not the point);
- the takedown call itself at two victim scales — a realistic GDPR
  batch (~200 ids) and a bulk decontamination sweep (1% = 20k ids):
  the index deletes must be id-set-sized tombstone appends (seconds,
  flat across victim scales), the corpus swap-rewrite must be one
  anti-join scan + write (corpus-scale, flat across victim scales) —
  so TOTAL cost should be dominated by the corpus rewrite and nearly
  independent of how many ids are taken down;
- the idempotent rerun (crash-recovery contract): near-free, removes 0;
- a post-takedown BM25 probe: the index answers immediately (tombstones
  are merge-on-read — no compaction needed for correctness).

Usage: python tools/fullscale_takedown.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"
ANN_IDX = "/tmp/fullscale_ann/ivfpq_idx_2000000"  # lifecycle tool's index
N_BUCKETS = 64
TERMS = ["w12", "w47", "w203", "w1776"]


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import (
        dedup as D,
        takedown as TD,
        textindex as TI,
    )
    from tools.fullscale_docs import synth_corpus

    spark = get_spark("fullscale-takedown")

    src = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(src, "_SUCCESS")):
        os.makedirs(WORKDIR, exist_ok=True)
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(src)

    # private corpus copy: takedown swap-rewrites it in place
    corp = os.path.join(WORKDIR, f"corpus_takedown_{N_DOCS}")
    if os.path.exists(corp):
        shutil.rmtree(corp)
    t0 = time.monotonic()
    spark.read.parquet(src).select("doc_id", "text").write.parquet(corp)
    print(f"corpus copy: {time.monotonic() - t0:.1f}s", flush=True)
    docs = spark.read.parquet(corp)

    txt = os.path.join(WORKDIR, f"txtidx_takedown_{N_DOCS}")
    if os.path.exists(txt):
        shutil.rmtree(txt)
    t0 = time.monotonic()
    TI.write_text_index(docs, txt, n_buckets=N_BUCKETS)
    print(f"text index build: {time.monotonic() - t0:.1f}s", flush=True)

    ded = os.path.join(WORKDIR, f"dedupidx_takedown_{N_DOCS}")
    if os.path.exists(ded):
        shutil.rmtree(ded)
    t0 = time.monotonic()
    D.write_dedup_index(docs, ded, "doc_id", "text")
    print(f"dedup index build: {time.monotonic() - t0:.1f}s", flush=True)

    ann = ANN_IDX if os.path.exists(os.path.join(ANN_IDX, "meta.json")) else None
    print(f"ann index: {'included (' + ann + ')' if ann else 'absent, skipped'}",
          flush=True)

    def run(label: str, victims_df, expect_n: int) -> None:
        kw = dict(corpus_path=corp, text_index=txt, dedup_index=ded)
        if ann:
            kw["ann_index"] = ann
        t0 = time.monotonic()
        led = TD.takedown_docs(spark, victims_df, **kw)
        t_take = time.monotonic() - t0
        t0 = time.monotonic()
        again = TD.takedown_docs(spark, victims_df, **kw)
        t_rerun = time.monotonic() - t0
        assert led["corpus_deleted"] == expect_n, led
        assert led["text_deleted"] == expect_n, led
        assert led["dedup_deleted"] == expect_n, led
        assert all(
            (v == 0 or v is None) for v in again.values()
        ), f"rerun not a no-op: {again}"
        t0 = time.monotonic()
        hits = TI.bm25_query_index(spark, txt, TERMS, k=50)
        n_hits = hits.count()
        t_probe = time.monotonic() - t0
        print(
            f"takedown[{label}]: {expect_n} ids removed from "
            f"{'4' if ann else '3'} stores in {t_take:.1f}s "
            f"(tokens excised: {led['text_deleted_tokens']}"
            + (f", ann rows: {led['ann_deleted']}" if ann else "")
            + f"); idempotent rerun {t_rerun:.1f}s (removed 0); "
            f"post-takedown BM25 probe {t_probe:.1f}s ({n_hits} rows)",
            flush=True,
        )

    # victims come from the IMMUTABLE source parquet, never from the
    # corpus copy: the takedown swap-rewrites `corp`, so any victim
    # DataFrame derived from it would hold pre-swap file listings
    stable = spark.read.parquet(src).select("doc_id")

    # scenario 1: realistic GDPR batch — ~200 ids (doc_id % 10007 == 3)
    v1 = stable.filter(F.pmod(F.col("doc_id"), F.lit(10007)) == 3)
    run("gdpr ~200 ids", v1, v1.count())

    # scenario 2: bulk decontamination sweep — 1% (doc_id % 100 == 7),
    # minus scenario 1's already-removed ids so the ledger asserts
    # stay exact (re-deleting a gone id is a no-op by contract)
    v2 = stable.filter(
        (F.pmod(F.col("doc_id"), F.lit(100)) == 7)
        & (F.pmod(F.col("doc_id"), F.lit(10007)) != 3)
    )
    run("bulk 1%", v2, v2.count())

    n_left = spark.read.parquet(corp).count()
    print(f"corpus rows remaining: {n_left} of {N_DOCS}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
