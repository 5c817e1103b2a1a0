#!/usr/bin/env python
"""Addendum to the IVF-PQ lifecycle leg 5 (BASELINE_NOTES round 14):
quantify the documented advice that when drift adds TIGHT new
clusters, the durable fix is raising ``n_cells`` at retrain time, not
lowering ``max_skew``.

Reuses the lifecycle tool's on-disk state (`/tmp/fullscale_ann`):
the 2M synthetic corpus + the 1.1M novel-center drift rows that fired
the advisory. Two retrains on the identical 3.32M-row corpus:

1. ``n_cells=64`` (the index's original shape) — reproduces leg 5's
   end state from a clean slate (also clears any tombstones other
   legs left in the shared index);
2. ``n_cells=128`` — the advice under test, probed at both the same
   absolute ``n_probe`` (8: half the probe FRACTION, the latency-
   constant reading) and the same probe fraction (16: the recall-
   comparable reading).

Each pass reports retrain wall time, skew, hot-cell mass, drift-
locality recall@5 vs brute force, and the 40-query probe time.

Usage: python tools/fullscale_ivfpq_ncells.py [n_vecs] [workdir]
(defaults match the lifecycle tool: 2_000_000, /tmp/fullscale_ann)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_ann"
DIM = 64
N_DRIFT = 1_100_000  # slices appended before the advisory fired (leg 5)


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import similarity as S

    argv, sys.argv = sys.argv, sys.argv[:1]
    try:
        from tools.fullscale_ann import _u, synth_embeddings
    finally:
        sys.argv = argv

    spark = get_spark("fullscale-ivfpq-ncells")
    lo_d = N_VECS + 220_000  # base + 100k append + 12x10k (leg 2/3 ids)

    def drift_batch(lo: int, n: int):
        # identical rule to fullscale_ivfpq_lifecycle leg 5
        base = spark.range(lo, lo + n).select(F.col("id").alias("vec_id"))
        cl = F.lit(1000) + F.col("vec_id") % 2
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: _u(cl * DIM + i, 97)
            + 0.35 * _u(F.col("vec_id") * DIM + i, 131),
        )
        return base.select("vec_id", vec.alias("embedding"))

    corpus = synth_embeddings(spark, lo_d).unionByName(
        drift_batch(lo_d, N_DRIFT)
    )
    idx = os.path.join(WORKDIR, f"ivfpq_idx_{N_VECS}")
    assert os.path.exists(os.path.join(idx, "meta.json")), (
        f"run tools/fullscale_ivfpq_lifecycle.py first to create {idx}"
    )

    qd = (
        synth_embeddings(spark, 20)  # 20 original-locality queries
        .unionByName(drift_batch(lo_d, 20))  # 20 drift-locality queries
    )
    exact = (
        S.brute_force_topk_arrow(
            qd.select(
                F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
            ),
            corpus.select(
                F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
            ),
            query_id="qid", query_vec="qvec",
            corpus_id="cid", corpus_vec="cvec", k=5,
        )
        .select("qid", "cid")
        .collect()
    )
    truth: dict = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.cid)
    total = sum(len(v) for v in truth.values())

    def probe(label: str, n_probe: int) -> None:
        t0 = time.monotonic()
        approx = S.ivfpq_query_index(
            spark, idx, qd, corpus,
            query_id="vec_id", query_vec="embedding",
            corpus_id="vec_id", corpus_vec="embedding",
            k=5, n_probe=n_probe, shortlist=500,
        ).collect()
        t_q = time.monotonic() - t0
        hits = sum(1 for r in approx if r.cid in truth.get(r.qid, set()))
        print(
            f"  [{label}, n_probe={n_probe}] recall@5 {hits}/{total} "
            f"= {hits / total:.4f}, 40-query probe {t_q:.1f}s",
            flush=True,
        )

    for n_cells, probes in ((64, (8,)), (128, (8, 16))):
        t0 = time.monotonic()
        rt = S.retrain_ivfpq_index(
            idx, corpus,
            corpus_id="vec_id", corpus_vec="embedding", n_train=8192,
        ) if n_cells == 64 else S.retrain_ivfpq_index(
            idx, corpus,
            corpus_id="vec_id", corpus_vec="embedding", n_train=8192,
            n_cells=128,
        )
        t_rt = time.monotonic() - t0
        st = S.ivfpq_index_stats(idx)
        print(
            f"retrain n_cells={n_cells}: {t_rt:.1f}s -> skew "
            f"{st['cell_skew_ratio']:.2f}, max cell "
            f"{st['cell_rows_max']} rows (mean {st['cell_rows_mean']:.0f})",
            flush=True,
        )
        for np_ in probes:
            probe(f"n_cells={n_cells}", np_)

    spark.stop()


if __name__ == "__main__":
    main()
