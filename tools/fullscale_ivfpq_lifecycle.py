#!/usr/bin/env python
"""Full-scale persisted IVF-PQ index lifecycle: the steady-state ingest
loop measured at 2M + 12x10k vectors.

Legs:
1. base build: train (coarse centroids + residual codebooks) on the 2M
   clustered corpus (same synth rule as tools/fullscale_ann.py), write
   the persisted index (one file per cell).
2. single 100k append with the FROZEN model — the number that matters:
   append cost must track the BATCH size, not the index size (a full
   rebuild is the comparison).
3. 12 x 10k appends (the fragmentation regime): file count grows by
   ~touched-cells per batch; query the fragmented index.
4. compaction: restore ~one file per cell; query again — results must
   be row-identical to the fragmented index (same codes, same model).
5. drift -> advisory -> retrain (r14, r13 verdict item 2): append
   100k-slices drawn from NOVEL cluster centers the frozen coarse
   model never saw (they pile into few cells) until
   ``maybe_retrain_ivfpq_index`` fires; at the fire point measure what
   the drift actually costs (hot-cell mass = worst-case probe cost,
   recall@k on drift-locality queries vs brute force) and what the
   repair costs (``retrain_ivfpq_index`` wall time vs the base build
   vs one append); re-measure after. This leg is the evidence behind
   the advisory's documented ``max_skew`` default.

Usage: python tools/fullscale_ivfpq_lifecycle.py [n_vecs] [workdir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_ann"
DIM = 64
N_CLUSTERS = 32
N_CELLS = 64
M_SUB, N_CODES = 16, 64


def nfiles(d: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    )


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import similarity as S

    # fullscale_ann parses sys.argv at import (its own CLI contract);
    # stash ours so a workdir argument doesn't crash its int() parse
    argv, sys.argv = sys.argv, sys.argv[:1]
    try:
        from tools.fullscale_ann import synth_embeddings
    finally:
        sys.argv = argv

    spark = get_spark("fullscale-ivfpq-lifecycle")
    emb_path = os.path.join(WORKDIR, f"emb_{N_VECS}.parquet")
    if not os.path.exists(os.path.join(emb_path, "_SUCCESS")):
        synth_embeddings(spark, N_VECS).repartition(64).write.mode(
            "overwrite"
        ).parquet(emb_path)
    emb = spark.read.parquet(emb_path)

    cents = S.train_ivf_centroids(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        n_cells=N_CELLS, n_train=8192,
    )
    books = S.train_pq_codebooks_distributed(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        m=M_SUB, n_codes=N_CODES, n_train=8192, dim=DIM, centroids=cents,
    )
    idx = os.path.join(WORKDIR, f"ivfpq_idx_{N_VECS}")
    if os.path.exists(idx):
        shutil.rmtree(idx)
    t0 = time.monotonic()
    S.write_ivfpq_index(
        emb, idx, books, cents, corpus_id="vec_id", corpus_vec="embedding"
    )
    t_base = time.monotonic() - t0
    codes = os.path.join(idx, "codes")
    print(
        f"base build: {N_VECS} vectors encoded + written in {t_base:.1f}s, "
        f"{nfiles(codes)} files",
        flush=True,
    )

    # synthesize append batches BEYOND the corpus with the same rule
    # (synth_embeddings is deterministic in vec_id, so a range shift is
    # just 'more of the same corpus')
    def batch(lo: int, n: int):
        return synth_embeddings(spark, lo + n).filter(F.col("vec_id") >= lo)

    t0 = time.monotonic()
    S.append_ivfpq_index(
        batch(N_VECS, 100_000), idx, corpus_vec="embedding", batch_id=0
    )
    t_app = time.monotonic() - t0
    print(
        f"append 100k (frozen model): {t_app:.1f}s = "
        f"{t_base / t_app:.1f}x cheaper than a rebuild at {N_VECS} rows "
        f"({nfiles(codes)} files)",
        flush=True,
    )

    lo = N_VECS + 100_000
    t0 = time.monotonic()
    for i in range(12):
        S.append_ivfpq_index(
            batch(lo + i * 10_000, 10_000), idx,
            corpus_vec="embedding", batch_id=i + 1,
        )
    t_many = time.monotonic() - t0
    frag_files = nfiles(codes)
    print(
        f"12 x 10k appends: {t_many:.1f}s total "
        f"({t_many / 12:.1f}s/batch), layout fragmented to "
        f"{frag_files} files",
        flush=True,
    )

    q = emb.filter(F.col("vec_id") < 20)
    kw = dict(
        query_id="vec_id", query_vec="embedding",
        corpus_id="vec_id", corpus_vec="embedding",
        k=5, n_probe=8, shortlist=500,
    )
    corpus_all = synth_embeddings(spark, lo + 120_000)
    t0 = time.monotonic()
    before = {
        tuple(r)
        for r in S.ivfpq_query_index(spark, idx, q, corpus_all, **kw).collect()
    }
    t_qfrag = time.monotonic() - t0
    t0 = time.monotonic()
    stats = S.compact_ivfpq_index(spark, idx)
    t_comp = time.monotonic() - t0
    t0 = time.monotonic()
    after = {
        tuple(r)
        for r in S.ivfpq_query_index(spark, idx, q, corpus_all, **kw).collect()
    }
    t_qcomp = time.monotonic() - t0
    assert after == before, "compaction changed query results"
    print(
        f"compaction: {stats['files_before']} -> {stats['files_after']} "
        f"files in {t_comp:.1f}s; query fragmented {t_qfrag:.1f}s vs "
        f"compacted {t_qcomp:.1f}s; results row-identical",
        flush=True,
    )

    # --- leg 5: drift -> advisory -> retrain (r14) ------------------------
    argv, sys.argv = sys.argv, sys.argv[:1]
    try:
        from tools.fullscale_ann import _u
    finally:
        sys.argv = argv

    def drift_batch(lo: int, n: int):
        """Same per-component rule as synth_embeddings but the cluster
        id is drawn from TWO NOVEL centers (>= any trained cluster) —
        the post-deployment distribution shift the frozen coarse model
        cannot follow; every drifted vector lands in whichever
        existing cell happens to sit nearest the new centers."""
        base = spark.range(lo, lo + n).select(F.col("id").alias("vec_id"))
        cl = F.lit(1000) + F.col("vec_id") % 2
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(DIM - 1)),
            lambda i: _u(cl * DIM + i, 97)
            + 0.35 * _u(F.col("vec_id") * DIM + i, 131),
        )
        return base.select("vec_id", vec.alias("embedding"))

    lo_d = lo + 120_000  # ids continue past the fragmentation appends

    def corpus_at(n_drift: int):
        """The index's exact live contents: base+appends (the synth
        rule over a contiguous id range) + the drifted slices."""
        c = synth_embeddings(spark, lo_d)
        return c.unionByName(drift_batch(lo_d, n_drift)) if n_drift else c

    def recall_and_time(n_drift: int, label: str) -> tuple[float, float]:
        """recall@K and query wall time for 20 original + 20 drifted
        queries against the CURRENT index, truth from brute force over
        the same corpus — drift-locality queries are where an
        overstuffed cell actually hurts (their whole neighborhood
        shares the hot cell)."""
        corpus = corpus_at(n_drift)
        qd = (
            emb.filter(F.col("vec_id") < 20)
            .unionByName(drift_batch(lo_d, 20))
            if n_drift
            else emb.filter(F.col("vec_id") < 40)
        )
        exact = (
            S.brute_force_topk_arrow(
                qd.select(
                    F.col("vec_id").alias("qid"),
                    F.col("embedding").alias("qvec"),
                ),
                corpus.select(
                    F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cvec"),
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
        t0 = time.monotonic()
        approx = S.ivfpq_query_index(
            spark, idx, qd, corpus,
            query_id="vec_id", query_vec="embedding",
            corpus_id="vec_id", corpus_vec="embedding",
            k=5, n_probe=8, shortlist=500,
        ).collect()
        t_q = time.monotonic() - t0
        hits = sum(1 for r in approx if r.cid in truth.get(r.qid, set()))
        total = sum(len(v) for v in truth.values())
        rec = hits / total
        print(
            f"  [{label}] recall@5 {hits}/{total} = {rec:.4f}, "
            f"40-query probe {t_q:.1f}s",
            flush=True,
        )
        return rec, t_q

    st0 = S.ivfpq_index_stats(idx)
    # the derivation rule this leg exists to measure: a healthy build
    # of a CLUSTERED corpus already sits at skew ~2 (32 synth clusters
    # over 64 cells — real corpora are never uniform), so an absolute
    # threshold is meaningless; fire at 2x the healthy-build skew.
    # Measured here: novel-center drift adds ~+0.22 skew per 100k rows
    # at 2.2M/64 cells, so 2x baseline ~ 0.9M drifted rows (~40% of
    # the corpus) — the advisory fires when drift is a large minority
    # of the data, not on the first append.
    MAX_SKEW = 2.0 * st0["cell_skew_ratio"]
    print(
        f"drift leg baseline: skew {st0['cell_skew_ratio']:.2f}, "
        f"max cell {st0['cell_rows_max']} rows "
        f"(mean {st0['cell_rows_mean']:.0f}); advisory threshold "
        f"2x baseline = {MAX_SKEW:.2f}",
        flush=True,
    )
    rec0, tq0 = recall_and_time(0, "pre-drift")
    n_drift, fired = 0, None
    for i in range(16):
        t0 = time.monotonic()
        S.append_ivfpq_index(
            drift_batch(lo_d + n_drift, 100_000), idx,
            corpus_vec="embedding", batch_id=13 + i,
        )
        n_drift += 100_000
        t_slice = time.monotonic() - t0
        fired = S.maybe_retrain_ivfpq_index(idx, max_skew=MAX_SKEW)
        st = fired or S.ivfpq_index_stats(idx)
        print(
            f"drift slice {i + 1}: +100k novel-center vectors in "
            f"{t_slice:.1f}s -> skew {st['cell_skew_ratio']:.2f}, "
            f"max cell {st['cell_rows_max']} rows"
            + (" — ADVISORY FIRED" if fired else ""),
            flush=True,
        )
        if fired:
            break
    assert fired, f"advisory never fired after {n_drift} drifted rows"
    rec1, tq1 = recall_and_time(n_drift, "at-fire (drifted)")

    corpus_now = corpus_at(n_drift)
    n_now = N_VECS + 220_000 + n_drift
    t0 = time.monotonic()
    rt = S.retrain_ivfpq_index(
        idx, corpus_now,
        corpus_id="vec_id", corpus_vec="embedding", n_train=8192,
    )
    t_retrain = time.monotonic() - t0
    st2 = S.ivfpq_index_stats(idx)
    rec2, tq2 = recall_and_time(n_drift, "post-retrain")
    print(
        f"retrain at {n_now} rows: {t_retrain:.1f}s "
        f"(base build at {N_VECS} was {t_base:.1f}s, one 100k append "
        f"{t_app:.1f}s) — skew {rt['skew_before']:.2f} -> "
        f"{rt['skew_after']:.2f}, max cell {st2['cell_rows_max']} rows; "
        f"recall@5 pre-drift {rec0:.4f} / drifted {rec1:.4f} / "
        f"post-retrain {rec2:.4f}; 40-query probe "
        f"{tq0:.1f}s / {tq1:.1f}s / {tq2:.1f}s",
        flush=True,
    )
    assert rt["skew_after"] < rt["skew_before"], "retrain did not fix skew"
    spark.stop()


if __name__ == "__main__":
    main()
