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
    spark.stop()


if __name__ == "__main__":
    main()
