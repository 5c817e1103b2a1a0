#!/usr/bin/env python
"""Full-scale ANN measurement: synthesize a multi-million-vector
CLUSTERED embedding corpus entirely Spark-side (seeded, no driver
data), then measure the similarity-search family end to end:

- exact brute-force top-k via the Arrow matmul path
  (`operators/similarity.py::brute_force_topk_arrow`) — the ground
  truth AND the baseline throughput number;
- IVF-flat with DISTRIBUTED KMeans coarse centroids
  (`train_ivf_centroids` + `ivf_topk`) — index assignment cost, query
  cost, and recall@k against the brute-force truth.

Corpus model: ``n_clusters`` seeded unit-ball centers; vector i
belongs to cluster (i % n_clusters) and is center + 0.35*noise, all
components derived from xxhash64(id, dim) — pure Column expressions,
fully parallel, reproducible. Clustered data is the shape IVF exists
for (uniform data would make every probe list equally useless).

Usage: python tools/fullscale_ann.py [n_vecs] [n_queries] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_QUERIES = int(sys.argv[2]) if len(sys.argv) > 2 else 100
WORKDIR = sys.argv[3] if len(sys.argv) > 3 else "/tmp/fullscale_ann"
DIM = 64
N_CLUSTERS = 32
N_CELLS = 64
N_PROBE = 8
K = 5


def _u(seed_col, salt: int):
    """uniform [-1, 1) from a 64-bit hash — pure Column arithmetic."""
    return (
        F.pmod(F.xxhash64(seed_col, F.lit(salt)), F.lit(2_000_000))
        / 1_000_000.0
        - 1.0
    )


def synth_embeddings(spark, n_vecs: int, n_clusters: int = N_CLUSTERS) -> DataFrame:
    base = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    cl = F.col("vec_id") % n_clusters
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(DIM - 1)),
        lambda i: _u(cl * DIM + i, 97) + 0.35 * _u(F.col("vec_id") * DIM + i, 131),
    )
    return base.select("vec_id", vec.alias("embedding"))


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import similarity as S

    spark = get_spark("fullscale-ann")
    path = os.path.join(WORKDIR, f"emb_{N_VECS}.parquet")
    t0 = time.monotonic()
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_embeddings(spark, N_VECS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    emb = spark.read.parquet(path)
    n = emb.count()
    print(
        f"corpus: {n} x {DIM}-dim vectors in {time.monotonic() - t0:.1f}s "
        f"({os.popen(f'du -sh {path}').read().split()[0]})",
        flush=True,
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES)

    # --- exact brute force (Arrow matmul path): truth + baseline ---------
    t0 = time.monotonic()
    exact = (
        S.brute_force_topk_arrow(
            q.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
            emb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
            query_id="qid",
            query_vec="qvec",
            corpus_id="cid",
            corpus_vec="cvec",
            k=K,
        )
        .select("qid", "cid")
        .collect()
    )
    t_bf = time.monotonic() - t0
    truth = {}
    for r in exact:
        truth.setdefault(r.qid, set()).add(r.cid)
    print(
        f"brute_force_arrow: {N_QUERIES} queries x {n} vectors in "
        f"{t_bf:.1f}s = {N_QUERIES * n / t_bf / 1e6:.1f}M scores/s",
        flush=True,
    )

    # --- IVF: distributed KMeans train + probe ----------------------------
    t0 = time.monotonic()
    cents = S.train_ivf_centroids(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        n_cells=N_CELLS, n_train=8192,
    )
    t_train = time.monotonic() - t0
    t0 = time.monotonic()
    approx = (
        S.ivf_topk_arrow(
            q,
            emb,
            query_id="vec_id",
            query_vec="embedding",
            corpus_id="vec_id",
            corpus_vec="embedding",
            k=K,
            n_probe=N_PROBE,
            dim=DIM,
            centroids=cents,
        )
        .select("qid", "cid")
        .collect()
    )
    t_ivf = time.monotonic() - t0
    hits = sum(1 for r in approx if r.cid in truth.get(r.qid, set()))
    total = sum(len(v) for v in truth.values())
    # the dominant index cost is the corpus->cell assignment inside
    # ivf_topk (n * n_cells cosines); report it as the effective rate
    print(
        f"ivf: kmeans train ({N_CELLS} cells, 8192 sample) {t_train:.1f}s; "
        f"assign+probe {t_ivf:.1f}s = {n / t_ivf / 1e6:.2f}M vecs/s "
        f"(corpus x {N_CELLS}-cell assignment + {N_PROBE}-probe scoring); "
        f"recall@{K} {hits}/{total} = {hits / total:.4f}",
        flush=True,
    )
    speedup = t_bf / t_ivf if t_ivf else float("inf")
    print(
        f"ivf vs brute force at {N_QUERIES} queries: {speedup:.2f}x "
        f"(probe fraction {N_PROBE}/{N_CELLS}; the query-side advantage "
        f"grows linearly with query count once the cell assignment is "
        f"amortized into the index build)",
        flush=True,
    )

    # --- flat PQ vs composed IVF-PQ (round 10) ----------------------------
    # Both indexes are STAGED to parquet (the production shape: encode
    # once, query many) so the timings below are pure query path. The
    # IVF-PQ index is written PARTITIONED BY cell — the probed-cell
    # isin filter then becomes partition pruning, the exact mechanism
    # a 10^9-vector deployment relies on.
    M_SUB, N_CODES, SHORTLIST = 16, 64, 500
    t0 = time.monotonic()
    books = S.train_pq_codebooks_distributed(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        m=M_SUB, n_codes=N_CODES, n_train=8192, dim=DIM,
    )
    t_books = time.monotonic() - t0
    pq_path = os.path.join(WORKDIR, f"pq_{N_VECS}.parquet")
    t0 = time.monotonic()
    S.encode_pq(
        emb, books, corpus_id="vec_id", corpus_vec="embedding"
    ).write.mode("overwrite").parquet(pq_path)
    t_enc_flat = time.monotonic() - t0
    encoded = spark.read.parquet(pq_path)
    t0 = time.monotonic()
    flat = (
        S.pq_topk(
            q, emb, encoded, books,
            query_id="vec_id", query_vec="embedding",
            corpus_id="vec_id", corpus_vec="embedding",
            k=K, shortlist=SHORTLIST,
        )
        .select("qid", "cid")
        .collect()
    )
    t_pq = time.monotonic() - t0
    hits_f = sum(1 for r in flat if r.cid in truth.get(r.qid, set()))
    print(
        f"pq flat: codebook train {t_books:.1f}s, encode {t_enc_flat:.1f}s "
        f"(m={M_SUB} K={N_CODES}); ADC scan of ALL {n} codes + re-rank "
        f"{t_pq:.1f}s; recall@{K} {hits_f}/{total} = {hits_f / total:.4f}",
        flush=True,
    )
    # residual codebooks: the textbook IVFADC layout — on this tightly
    # clustered corpus non-residual codes CANNOT rank within a cluster
    # (the flat recall above is the measurement), residual codes can
    t0 = time.monotonic()
    books_r = S.train_pq_codebooks_distributed(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        m=M_SUB, n_codes=N_CODES, n_train=8192, dim=DIM, centroids=cents,
    )
    t_books_r = time.monotonic() - t0
    idx_path = os.path.join(WORKDIR, f"ivfpq_{N_VECS}.parquet")
    t0 = time.monotonic()
    S.encode_ivfpq(
        emb, books_r, cents, corpus_id="vec_id", corpus_vec="embedding"
    ).repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(idx_path)  # 1 file/cell: see write_ivfpq_index
    t_enc_ivf = time.monotonic() - t0
    index = spark.read.parquet(idx_path)

    def pruned_fraction(queries_df) -> float:
        """What the probe scan actually reads: the UNION of all
        queries' probe lists, as a fraction of corpus rows. Per-query
        probing is n_probe/n_cells, but a query batch spanning many
        clusters probes the union — with 100 queries over all 32
        clusters that union is 64/64 cells and the 'pruned' scan reads
        everything. Printing it keeps the speedup claim honest."""
        import numpy as np

        C = np.array(cents, dtype=np.float64)
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-30)
        Q = np.array(
            [r.embedding for r in queries_df.collect()], dtype=np.float64
        )
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-30)
        s = Qn @ Cn.T
        qidx = np.argsort(-s[:, ::-1], axis=1, kind="stable")[:, :N_PROBE]
        probed = sorted({int(c) for row in (N_CELLS - 1 - qidx) for c in row})
        return index.filter(
            F.col("cell").isin(probed)
        ).count() / max(n, 1)

    kw_pq = dict(
        query_id="vec_id", query_vec="embedding",
        corpus_id="vec_id", corpus_vec="embedding",
        k=K, shortlist=SHORTLIST,
    )
    # this host swings 3x on a minutes timescale -> interleaved min-of-2
    t_ivfpq, t_pq2 = [], []
    comp = None
    for _ in range(2):
        t0 = time.monotonic()
        comp = (
            S.ivfpq_topk(
                q, emb, index, books_r, cents, n_probe=N_PROBE, **kw_pq
            )
            .select("qid", "cid")
            .collect()
        )
        t_ivfpq.append(time.monotonic() - t0)
        t0 = time.monotonic()
        S.pq_topk(q, emb, encoded, books, **kw_pq).write.format(
            "noop"
        ).mode("overwrite").save()
        t_pq2.append(time.monotonic() - t0)
    hits_c = sum(1 for r in comp if r.cid in truth.get(r.qid, set()))
    frac = pruned_fraction(q)
    print(
        f"ivfpq (residual): codebook train {t_books_r:.1f}s, encode "
        f"(cell + codes, one pass) {t_enc_ivf:.1f}s; "
        f"probe {N_PROBE}/{N_CELLS} cells/query, scan union "
        f"{frac:.2f} of corpus; ADC + re-rank min "
        f"{min(t_ivfpq):.1f}s vs flat min {min(t_pq2):.1f}s "
        f"(interleaved x2: ivfpq {[round(t,1) for t in t_ivfpq]}, "
        f"flat {[round(t,1) for t in t_pq2]}); recall@{K} "
        f"{hits_c}/{total} = {hits_c / total:.4f} "
        f"(vs flat {hits_f / total:.4f})",
        flush=True,
    )

    # --- clustered query batch: where the probe PRUNES -------------------
    # A batch of queries from ONE cluster probes a union of a few
    # cells; the partition-pruned scan then reads that fraction of the
    # index no matter the corpus size — the mechanism a 10^9-vector
    # deployment's per-tenant / per-topic query batches rely on.
    qc = emb.filter(
        (F.col("vec_id") % N_CLUSTERS == 0) & (F.col("vec_id") < 640)
    )  # 20 queries, all cluster 0
    t_cl, t_cl_flat = [], []
    for _ in range(2):
        t0 = time.monotonic()
        S.ivfpq_topk(
            qc, emb, index, books_r, cents, n_probe=N_PROBE, **kw_pq
        ).write.format("noop").mode("overwrite").save()
        t_cl.append(time.monotonic() - t0)
        t0 = time.monotonic()
        S.pq_topk(qc, emb, encoded, books, **kw_pq).write.format(
            "noop"
        ).mode("overwrite").save()
        t_cl_flat.append(time.monotonic() - t0)
    frac_cl = pruned_fraction(qc)
    print(
        f"ivfpq clustered batch (20 queries, 1 cluster): scan union "
        f"{frac_cl:.3f} of corpus; ivfpq min {min(t_cl):.1f}s vs flat "
        f"ADC-all min {min(t_cl_flat):.1f}s = "
        f"{min(t_cl_flat) / min(t_cl):.2f}x "
        f"(interleaved x2: ivfpq {[round(t,1) for t in t_cl]}, "
        f"flat {[round(t,1) for t in t_cl_flat]})",
        flush=True,
    )

    # --- realistic density: 512 clusters (~3.9k per cluster at 2M) -------
    # The 32-cluster corpus above is the deliberate WORST CASE for
    # sub-exhaustive search (62.5k decoys per cluster separated only by
    # noise direction — even exact-rerank shortlists must grow to
    # resolve top-5 in that cloud). Real embedding corpora have local
    # structure at many scales; this leg measures the same stack at a
    # density where the standard parameters (shortlist 50) apply.
    fine_path = os.path.join(WORKDIR, f"emb_fine_{N_VECS}.parquet")
    if not os.path.exists(os.path.join(fine_path, "_SUCCESS")):
        synth_embeddings(spark, N_VECS, n_clusters=512).repartition(
            64
        ).write.mode("overwrite").parquet(fine_path)
    femb = spark.read.parquet(fine_path)
    fq = femb.filter(F.col("vec_id") < N_QUERIES)
    t0 = time.monotonic()
    fexact = (
        S.brute_force_topk_arrow(
            fq.select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")),
            femb.select(F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")),
            query_id="qid", query_vec="qvec",
            corpus_id="cid", corpus_vec="cvec", k=K,
        )
        .select("qid", "cid")
        .collect()
    )
    t_fbf = time.monotonic() - t0
    ftruth: dict = {}
    for r in fexact:
        ftruth.setdefault(r.qid, set()).add(r.cid)
    ftotal = sum(len(v) for v in ftruth.values())
    fcents = S.train_ivf_centroids(
        femb, corpus_vec="embedding", corpus_id="vec_id",
        n_cells=N_CELLS, n_train=8192,
    )
    fbooks = S.train_pq_codebooks_distributed(
        femb, corpus_vec="embedding", corpus_id="vec_id",
        m=M_SUB, n_codes=N_CODES, n_train=8192, dim=DIM, centroids=fcents,
    )
    fidx_path = os.path.join(WORKDIR, f"ivfpq_fine_{N_VECS}.parquet")
    S.encode_ivfpq(
        femb, fbooks, fcents, corpus_id="vec_id", corpus_vec="embedding"
    ).repartition(F.col("cell")).write.mode("overwrite").partitionBy(
        "cell"
    ).parquet(fidx_path)
    findex = spark.read.parquet(fidx_path)
    # Recall on THIS synthetic geometry is floored by construction:
    # within a cluster every decoy sits at the same noise radius, so
    # the true top-5 differ from ~3.9k near-ties only in noise
    # direction — exactly what 8-byte codes quantize away. The recall
    # EVIDENCE for the operator is the battery's real-data gates
    # (similarity_*_recall, 90-100% measured); these legs measure the
    # throughput mechanics, and the shortlist sweep below shows recall
    # is shortlist-bound (the exact re-rank recovers whatever the ADC
    # shortlist retains), not a scoring bug.
    for fsl in (50, 500):
        t0 = time.monotonic()
        fcomp = (
            S.ivfpq_topk(
                fq, femb, findex, fbooks, fcents,
                query_id="vec_id", query_vec="embedding",
                corpus_id="vec_id", corpus_vec="embedding",
                k=K, n_probe=N_PROBE, shortlist=fsl,
            )
            .select("qid", "cid")
            .collect()
        )
        t_fivfpq = time.monotonic() - t0
        fhits = sum(1 for r in fcomp if r.cid in ftruth.get(r.qid, set()))
        print(
            f"ivfpq fine (512 clusters, shortlist {fsl}): query "
            f"{t_fivfpq:.1f}s vs brute force {t_fbf:.1f}s "
            f"({t_fbf / t_fivfpq:.2f}x); recall@{K} {fhits}/{ftotal} = "
            f"{fhits / ftotal:.4f}",
            flush=True,
        )


if __name__ == "__main__":
    main()
