#!/usr/bin/env python
"""Full-scale KMV leg (r12 verdict item 5): wire the bottom-k sketch
family into the dedup TRIAGE story at real scale.

Scenario: two corpus snapshots ("source A" and "source B", default 4M
docs each) need an overlap decision per shard BEFORE anyone commits to
a full MinHash-LSH pass over both. Exact per-shard bigram-set Jaccard
costs a distinct+join over every bigram of both corpora (hundreds of
millions of rows); the KMV triage costs one bottom-k sketch per
(shard, side) — k longs per group, so the COMPARE is a broadcast-size
join however large the corpora were, and sketches of old snapshots
can be persisted and reused (the union-merge closure is
property-tested in tests/test_sketch.py).

Corpus construction reuses fullscale_docs.synth_corpus (seeded,
Spark-side, no driver data): side B copies every even-id doc from A
verbatim and draws fresh text for odd ids from a disjoint seed range,
so shards have substantial-but-partial overlap; the EXACT Jaccard is
computed independently as the yardstick (whatever natural bigram
collisions the shared Zipf vocabulary adds are part of the truth both
paths must agree on).

The leg prints an error-vs-k table (k = 64 / 256 / 1024) and the
triage decision per shard. DECISION RECIPE (documented for the dedup
runbook, measured numbers in BASELINE_NOTES.md round 13 — at 4M
docs/side the observed max absolute error was 0.056 at k=256 and
0.026 at k=1024):
  est_jaccard >= 0.10  ->  escalate the shard pair to MinHash-LSH
                           (operators/dedup.py::near_dup_pairs_minhash)
  est_jaccard <  0.10  ->  skip; cross-snapshot near-dup yield too low
                           to pay a banded pass
  |est - 0.10| <= the k's observed error band -> re-sketch at k=1024
  (or sketch at k=1024 from the start: the sketch pass is the same
  corpus scan either way; only the k-long state grows)
Sketch cost is ONE tokenize+distinct pass over each corpus — the same
scan any overlap method pays — and persists per snapshot (union-merge
closure), while the compare stays k longs per shard forever.

Usage: python tools/fullscale_kmv.py [n_docs_per_side] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"
N_SHARDS = 8
KS = (64, 256, 1024)
ESCALATE_AT = 0.10


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from fullscale_docs import synth_corpus

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import sketch as SK

    spark = get_spark("fullscale-kmv")

    a = synth_corpus(spark, N_DOCS)
    # side B: even ids are verbatim copies of A's doc, odd ids draw
    # from a disjoint seed range (doc_id + N) — partial overlap by
    # construction, per shard
    b_fresh = synth_corpus(spark, 2 * N_DOCS).filter(
        (F.col("doc_id") >= N_DOCS) & (F.col("doc_id") % 2 == 1)
    ).select((F.col("doc_id") - N_DOCS).alias("doc_id"), "text")
    b_copy = a.filter(F.col("doc_id") % 2 == 0)
    b = b_copy.unionByName(b_fresh)

    def shard_bigrams(df):
        toks = F.filter(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+"),
            lambda t: t != "",
        )
        return (
            # shard by doc_id div 2 so every shard holds both copied
            # (even) and fresh (odd) ids — exact Jaccard lands mid-range
            # instead of at the degenerate 0/1 ends
            df.select(
                F.pmod(F.expr("doc_id div 2"), F.lit(N_SHARDS)).alias(
                    "shard"
                ),
                toks.alias("_t"),
            )
            .filter(F.size("_t") >= 2)
            .select(
                "shard",
                F.explode(
                    F.transform(
                        F.sequence(F.lit(0), F.size("_t") - 2),
                        lambda i: F.concat_ws(
                            " ", F.col("_t")[i], F.col("_t")[i + F.lit(1)]
                        ),
                    )
                ).alias("item"),
            )
        )

    big_a, big_b = shard_bigrams(a), shard_bigrams(b)

    # exact yardstick: per-shard distinct bigram sets, |A∩B| / |A∪B|
    t0 = time.monotonic()
    da = big_a.select("shard", "item").distinct()
    db = big_b.select("shard", "item").distinct()
    inter = (
        da.join(db, ["shard", "item"])
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n_inter"))
    )
    union = (
        da.unionByName(db).distinct()
        .groupBy("shard").agg(F.count(F.lit(1)).alias("n_union"))
    )
    # LEFT join from union: a shard with ZERO intersection (fully
    # disjoint sides) must appear with exact J = 0, not silently drop
    # out of the yardstick — that's exactly where the estimator is
    # most error-prone (union is never empty when any docs exist)
    exact = {
        r["shard"]: (r["n_inter"] or 0) / r["n_union"]
        for r in union.join(inter, "shard", "left").collect()
    }
    if not exact:
        raise SystemExit("no shards produced bigrams — corpus too small")
    t_exact = time.monotonic() - t0
    print(
        f"exact per-shard Jaccard ({N_DOCS} docs/side, {N_SHARDS} "
        f"shards): {t_exact:.1f}s"
    )

    print(f"{'k':>6} {'sketch_s':>9} {'cmp_s':>7} {'mean_err':>9} "
          f"{'max_err':>8}")
    k_rows = {}
    for k in KS:
        t0 = time.monotonic()
        sa = SK.kmv_sketch(big_a, "shard", "item", k=k).cache()
        sb = SK.kmv_sketch(big_b, "shard", "item", k=k).cache()
        sa.count(), sb.count()  # materialize: the triage artifact
        t_sk = time.monotonic() - t0
        t0 = time.monotonic()
        est = {
            r["shard"]: r["jaccard_q"] / 1_000_000
            for r in SK.kmv_jaccard(sa, sb, "shard", k=k).collect()
        }
        t_cmp = time.monotonic() - t0
        errs = [abs(est[s] - exact[s]) for s in exact]
        k_rows[k] = est
        print(
            f"{k:>6} {t_sk:>9.1f} {t_cmp:>7.1f} "
            f"{sum(errs) / len(errs):>9.4f} {max(errs):>8.4f}"
        )
        sa.unpersist(), sb.unpersist()

    est = k_rows[256]
    print(f"\ntriage at k=256 (escalate to MinHash-LSH when est >= "
          f"{ESCALATE_AT}):")
    for s in sorted(exact):
        verdict = "ESCALATE" if est[s] >= ESCALATE_AT else "skip"
        agree = (est[s] >= ESCALATE_AT) == (exact[s] >= ESCALATE_AT)
        print(
            f"  shard {s}: est {est[s]:.4f} exact {exact[s]:.4f} "
            f"-> {verdict} (agrees with exact: {agree})"
        )


if __name__ == "__main__":
    main()
