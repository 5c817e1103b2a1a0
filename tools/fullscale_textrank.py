#!/usr/bin/env python
"""Full-scale TextRank leg (round-9 idle re-run of the contended
round-8 measurement, now on the fused edge build): distill the word
co-occurrence graph from the 4M-doc Zipfian corpus with ONE canonical
(least, greatest) distinct + explode-both-directions (the round-9
rewrite of queries/graphops.py::keyword_pagerank_docs — one
vocab²-bounded dedup shuffle instead of two), then run 5 integer
fixed-point PageRank iterations with assume_distinct_edges=True.

Usage: python tools/fullscale_textrank.py [n_docs] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_docs"


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.graph import (
        pagerank_fixed_point,
    )
    from implementation_of_an_etl_process_spark.operators.text import (
        adjacent_word_pairs,
    )
    from tools.fullscale_docs import synth_corpus

    spark = get_spark("fullscale-textrank")

    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        os.makedirs(WORKDIR, exist_ok=True)
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)
    n = docs.count()
    print(f"corpus: {n} docs", flush=True)

    # graph build: the round-9 fused shape — one distinct on canonical
    # pairs, explode both directions, no re-dedup anywhere downstream
    t0 = time.monotonic()
    pairs = adjacent_word_pairs(docs).select("w1", "w2")
    canon = (
        pairs.filter(F.col("w1") != F.col("w2"))
        .select(
            F.least("w1", "w2").alias("a"),
            F.greatest("w1", "w2").alias("b"),
        )
        .distinct()
    )
    edges = canon.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("src"), F.col("b").alias("dst")),
                F.struct(F.col("b").alias("src"), F.col("a").alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    # Stage the edge list to parquet rather than localCheckpoint: an
    # eager checkpoint of 72M string edges stays resident in executor
    # STORAGE memory for the whole rank leg, fighting the iteration's
    # own loop-invariant persist for execution memory (measured: the
    # rank leg read 234s with the checkpoint resident vs ~150s from a
    # cold parquet read). At 100 TB you'd stage exactly this way.
    epath = os.path.join(WORKDIR, "word_edges.parquet")
    edges.write.mode("overwrite").parquet(epath)
    edges = spark.read.parquet(epath)
    n_edges = edges.count()
    n_nodes = (
        edges.select(F.col("src").alias("w")).distinct().count()
    )
    t_build = time.monotonic() - t0
    print(
        f"graph build (fused, 1 dedup shuffle): {n_edges} directed edges"
        f" / {n_nodes} nodes in {t_build:.1f}s",
        flush=True,
    )

    t0 = time.monotonic()
    ranks = pagerank_fixed_point(
        edges,
        iterations=5,
        damping_pct=85,
        redistribute_dangling=True,
        assume_distinct_edges=True,
    )
    top = (
        ranks.orderBy(F.col("rank").desc(), F.col("id").asc())
        .limit(5)
        .collect()
    )
    t_rank = time.monotonic() - t0
    print(
        f"pagerank: 5 iterations over {n_edges} edges in {t_rank:.1f}s; "
        f"top-5 = {[(r['id'], r['rank']) for r in top]}",
        flush=True,
    )
    # the generation law is Zipf: the head words must rank on top
    assert all(r["id"].startswith("w") for r in top)


if __name__ == "__main__":
    main()
