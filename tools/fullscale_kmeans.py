#!/usr/bin/env python
"""Full-scale fixed-point k-means
(`operators/clustering.py::kmeans_fixed_point`) on the clustered
synthetic embedding corpus from tools/fullscale_ann.py: n_vecs 64-dim
vectors around 32 planted centers. Measures per-iteration cost at a
corpus the battery's 500-row table can't exercise, and checks the
planted structure is actually recovered (every cluster non-trivial,
total inertia drops monotonically across iterations).

Usage: python tools/fullscale_kmeans.py [n_vecs] [k] [iterations]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_VECS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 8
ITERS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.clustering import (
        kmeans_fixed_point,
    )
    from tools.fullscale_ann import synth_embeddings

    spark = get_spark("fullscale-kmeans")
    emb = synth_embeddings(spark, N_VECS).localCheckpoint(eager=True)
    n = emb.count()
    print(f"corpus: {n} x 64-dim clustered vectors", flush=True)

    prev_inertia = None
    for iters in range(1, ITERS + 1):
        t0 = time.monotonic()
        out = kmeans_fixed_point(
            emb, "vec_id", "embedding", k=K, iterations=iters
        )
        agg = out.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("cluster").alias("ncl"),
            # corpus inertia exceeds int64 (2M x ~5e14): DECIMAL sum
            F.sum(F.col("dist_q").cast("decimal(38,0)")).alias("inertia"),
            F.min("dist_q").alias("dmin"),
        ).first()
        t = time.monotonic() - t0
        assert agg["n"] == n and agg["dmin"] >= 0
        assert agg["ncl"] == K, agg  # no cluster starves on planted data
        print(
            f"kmeans k={K} iters={iters}: {t:.1f}s "
            f"({t / iters:.1f}s/iter incl. seed+final assign), "
            f"inertia_q={agg['inertia']}",
            flush=True,
        )
        if prev_inertia is not None:
            # Lloyd never increases inertia; integer floor-divides can
            # only shave it further
            assert agg["inertia"] <= prev_inertia, (
                agg["inertia"],
                prev_inertia,
            )
        prev_inertia = agg["inertia"]


if __name__ == "__main__":
    main()
