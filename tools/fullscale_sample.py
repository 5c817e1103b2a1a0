#!/usr/bin/env python
"""Full-scale A-ES sampling legs: global (zero-shuffle
TakeOrderedAndProject — measured 3.4s at 50M rows in round 7) vs the
round-9 PER-GROUP variant (`weighted_sample_per_group`), which pays
the one group-key shuffle per-group semantics require. Checks the
exact per-group contract (k winners per group) and records the cost
of that shuffle at 50M rows / 20 groups.

Usage: python tools/fullscale_sample.py [n_rows] [k_per_group]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
K = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
N_GROUPS = 20


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample,
        weighted_sample_per_group,
    )

    spark = get_spark("fullscale-sample")
    rows = spark.range(N_ROWS).select(
        F.col("id").alias("doc_id"),
        (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(4000)) + 50).alias(
            "n_chars"
        ),
        F.concat(
            F.lit("g"), F.pmod(F.col("id"), F.lit(N_GROUPS))
        ).alias("grp"),
    )

    t0 = time.monotonic()
    n_glob = weighted_sample(
        rows, "doc_id", "n_chars", K * N_GROUPS, seed="fs1"
    ).count()
    t_glob = time.monotonic() - t0
    assert n_glob == K * N_GROUPS
    print(
        f"global A-ES top-{K * N_GROUPS} of {N_ROWS} rows: {t_glob:.1f}s "
        f"(zero-shuffle TakeOrderedAndProject)",
        flush=True,
    )

    t0 = time.monotonic()
    per = (
        weighted_sample_per_group(
            rows, "doc_id", "n_chars", "grp", K, seed="fs1"
        )
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    t_grp = time.monotonic() - t0
    assert len(per) == N_GROUPS and all(r["n"] == K for r in per)
    print(
        f"per-group A-ES top-{K} x {N_GROUPS} groups: {t_grp:.1f}s "
        f"(ONE group-key shuffle + rank window; exact k per group)",
        flush=True,
    )


if __name__ == "__main__":
    main()
