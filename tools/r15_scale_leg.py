#!/usr/bin/env python
"""Round-15 SCALE LEG: time the heavy headline queries on the K-fold
dataset from tools/r15_scale_data.py (default /tmp/sf1x), where the
work is data-bound — the evidence leg VERDICT r14 item 2 asked for.

Same methodology as bench.py (noop sink, interleaved passes, per-query
MIN), same env contract ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS), one
JSON line out. Run it at 32 and at 8 cpus and compare:

    SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/tmp/sf1x python tools/r15_scale_leg.py
    SPARK_GRAFT_CPUS=8  SPARK_GRAFT_SF_DIR=/tmp/sf1x python tools/r15_scale_leg.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the untimed index setup helpers)

SUITE = [
    "hypercube",
    "q1_pricing_summary",
    "q5_local_supplier",
    "dedup_exact_documents",
    "dedup_minhash_lsh",
    "similarity_ivfpq",
    "bm25_phrase_probe",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/sf1x")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    rounds = int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3"))
    names = sys.argv[1:] or SUITE

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark import queries as battery

    spark = get_spark("r15-scale-leg")
    qs = dict(battery.queries())
    for name, setup in (
        ("similarity_ivfpq", bench._setup_ivfpq),
        ("bm25_phrase_probe", bench._setup_phrase),
    ):
        if name in names:
            qs[name] = setup(spark, sf_dir)

    def run(name: str) -> float:
        t0 = time.monotonic()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return round(time.monotonic() - t0, 3)

    warmup = run(names[0])
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(rounds):
        for n in names:
            samples[n].append(run(n))
    timings = {"_warmup": warmup}
    timings.update({n: min(samples[n]) for n in names})
    total = round(sum(v for k, v in timings.items() if not k.startswith("_")), 3)
    print(
        json.dumps(
            {
                "metric": "scale_leg_seconds",
                "value": total,
                "unit": "sec",
                "cpus": cpus,
                "sf_dir": sf_dir,
                "queries": timings,
                "samples": samples,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
