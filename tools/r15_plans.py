#!/usr/bin/env python
"""Dump .explain("formatted") for named queries into plans/r15/<name>_<tag>.txt.

Usage: python tools/r15_plans.py <tag> [name ...]
Default names: the bench headline suite (incl. the two setup-injected
probes, built the same way bench.py builds them).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses _setup_ivfpq/_setup_phrase)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "plans", "r15")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark import queries as battery

    spark = get_spark("r14-plans")
    qs = dict(battery.queries())
    for name, setup in (
        ("similarity_ivfpq", bench._setup_ivfpq),
        ("bm25_phrase_probe", bench._setup_phrase),
    ):
        if name in names:
            qs[name] = setup(spark, sf_dir)

    os.makedirs(OUT, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(OUT, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
