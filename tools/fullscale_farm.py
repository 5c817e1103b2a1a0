#!/usr/bin/env python
"""Mirror-farm stress for the LSH hot-bucket guard at full scale: the
4M-doc Zipfian corpus (tools/fullscale_docs.py) plus an n-copy farm of
ONE byte-identical document (vocabulary disjoint from the corpus, so
every farm pair is intra-farm). This is the degenerate shape real
crawls hit (mirror sites, boilerplate pages) and the one the exact-copy
collapse guard (operators/dedup.py::minhash_lsh_pairs) exists for.

Measured quantities:
- guard ON at the full farm size: wall time + pair count (must be
  corpus_pairs + n*(n-1)/2);
- guard OFF at a small farm (A/B contrast): the un-guarded banding
  join materializes bands * n^2 candidate rows and re-verifies each
  pair against ~(W-2) shingles — quadratic-times-doc-length. The OFF
  run is only attempted at a size where that is tractable; the big-farm
  OFF cost is reported as the closed-form row count instead of run.

Usage: python tools/fullscale_farm.py [n_docs] [farm_small] [farm_big]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_DOCS = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
FARM_SMALL = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
FARM_BIG = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
WORKDIR = "/tmp/fullscale_docs"
FARM_TEXT = " ".join(f"farmonlyword{i}" for i in range(40))


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators import dedup as D
    from tools.fullscale_docs import synth_corpus

    spark = get_spark("fullscale-farm")
    path = os.path.join(WORKDIR, f"docs_{N_DOCS}.parquet")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        synth_corpus(spark, N_DOCS).repartition(64).write.mode(
            "overwrite"
        ).parquet(path)
    docs = spark.read.parquet(path)

    def with_farm(n):
        farm = spark.range(n).select(
            (F.col("id") + 100_000_000).alias("doc_id"),
            F.lit(FARM_TEXT).alias("text"),
        )
        return docs.unionByName(farm).repartition(64)

    # corpus-only baseline pair count (guard on; corpus has planted dups)
    t0 = time.monotonic()
    base_pairs = D.minhash_lsh_pairs(docs, "doc_id", "text").count()
    print(f"corpus only  (guard on): {base_pairs} pairs in "
          f"{time.monotonic() - t0:.1f}s", flush=True)

    for n, modes in ((FARM_SMALL, (True, False)), (FARM_BIG, (True,))):
        expect = base_pairs + n * (n - 1) // 2
        for on in modes:
            t0 = time.monotonic()
            got = D.minhash_lsh_pairs(
                with_farm(n), "doc_id", "text", collapse_exact=on
            ).count()
            t = time.monotonic() - t0
            ok = "OK" if got == expect else f"MISMATCH expect {expect}"
            print(f"corpus+{n}-farm guard={'on ' if on else 'off'}: "
                  f"{got} pairs in {t:.1f}s [{ok}]", flush=True)
        if len(modes) == 1:
            cand = 8 * n * n
            print(f"  (guard-off at {n} not run: banding join would "
                  f"materialize ~{cand:.1e} candidate rows before "
                  f"distinct, each re-verified against ~38 shingles)",
                  flush=True)


if __name__ == "__main__":
    main()
