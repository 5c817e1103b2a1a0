#!/usr/bin/env python
"""Synthesize the round-15 SCALE-LEG dataset: a deterministic K-fold
replication of /root/testdata/sf0.1 with shifted keys, so data-path
claims can be measured where the work is data-bound instead of
scheduler-bound (VERDICT r14: 11 of 14 headline 8-vs-32 scaling ratios
were ~1 at sf0.1 — the bench had become a scheduling benchmark).

Shape (pure function of sf0.1 + the constants below; no randomness):

- TPC-H tables x10 with every key column shifted by copy*OFFSET, so
  FK joins hold within each copy and never collide across copies.
  nation/region are fixed-cardinality dims — kept single-copy, their
  keys are never shifted on the fact side's *_nationkey columns.
- events x10 (event_id/user_id shifted: 10x the users, same per-user
  session structure).
- documents x120 (~600k docs, ~70 MB — deliberately past the 64 MB
  latency-mode gate so dedup ops run their AQE scale path). Every
  token of copy i>0 is prefixed "c<i>" via one regexp, so shingle sets
  are disjoint across copies: the true near-dup pair set is exactly
  120x sf0.1's, never a cross-copy mirror farm.
- embeddings x50 (100k vectors); copy i adds i*1e-4 to every
  component so cross-copy vectors are near-but-not-tied duplicates.

Usage: python tools/r15_scale_data.py [out_dir]   (default /tmp/sf1x)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
OFFSET = 100_000_000  # > any sf0.1 key

# table -> (K copies, key columns shifted by copy*OFFSET)
PLAN = {
    "region": (1, []),
    "nation": (1, []),
    "customer": (10, ["c_custkey"]),
    "supplier": (10, ["s_suppkey"]),
    "part": (10, ["p_partkey"]),
    "orders": (10, ["o_orderkey", "o_custkey"]),
    "lineitem": (10, ["l_orderkey", "l_partkey", "l_suppkey"]),
    "events": (10, ["event_id", "user_id"]),
    "documents": (120, ["doc_id"]),
    "embeddings": (50, ["vec_id"]),
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1x"
    os.makedirs(out, exist_ok=True)

    from pyspark.sql import functions as F

    from implementation_of_an_etl_process_spark import get_spark

    spark = get_spark("r15-scale-data")
    for name, (k, keys) in PLAN.items():
        src = spark.read.parquet(os.path.join(SRC, f"{name}.parquet"))
        copies = []
        for i in range(k):
            df = src
            for c in keys:
                df = df.withColumn(c, F.col(c) + F.lit(i * OFFSET))
            if name == "documents" and i > 0:
                # disjoint token space per copy: linear, not quadratic,
                # growth of the near-dup pair set
                df = df.withColumn(
                    "text", F.regexp_replace("text", r"(\S+)", f"c{i}$1")
                )
            if name == "embeddings" and i > 0:
                df = df.withColumn(
                    "embedding",
                    F.transform(
                        "embedding",
                        lambda x: (x + F.lit(float(i) * 1e-4)).cast("float"),
                    ),
                )
            copies.append(df)
        full = copies[0]
        for c in copies[1:]:
            full = full.unionByName(c)
        n_out = 1 if k == 1 else 8  # a few splittable files per table
        (
            full.repartition(n_out)
            .write.mode("overwrite")
            .parquet(os.path.join(out, f"{name}.parquet"))
        )
        print(f"{name}: x{k} -> {os.path.join(out, name)}.parquet")
    spark.stop()


if __name__ == "__main__":
    main()
