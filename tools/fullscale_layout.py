#!/usr/bin/env python
"""Full-scale layout + sampling measurement: synthesize a wide event
fact Spark-side (seeded, no driver data), then measure

- ``zorder_repartition`` (operators/layout.py) vs a linear single-key
  range sort: layout WRITE cost (both pay exactly one range shuffle)
  and the read-side PRUNING effect, counted the way a stats-based
  reader does — parquet footer min/max boxes intersecting a
  conjunctive 2-D range predicate, plus the actual bytes/files Spark
  touches for the same filter;
- ``weighted_sample`` (operators/pipeline.py) at corpus scale: the
  zero-shuffle TakeOrderedAndProject top-k against the full-sort
  alternative it replaces.

Usage: python tools/fullscale_layout.py [n_rows] [workdir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N_ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
WORKDIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/fullscale_layout"
N_FILES = 64
N_USERS = 100_000
N_DAYS = 365


def main() -> None:
    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark.operators.layout import (
        zorder_repartition,
    )
    from implementation_of_an_etl_process_spark.operators.pipeline import (
        weighted_sample,
    )

    spark = get_spark("fullscale-layout")
    os.makedirs(WORKDIR, exist_ok=True)

    # seeded synthetic fact: user skew-free, day uniform, weight Zipfy
    ev = spark.range(N_ROWS).select(
        F.col("id").alias("event_id"),
        F.pmod(F.xxhash64("id", F.lit("u")), F.lit(N_USERS)).alias("user_id"),
        F.pmod(F.xxhash64("id", F.lit("d")), F.lit(N_DAYS)).alias("day"),
        (
            F.pmod(F.xxhash64("id", F.lit("w")), F.lit(1000)) + F.lit(1)
        ).alias("weight"),
    )

    lin = os.path.join(WORKDIR, "linear")
    zor = os.path.join(WORKDIR, "zorder")

    t0 = time.monotonic()
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(lin)
    )
    t_lin = time.monotonic() - t0

    t0 = time.monotonic()
    zorder_repartition(ev, ["user_id", "day"], bits=17, num_files=N_FILES)\
        .write.mode("overwrite").parquet(zor)
    t_zor = time.monotonic() - t0
    print(f"[layout] write {N_ROWS:,} rows x {N_FILES} files: "
          f"linear {t_lin:.1f}s, zorder {t_zor:.1f}s")

    # stats-reader candidate files for a 1% x 10% conjunctive box
    import pyarrow.parquet as pq

    def candidates(path, u_box, d_box):
        n_all, n_hit = 0, 0
        for f in sorted(os.listdir(path)):
            if not f.endswith(".parquet"):
                continue
            n_all += 1
            md = pq.ParquetFile(os.path.join(path, f)).metadata
            lo, hi = {}, {}
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    c = md.row_group(rg).column(ci)
                    nm = c.path_in_schema
                    if nm in ("user_id", "day") and c.statistics:
                        lo[nm] = min(lo.get(nm, c.statistics.min), c.statistics.min)
                        hi[nm] = max(hi.get(nm, c.statistics.max), c.statistics.max)
            # a 0-row-group file (empty range partition) has no stats:
            # it can't contain matching rows, skip it
            if all(
                k in lo and lo[k] <= b[1] and hi[k] >= b[0]
                for k, b in (("user_id", u_box), ("day", d_box))
            ):
                n_hit += 1
        return n_hit, n_all

    u_all = (0, N_USERS)
    d_all = (0, N_DAYS)
    u_box = (40_000, 41_000)   # 1% of users
    d_box = (100, 136)         # ~10% of days
    for label, ub, db in (
        ("user-only (1%)", u_box, d_all),
        ("day-only (10%)", u_all, d_box),
        ("conjunctive", u_box, d_box),
    ):
        for name, path in (("linear", lin), ("zorder", zor)):
            hit, total = candidates(path, ub, db)
            print(f"[layout] {label:>15} {name}: {hit}/{total} "
                  f"candidate files")

    # the same filter through Spark (row counts must agree)
    pred = (
        (F.col("user_id") >= u_box[0]) & (F.col("user_id") <= u_box[1])
        & (F.col("day") >= d_box[0]) & (F.col("day") <= d_box[1])
    )
    counts = {}
    for name, path in (("linear", lin), ("zorder", zor)):
        t0 = time.monotonic()
        counts[name] = spark.read.parquet(path).filter(pred).count()
        print(f"[layout] {name}: filtered count {counts[name]:,} "
              f"in {time.monotonic() - t0:.2f}s")
    assert counts["linear"] == counts["zorder"]

    # weighted sampling at scale: A-ES top-k vs the full-sort shape
    docs = ev.withColumnRenamed("event_id", "doc_id")
    for k in (1_000, 100_000):
        t0 = time.monotonic()
        n = weighted_sample(docs, "doc_id", "weight", k).count()
        t_aes = time.monotonic() - t0
        print(f"[sample] A-ES top-{k:,}: {n:,} rows in {t_aes:.1f}s "
              f"(TakeOrderedAndProject)")
    # the naive alternative: global sort then limit (forces the range
    # shuffle a window/row_number formulation pays)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("ws1:"), F.col("doc_id").cast("string"))), 1, 8),
        16, 10,
    ).cast("long")
    key = F.log((h + F.lit(1)).cast("double") / F.lit(float(1 << 32))) / \
        F.greatest(F.col("weight"), F.lit(1)).cast("double")
    t0 = time.monotonic()
    n = (
        docs.withColumn("_k", key)
        .withColumn("_rn", F.row_number().over(
            __import__("pyspark.sql.window", fromlist=["Window"])
            .Window.orderBy(F.col("_k").desc(), F.col("doc_id"))))
        .filter(F.col("_rn") <= 100_000)
        .count()
    )
    print(f"[sample] window row_number top-100,000: {n:,} rows in "
          f"{time.monotonic() - t0:.1f}s (single-partition sort)")


if __name__ == "__main__":
    main()
