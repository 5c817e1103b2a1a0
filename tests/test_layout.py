"""Storage-layout scale tests: partition pruning and shuffle-free
bucketed joins, asserted on the physical plan."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.plans import explain_str
from implementation_of_an_etl_process_spark.sources.sinks import (
    write_bucketed_table,
    write_partitioned_parquet,
)
from tests.conftest import SF_SMOKE


def test_partition_pruning(spark, tmp_path):
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = str(tmp_path / "orders_part")
    write_partitioned_parquet(orders, path, ["order_year"])
    # partition dirs exist
    years = {d for d in os.listdir(path) if d.startswith("order_year=")}
    assert len(years) >= 5
    pruned = spark.read.parquet(path).filter(F.col("order_year") == 1996)
    plan = explain_str(pruned)
    # planner must prune to a single partition directory
    assert "PartitionFilters" in plan
    assert pruned.count() == orders.filter(F.col("order_year") == 1996).count()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    write_bucketed_table(
        orders, "b_orders", ["o_orderkey"], n_buckets=8, sort_cols=["o_orderkey"]
    )
    write_bucketed_table(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        ["o_orderkey"],
        n_buckets=8,
        sort_cols=["o_orderkey"],
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    # disable broadcast so the join would otherwise shuffle both sides
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(bo, "o_orderkey").groupBy("o_orderstatus").count()
        plan = explain_str(joined)
        # bucketed layout: the join key needs NO exchange anywhere (the
        # only shuffle left is the groupBy on o_orderstatus)
        assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and it still computes the right answer
        got = {r.o_orderstatus: r["count"] for r in joined.collect()}
        exp = {
            r.o_orderstatus: r["count"]
            for r in lineitem.join(
                orders, lineitem.l_orderkey == orders.o_orderkey
            )
            .groupBy("o_orderstatus")
            .count()
            .collect()
        }
        assert got == exp
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_zorder_write_skips_row_groups_in_both_dimensions(spark, tmp_path):
    """Z-order clustering: after a Morton-code sort on
    (o_custkey, o_totalprice), parquet min/max stats must let a narrow
    filter on EITHER column skip most row groups — the property a
    single-column sort only gives its leading column."""
    import pyarrow.parquet as pq

    from implementation_of_an_etl_process_spark.sources.sinks import (
        write_zordered_parquet,
    )

    orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    path = str(tmp_path / "orders_z")
    write_zordered_parquet(
        orders, path, ["o_custkey", "o_totalprice"], n_files=16
    )

    groups = []  # (cust_min, cust_max, price_min, price_max)
    for f in os.listdir(path):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            stats = {
                row.column(i).path_in_schema: row.column(i).statistics
                for i in range(row.num_columns)
            }
            groups.append(
                (
                    stats["o_custkey"].min,
                    stats["o_custkey"].max,
                    stats["o_totalprice"].min,
                    stats["o_totalprice"].max,
                )
            )
    assert len(groups) >= 8

    lo_c, hi_c = orders.agg(
        F.min("o_custkey"), F.max("o_custkey")
    ).first()
    lo_p, hi_p = orders.agg(
        F.min("o_totalprice"), F.max("o_totalprice")
    ).first()
    # a 5%-wide slice in each dimension
    c_a, c_b = lo_c, lo_c + (hi_c - lo_c) * 0.05
    p_a, p_b = lo_p, lo_p + (hi_p - lo_p) * 0.05
    cust_hit = sum(1 for g in groups if g[0] <= c_b and g[1] >= c_a)
    price_hit = sum(1 for g in groups if g[2] <= p_b and g[3] >= p_a)
    assert cust_hit / len(groups) <= 0.5, (cust_hit, len(groups))
    assert price_hit / len(groups) <= 0.5, (price_hit, len(groups))
    # layout-only: the data itself is unchanged
    assert spark.read.parquet(path).count() == orders.count()


# --- Z-order (Morton) clustering --------------------------------------------


def _py_interleave(vals: list[int], bits: int) -> int:
    out = 0
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * len(vals) + j)
    return out


def test_interleave_bits_matches_python_reference(spark):
    from implementation_of_an_etl_process_spark.operators.layout import (
        zorder_key,
    )

    rows = [(x, y) for x in (0, 1, 5, 255, 4095) for y in (0, 3, 17, 4095)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = df.select(
        "x", "y", zorder_key(["x", "y"], bits=12).alias("z")
    ).collect()
    for r in got:
        assert r["z"] == _py_interleave([r["x"], r["y"]], 12), (r["x"], r["y"])


def test_zorder_key_validation(spark):
    import pytest as _pytest

    from implementation_of_an_etl_process_spark.operators.layout import (
        interleave_bits,
        zorder_key,
    )

    with _pytest.raises(ValueError):
        interleave_bits([F.col("x")], 8)  # < 2 columns
    with _pytest.raises(ValueError):
        zorder_key(["x", "y"], bits=32)  # 64 bits > 63


def _candidate_files(path: str, boxes: dict[str, tuple[int, int]]) -> int:
    """Files whose parquet column min/max stats intersect every box —
    exactly what a stats-based reader must scan for the predicate."""
    import pyarrow.parquet as pq

    n = 0
    for f in sorted(os.listdir(path)):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, f)).metadata
        lo: dict[str, int] = {}
        hi: dict[str, int] = {}
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                name = col.path_in_schema
                if name in boxes and col.statistics is not None:
                    s = col.statistics
                    lo[name] = min(lo.get(name, s.min), s.min)
                    hi[name] = max(hi.get(name, s.max), s.max)
        if all(
            name in lo and lo[name] <= b_hi and hi[name] >= b_lo
            for name, (b_lo, b_hi) in boxes.items()
        ):
            n += 1
    return n


def test_zorder_layout_prunes_second_dimension(spark, tmp_path):
    """The layout claim, measured on real parquet footers: linearly
    sorting events by user_id leaves every file's day range spanning
    the whole domain (a day predicate scans ALL files), while the
    Z-ordered layout keeps both dimensions tight (a day predicate
    skips most files, and the user predicate still prunes)."""
    from implementation_of_an_etl_process_spark.operators.layout import (
        zorder_repartition,
    )

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select(
            "event_id",
            "user_id",
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
        )
    )
    n_files = 16
    lin_path = str(tmp_path / "linear")
    (
        ev.repartitionByRange(n_files, "user_id")
        .sortWithinPartitions("user_id")
        .write.parquet(lin_path)
    )
    z_path = str(tmp_path / "zorder")
    zorder_repartition(
        ev, ["user_id", "day"], bits=12, num_files=n_files
    ).write.parquet(z_path)

    stats = ev.agg(
        F.min("day"), F.max("day"), F.min("user_id"), F.max("user_id")
    ).first()
    d_lo, d_hi, u_lo, u_hi = stats
    # a ~12% slice of the day domain (second dimension)
    day_box = (d_lo, d_lo + max(1, (d_hi - d_lo) // 8))
    lin_day = _candidate_files(lin_path, {"day": day_box})
    z_day = _candidate_files(z_path, {"day": day_box})
    # linear layout: day spans (nearly) the whole domain in every file
    # (small files may miss a few days by chance — measured 14/16 at
    # sf0.001's ~62 rows/file)
    assert lin_day >= n_files * 3 // 4, (lin_day, n_files)
    # z-order: most files' day boxes miss the slice (measured 3/16)
    assert z_day <= lin_day // 2, (z_day, lin_day)
    # and the first dimension still prunes under z-order
    user_box = (u_lo, u_lo + max(1, (u_hi - u_lo) // 8))
    z_user = _candidate_files(z_path, {"user_id": user_box})
    assert z_user < n_files, z_user
    # correctness: both layouts hold exactly the same rows
    a = spark.read.parquet(lin_path)
    b = spark.read.parquet(z_path)
    assert a.count() == b.count() == ev.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_compact_parquet_merges_small_files(spark, tmp_path):
    """Compaction: 64 tiny files -> a handful of target-size files,
    values identical; with zorder_cols the rewrite also re-clusters."""
    from implementation_of_an_etl_process_spark.sources.sinks import (
        compact_parquet,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id",
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("day"),
    )
    src = str(tmp_path / "fragmented")
    ev.repartition(64).write.parquet(src)
    n_src = sum(1 for f in os.listdir(src) if f.endswith(".parquet"))
    assert n_src == 64
    total = sum(
        e.stat().st_size
        for e in os.scandir(src)
        if e.name.endswith(".parquet")
    )
    dst = str(tmp_path / "compacted")
    n_out = compact_parquet(
        spark, src, dst, target_file_bytes=total // 4 + 1
    )
    assert n_out <= 5, n_out
    a, b = spark.read.parquet(src), spark.read.parquet(dst)
    assert a.count() == b.count()
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    # z-ordered compaction: same values, clustered layout
    dstz = str(tmp_path / "compacted_z")
    n_outz = compact_parquet(
        spark, src, dstz,
        target_file_bytes=total // 8 + 1,
        zorder_cols=["user_id", "day"],
    )
    c = spark.read.parquet(dstz)
    assert c.count() == a.count()
    assert a.exceptAll(c).isEmpty()
    assert n_outz >= 2


def test_zorder_repartition_extreme_and_null_domains(spark):
    """Regression (round-8 review): full-int64-range domains must not
    overflow (ANSI mode aborts the whole rewrite), and all-NULL
    columns degrade to one bucket instead of TypeError."""
    from implementation_of_an_etl_process_spark.operators.layout import (
        zorder_repartition,
    )

    rows = [
        (-(1 << 63), 1, None),
        ((1 << 63) - 1, 2, None),
        (0, 3, None),
        (None, 4, None),
    ]
    df = spark.createDataFrame(
        rows, "snowflake long, day long, dead long"
    )
    out = zorder_repartition(df, ["snowflake", "day"], bits=16, num_files=2)
    assert out.count() == 4  # no ANSI overflow, NULL row kept
    out2 = zorder_repartition(df, ["day", "dead"], bits=16, num_files=2)
    assert out2.count() == 4  # all-NULL column degrades, no TypeError


def test_compact_parquet_sizes_partitioned_sources(spark, tmp_path):
    """Regression (round-8 review): hive-partitioned sources keep data
    files in key=... subdirectories — sizing must scan recursively, or
    total=0 collapses the whole table into one file regardless of the
    target."""
    from implementation_of_an_etl_process_spark.sources.sinks import (
        compact_parquet,
        write_partitioned_parquet,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "etype", F.col("event_type")
    )
    src = str(tmp_path / "hive_src")
    write_partitioned_parquet(ev.repartition(8), src, ["etype"])
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    assert total > 0
    dst = str(tmp_path / "hive_dst")
    n_out = compact_parquet(
        spark, src, dst, target_file_bytes=total // 4 + 1
    )
    assert n_out >= 2, n_out  # NOT collapsed to one file
    a, b = spark.read.parquet(src), spark.read.parquet(dst)
    assert a.count() == b.count()


def test_compact_parquet_preserves_hive_partitioning(spark, tmp_path):
    """Regression (round-8 ADVICE): compaction must keep the source's
    hive partitioning by default — flattening silently inlines the
    partition columns and loses partition pruning for every downstream
    reader. partition_by=[] is the documented explicit flatten."""
    from implementation_of_an_etl_process_spark.sources.sinks import (
        compact_parquet,
        detect_hive_partition_cols,
        write_partitioned_parquet,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").withColumn(
        "etype", F.col("event_type")
    )
    src = str(tmp_path / "hive_src")
    write_partitioned_parquet(ev.repartition(8), src, ["etype"])
    assert detect_hive_partition_cols(src) == ["etype"]
    dst = str(tmp_path / "hive_dst")
    n_out = compact_parquet(spark, src, dst)
    # layout preserved: etype=... directories exist in dst
    part_dirs = sorted(
        e.name for e in os.scandir(dst) if e.is_dir() and "=" in e.name
    )
    src_dirs = sorted(
        e.name for e in os.scandir(src) if e.is_dir() and "=" in e.name
    )
    assert part_dirs == src_dirs and part_dirs
    # compaction happened: one file per partition (8 inputs each)
    assert n_out == len(part_dirs), (n_out, part_dirs)
    a, b = spark.read.parquet(src), spark.read.parquet(dst)
    assert a.count() == b.count()
    cols = a.columns
    assert (
        a.select(cols).exceptAll(b.select(cols)).isEmpty()
        and b.select(cols).exceptAll(a.select(cols)).isEmpty()
    )
    # a partition filter on dst matches the source slice
    val = part_dirs[0].split("=", 1)[1]
    assert (
        b.filter(F.col("etype") == val).count()
        == a.filter(F.col("etype") == val).count()
        > 0
    )
    # explicit flatten still available
    flat = str(tmp_path / "flat_dst")
    compact_parquet(spark, src, flat, partition_by=[])
    assert not any(
        e.is_dir() and "=" in e.name for e in os.scandir(flat)
    )
    assert spark.read.parquet(flat).count() == a.count()


def test_compact_parquet_partitioned_salting_splits_big_keys(
    spark, tmp_path
):
    """When one partition key's data spans several target files, the
    deterministic salt splits it instead of writing one giant file."""
    from implementation_of_an_etl_process_spark.sources.sinks import (
        compact_parquet,
        write_partitioned_parquet,
    )

    df = spark.range(20_000).select(
        F.lit("k0").alias("k"),
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    src = str(tmp_path / "one_key_src")
    write_partitioned_parquet(df.repartition(16), src, ["k"])
    total = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(src)
        for f in fs
        if f.endswith(".parquet")
    )
    dst = str(tmp_path / "one_key_dst")
    n_out = compact_parquet(
        spark, src, dst, target_file_bytes=total // 4 + 1
    )
    assert 2 <= n_out <= 8, n_out  # split, but far below the 16 inputs
    assert spark.read.parquet(dst).count() == 20_000


def test_zorder_repartition_narrow_caller_domains_clamp(spark):
    """Regression (round-8 ADVICE): caller-supplied domains NARROWER
    than the data, with a large-magnitude lo, must clamp — not
    overflow int64 in ``v - lo`` and abort under ANSI mode."""
    from implementation_of_an_etl_process_spark.operators.layout import (
        zorder_repartition,
    )

    rows = [
        ((1 << 63) - 1, 1),   # far above the claimed hi
        (-(1 << 63), 2),      # far below the claimed lo
        (-4_000_000_000, 3),  # inside
    ]
    df = spark.createDataFrame(rows, "v long, day long")
    out = zorder_repartition(
        df,
        ["v", "day"],
        bits=16,
        num_files=2,
        domains={"v": (-5_000_000_000, -3_000_000_000), "day": (1, 3)},
    )
    assert out.count() == 3  # no ANSI overflow, out-of-domain rows kept
