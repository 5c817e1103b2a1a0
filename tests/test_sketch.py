"""Count-min sketch + Bloom filter: the classic guarantees, pinned.

Both sketches are RELATIONS built by map-side-combined aggregates (see
operators/sketch.py and operators/pretrain.py docstrings), so these
tests double as shape checks: nothing here collects more than the
bounded sketch itself.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_cms_never_underestimates_and_merge_is_rebuild(spark):
    """est >= exact for EVERY key (the one-sided CMS guarantee), the
    estimate of a never-seen key probes cleanly, and merging two
    half-corpus sketches equals building one over the union."""
    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
        cms_estimate,
        cms_merge,
    )

    # Zipf-ish: token t_k appears 200//k times
    rows = [(f"t{k}",) for k in range(1, 21) for _ in range(200 // k)]
    df = spark.createDataFrame(rows, "v string")
    # tight width forces collisions so the >= is non-trivial
    sk = cms_build(df, "v", depth=3, width=16)
    exact = df.groupBy("v").agg(F.count(F.lit(1)).alias("exact"))
    est = cms_estimate(exact, sk, "v", depth=3, width=16)
    bad = est.filter(F.col("est") < F.col("exact")).count()
    assert bad == 0
    over = est.filter(F.col("est") > F.col("exact")).count()
    assert over > 0  # collisions really happened at width=16
    # unseen key: estimate is whatever its cells hold, never negative
    unseen = spark.createDataFrame([("nope",)], "v string")
    got = cms_estimate(unseen, sk, "v", depth=3, width=16).first()
    assert got["est"] >= 0
    # mergeability
    a = df.filter(F.length("v") == 2)  # t1..t9
    b = df.filter(F.length("v") > 2)   # t10..t20
    merged = cms_merge(
        cms_build(a, "v", depth=3, width=16),
        cms_build(b, "v", depth=3, width=16),
    )
    whole = cms_build(df, "v", depth=3, width=16)
    assert (
        merged.exceptAll(whole).isEmpty()
        and whole.exceptAll(merged).isEmpty()
    )


def test_cms_weighted_and_param_validation(spark):
    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [("a", 5), ("a", 7), ("b", 1)], "v string, w int"
    )
    sk = cms_build(df, "v", depth=4, width=64, weight_col="w")
    est = {
        r["v"]: r["est"]
        for r in cms_estimate(
            df.select("v").distinct(), sk, "v", depth=4, width=64
        ).collect()
    }
    assert est["a"] >= 12 and est["b"] >= 1
    with pytest.raises(ValueError, match="width"):
        cms_build(df, "v", width=100)
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "v", depth=0)


def test_cms_sketch_is_bounded(spark):
    """The sketch relation never exceeds depth x width rows, however
    many values went in — the fixed-size contract."""
    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
    )

    df = spark.range(50_000).select(F.col("id").cast("string").alias("v"))
    sk = cms_build(df, "v", depth=4, width=256)
    assert sk.count() <= 4 * 256


def test_bloom_no_false_negatives(spark):
    """Every inserted value is maybe_member=True (the Bloom
    guarantee); a disjoint probe set sees a low false-positive rate at
    the sized m; the filter relation is at most m/64 rows."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        bloom_filter_build,
        bloom_membership,
    )

    m, k = 1 << 12, 4
    inserted = spark.range(500).select(
        F.concat(F.lit("in"), F.col("id")).alias("v")
    )
    bloom = bloom_filter_build(inserted, "v", m_bits=m, k=k)
    assert bloom.count() <= m // 64
    got = bloom_membership(inserted, bloom, "v", m_bits=m, k=k)
    assert got.filter(~F.col("maybe_member")).count() == 0
    outside = spark.range(2000).select(
        F.concat(F.lit("out"), F.col("id")).alias("v")
    )
    fp = (
        bloom_membership(outside, bloom, "v", m_bits=m, k=k)
        .filter(F.col("maybe_member"))
        .count()
    )
    # theory: (1 - e^{-kn/m})^k ~ 0.024 at n=500, m=4096, k=4;
    # allow generous slack — the point is "low", not the 3rd decimal
    assert fp / 2000 < 0.15, fp


def test_cms_streaming_incremental_merge(spark, tmp_path):
    """The mergeability contract under Structured Streaming: a
    foreachBatch sink that builds a per-micro-batch sketch and
    cms_merges it into a parquet state must end bit-identical to the
    one-shot batch sketch over the same rows — the per-day/per-batch
    summary pattern."""
    import os
    import shutil

    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
        cms_merge,
    )

    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "event_type"
    )
    src = tmp_path / "src"
    src.mkdir()
    for i in range(2):
        part = tmp_path / f"part{i}"
        ev.filter(F.col("event_id") % 2 == i).coalesce(1).write.parquet(
            str(part)
        )
        for f in os.listdir(part):
            if f.endswith(".parquet"):
                shutil.copy(part / f, src / f"{i}.parquet")
    state = str(tmp_path / "cms_state")

    def upsert(batch_df, batch_id):
        sk = cms_build(batch_df, "event_type", depth=3, width=64)
        if os.path.exists(os.path.join(state, "_SUCCESS")):
            prev = batch_df.sparkSession.read.parquet(state)
            sk = cms_merge(prev, sk)
        sk.coalesce(1).write.mode("overwrite").parquet(state + ".tmp")
        out = batch_df.sparkSession.read.parquet(state + ".tmp")
        out.coalesce(1).write.mode("overwrite").parquet(state)

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = spark.read.parquet(state)
    batch = cms_build(ev, "event_type", depth=3, width=64)
    assert (
        streamed.exceptAll(batch).isEmpty()
        and batch.exceptAll(streamed).isEmpty()
    )


def test_bloom_merge_is_rebuild(spark):
    """bloom_merge over two half-corpus filters equals building one
    over the union — the same per-batch summary contract as
    cms_merge."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        bloom_filter_build,
        bloom_membership,
        bloom_merge,
    )

    vals = spark.range(1000).select(
        F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    a = vals.filter(F.col("v").substr(2, 10).cast("long") % 2 == 0)
    b = vals.filter(F.col("v").substr(2, 10).cast("long") % 2 == 1)
    merged = bloom_merge(
        bloom_filter_build(a, "v", m_bits=1 << 12),
        bloom_filter_build(b, "v", m_bits=1 << 12),
    )
    whole = bloom_filter_build(vals, "v", m_bits=1 << 12)
    assert (
        merged.exceptAll(whole).isEmpty()
        and whole.exceptAll(merged).isEmpty()
    )
    got = bloom_membership(vals, merged, "v", m_bits=1 << 12)
    assert got.filter(~F.col("maybe_member")).count() == 0


def test_sketch_degenerate_inputs(spark):
    """Edge sweep: minimum parameters and empty build sets behave —
    empty Bloom = everything definitely-absent, empty CMS = all-zero
    estimates, d=1/w=2 CMS still upholds est >= exact."""
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        bloom_filter_build,
        bloom_membership,
    )
    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "v string")
    sk = cms_build(df, "v", depth=1, width=2)
    est = {
        r["v"]: r["est"]
        for r in cms_estimate(
            df.distinct(), sk, "v", depth=1, width=2
        ).collect()
    }
    assert est["a"] >= 2 and est["b"] >= 1
    empty = spark.createDataFrame([], "v string")
    b0 = bloom_filter_build(empty, "v", m_bits=64, k=2)
    g0 = bloom_membership(df, b0, "v", m_bits=64, k=2)
    assert g0.filter(F.col("maybe_member")).count() == 0
    sk0 = cms_build(empty, "v", depth=2, width=4)
    e0 = cms_estimate(df.distinct(), sk0, "v", depth=2, width=4)
    assert e0.filter(F.col("est") != 0).count() == 0


def test_star_cc_degenerate_graphs(spark):
    """Single edge and all-self-loop (effectively empty) graphs."""
    from implementation_of_an_etl_process_spark.operators.graph import (
        connected_components_star,
    )

    e1 = spark.createDataFrame([(1, 2)], "src long, dst long")
    assert sorted(
        (r["_id"], r["cluster"])
        for r in connected_components_star(e1).collect()
    ) == [(1, 1), (2, 1)]
    e2 = spark.createDataFrame([(5, 5), (7, 7)], "src long, dst long")
    assert connected_components_star(e2).count() == 0


def test_bloom_param_validation(spark):
    from implementation_of_an_etl_process_spark.operators.pretrain import (
        bloom_filter_build,
    )

    df = spark.createDataFrame([("x",)], "v string")
    with pytest.raises(ValueError, match="m_bits"):
        bloom_filter_build(df, "v", m_bits=1000)
    with pytest.raises(ValueError, match="k must"):
        bloom_filter_build(df, "v", k=0)


def test_cms_probe_column_names_and_collisions(spark):
    """Probe frames may carry columns named row/cell/cnt (the sketch
    side is aliased to _cms_* before the join — r9 advice); a probe
    column that collides with the reserved names raises up front."""
    from implementation_of_an_etl_process_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame(
        [("a",)] * 3 + [("b",)], "v string"
    )
    sk = cms_build(df, "v", depth=2, width=8)
    probes = spark.createDataFrame(
        [("a", 1, 2, 3), ("b", 4, 5, 6)],
        "v string, row int, cell int, cnt int",
    )
    got = {
        r["v"]: r["est"]
        for r in cms_estimate(probes, sk, "v", depth=2, width=8).collect()
    }
    assert got["a"] >= 3 and got["b"] >= 1
    bad = spark.createDataFrame([("a", 0)], "v string, _cms_row int")
    with pytest.raises(ValueError, match="reserved"):
        cms_estimate(bad, sk, "v", depth=2, width=8)
    # out_col colliding with a probe column is the same error
    with pytest.raises(ValueError, match="reserved"):
        cms_estimate(probes, sk, "v", depth=2, width=8, out_col="cnt")


def test_kmv_sketch_estimate_and_union_merge(spark):
    """KMV bottom-k sketch: (a) groups with < k distinct items report
    exactly; (b) the order-statistic estimate lands within the
    documented ~1/sqrt(k) band on a larger group; (c) the sketch is
    CLOSED under union — bottom-k of the full data equals the merge of
    two partial sketches, row-identical (the mergeable-rollup
    property every distributed sketch needs)."""
    from implementation_of_an_etl_process_spark.operators.sketch import (
        kmv_distinct_estimate,
        kmv_sketch,
        kmv_union,
    )

    rows = [("small", f"s{i}") for i in range(20)]
    rows += [("big", f"b{i % 3000}") for i in range(6000)]
    df = spark.createDataFrame(rows, "g string, item string")
    sk = kmv_sketch(df, "g", "item", k=64)
    est = {
        r["g"]: (r["n_seen"], r["est_distinct"])
        for r in kmv_distinct_estimate(sk, "g", k=64).collect()
    }
    assert est["small"] == (20, 20)  # < k: exact
    n, e = est["big"]
    assert n == 64
    assert abs(e - 3000) / 3000 < 0.5, e  # ~1/sqrt(64) band, generous
    # union-merge == sketch of the union, exactly
    half_a = df.filter(F.crc32(F.col("item")) % 2 == 0)
    half_b = df.filter(F.crc32(F.col("item")) % 2 == 1)
    merged = kmv_union(
        kmv_sketch(half_a, "g", "item", k=64),
        kmv_sketch(half_b, "g", "item", k=64),
        "g",
        k=64,
    )
    def rows_of(df):
        return {(r["g"], tuple(r["kmv"]), r["n_seen"]) for r in df.collect()}

    assert rows_of(merged) == rows_of(sk)


def test_kmv_jaccard_estimate(spark):
    """KMV resemblance: the merged-bottom-k membership estimator lands
    near the true Jaccard on overlapping sets, reports ~0 for disjoint
    sets and scale for identical ones, and handles one-sided groups."""
    from implementation_of_an_etl_process_spark.operators.sketch import (
        kmv_jaccard,
        kmv_sketch,
    )

    # group "half": |A|=|B|=2000, |A∩B|=1000 -> J = 1000/3000 = 1/3
    a_rows = [("half", f"x{i}") for i in range(2000)]
    b_rows = [("half", f"x{i}") for i in range(1000, 3000)]
    # identical small sets -> J = 1 exactly (sketches are exact < k)
    a_rows += [("same", f"s{i}") for i in range(30)]
    b_rows += [("same", f"s{i}") for i in range(30)]
    # disjoint -> J = 0
    a_rows += [("disj", f"a{i}") for i in range(500)]
    b_rows += [("disj", f"b{i}") for i in range(500)]
    # group only on one side
    a_rows += [("only_a", f"o{i}") for i in range(10)]
    a = kmv_sketch(
        spark.createDataFrame(a_rows, "g string, item string"),
        "g", "item", k=64,
    )
    b = kmv_sketch(
        spark.createDataFrame(b_rows, "g string, item string"),
        "g", "item", k=64,
    )
    got = {r["g"]: r for r in kmv_jaccard(a, b, "g", k=64).collect()}
    assert got["same"]["jaccard_q"] == 1_000_000
    assert got["disj"]["jaccard_q"] == 0
    assert got["only_a"]["jaccard_q"] == 0
    j = got["half"]["jaccard_q"] / 1_000_000
    assert abs(j - 1 / 3) < 0.2, j  # ~1/sqrt(64) band, generous
