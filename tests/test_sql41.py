"""Properties of the modern-SQL battery entries (queries/sql41.py)
beyond the sf0.01 oracle gate — semantic invariants at smoke scale."""

from __future__ import annotations

from pyspark.sql import functions as F

from implementation_of_an_etl_process_spark.queries import sql41
from tests.conftest import SF_SMOKE


def test_recursive_months_spine_is_contiguous_and_complete(spark):
    out = sql41.recursive_cte_months(spark, SF_SMOKE).collect()
    months = [r["month"] for r in out]
    assert months == sorted(months)
    # contiguous: every consecutive pair differs by exactly one month
    def nxt(m):
        y, mo = int(m[:4]), int(m[5:])
        return f"{y + mo // 12}-{(mo % 12) + 1:02d}"

    for a, b in zip(months, months[1:]):
        assert nxt(a) == b, (a, b)
    # every order lands in some month of the spine
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert sum(r["n_orders"] for r in out) == n_orders


def test_lateral_topk_matches_window_rank(spark):
    out = sql41.lateral_topk_nation(spark, SF_SMOKE)
    cust = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    nat = spark.read.parquet(f"{SF_SMOKE}/nation.parquet")
    from pyspark.sql import Window as W

    w = W.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    expected = (
        cust.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 3)
        .join(nat, cust.c_nationkey == nat.n_nationkey)
        .select("n_name", "c_custkey", "c_acctbal")
    )
    got = {tuple(r) for r in out.collect()}
    exp = {tuple(r) for r in expected.collect()}
    assert got == exp


def test_variant_roundtrip_is_identity(spark):
    out = sql41.variant_order_json(spark, SF_SMOKE)
    src = (
        spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .filter(F.col("o_orderkey") <= 500)
        .select(
            "o_orderkey",
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
        )
    )
    assert out.count() == src.count()
    mism = (
        out.alias("a")
        .join(src.alias("b"), "o_orderkey")
        .filter(
            (F.col("a.status") != F.col("b.status"))
            | (F.col("a.total") != F.col("b.total"))
            | F.col("a.missing").isNotNull()
        )
        .count()
    )
    assert mism == 0


def test_udtf_words_match_python_split(spark):
    out = (
        sql41.udtf_word_positions(spark, SF_SMOKE)
        .filter(F.col("doc_id") == 0)
        .orderBy("pos")
        .collect()
    )
    text = (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .filter(F.col("doc_id") == 0)
        .first()["text"]
    )
    assert [(r["word"], r["pos"]) for r in out] == [
        (w, i) for i, w in enumerate(text.split())
    ]


def test_sql_udf_bands_partition_orders(spark):
    out = sql41.sql_udf_price_band(spark, SF_SMOKE).collect()
    assert {r["band"] for r in out} <= {"low", "mid", "high"}
    n_orders = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").count()
    assert sum(r["n"] for r in out) == n_orders


def test_battery_oracle_key_consistency():
    """Driver-contract invariants that don't need Spark: every oracle
    key has a query, names are unique across modules, and no entry is
    rows-only (every query has a value oracle since round 4)."""
    import __spark_entry__ as e

    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    # since round 4 every entry is oracle-checked (the HLL estimate got
    # a bounded-relative-error value oracle; nothing is rows-only)
    assert set(qs) - set(osql) == set()
    from implementation_of_an_etl_process_spark.queries import _MODULES

    seen = {}
    for m in _MODULES:
        for k in m.QUERIES:
            assert k not in seen, f"{k} defined in {seen[k]} and {m.__name__}"
            seen[k] = m.__name__
        assert set(m.ORACLES) <= set(m.QUERIES), m.__name__


def test_driver_first50_covers_every_family():
    """The driver's CORRECTNESS gate checks only the first 50 entries of
    queries() iteration order (CORRECTNESS_r01/r02 are each exactly 50
    rows).  Since round 11 the prefix is COMPUTED
    (queries/rotation.py), so this test verifies the derived invariants
    rather than a hand-maintained list: every hard-gate operator family
    has evidence no older than the rule-(b) cycle (a member in-cap, or
    a member value-green within the last three completed rounds — the
    window that makes the rule capacity-free in steady state), and
    everything inside the cap has a value-hash oracle."""
    import __spark_entry__ as e

    first50 = list(e.queries())[:50]
    from implementation_of_an_etl_process_spark.queries import _DRIVER_PRIORITY
    from implementation_of_an_etl_process_spark.queries.rotation import (
        FAMILY_COVER,
        read_driver_history,
    )

    assert first50 == _DRIVER_PRIORITY, (
        "driver gate drifted from the computed rotation: "
        f"{set(first50) ^ set(_DRIVER_PRIORITY)}"
    )
    registered = set(e.queries())
    # every family names at least one registered entry (typo guard)
    for fam, members in FAMILY_COVER.items():
        assert members & registered, f"family {fam!r} names no registered entry"
    _, _, value_green = read_driver_history()
    cap = set(first50)
    for fam, members in FAMILY_COVER.items():
        members = members & registered
        assert members & cap or members & value_green, (
            f"family {fam!r} has neither an in-cap member nor a member "
            f"value-green in the completed round ({sorted(members)})"
        )
    osql = e.oracle_sql()
    no_oracle = [n for n in first50 if n not in osql]
    assert not no_oracle, f"rows-only entries waste driver-cap slots: {no_oracle}"


def test_driver_gate_freshness_rule():
    """Rotation freshness, enforced (r8 verdict item 4, previously a
    comment convention): (a) every registered entry that has NEVER
    held a driver slot must be in the NEXT gate's 50 — new operators
    can't merge gated only by local verify for more than one round;
    (b) no entry's latest driver-green evidence may lag more than
    ``stale_lag(len(registry))`` rounds (computed, floor 3) behind the
    newest CORRECTNESS file unless it holds a slot this round. Fails
    at authoring time (this repo's CI), not at judge time."""
    import glob
    import json
    import os

    import __spark_entry__ as e
    from implementation_of_an_etl_process_spark.queries import (
        _DRIVER_PRIORITY,
    )

    root = os.path.join(os.path.dirname(__file__), "..")
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    if not files:  # fresh clone without driver artifacts: nothing to check
        return
    latest: dict[str, int] = {}
    for p in files:
        rnd = int(os.path.basename(p).split("_r")[1].split(".")[0])
        for k, v in json.load(open(p)).items():
            if v.get("rows_match") and v.get("schema_match"):
                latest[k] = max(latest.get(k, 0), rnd)
    gate = set(_DRIVER_PRIORITY)
    registered = set(e.queries())
    never_gated = registered - set(latest)
    # entries that land THIS round may rotate in next round; "already
    # landed" = appeared in the VERIFY_LOCAL artifact of the last
    # COMPLETED round (= the newest CORRECTNESS round — the current
    # round may write its own VERIFY_LOCAL before the gate runs, and
    # that must not count entries landed mid-round as overdue)
    completed = max(
        int(os.path.basename(p).split("_r")[1].split(".")[0])
        for p in files
    )
    from implementation_of_an_etl_process_spark.queries.rotation import (
        read_landed_rounds,
    )

    landed = read_landed_rounds(root)
    # rule (a) hard arm: never-gated entries landed >= 2 completed
    # rounds back hold a slot unconditionally; fresher ones may wait
    # one round ONLY when the gate is full (capacity arm)
    overdue = {
        k
        for k in never_gated
        if landed.get(k, completed + 1) <= completed - 1
    } - gate
    assert not overdue, (
        "never-gated entries landed two completed rounds back must "
        f"hold a slot: {sorted(overdue)}"
    )
    waiting = {
        k
        for k in never_gated
        if landed.get(k, completed + 1) == completed
    } - gate
    if waiting:
        assert len(_DRIVER_PRIORITY) >= 50, (
            f"newcomers wait while the gate has room: {sorted(waiting)}"
        )
    from implementation_of_an_etl_process_spark.queries.rotation import (
        stale_lag,
    )

    lag = stale_lag(len(registered))
    too_stale = {
        k
        for k in registered
        if k in latest and latest[k] <= completed - lag and k not in gate
    }
    assert not too_stale, (
        f"entries whose latest driver-green round is <= r{completed - lag} "
        f"must rotate into the gate: {sorted(too_stale)}"
    )
