#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query executes to completion via the noop sink (full computation,
no driver-side result transfer skewing the numbers). Timings exclude
SparkSession startup; the first (warmup) run of the flagship is
reported separately inside "queries" as "_warmup".

This host's throughput swings ~3x on a minutes timescale (steal time;
see BASELINE_NOTES.md), so one timing window can't be trusted: round 2
recorded 7.87s for a query that measures 2.2s on an idle host.  The
suite therefore runs SPARK_GRAFT_BENCH_ROUNDS (default 3) full passes
INTERLEAVED — A B C ... A B C ... — and reports the per-query MIN
across passes; a noisy window then inflates one pass, not the floor.
Per-pass totals are kept in "_pass_totals" so noise is visible.

SELF-DEFENDING RECORD (r12 verdict item 1: two rounds running, the
driver's snapshot landed in a contended window while the true floor
lived only in BASELINE_NOTES.md): the line now carries the evidence to
read itself.  After the base passes the harness checks CONVERGENCE —
(a) the best full pass must be within PASS_SPREAD of the sum of
per-query mins (a spread means no single pass ran clean), and (b) the
reported value must be within FLOOR_SLACK of the committed per-query
floor ledger (BENCH_FLOOR.json) when one covers the suite.  While
either check fails it runs EXTRA passes (bounded by
SPARK_GRAFT_BENCH_MAX_EXTRA, default 4).  The emitted JSON then says
"converged": true/false and "floor_file": <ledger total for this
suite>, so a noisy capture is machine-visible instead of silently
over-reading.  Queries that beat their recorded floor update the
ledger in place (commit it with the round).

WINDOW STAMP (r13 verdict item 3): the line also records
"loadavg_start"/"loadavg_end" (/proc/loadavg, 1-min field) so a
"converged at 1.18x floor" capture in a busy window is
machine-distinguishable from a true-idle one.  The floor LEDGER has
the matching rule: only low-load captures may TIGHTEN floors —
tightening requires loadavg_start <= SPARK_GRAFT_FLOOR_MAX_LOAD
(default 1.0; the end load reflects our own 32-thread passes, so the
start value is the external-contention signal).  A first floor for a
brand-new suite row is still recorded at any load (no floor is worse
than a loose one — the next idle capture tightens it).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "hypercube",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_local_supplier",
    "window_topk_orders",
    "events_sessionize",
    "dedup_exact_documents",
    "text_quality",
    "dedup_minhash_lsh",
    "similarity_topk_cosine",
    # layout family: co-located join with zero join-side Exchange (the
    # entry asserts that on its own plan). First pass pays the one-time
    # bucketed write; the min-of-N floor reflects the steady-state read.
    "bucketed_join_orders",
    # ANN lifecycle: probe a PERSISTED IVF-PQ index (cell-partitioned
    # parquet; the probe filter prunes directories) — the index is
    # built once at suite setup, outside the timed passes, so the row
    # tracks the steady-state query path round over round.
    "similarity_ivfpq",
    # positional-index lifecycle (r12 flagship capability, r12 verdict
    # item 8): fixed multi-phrase probe set against a positional text
    # index built once at suite setup — pins the phrase-query plan
    # (pruned positions scan + intersect-before-positions) round over
    # round, same steady-state pattern as similarity_ivfpq.
    "bm25_phrase_probe",
]

# convergence thresholds (see module docstring)
PASS_SPREAD = 1.15   # best full pass vs sum of per-query mins
FLOOR_SLACK = 1.20   # reported value vs committed floor ledger
FLOOR_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "BENCH_FLOOR.json"
)
# max 1-min loadavg at suite start for a capture to TIGHTEN existing
# floors (see module docstring; BASELINE_NOTES' window ledger uses
# load < 1 as its idle criterion)
FLOOR_MAX_LOAD = float(os.environ.get("SPARK_GRAFT_FLOOR_MAX_LOAD", "1.0"))


def _loadavg() -> float | None:
    """1-minute load average, or None where /proc is absent."""
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except (OSError, ValueError, IndexError):
        return None


def _may_tighten_floor(load_start: float | None, max_load: float) -> bool:
    """Floors are all-time per-query minima; a busy-window sample can
    only ever be >= the true floor, so allowing it to tighten is
    harmless in theory — but an UNDER-loaded ledger entry is what the
    convergence check hangs off, and an entry recorded during a lucky
    sub-window of a contended run reads as 'floor' while being 20%
    loose. Gate tightening on a measured-idle start instead."""
    return load_start is not None and load_start <= max_load


def _bench_tmp(prefix: str, sf_dir: str) -> str:
    """Deterministic per-sf scratch path, rebuilt in place each
    invocation — mkdtemp here left one corpus-sized index tree in /tmp
    PER BENCH RUN (r13 advice); a fixed name caps the residue at one
    tree per (prefix, sf) however many times the bench runs."""
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:8]
    path = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    shutil.rmtree(path, ignore_errors=True)
    return path


def _setup_ivfpq(spark, sf_dir: str):
    """Train + persist the IVF-PQ index once (setup, untimed) and
    return the probe callable the suite times."""
    from pyspark.sql import functions as F

    from implementation_of_an_etl_process_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    dim = len(emb.select("embedding").first()[0])
    cents = S.train_ivf_centroids(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        n_cells=16, n_train=4096,
    )
    books = S.train_pq_codebooks_distributed(
        emb, corpus_vec="embedding", corpus_id="vec_id",
        m=16, n_codes=64, dim=dim, centroids=cents,
    )
    path = _bench_tmp("bench_ivfpq", sf_dir)
    S.write_ivfpq_index(
        emb, path, books, cents,
        corpus_id="vec_id", corpus_vec="embedding",
    )
    q = emb.filter(F.col("vec_id") < 200)

    def probe(spark, _sf_dir):
        return S.ivfpq_query_index(
            spark, path, q, emb,
            query_id="vec_id", query_vec="embedding",
            corpus_id="vec_id", corpus_vec="embedding",
            k=10, n_probe=4, shortlist=50,
        )

    return probe


def _setup_phrase(spark, sf_dir: str):
    """Build the positional text index once (setup, untimed); the
    timed row is the fixed 8-phrase bulk probe — ONE pruned positions
    scan however many phrases probe."""
    from implementation_of_an_etl_process_spark.operators import (
        textindex as TI,
    )

    docs = spark.read.parquet(
        os.path.join(sf_dir, "documents.parquet")
    ).select("doc_id", "text")
    path = _bench_tmp("bench_phraseidx", sf_dir)
    TI.write_text_index(docs, path, n_buckets=32, store_positions=True)
    probes = [
        "value table", "fast scan", "hash join", "sort merge",
        "big data", "small batch", "slow query", "stream filter",
    ]

    def probe(spark, _sf_dir):
        return TI.multi_phrase_query_index(spark, path, probes, k=100)

    return probe


def _load_floors() -> dict:
    if os.path.exists(FLOOR_FILE):
        with open(FLOOR_FILE) as f:
            return json.load(f)
    return {}


def _suite_floor(floors: dict, key: str, suite: list[str]):
    """Ledger total for THIS suite composition — None unless every
    query has a recorded floor (a suite change resets the check until
    the new row's floor lands). Ledger keys are ``metric@sf<sf>`` so a
    small-SF smoke run can never tighten the sf0.1 floors."""
    per_q = floors.get(key, {}).get("queries", {})
    if all(name in per_q for name in suite):
        return round(sum(per_q[name] for name in suite), 3)
    return None

# ``bench.py --tpch``: interleaved min-of-N floors for ALL 22 TPC-H
# shapes, so a plan regression in the long tail is visible — the
# headline suite covers only 4 of them. Committed floors live in
# BASELINE_NOTES.md; the driver's per-round BENCH_r{N}.json stays the
# default headline suite.
TPCH = [
    "q1_pricing_summary",
    "q2_min_cost_supplier",
    "q3_top_orders",
    "q4_order_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q7_volume_shipping",
    "q8_market_share",
    "q9_product_profit",
    "q10_returned_items",
    "q11_important_stock",
    "q12_shipmode_priority",
    "q13_order_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q16_supplier_relation",
    "q17_small_quantity",
    "q18_large_volume",
    "q19_bracket_revenue",
    "q20_excess_stock",
    "q21_waiting_orders",
    "q22_idle_customers",
]


def main() -> None:
    if "--tpch" in sys.argv:
        suite, metric = TPCH, "tpch_suite_seconds"
    else:
        suite, metric = HEADLINE, "headline_suite_seconds"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    load_start = _loadavg()

    from implementation_of_an_etl_process_spark import get_spark
    from implementation_of_an_etl_process_spark import queries as battery

    spark = get_spark("bench")
    qs = dict(battery.queries())
    for name, setup in (
        ("similarity_ivfpq", _setup_ivfpq),
        ("bm25_phrase_probe", _setup_phrase),
    ):
        if name in suite:
            try:
                qs[name] = setup(spark, sf_dir)
            except Exception as e:  # noqa: BLE001
                print(f"bench: {name} setup FAILED: {e}", file=sys.stderr)
                suite = [n for n in suite if n != name]

    def run(name: str) -> float | None:
        """Per-query wall time; a failing query reports null instead of
        killing the whole bench line."""
        t0 = time.monotonic()
        try:
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001
            print(f"bench: {name} FAILED: {e}", file=sys.stderr)
            return None
        return round(time.monotonic() - t0, 3)

    rounds = max(2, int(os.environ.get("SPARK_GRAFT_BENCH_ROUNDS", "3")))
    max_extra = max(
        0, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "4"))
    )
    timings: dict[str, float | None] = {}
    timings["_warmup"] = run(suite[0])  # JVM/codegen warmup, reported apart

    # interleaved passes: each query's first pass additionally pays its
    # per-plan codegen compilation, which the min also discards
    samples: dict[str, list[float]] = {name: [] for name in suite}
    pass_totals: list[float | None] = []

    def one_pass() -> None:
        pass_ok = True
        t_pass = time.monotonic()
        for name in suite:
            t = run(name)
            if t is None:
                pass_ok = False
            else:
                samples[name].append(t)
        pass_totals.append(
            round(time.monotonic() - t_pass, 3) if pass_ok else None
        )

    def composed() -> float:
        return round(
            sum(min(s) for s in samples.values() if s), 3
        )

    floors = _load_floors()
    floor_key = f"{metric}@sf{sf}"
    floor_total = _suite_floor(floors, floor_key, suite)

    def check() -> tuple[bool, bool]:
        """(pass-spread ok, floor ok) on the current samples."""
        valid = [p for p in pass_totals if p is not None]
        spread_ok = bool(valid) and min(valid) <= PASS_SPREAD * composed()
        floor_ok = (
            floor_total is None or composed() <= FLOOR_SLACK * floor_total
        )
        return spread_ok, floor_ok

    for _ in range(rounds):
        one_pass()
    extra = 0
    while extra < max_extra and not all(check()):
        spread_ok, floor_ok = check()
        print(
            f"bench: non-convergence after {len(pass_totals)} passes "
            f"(pass-spread ok={spread_ok}, floor ok={floor_ok}; "
            f"composed={composed()}, floor={floor_total}) — extra pass",
            file=sys.stderr,
        )
        one_pass()
        extra += 1

    for name in suite:
        timings[name] = min(samples[name]) if samples[name] else None
    timings["_pass_totals"] = pass_totals  # type: ignore[assignment]
    timings["_rounds"] = len(pass_totals)  # type: ignore[assignment]

    total = round(
        sum(v for k, v in timings.items() if not k.startswith("_") and v), 3
    )
    spread_ok, floor_ok = check()
    # queries that beat their recorded floor tighten the ledger; new
    # suite rows get their first floor. The ledger is committed with
    # the round, so next capture self-checks against it.
    per_q = floors.setdefault(floor_key, {}).setdefault("queries", {})
    improved = False
    tighten_ok = _may_tighten_floor(load_start, FLOOR_MAX_LOAD)
    skipped_tighten = 0
    for name in suite:
        v = timings.get(name)
        if v is None:
            continue
        if name not in per_q:
            per_q[name] = v  # first floor for a new row: any load
            improved = True
        elif v < per_q[name]:
            if tighten_ok:
                per_q[name] = v
                improved = True
            else:
                skipped_tighten += 1
    if skipped_tighten:
        print(
            f"bench: {skipped_tighten} quer(ies) beat their floor but "
            f"loadavg_start={load_start} > {FLOOR_MAX_LOAD} — busy-window "
            "captures may not tighten the ledger (re-run idle to record)",
            file=sys.stderr,
        )
    if improved:
        try:
            with open(FLOOR_FILE, "w") as f:
                json.dump(floors, f, indent=1, sort_keys=True)
        except OSError as e:
            print(f"bench: floor ledger not writable: {e}", file=sys.stderr)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": total,
                "unit": "sec",
                "converged": bool(spread_ok and floor_ok),
                "floor_file": floor_total,
                "loadavg_start": load_start,
                "loadavg_end": _loadavg(),
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
