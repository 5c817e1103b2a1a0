"""Computed driver-gate rotation (round-11; replaces the hand-curated
``_DRIVER_PRIORITY`` literal that drifted the moment a new CORRECTNESS
artifact landed).

The driver's correctness gate checks only the FIRST ``cap`` (=50)
entries of ``queries()`` iteration order.  This module derives that
prefix deterministically from the repo's own driver artifacts
(``CORRECTNESS_r*.json`` / ``VERIFY_LOCAL_r*.txt``) so the rotation
invariants hold by construction, every round, with no hand edits:

1. **Flagships** — the two reference-parity entries (``hypercube``,
   ``reference_native_path``) hold slots every round.
2. **Rule (b), staleness (HARD)** — any entry whose latest driver-green
   round lags more than :func:`stale_lag` rounds behind the newest
   CORRECTNESS artifact must rotate back in.  The lag is computed from
   the registry size (floor 3), so every entry re-gates at most every
   lag+1 rounds and the cycle's slot budget always covers the registry —
   the binding budget; this rule never yields.
3. **Rule (a), never-gated debt (capacity-aware)** — entries that have
   never held a driver slot are gated as capacity permits after rule
   (b), oldest-landed first (landed round = first VERIFY_LOCAL artifact
   naming them).  HARD bound: an entry landed two or more completed
   rounds ago must be in the gate — if even that does not fit, the
   function raises (the registry has outgrown the cap).  A registration
   burst therefore drains over at most two gates instead of crashing
   the import the round after it lands.
4. **Family coverage** — every hard-gate operator family keeps
   independent evidence no older than the rule-(b) cycle: a member
   in-cap this round, or a member value-green within the last THREE
   completed rounds.  With that window the rule is automatically
   satisfied in steady state (any member older than the window is
   rule-(b) mandatory and therefore in-cap), so it costs no extra
   capacity — it exists to catch pathologies (an entire family going
   red, a family of entries the staleness queue never reaches), not to
   schedule routine refreshes.  Budget note: a tighter window would
   structurally oversubscribe the gate — the registry / its re-gate
   cycle consumes ~all 48 non-flagship slots per round already.
5. **Fill** — remaining slots go to the oldest-evidence entries
   (remaining never-gated newcomers first, then the oldest green
   cohort), tiebroken by name, so cohorts age into the gate gradually
   instead of all becoming rule-(b)-mandatory in the same round.

If the HARD obligations alone (flagships + rule-b + overdue rule-a)
exceed ``cap`` the function raises — an authoring-time signal that the
registry has outgrown the gate's re-verification capacity, never a
silent drop.

CAPACITY LEDGER (now COMPUTED, round-12): lag L = an (L+1)-round
re-gate cycle = (L+1) x (cap - flagships) non-flagship slots per
cycle.  The lag is derived from the registry size by
:func:`stale_lag` — ``max(3, ceil(n / (cap - flagships)) - 1)`` —
so the cycle always has capacity >= the registry and a registration
can never make ``compute_rotation`` raise at import just because the
registry crossed a multiple of 48.  At 192 entries the formula gives
lag 3 (the historical constant; 4 x 48 = 192, knife edge); the 193rd
registration automatically widens it to lag 4 (5-round cycle = 240
slots).  Widening is still a recorded relaxation — it is visible in
``tools/rotate_gate.py`` output and asserted by
tests/test_sql41.py::test_driver_gate_freshness_rule, which mirrors
the same formula instead of a hand-bumped constant.
"""

from __future__ import annotations

import glob
import json
import os

FLAGSHIPS = ["hypercube", "reference_native_path"]

# Hard-gate operator families: the driver cap must never starve any of
# these of independent evidence for long.  Members are interchangeable
# representatives; the rotation adds the oldest-evidence member when a
# family has neither an in-cap member nor a completed-round-green one.
FAMILY_COVER: dict[str, set[str]] = {
    "cube": {"hypercube", "grouping_sets_orders", "rollup_region_nation",
             "cube_status_priority"},
    "reference-native": {"reference_native_path"},
    "streaming-cube": {"streaming_hypercube_native"},
    "multimodal-codec": {"multimodal_png_decode", "multimodal_ppm_decode",
                         "multimodal_jpeg_decode"},
    "multimodal-container": {"multimodal_binary_stats"},
    "near-dup": {"dedup_minhash_lsh", "audio_energy_hash_dedup",
                 "paragraph_dedup_frac", "winnow_overlap_pairs"},
    "ann": {"similarity_ivf_topk", "similarity_topk_cosine",
            "similarity_ivf_arrow_recall"},
    "ivfpq-lifecycle": {"similarity_ivfpq_recall",
                        "similarity_ivfpq_incremental"},
    "survivor-policy": {"dedup_keep_best_docs"},
    "graph": {"pagerank_purchases", "keyword_pagerank_docs",
              "triangle_count_purchases"},
    "pretraining": {"pack_sequences_docs", "bigram_lm_docs",
                    "bigram_lm_pruned_docs", "bpe_tokenize_gate"},
    "structured-streaming": {"streaming_sliding_15m",
                             "streaming_tumbling_1h",
                             "streaming_session_windows"},
    "streaming-ingest": {"streaming_incremental_dedup"},
    "source-formats": {"parquet_schema_evolution", "csv_permissive_ingest"},
    "udf-surface": {"arrow_python_udf_reverse", "pandas_udf_vowels"},
    "tpch": {"q1_pricing_summary", "q3_top_orders", "q5_local_supplier",
             "q6_forecast_revenue"},
    "audio": {"multimodal_wav_decode"},
    # round-11 surface (r11 verdict item 5): the computed rotation must
    # never starve the newest differentiated families of evidence
    "text-index": {"bm25_index_topk_docs", "bm25_index_incremental",
                   "bm25_index_delete_docs"},
    "mor-delete": {"similarity_ivfpq_delete", "incremental_dedup_delete_docs",
                   "bm25_index_delete_docs", "takedown_all_stores_docs"},
    "media-resample": {"multimodal_resize_ppm", "multimodal_resize_box",
                       "multimodal_wav_resample"},
    "jpeg-advanced": {"multimodal_jpeg420_decode", "multimodal_jpeg_prog_decode",
                      "multimodal_exif_orient_decode"},
    # round-12 surface: positional tier of the text index
    "phrase-index": {"bm25_index_phrase_docs", "bm25_index_proximity_docs",
                     "contamination_phrase_index_docs",
                     "curation_span_decontam_stats"},
    # round-12/13 surface (r12 verdict item 7): retrieval fusion+eval
    # and the KMV sketch family must never starve of evidence
    "retrieval-stack": {"hybrid_retrieval_docs", "retrieval_metrics_eval",
                        "hybrid_retrieval_eval",
                        "retrieval_graded_ndcg_eval",
                        "retrieval_exp_ndcg_eval",
                        "retrieval_map_eval"},
    "kmv": {"kmv_distinct_sources"},
}

_MIN_STALE_LAG = 3  # rule (b) floor: lag never tightens below 3 rounds


def stale_lag(n_registered: int, cap: int = 50) -> int:
    """Rule-(b) staleness lag, derived from the registry size (r11
    verdict item 1 — previously a hand-bumped constant that made the
    193rd registration raise at import).  Lag L gives an (L+1)-round
    re-gate cycle with (L+1) x (cap - flagships) slots; the formula
    picks the smallest L >= the historical floor whose cycle capacity
    covers the registry: ``ceil(n / per_round) - 1`` satisfies
    ``(L+1) * per_round >= n`` by construction."""
    per_round = cap - len(FLAGSHIPS)
    return max(_MIN_STALE_LAG, -(-n_registered // per_round) - 1)


def _repo_root() -> str:
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")
    )


_FAMILY_WINDOW = 3  # family evidence may be this many completed rounds old


def read_driver_history(root: str | None = None):
    """Parse CORRECTNESS_r*.json into (latest_green_round_per_entry,
    completed_round, entries_value_green_within_the_family_window).

    "Green" for staleness purposes is rows+schema match (matching
    test_driver_gate_freshness_rule); "value-green" for family evidence
    additionally requires the hash/values match (hard signal) and must
    fall within the last ``_FAMILY_WINDOW`` completed rounds."""
    root = root or _repo_root()
    latest: dict[str, int] = {}
    value_green_recent: set[str] = set()
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    completed = 0
    for p in files:
        rnd = int(os.path.basename(p).split("_r")[1].split(".")[0])
        completed = max(completed, rnd)
        for k, v in json.load(open(p)).items():
            if v.get("rows_match") and v.get("schema_match"):
                latest[k] = max(latest.get(k, 0), rnd)
    for p in files:
        rnd = int(os.path.basename(p).split("_r")[1].split(".")[0])
        if rnd <= completed - _FAMILY_WINDOW:
            continue
        for k, v in json.load(open(p)).items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and (v.get("hash_match") or v.get("values_match"))
            ):
                value_green_recent.add(k)
    return latest, completed, value_green_recent


def read_landed_before(completed: int, root: str | None = None) -> set[str]:
    """Entries present in the newest VERIFY_LOCAL artifact of a COMPLETED
    round — i.e. code that existed a full round ago.  Entries landing
    mid-round (current round's verify) must not count as overdue."""
    return {
        k
        for k, r in read_landed_rounds(root).items()
        if r <= completed
    }


def read_landed_rounds(root: str | None = None) -> dict[str, int]:
    """First VERIFY_LOCAL round naming each entry — when its code
    landed.  Drives rule (a)'s oldest-first ordering and its hard
    two-completed-rounds bound."""
    root = root or _repo_root()
    landed: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(root, "VERIFY_LOCAL_r*.txt"))):
        rnd = int(os.path.basename(p).split("_r")[1].split(".")[0])
        for line in open(p):
            parts = line.split()
            if len(parts) >= 2 and parts[0] in ("OK", "FAIL", "WEAK"):
                landed.setdefault(parts[1], rnd)
    return landed


def compute_rotation(
    registered: list[str], root: str | None = None, cap: int = 50
) -> list[str]:
    """Derive the driver-gate prefix for the CURRENT round.  Pure
    function of the registered entry names and the driver artifacts on
    disk; deterministic (sorted tiebreaks throughout)."""
    root = root or _repo_root()
    reg = list(dict.fromkeys(registered))
    reg_set = set(reg)
    latest, completed, value_green = read_driver_history(root)
    landed_rounds = read_landed_rounds(root)

    gate: list[str] = [f for f in FLAGSHIPS if f in reg_set]
    in_gate = set(gate)

    # rule (b) is the HARD budget: staleness queue, oldest evidence
    # first — an entry skipped here would exceed the re-gate cycle,
    # which nothing is allowed to do.  The lag is computed from the
    # registry size so growth widens the cycle instead of raising.
    lag = stale_lag(len(reg_set), cap)
    stale = sorted(
        (
            k
            for k in reg_set
            if k in latest and latest[k] <= completed - lag
        ),
        key=lambda k: (latest[k], k),
    )
    for k in stale:
        if k not in in_gate:
            gate.append(k)
            in_gate.add(k)

    # rule (a), HARD arm: never-gated entries landed >= 2 completed
    # rounds back cannot wait any longer.
    never_gated = sorted(
        (
            k
            for k in reg_set - set(latest)
            if landed_rounds.get(k, completed + 1) <= completed
        ),
        key=lambda k: (landed_rounds[k], k),
    )
    for k in never_gated:
        if k not in in_gate and landed_rounds[k] <= completed - 1:
            gate.append(k)
            in_gate.add(k)

    if len(gate) > cap:
        raise RuntimeError(
            f"driver-gate HARD set ({len(gate)}) exceeds cap ({cap}): "
            "flagships + rule-(b) staleness + overdue never-gated no "
            "longer fit — the registry has outgrown the gate's "
            f"re-verification capacity. Mandatory: {gate}"
        )

    # family coverage: in-cap member, or value-green within the last
    # _FAMILY_WINDOW completed rounds (auto-satisfied in steady state —
    # see module docstring).
    for fam in sorted(FAMILY_COVER):
        members = FAMILY_COVER[fam] & reg_set
        if not members:
            continue
        if members & in_gate or members & value_green:
            continue
        if len(gate) >= cap:
            raise RuntimeError(
                f"no slot left for uncovered family {fam!r} (cap {cap})"
            )
        pick = min(members, key=lambda k: (latest.get(k, -1), k))
        gate.append(pick)
        in_gate.add(pick)

    # rule (a), capacity arm: remaining never-gated newcomers,
    # oldest-landed first — a registration burst drains over at most
    # two gates (the leftover becomes HARD next round).
    for k in never_gated:
        if len(gate) >= cap:
            break
        if k not in in_gate:
            gate.append(k)
            in_gate.add(k)

    # fill: oldest evidence first (still-ungated newcomers sort
    # oldest), so upcoming rule-(b) cohorts are pre-drained gradually
    # instead of all coming due in the same round.
    for k in sorted(reg_set - in_gate, key=lambda k: (latest.get(k, -1), k)):
        if len(gate) >= cap:
            break
        gate.append(k)
        in_gate.add(k)
    return gate
