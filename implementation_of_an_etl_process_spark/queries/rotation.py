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
2. **Rule (a), never-gated debt** — any registered entry that has never
   held a driver slot AND already landed in the last completed round's
   local verify must be gated now.
3. **Rule (b), staleness** — any entry whose latest driver-green round
   lags more than 3 rounds behind the newest CORRECTNESS artifact must
   rotate back in.
4. **Family coverage** — every hard-gate operator family keeps fresh
   independent evidence: a member in-cap this round, or a member that
   was driver-green in the newest (completed) artifact.  The second arm
   is forward-stable: after THIS round's artifact drops, the "last two
   artifacts" window still contains the completed round, so the family
   test stays green at judge time too.
5. **Fill** — remaining slots go to the oldest-evidence entries
   (never-gated newcomers first, then the oldest green cohort),
   tiebroken by name, so cohorts age into the gate gradually instead of
   all becoming rule-(b)-mandatory in the same round.

If the mandatory set alone exceeds ``cap`` the function raises — an
authoring-time signal that the queue is over budget and the round must
drain it across two gates deliberately, never a silent drop.
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
}

_STALE_LAG = 3  # rule (b): latest green may lag at most this many rounds


def _repo_root() -> str:
    return os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "..")
    )


def read_driver_history(root: str | None = None):
    """Parse CORRECTNESS_r*.json into (latest_green_round_per_entry,
    completed_round, entries_value_green_in_completed_round).

    "Green" for staleness purposes is rows+schema match (matching
    test_driver_gate_freshness_rule); "value-green" for family evidence
    additionally requires the hash/values match (hard signal)."""
    root = root or _repo_root()
    latest: dict[str, int] = {}
    value_green_completed: set[str] = set()
    files = sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json")))
    completed = 0
    for p in files:
        rnd = int(os.path.basename(p).split("_r")[1].split(".")[0])
        completed = max(completed, rnd)
        for k, v in json.load(open(p)).items():
            if v.get("rows_match") and v.get("schema_match"):
                latest[k] = max(latest.get(k, 0), rnd)
    if files:
        newest = max(
            files,
            key=lambda p: int(os.path.basename(p).split("_r")[1].split(".")[0]),
        )
        for k, v in json.load(open(newest)).items():
            if (
                v.get("rows_match")
                and v.get("schema_match")
                and (v.get("hash_match") or v.get("values_match"))
            ):
                value_green_completed.add(k)
    return latest, completed, value_green_completed


def read_landed_before(completed: int, root: str | None = None) -> set[str]:
    """Entries present in the newest VERIFY_LOCAL artifact of a COMPLETED
    round — i.e. code that existed a full round ago.  Entries landing
    mid-round (current round's verify) must not count as overdue."""
    root = root or _repo_root()
    vl = [
        p
        for p in sorted(glob.glob(os.path.join(root, "VERIFY_LOCAL_r*.txt")))
        if int(os.path.basename(p).split("_r")[1].split(".")[0]) <= completed
    ]
    landed: set[str] = set()
    if vl:
        for line in open(vl[-1]):
            parts = line.split()
            if len(parts) >= 2 and parts[0] in ("OK", "FAIL", "WEAK"):
                landed.add(parts[1])
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
    landed_before = read_landed_before(completed, root)

    gate: list[str] = [f for f in FLAGSHIPS if f in reg_set]
    in_gate = set(gate)

    # rule (a): never-gated entries that landed a full round ago.
    never_gated = sorted((reg_set - set(latest)) & landed_before)
    for k in never_gated:
        if k not in in_gate:
            gate.append(k)
            in_gate.add(k)

    # rule (b): staleness queue, oldest evidence first.
    stale = sorted(
        (
            k
            for k in reg_set
            if k in latest and latest[k] <= completed - _STALE_LAG
        ),
        key=lambda k: (latest[k], k),
    )
    for k in stale:
        if k not in in_gate:
            gate.append(k)
            in_gate.add(k)

    if len(gate) > cap:
        raise RuntimeError(
            f"driver-gate mandatory set ({len(gate)}) exceeds cap ({cap}): "
            "the staleness queue is over budget — split it deliberately "
            f"across rounds. Mandatory: {gate}"
        )

    # family coverage: in-cap member, or value-green in the completed
    # round (forward-stable across this round's artifact drop).
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

    # fill: oldest evidence first (never-gated newcomers sort oldest),
    # so cohorts age into the gate gradually.
    for k in sorted(reg_set - in_gate, key=lambda k: (latest.get(k, -1), k)):
        if len(gate) >= cap:
            break
        gate.append(k)
        in_gate.add(k)
    return gate
