"""Unit tests for the computed driver-gate rotation
(queries/rotation.py) against synthetic CORRECTNESS/VERIFY_LOCAL
artifacts — the invariants must hold by construction on any history,
not just the repo's current one."""

from __future__ import annotations

import json

import pytest

from implementation_of_an_etl_process_spark.queries.rotation import (
    FAMILY_COVER,
    FLAGSHIPS,
    compute_rotation,
)

GREEN = {"rows_match": True, "schema_match": True, "hash_match": True}
ROWS_ONLY = {"rows_match": True, "schema_match": True, "hash_match": False}


def _write_round(root, rnd, entries):
    (root / f"CORRECTNESS_r{rnd:02d}.json").write_text(
        json.dumps({k: dict(v) for k, v in entries.items()})
    )


def test_flagships_always_first(tmp_path):
    reg = FLAGSHIPS + [f"e{i}" for i in range(60)]
    gate = compute_rotation(reg, root=str(tmp_path))
    assert gate[:2] == FLAGSHIPS


def test_stale_entries_mandatory(tmp_path):
    reg = FLAGSHIPS + [f"e{i}" for i in range(60)]
    # e0..e9 green at r1 only; everything else green at r4 (completed)
    _write_round(tmp_path, 1, {f"e{i}": GREEN for i in range(10)})
    _write_round(
        tmp_path, 4, {k: GREEN for k in reg if not k.startswith("e") or int(k[1:]) >= 10}
    )
    gate = compute_rotation(reg, root=str(tmp_path))
    stale = {f"e{i}" for i in range(10)}
    assert stale <= set(gate), "rule (b): r1-green entries must rotate in at r4"


def test_never_gated_landed_entries_gated_with_capacity(tmp_path):
    reg = FLAGSHIPS + [f"e{i}" for i in range(60)]
    _write_round(tmp_path, 4, {k: GREEN for k in reg if k != "e0"})
    # e0 landed a round ago (in the completed round's verify) but was
    # never driver-gated -> rule (a) capacity arm (plenty of room here)
    (tmp_path / "VERIFY_LOCAL_r04.txt").write_text("OK e0 value-exact\n")
    gate = compute_rotation(reg, root=str(tmp_path))
    assert "e0" in gate


def test_never_gated_overdue_is_hard_and_burst_drains_over_two_gates(
    tmp_path,
):
    """A registration burst bigger than the spare capacity drains over
    two gates: newcomers beyond capacity wait one round, then become
    HARD; if even the hard arm cannot fit, the rotation raises."""
    reg = FLAGSHIPS + [f"e{i}" for i in range(60)] + [
        f"new{i:02d}" for i in range(20)
    ]
    # 45 stale entries (green r1) + fresh others; 20 newcomers landed r4
    _write_round(tmp_path, 1, {f"e{i}": GREEN for i in range(45)})
    _write_round(
        tmp_path, 4,
        {k: GREEN for k in reg if not k.startswith("new")
         and not (k.startswith("e") and int(k[1:]) < 45)},
    )
    (tmp_path / "VERIFY_LOCAL_r04.txt").write_text(
        "".join(f"OK new{i:02d} x\n" for i in range(20))
    )
    gate = compute_rotation(reg, root=str(tmp_path))
    newcomers_in = [k for k in gate if k.startswith("new")]
    assert 0 < len(newcomers_in) < 20  # partial drain, capacity-bound
    assert len(gate) == 50
    # next round: the leftovers are overdue (landed r4 <= 5 - 1) and
    # HARD; with room they all enter
    _write_round(tmp_path, 5, {k: GREEN for k in gate})
    gate2 = compute_rotation(reg, root=str(tmp_path))
    leftovers = {f"new{i:02d}" for i in range(20)} - set(newcomers_in)
    assert leftovers <= set(gate2)


def test_family_coverage_adds_oldest_member(tmp_path):
    fam = sorted(FAMILY_COVER["near-dup"])
    reg = FLAGSHIPS + fam + [f"e{i}" for i in range(60)]
    # family members ROWS-ONLY green at r4 (keeps them off the
    # staleness queue but gives no value evidence), fillers fresh ->
    # coverage must pull in the oldest member
    _write_round(tmp_path, 2, {k: GREEN for k in fam})
    ent = {k: GREEN for k in reg if k not in fam}
    ent.update({k: ROWS_ONLY for k in fam})
    _write_round(tmp_path, 6, ent)
    gate = compute_rotation(reg, root=str(tmp_path))
    assert set(fam) & set(gate)


def test_family_window_spans_three_completed_rounds(tmp_path):
    """A member value-green two rounds back still covers its family
    (the window equals the rule-(b) cycle, so the rule costs no extra
    capacity in steady state)."""
    fam = sorted(FAMILY_COVER["survivor-policy"])
    # fillers share the family's age and sort BEFORE it by name, so
    # fill alone would never reach the family member — only the family
    # pass could seat it, and it must not (r4 is inside the window)
    reg = FLAGSHIPS + fam + [f"a{i:02d}" for i in range(60)]
    _write_round(tmp_path, 4, {k: GREEN for k in reg if k not in FLAGSHIPS})
    _write_round(tmp_path, 6, {k: GREEN for k in FLAGSHIPS})
    gate = compute_rotation(reg, root=str(tmp_path))
    assert not set(fam) & set(gate)
    # ...but green at r3 is BOTH outside the window AND stale ->
    # rule-b pulls it in (the steady-state interplay)
    import os

    os.makedirs(tmp_path / "b", exist_ok=True)
    _write_round(tmp_path / "b", 3, {k: GREEN for k in fam})
    _write_round(
        tmp_path / "b", 6, {k: GREEN for k in reg if k not in fam}
    )
    gate2 = compute_rotation(reg, root=str(tmp_path / "b"))
    assert set(fam) <= set(gate2)


def test_family_green_in_completed_round_needs_no_slot(tmp_path):
    fam = sorted(FAMILY_COVER["near-dup"])
    reg = FLAGSHIPS + fam + [f"e{i}" for i in range(200)]
    # family value-green in the completed round, 200 fresh fillers
    # competing for slots
    _write_round(tmp_path, 4, {k: GREEN for k in reg})
    gate = compute_rotation(reg, root=str(tmp_path))
    assert len(gate) == 50
    # fill is deterministic oldest-first by name; family holds no slot
    # beyond what fill gives it, and nothing crashes


def test_rows_only_match_does_not_count_as_family_evidence(tmp_path):
    fam = sorted(FAMILY_COVER["survivor-policy"])
    reg = FLAGSHIPS + fam + [f"e{i}" for i in range(60)]
    ent = {k: GREEN for k in reg if k not in fam}
    ent.update({k: ROWS_ONLY for k in fam})  # weak signal only
    _write_round(tmp_path, 4, ent)
    gate = compute_rotation(reg, root=str(tmp_path))
    assert set(fam) & set(gate), "rows-only green is not family evidence"


def test_over_budget_raises(tmp_path):
    reg = FLAGSHIPS + [f"e{i}" for i in range(70)]
    _write_round(tmp_path, 1, {f"e{i}": GREEN for i in range(70)})
    _write_round(tmp_path, 4, {k: GREEN for k in FLAGSHIPS})
    with pytest.raises(RuntimeError, match="exceeds cap"):
        compute_rotation(reg, root=str(tmp_path))


def test_deterministic_and_no_duplicates(tmp_path):
    reg = FLAGSHIPS + [f"e{i}" for i in range(80)]
    _write_round(tmp_path, 1, {f"e{i}": GREEN for i in range(5)})
    _write_round(tmp_path, 4, {k: GREEN for k in reg})
    g1 = compute_rotation(reg, root=str(tmp_path))
    g2 = compute_rotation(list(reversed(reg)), root=str(tmp_path))
    assert len(g1) == len(set(g1)) == 50
    # registration order must not affect the gate (artifacts drive it)
    assert set(g1) == set(g2)


def test_empty_history_is_sane(tmp_path):
    reg = FLAGSHIPS + [f"e{i}" for i in range(60)]
    gate = compute_rotation(reg, root=str(tmp_path))
    assert gate[:2] == FLAGSHIPS and len(gate) == 50


def test_repo_rotation_respects_all_rules():
    """The live rotation (real artifacts) upholds the hard rules and
    the cap: rule (b) for every stale entry, rule (a)'s hard arm for
    overdue never-gated entries, and no never-gated entry waits while
    a slot went to mere fill."""
    import __spark_entry__ as e
    from implementation_of_an_etl_process_spark.queries.rotation import (
        read_driver_history,
        read_landed_rounds,
        stale_lag,
    )

    gate = list(e.queries())[:50]
    latest, completed, _ = read_driver_history()
    if not completed:
        return
    landed = read_landed_rounds()
    reg = set(e.queries())
    lag = stale_lag(len(reg))
    for k in reg - set(latest):
        if landed.get(k, completed + 1) <= completed - 1:
            assert k in gate, f"rule (a) hard arm violated: {k}"
    for k in reg:
        if k in latest and latest[k] <= completed - lag:
            assert k in gate, f"rule (b) violated: {k}"
    waiting = {
        k
        for k in reg - set(latest)
        if landed.get(k, completed + 1) <= completed and k not in gate
    }
    if waiting:
        assert len(gate) == 50, (
            f"newcomers wait while the gate has room: {sorted(waiting)}"
        )


def test_stale_lag_computed_from_registry_size():
    """r11 verdict item 1: the rule-(b) lag is derived from the
    registry size — never a hand-bumped constant.  Floor 3; widens
    exactly when the (lag+1)-round cycle would no longer cover the
    registry."""
    from implementation_of_an_etl_process_spark.queries.rotation import (
        stale_lag,
    )

    assert stale_lag(1) == 3
    assert stale_lag(192) == 3   # 4 x 48 = 192: knife edge, still lag 3
    assert stale_lag(193) == 4   # 193rd registration widens, not raises
    assert stale_lag(240) == 4   # 5 x 48 = 240
    assert stale_lag(241) == 5
    per_round = 48
    for n in range(1, 600):
        lag = stale_lag(n)
        assert lag >= 3
        assert (lag + 1) * per_round >= n, (
            f"cycle capacity must cover the registry at n={n}"
        )


def test_193_entry_history_composes_five_round_cycle(tmp_path):
    """r11 verdict item 1 done-criterion: a 193-entry synthetic history
    composes a valid 5-round cycle without raising (the constant-lag
    design raised at import on the 193rd registration), and no entry's
    evidence ever exceeds the computed cycle."""
    from implementation_of_an_etl_process_spark.queries.rotation import (
        read_driver_history,
        stale_lag,
    )

    reg = FLAGSHIPS + [f"e{i:03d}" for i in range(191)]
    assert len(reg) == 193 and stale_lag(len(reg)) == 4
    _write_round(tmp_path, 1, {k: GREEN for k in reg})
    for rnd in range(2, 8):  # six successive gates, one full cycle+
        gate = compute_rotation(reg, root=str(tmp_path))  # must not raise
        assert len(gate) == 50 and gate[:2] == FLAGSHIPS
        assert len(set(gate)) == len(gate)
        _write_round(tmp_path, rnd, {k: GREEN for k in gate})
    latest, completed, _ = read_driver_history(str(tmp_path))
    lag = stale_lag(len(reg))
    overdue = {k for k in reg if latest[k] < completed - lag}
    assert not overdue, (
        f"entries exceeded the computed {lag + 1}-round re-gate "
        f"cycle: {sorted(overdue)}"
    )


def _simulate_growth(root, batches, *, n_start=200, assert_immediate=True):
    """Drive compute_rotation over a synthetic history that GROWS:
    n_start entries all green at r1, then one registration batch per
    round (VERIFY_LOCAL written the round the code lands, CORRECTNESS
    written for the computed gate). Returns the final registry.

    Asserts per round: the gate composes (no raise), flagships lead,
    no duplicates, newcomers gate immediately when assert_immediate
    (else within two rounds — the documented burst drain), and no
    entry's evidence ever exceeds the CURRENT computed lag."""
    from implementation_of_an_etl_process_spark.queries.rotation import (
        read_driver_history,
        stale_lag,
    )

    reg = FLAGSHIPS + [f"e{i:03d}" for i in range(n_start - 2)]
    _write_round(root, 1, {k: GREEN for k in reg})
    (root / "VERIFY_LOCAL_r01.txt").write_text(
        "".join(f"OK {k} x\n" for k in reg)
    )
    prev_new: set[str] = set()
    for step, batch in enumerate(batches):
        rnd = step + 2
        new = [f"n{rnd:02d}_{j:02d}" for j in range(batch)]
        reg = reg + new
        (root / f"VERIFY_LOCAL_r{rnd:02d}.txt").write_text(
            "".join(f"OK {k} x\n" for k in reg)
        )
        gate = compute_rotation(reg, root=str(root))  # must not raise
        assert gate[:2] == FLAGSHIPS
        assert len(gate) == min(50, len(reg)) == len(set(gate))
        if assert_immediate:
            assert set(new) <= set(gate), (
                f"round {rnd}: newcomers not gated immediately: "
                f"{sorted(set(new) - set(gate))}"
            )
        # burst bound: anything left over from LAST round's batch is
        # overdue-HARD now and must be in
        assert prev_new <= set(gate), (
            f"round {rnd}: last round's leftovers still ungated"
        )
        _write_round(root, rnd, {k: GREEN for k in gate})
        prev_new = set(new) - set(gate)
        latest, completed, _ = read_driver_history(str(root))
        lag = stale_lag(len(reg))
        overdue = {
            k for k in reg if latest.get(k, completed) < completed - lag
        }
        assert not overdue, (
            f"round {rnd} (n={len(reg)}, lag={lag}): evidence exceeded "
            f"the cycle: {sorted(overdue)[:5]}"
        )
    return reg


def test_growth_200_to_300_gates_newcomers_immediately(tmp_path):
    """r13 verdict item 7: the computed rotation must keep covering
    the registry as it grows 200 -> 300 (the next stale_lag widening
    lands in this range: lag 4 -> 6), with every new entry gated the
    round it lands — the invariant that has kept never-gated debt at
    zero since r10. Steady registration (6/round, within the cycle's
    structural slack of cap*(lag+1) - n spread over lag+1 rounds)."""
    from implementation_of_an_etl_process_spark.queries.rotation import (
        stale_lag,
    )

    assert stale_lag(200) == 4
    reg = _simulate_growth(tmp_path, [6] * 17, n_start=200)
    assert len(reg) == 302
    assert stale_lag(len(reg)) == 6  # widened twice, raise-free


def test_growth_bursts_drain_within_two_gates(tmp_path):
    """Bursty registration (20 entries at once, beyond any round's
    slack) must not raise: leftovers become overdue-HARD and enter the
    very next gate — never-gated debt bounded at one round."""
    _simulate_growth(
        tmp_path,
        [0, 20, 0, 0, 20, 0, 0, 0, 20, 0, 0, 0],
        n_start=200,
        assert_immediate=False,
    )


@pytest.mark.parametrize("seed", [7, 23, 1946])
def test_growth_random_profiles_hold_invariants(tmp_path, seed):
    """Property flavor: random per-round batch sizes (0..6, the
    sustainable band) over the same 200->300 window — every profile
    must compose raise-free with immediate gating and bounded
    staleness."""
    import random

    rng = random.Random(seed)
    batches = [rng.randint(0, 6) for _ in range(18)]
    _simulate_growth(tmp_path, batches, n_start=200)
