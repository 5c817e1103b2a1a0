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


def test_never_gated_landed_entries_mandatory(tmp_path):
    reg = FLAGSHIPS + [f"e{i}" for i in range(60)]
    _write_round(tmp_path, 4, {k: GREEN for k in reg if k != "e0"})
    # e0 landed a round ago (in the completed round's verify) but was
    # never driver-gated -> rule (a)
    (tmp_path / "VERIFY_LOCAL_r04.txt").write_text("OK e0 value-exact\n")
    gate = compute_rotation(reg, root=str(tmp_path))
    assert "e0" in gate


def test_family_coverage_adds_oldest_member(tmp_path):
    fam = sorted(FAMILY_COVER["near-dup"])
    reg = FLAGSHIPS + fam + [f"e{i}" for i in range(60)]
    # all family members last green at r2, fillers fresh at r4 -> family
    # is neither in the mandatory queue (lag 2 < 3) nor completed-green,
    # so coverage must pull in the oldest member
    _write_round(tmp_path, 2, {k: GREEN for k in fam})
    _write_round(tmp_path, 4, {k: GREEN for k in reg if k not in fam})
    gate = compute_rotation(reg, root=str(tmp_path))
    assert set(fam) & set(gate)


def test_family_green_in_completed_round_needs_no_slot(tmp_path):
    fam = sorted(FAMILY_COVER["near-dup"])
    reg = FLAGSHIPS + fam + [f"e{i}" for i in range(200)]
    # family value-green in the completed round, 200 never-gated
    # landed fillers competing for slots
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
    """The live rotation (real artifacts) upholds rules (a)+(b) and cap."""
    import __spark_entry__ as e
    from implementation_of_an_etl_process_spark.queries.rotation import (
        read_driver_history,
        read_landed_before,
    )

    gate = list(e.queries())[:50]
    latest, completed, _ = read_driver_history()
    if not completed:
        return
    landed = read_landed_before(completed)
    reg = set(e.queries())
    for k in (reg - set(latest)) & landed:
        assert k in gate, f"rule (a) violated: {k}"
    for k in reg:
        if k in latest and latest[k] <= completed - 3:
            assert k in gate, f"rule (b) violated: {k}"
