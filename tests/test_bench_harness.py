"""The bench harness's self-defense helpers (r13): the floor ledger
math that decides whether a committed BENCH_r{N}.json capture is
trustworthy. Pure functions — no Spark session needed."""

from __future__ import annotations

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "bench",
    os.path.join(os.path.dirname(os.path.dirname(__file__)), "bench.py"),
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_suite_floor_requires_full_coverage():
    """A suite-composition change (new headline row) must RESET the
    floor check (None) until the new row's floor lands — comparing a
    13-query total against a 12-query floor would false-flag every
    capture."""
    floors = {
        "headline_suite_seconds@sf0.1": {
            "queries": {"a": 1.0, "b": 2.5}
        }
    }
    key = "headline_suite_seconds@sf0.1"
    assert bench._suite_floor(floors, key, ["a", "b"]) == 3.5
    assert bench._suite_floor(floors, key, ["a", "b", "new"]) is None
    assert bench._suite_floor(floors, key, ["a"]) == 1.0
    assert bench._suite_floor({}, key, ["a"]) is None


def test_floor_keys_are_sf_scoped():
    """sf0.01 smoke floors must never satisfy (or tighten) the sf0.1
    check — the keys differ."""
    floors = {
        "headline_suite_seconds@sf0.01": {"queries": {"a": 0.1}},
    }
    assert (
        bench._suite_floor(floors, "headline_suite_seconds@sf0.1", ["a"])
        is None
    )


def test_floor_tightening_requires_idle_start():
    """r14 (r13 verdict item 3): only low-load captures may tighten
    the committed floor ledger — a lucky sub-window of a contended run
    must not become the convergence baseline. None (no /proc) also
    refuses: an unmeasurable window is not a measured-idle one."""
    assert bench._may_tighten_floor(0.05, 1.0)
    assert bench._may_tighten_floor(1.0, 1.0)  # boundary: <= passes
    assert not bench._may_tighten_floor(1.01, 1.0)
    assert not bench._may_tighten_floor(17.3, 1.0)
    assert not bench._may_tighten_floor(None, 1.0)
    assert bench.FLOOR_MAX_LOAD > 0


def test_loadavg_reads_a_number_here():
    """This container has /proc; the stamp must be a non-negative
    float so BENCH_r{N}.json windows are self-describing."""
    v = bench._loadavg()
    assert isinstance(v, float) and v >= 0.0


def test_bench_tmp_is_deterministic_and_fresh(tmp_path, monkeypatch):
    """The suite-setup scratch paths are per-(prefix, sf) FIXED names
    (mkdtemp leaked one corpus-sized tree per bench run — r13 advice)
    and are cleared before reuse."""
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    try:
        p1 = bench._bench_tmp("bench_x", "/root/testdata/sf0.1")
        p2 = bench._bench_tmp("bench_x", "/root/testdata/sf0.1")
        assert p1 == p2 and p1.startswith(str(tmp_path))
        assert p1 != bench._bench_tmp("bench_x", "/root/testdata/sf0.01")
        os.makedirs(os.path.join(p1, "stale"))
        assert not os.path.exists(bench._bench_tmp("bench_x", "/root/testdata/sf0.1"))
    finally:
        tempfile.tempdir = None


def test_thresholds_are_sane():
    """The module constants the convergence check hangs off: spread
    and floor slack must stay > 1 (a <= 1 value would flag every
    honest capture) and modest (< 1.5 — beyond that the check stops
    defending anything)."""
    assert 1.0 < bench.PASS_SPREAD < 1.5
    assert 1.0 < bench.FLOOR_SLACK < 1.5
