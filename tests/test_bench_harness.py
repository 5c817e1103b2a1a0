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


def test_thresholds_are_sane():
    """The module constants the convergence check hangs off: spread
    and floor slack must stay > 1 (a <= 1 value would flag every
    honest capture) and modest (< 1.5 — beyond that the check stops
    defending anything)."""
    assert 1.0 < bench.PASS_SPREAD < 1.5
    assert 1.0 < bench.FLOOR_SLACK < 1.5
