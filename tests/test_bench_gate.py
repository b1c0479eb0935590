"""The noise-aware bench regression gate (bench.regression_gate) —
the r6 verdict's tooling finding: container-wide drift (a uniform
median inflation across untouched queries) must not flag per-query
regressions, and sub-second deltas are noise-floor by definition."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import regression_gate


def test_uniform_inflation_flags_nothing():
    """The r6 failure mode: every query ~1.6x slower because the box
    is busier — the median ratio absorbs it, zero candidates."""
    prev = {f"q{i}": 2.0 for i in range(10)}
    cur = {k: v * 1.6 for k, v in prev.items()}
    inflation, ratios, candidates = regression_gate(cur, prev)
    assert inflation == 1.6
    assert candidates == []


def test_real_regression_survives_normalization():
    prev = {f"q{i}": 2.0 for i in range(10)}
    cur = dict(prev)
    cur["q3"] = 5.0  # 2.5x while the median stays 1.0
    inflation, ratios, candidates = regression_gate(cur, prev)
    assert inflation == 1.0
    assert candidates == ["q3"]


def test_subsecond_delta_is_noise_floor():
    prev = {"big": 2.0, "tiny": 0.1}
    cur = {"big": 2.0, "tiny": 0.9}  # 9x raw — but under the 1s floor
    _, _, candidates = regression_gate(cur, prev)
    assert candidates == []


def test_regression_under_inflation_still_caught():
    """A genuine 4x regression inside a 1.5x-inflated run normalizes
    to ~2.7x and is flagged; its 1.5x-inflated neighbors are not."""
    prev = {f"q{i}": 2.0 for i in range(9)}
    cur = {k: v * 1.5 for k, v in prev.items()}
    cur["q0"] = 8.0
    inflation, _, candidates = regression_gate(cur, prev)
    assert inflation == 1.5
    assert candidates == ["q0"]


def test_no_baseline_is_silent():
    assert regression_gate({"a": 1.0}, {}) == (None, {}, [])
    assert regression_gate({}, {"a": 1.0}) == (None, {}, [])


def test_new_and_zero_baseline_queries_skipped():
    prev = {"a": 2.0, "z": 0.0}
    cur = {"a": 2.1, "z": 9.0, "new": 50.0}
    inflation, ratios, candidates = regression_gate(cur, prev)
    assert set(ratios) == {"a"}
    assert candidates == []
