"""Per-window bench calibration math (round-14 verdict #3).

Pure-Python tests of bench._windowed_ratios — the interpolated
probe-normalization that localizes a mid-run contention episode to its
own window instead of smearing it (or its overcorrection) across every
query the way the run-level average does.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _windowed_ratios  # noqa: E402


def _ratios_by_name(pairs):
    return {k: r for r, k in pairs}


def test_flat_probes_reduce_to_raw_ratio():
    # machine state identical to the prior round at every probe → the
    # windowed ratio IS the raw ratio
    timings = {f"q{i}": 2.0 for i in range(20)}
    prev_q = {f"q{i}": 1.0 for i in range(20)}
    probes = [(0.0, 0.5), (10.0, 0.5), (20.0, 0.5)]
    got = _ratios_by_name(_windowed_ratios(timings, probes, 0.5, prev_q))
    assert all(abs(r - 2.0) < 1e-9 for r in got.values())


def test_contention_window_discounts_only_its_queries():
    # probes: idle (0.5) at positions 0 and 10, a 2x contention episode
    # (1.0) spanning positions 10..20, idle again by 30. Queries are raw
    # 2x their prior values ONLY inside the slow window — windowed
    # normalization must bring those back to ~1.0 while leaving the
    # others' ratios at ~1.0 too (no overcorrection of idle windows).
    timings = {}
    for i in range(30):
        timings[f"q{i}"] = 2.0 if 10 <= i < 20 else 1.0
    prev_q = {f"q{i}": 1.0 for i in range(30)}
    probes = [(0.0, 0.5), (10.0, 0.5), (15.0, 1.0), (20.0, 1.0), (30.0, 0.5)]
    got = _ratios_by_name(_windowed_ratios(timings, probes, 0.5, prev_q))
    # deep inside the slow window (flat probe 1.0 → ratio 2.0 vs prev):
    # raw 2x discounts to exactly 1.0
    assert abs(got["q16"] - 1.0) < 1e-9
    # deep inside the idle stretches: ratio stays 1.0
    assert abs(got["q2"] - 1.0) < 0.15
    assert abs(got["q27"] - 1.0) < 0.25
    # a run-level average probe ((0.5+0.5)/2 = no drift) would have left
    # every slow-window query flagged at 2.0 — the windowed table must not.
    # Queries at the episode's ONSET (between the last idle probe and the
    # first slow one) are only partially corrected — inherent to sampled
    # probes — so the bound is loose at the boundary, tight elsewhere.
    assert all(r < 1.75 for r in got.values())
    assert all(abs(got[f"q{i}"] - 1.0) < 1e-9 for i in range(15, 20))


def test_interpolation_between_probes():
    # position 5 sits halfway between probes 0.4 (pos 0) and 0.6 (pos 10)
    # → interpolated probe 0.5 → ratio (1.0 / (0.5/0.5)) / 1.0 = 1.0
    timings = {f"q{i}": 1.0 for i in range(10)}
    prev_q = {f"q{i}": 1.0 for i in range(10)}
    probes = [(0.0, 0.4), (10.0, 0.6)]
    got = _ratios_by_name(_windowed_ratios(timings, probes, 0.5, prev_q))
    # q4 is at position 5.0 exactly (order is 1-based)
    assert abs(got["q4"] - 1.0) < 1e-9
    # earlier queries divide by a smaller probe → ratio above 1
    assert got["q0"] > 1.0 > got["q8"]


def test_shared_set_respects_prev_queries():
    timings = {"a": 1.0, "b": 1.0}
    prev_q = {"a": 1.0}  # b unknown to the prior round
    probes = [(0.0, 0.5), (2.0, 0.5)]
    got = _windowed_ratios(timings, probes, 0.5, prev_q)
    assert [k for _, k in got] == ["a"]
