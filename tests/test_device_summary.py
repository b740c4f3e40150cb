"""Unit test for the overlap-corrected xplane attribution sweep."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "benchmarks"))

from device_summary import exclusive_times  # noqa: E402


def test_exclusive_times_splits_overlap():
    # A covers [0,10), B covers [5,15): the overlapped 5 is split equally.
    excl, union = exclusive_times([(0, 10, "A"), (5, 10, "B")])
    assert union == 15
    assert excl["A"] == 7.5 and excl["B"] == 7.5


def test_exclusive_times_gap_and_nesting():
    # C nested inside A; D after a gap. Union skips the gap.
    excl, union = exclusive_times([(0, 10, "A"), (2, 4, "C"), (20, 5, "D")])
    assert union == 15
    assert excl["A"] == 8.0   # 6 exclusive + half of the 4 shared
    assert excl["C"] == 2.0
    assert excl["D"] == 5.0
    assert abs(sum(excl.values()) - union) < 1e-9


def test_exclusive_times_same_key_accumulates():
    excl, union = exclusive_times([(0, 5, "A"), (10, 5, "A")])
    assert union == 10 and excl["A"] == 10
