"""The 4x window-validity rule shared by every timing tool (bench.py).

Round-4's flag-probe record carried a physically impossible 6.98 img/s
window inside its spread with no discard rule; round 5 added one
(VERDICT r04 item 7): windows >4x off their siblings are recorded in
``suspect_windows`` and excluded from the median/IQR, never silently
averaged over.  Pure numpy — no jax, no device.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_clean_windows_pass_through():
  s = bench.spread_stats([100.0, 101.0, 99.0])
  assert "suspect_windows" not in s
  assert s["n"] == 3 and s["median"] == 100.0
  assert s["windows"] == [100.0, 101.0, 99.0]


def test_impossible_window_flagged_and_excluded():
  # The r04 flagprobe case: a 6.98 img/s reading among ~280 img/s windows.
  s = bench.spread_stats([281.0, 278.0, 6.98, 280.0, 283.0])
  assert s["suspect_windows"] == [2]
  assert s["n_valid"] == 4
  assert 278.0 <= s["median"] <= 283.0
  assert s["min"] == 278.0  # min/max over VALID windows
  assert 6.98 in s["windows"]  # but the raw record keeps the evidence


def test_fast_outlier_also_flagged():
  # Impossibly FAST windows (queued executions not drained) are equally
  # broken measurements.
  s = bench.spread_stats([100.0, 99.0, 101.0, 4178.0])
  assert s["suspect_windows"] == [3]


def test_valid_median_matches_spread():
  vals = [100.0, 101.0, 99.0, 6.98]
  assert bench.valid_median(vals) == bench.spread_stats(vals)["median"]


def test_degenerate_all_zero_keeps_everything():
  s = bench.spread_stats([0.0, 0.0])
  assert s["median"] == 0.0 and "suspect_windows" not in s


def test_two_modes_within_4x_both_kept():
  # The serving bimodality (~1x vs ~2x dispatch) is WITHIN 4x: both modes
  # are real measurements and must be kept — the rule only kills
  # physically impossible readings.
  s = bench.spread_stats([24.6, 24.7, 49.8, 49.9, 24.6])
  assert "suspect_windows" not in s
  assert s["n"] == 5
