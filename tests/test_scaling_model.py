"""Math of the analytic multi-chip projection (tools/scaling_model.py).

Pure numpy-free arithmetic — no jax, no device, no compiles (the census
half of the tool is exercised by the committed
measurements/r05/scaling_model.json run).  Checks the linear byte-growth
fit, the ring-collective wire model, and the step-time bounds.
"""

import os
import sys

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import scaling_model as sm  # noqa: E402


def test_fit_linear_recovers_exact_line():
  a, b = sm.fit_linear([2, 4, 8], [10.0, 14.0, 22.0])  # y = 6 + 2n
  assert abs(a - 6.0) < 1e-9 and abs(b - 2.0) < 1e-9


def test_fit_linear_constant_series():
  a, b = sm.fit_linear([2, 4, 8], [5.0, 5.0, 5.0])
  assert abs(a - 5.0) < 1e-9 and abs(b) < 1e-12


def test_ici_allreduce_wire_model():
  # 1.8 GB all-reduced on 8 chips over 180 GB/s egress:
  # 2 * 1.8e9 * 7/8 / 180e9 = 17.5 ms.
  t = sm.ici_ms({"all-reduce": 1.8e9}, n=8, egress_gbps=180.0)
  assert abs(t - 17.5) < 1e-6


def test_ici_gather_vs_permute_factors():
  # A gather pays (n-1)/n of its output; a permute pays all of it once.
  tg = sm.ici_ms({"all-gather": 1e9}, n=4, egress_gbps=100.0)
  tp = sm.ici_ms({"collective-permute": 1e9}, n=4, egress_gbps=100.0)
  assert abs(tg - 0.75 * 1e9 / 100e9 * 1e3) < 1e-9
  assert abs(tp - 1e9 / 100e9 * 1e3) < 1e-9


def test_projection_bounds_ordering():
  fits = {"all-reduce": (1.6e9, 0.0), "all-gather": (0.0, 19e6)}
  rows = sm.project(fits, compute_ms=190.4, ns=[8, 64, 256])
  for row in rows:
    lo_ms, hi_ms = row["step_ms_bounds"]
    assert lo_ms <= hi_ms
    assert lo_ms >= 190.4  # full overlap can't beat pure compute
    lo_tp, hi_tp = row["img_per_sec_per_chip_bounds"]
    assert lo_tp <= hi_tp
    lo_e, hi_e = row["scaling_efficiency_bounds"]
    assert 0.0 < lo_e <= hi_e <= 1.0
  # Growing all-gather bytes => efficiency monotonically non-increasing.
  effs = [row["scaling_efficiency_bounds"][0] for row in rows]
  assert effs == sorted(effs, reverse=True)


def test_build_record_fits_and_projects():
  pts = {
      2: {"all-reduce": 1600e6, "all-gather": 38e6},
      4: {"all-reduce": 1600e6, "all-gather": 76e6},
      8: {"all-reduce": 1600e6, "all-gather": 152e6},
  }
  rec = sm.build_record(pts, [8, 16], compute_ms=190.4,
                        images_per_device_step=112)
  fit = rec["per_kind_fit_mb"]
  assert abs(fit["all-reduce"]["per_chip"]) < 1e-6
  assert abs(fit["all-gather"]["per_chip"] - 19.0) < 1e-6
  n8, n16 = rec["projection"]
  assert n16["collective_mb_per_device"] > n8["collective_mb_per_device"]
  # At 8 chips the censused point must be reproduced by the fit.
  assert abs(n8["collective_mb_per_device"] - 1752.0) < 1.0
