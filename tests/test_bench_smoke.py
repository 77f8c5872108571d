"""bench.py smoke: the driver runs this script every round — make sure the
whole path (build, GSPMD timing, reference-design baseline, JSON contract)
executes on the CPU mesh and emits the one-line JSON it promises."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_bench_json_contract(tmp_path):
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  # Keep sitecustomize from registering the axon TPU plugin: with the
  # tunnel down its backend init blocks regardless of JAX_PLATFORMS.
  env.pop("PALLAS_AXON_POOL_IPS", None)
  # Isolate the baseline cache so this test never poisons the real one.
  proc = subprocess.run(
      [sys.executable, os.path.join(REPO, "bench.py"),
       "--image_size", "32", "--batch_size", "8", "--steps", "1",
       "--skip_baseline", "--scale_fused_convs", "0"],
      capture_output=True, text=True, timeout=1500, cwd=str(tmp_path),
      env=env)
  assert proc.returncode == 0, proc.stderr[-4000:]
  line = proc.stdout.strip().splitlines()[-1]
  out = json.loads(line)
  assert out["unit"] == "images/sec/chip"
  assert out["value"] > 0
  assert "vs_baseline" in out
  assert "32px" in out["metric"]


@pytest.mark.slow
def test_bench_conv_pipeline_ab(tmp_path):
  """No --scale_fused_convs => bench A/Bs both conv pipelines at the same
  batch and reports the winner (tiny dims via --test_config)."""
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("PALLAS_AXON_POOL_IPS", None)
  proc = subprocess.run(
      [sys.executable, os.path.join(REPO, "bench.py"),
       "--test_config", "--batch_size", "8", "--steps", "1",
       "--skip_baseline"],
      capture_output=True, text=True, timeout=1500, cwd=str(tmp_path),
      env=env)
  assert proc.returncode == 0, proc.stderr[-4000:]
  out = json.loads(proc.stdout.strip().splitlines()[-1])
  ab = out["conv_pipeline"]
  assert set(ab) - {"suspect"} == {"naive", "fused", "selected"}
  assert ab["selected"] in ("naive", "fused")
  if "suspect" in ab:
    # Implausible A/B gap (>4x between FLOP-equivalent pipelines): the
    # primary in-process measurement keeps the headline.
    assert out["value"] == pytest.approx(ab[ab["selected"]])
  else:
    assert out["value"] == pytest.approx(max(ab["naive"], ab["fused"]))
