"""Preemption-safe training (utils/preemption.py).

Protocol units plus a real SIGTERM integration: the CLI training process
must checkpoint at the agreed step, exit cleanly WITHOUT TRAIN_DONE, and
resume to completion on restart.
"""

import json
import os
import signal
import subprocess
import sys
import time

import pytest

from xmcgan_image_generation_tpu.utils.preemption import (
    MARKER,
    PreemptionGuard,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


class TestGuardProtocol:

  def test_no_signal_never_stops(self, tmp_path):
    guard = PreemptionGuard(str(tmp_path), initial_step=1)
    for step in range(1, 5):
      assert not guard.should_stop(step)

  def test_signal_stops_margin_steps_later(self, tmp_path):
    guard = PreemptionGuard(str(tmp_path), initial_step=1, margin=2)
    guard.request_stop()
    assert not guard.should_stop(10)   # writes target 12
    assert not guard.should_stop(11)
    assert guard.should_stop(12)
    assert guard.should_stop(13)       # late process still stops

  def test_first_writer_wins(self, tmp_path):
    a = PreemptionGuard(str(tmp_path), initial_step=1, margin=2)
    b = PreemptionGuard(str(tmp_path), initial_step=1, margin=2,
                        process_index=1)
    a.request_stop()
    assert not a.should_stop(10)       # target 12
    b.request_stop()
    assert not b.should_stop(11)       # loses the O_EXCL race: target stays 12
    assert b.should_stop(12)
    assert a.should_stop(12)

  def test_stale_marker_removed_on_install(self, tmp_path):
    with open(tmp_path / MARKER, "w") as f:
      f.write("7")                     # previous run stopped at 7
    guard = PreemptionGuard(str(tmp_path), initial_step=8)
    guard.install()
    guard.uninstall()
    assert not (tmp_path / MARKER).exists()
    assert not guard.should_stop(8)

  def test_stale_marker_ignored_by_nonzero_process(self, tmp_path):
    with open(tmp_path / MARKER, "w") as f:
      f.write("7")
    guard = PreemptionGuard(str(tmp_path), initial_step=8, process_index=1)
    guard.install()                    # must NOT delete (process 0's job)
    guard.uninstall()
    assert (tmp_path / MARKER).exists()
    assert not guard.should_stop(9)    # stale target < initial_step

  def test_signal_not_swallowed_by_stale_marker(self, tmp_path):
    """A stale marker that survived install() (e.g. a failed cleanup)
    must not eat a real SIGTERM: the write replaces it."""
    with open(tmp_path / MARKER, "w") as f:
      f.write("3")                     # stale: previous run stopped at 3
    guard = PreemptionGuard(str(tmp_path), initial_step=8, margin=2,
                            process_index=1)
    guard.request_stop()
    assert not guard.should_stop(10)   # replaces stale with target 12
    assert guard.should_stop(12)

  def test_cleanup_removes_live_leftover_after_normal_finish(self,
                                                             tmp_path):
    """SIGTERM within margin of the final step leaves a live target;
    cleanup() (normal completion, process 0) must remove it so the next
    extending run doesn't phantom-stop."""
    guard = PreemptionGuard(str(tmp_path), initial_step=1, margin=2)
    guard.request_stop()
    assert not guard.should_stop(10)   # target 12, but run ends at 10
    guard.cleanup()
    assert not (tmp_path / MARKER).exists()
    nxt = PreemptionGuard(str(tmp_path), initial_step=11)
    assert not nxt.should_stop(12)

  def test_cleanup_is_process0_only(self, tmp_path):
    guard = PreemptionGuard(str(tmp_path), initial_step=1, margin=2,
                            process_index=1)
    guard.request_stop()
    guard.should_stop(5)               # writes target 7
    guard.cleanup()                    # non-zero process: no-op
    assert (tmp_path / MARKER).exists()

  def test_marker_write_is_atomic(self, tmp_path):
    """No .tmp leftovers and the published file is complete."""
    guard = PreemptionGuard(str(tmp_path), initial_step=1, margin=2)
    guard.request_stop()
    guard.should_stop(5)
    assert [p.name for p in tmp_path.iterdir()] == [MARKER]
    assert int((tmp_path / MARKER).read_text()) == 7


def _wait_for(predicate, timeout, interval=0.5):
  deadline = time.time() + timeout
  while time.time() < deadline:
    if predicate():
      return True
    time.sleep(interval)
  return False


@pytest.mark.slow
def test_sigterm_checkpoints_and_resumes(tmp_path):
  workdir = str(tmp_path / "exp")
  env = dict(os.environ)
  env["JAX_PLATFORMS"] = "cpu"
  env.pop("PALLAS_AXON_POOL_IPS", None)
  env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                      + " --xla_force_host_platform_device_count=2")
  base_cmd = [
      sys.executable, "-m", "xmcgan_image_generation_tpu.main",
      "--config",
      os.path.join(REPO, "xmcgan_image_generation_tpu/configs/coco_xmc.py")
      + ":test",
      "--workdir", workdir, "--mode", "train", "--jax_xla_backend", "cpu",
      "--config.batch_size=8", "--config.eval_batch_size=8",
      # Far more steps than we let it run, and a checkpoint cadence it
      # will never reach — any checkpoint present is the preemption save.
      "--config.num_train_steps=100000", "--config.log_loss_every_steps=5",
      "--config.eval_every_steps=100000",
      "--config.checkpoint_every_steps=100000",
  ]
  proc = subprocess.Popen(base_cmd, env=env, cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                          text=True)
  try:
    metrics_path = os.path.join(workdir, "metrics.jsonl")
    # Wait until the loop has demonstrably taken steps.
    assert _wait_for(
        lambda: os.path.exists(metrics_path)
        and len(open(metrics_path).read().strip()) > 0, timeout=600), \
        "training never produced metrics"
    proc.send_signal(signal.SIGTERM)
    out, _ = proc.communicate(timeout=300)
    assert proc.returncode == 0, out[-4000:]
  finally:
    if proc.poll() is None:
      proc.kill()
      proc.communicate()

  ckpt_dir = os.path.join(workdir, "checkpoints")
  steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
  assert steps, "preemption did not save a checkpoint"
  assert not os.path.exists(os.path.join(ckpt_dir, "TRAIN_DONE"))
  assert os.path.exists(os.path.join(workdir, MARKER))
  saved = steps[-1]

  # Restart: resumes past the preemption point and finishes.
  resume_cmd = [c for c in base_cmd
                if not c.startswith("--config.num_train_steps")]
  resume_cmd.append(f"--config.num_train_steps={saved + 2}")
  proc2 = subprocess.run(resume_cmd, env=env, cwd=REPO,
                         capture_output=True, text=True, timeout=900)
  assert proc2.returncode == 0, proc2.stdout[-2000:] + proc2.stderr[-2000:]
  assert os.path.exists(os.path.join(ckpt_dir, "TRAIN_DONE"))
  final_steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
  assert final_steps[-1] == saved + 2
  # The stale preemption marker was cleaned up by the restart.
  assert not os.path.exists(os.path.join(workdir, MARKER))
