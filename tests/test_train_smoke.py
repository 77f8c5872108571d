"""End-to-end smoke: train the tiny config on synthetic data over the
8-device CPU mesh; checkpoint, resume, artifacts.

Quick manual drive (same flow via the CLI):

  python -m xmcgan_image_generation_tpu.main \
      --config=xmcgan_image_generation_tpu/configs/coco_xmc.py:test \
      --workdir=$(mktemp -d) --mode=train
"""

import glob
import json
import os
import shutil

import jax
import numpy as np
import pytest

from xmcgan_image_generation_tpu import train as train_lib
from xmcgan_image_generation_tpu.configs import coco_xmc
from xmcgan_image_generation_tpu.utils.checkpoint import (
    CheckpointManager,
    checkpoints_dir,
)


def smoke_config(num_steps=2):
  config = coco_xmc.get_test_config()
  config.num_train_steps = num_steps
  config.batch_size = 8  # Divisible over the 8-device mesh.
  config.eval_batch_size = 8
  config.checkpoint_every_steps = 2
  return config


@pytest.fixture(scope="module")
def trained_workdir(tmp_path_factory):
  """ONE shared 2-step constant-LR training run.

  Four tests in this module need a trained workdir; training it once and
  handing mutating tests a copy keeps the quick tier's wall time at one
  compile instead of four (tools/time_quick_tier.sh budget).  Tests that
  only read assert on the shared dir directly.
  """
  workdir = str(tmp_path_factory.mktemp("smoke") / "exp")
  train_lib.train(smoke_config(num_steps=2), workdir)
  return workdir


def _mutable_copy(trained_workdir, tmp_path):
  dst = str(tmp_path / "exp")
  shutil.copytree(trained_workdir, dst)
  return dst


class TestTrainSmoke:

  def test_end_to_end_train(self, trained_workdir):
    workdir = trained_workdir

    # Checkpoint exists at the final step.
    mngr = CheckpointManager(checkpoints_dir(workdir))
    assert mngr.all_steps() == [2]
    mngr.close()
    # Metrics were written.
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
      rows = [json.loads(l) for l in f]
    steps = {r["step"] for r in rows}
    assert 1 in steps and 2 in steps
    d_losses = [r["d_loss"] for r in rows if "d_loss" in r]
    assert d_losses and all(np.isfinite(v) for v in d_losses)
    # Image grids were written.
    assert glob.glob(os.path.join(workdir, "images", "generated_image_*"))
    assert glob.glob(os.path.join(workdir, "images", "ema_generated_*"))
    # TRAIN_DONE marker for the eval service.
    assert os.path.exists(
        os.path.join(checkpoints_dir(workdir), "TRAIN_DONE"))

  def test_resume_from_checkpoint(self, trained_workdir, tmp_path):
    # Resume the shared 2-step run (in a copy) and train 2 more.
    workdir = _mutable_copy(trained_workdir, tmp_path)
    train_lib.train(smoke_config(num_steps=4), workdir)
    mngr = CheckpointManager(checkpoints_dir(workdir))
    assert 4 in mngr.all_steps()
    mngr.close()
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
      steps = [json.loads(l)["step"] for l in f]
    # The resumed run must not have re-run steps 1-2.
    assert steps.count(3) >= 1 and steps.count(4) >= 1

  @pytest.mark.heavy
  def test_resume_is_bit_identical_to_uninterrupted(self, tmp_path):
    """Checkpoint/resume must be invisible: params after 2+2 resumed
    steps equal params after 4 uninterrupted steps (exact data-iterator
    resume + per-step rng folding)."""
    wd_straight = str(tmp_path / "straight")
    train_lib.train(smoke_config(num_steps=4), wd_straight)
    wd_resumed = str(tmp_path / "resumed")
    train_lib.train(smoke_config(num_steps=2), wd_resumed)
    train_lib.train(smoke_config(num_steps=4), wd_resumed)

    def final_params(workdir):
      from xmcgan_image_generation_tpu.engine import create_train_state
      from __graft_entry__ import _example_batch
      from xmcgan_image_generation_tpu.engine.step import split_batch
      config = smoke_config()
      batch = split_batch(
          _example_batch(config,
                         config.batch_size * config.d_step_per_g_step),
          config.d_step_per_g_step)[0]
      _, _, template = create_train_state(config, jax.random.PRNGKey(0),
                                          batch)
      mngr = CheckpointManager(checkpoints_dir(workdir))
      state = mngr.restore(4, template)
      mngr.close()
      return state

    a = final_params(wd_straight)
    b = final_params(wd_resumed)
    for pa, pb in zip(jax.tree_util.tree_leaves(a.g_params),
                      jax.tree_util.tree_leaves(b.g_params)):
      np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for pa, pb in zip(jax.tree_util.tree_leaves(a.d_params),
                      jax.tree_util.tree_leaves(b.d_params)):
      np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))
    for pa, pb in zip(jax.tree_util.tree_leaves(a.ema_params),
                      jax.tree_util.tree_leaves(b.ema_params)):
      np.testing.assert_array_equal(np.asarray(pa), np.asarray(pb))

  def test_num_train_steps_epoch_math(self):
    config = smoke_config()
    config.num_train_steps = -1
    config.num_epochs = 3
    config.batch_size = 8
    config.d_step_per_g_step = 2
    # 64 synthetic examples // (8 * 2) = 4 steps/epoch.
    assert train_lib.compute_num_train_steps(config, 64) == 12


def scheduled_config(num_steps=2):
  config = smoke_config(num_steps=num_steps)
  config.lr_schedule = "cosine"
  config.lr_warmup_steps = 1
  config.lr_decay_steps = 4
  config.log_loss_every_steps = 1
  return config


class TestScheduledTraining:
  """config.lr_schedule driven end-to-end, not just unit-tested."""

  @pytest.mark.heavy  # two full train() runs: integration-grade compile
  # cost (~86s cold); the mismatch error-path test below stays quick, and
  # the 200-step on-mesh dynamics run (measurements/r05/dynamics.json)
  # covers the schedule end-to-end.
  def test_schedule_visible_in_metrics_and_resumes_mid_schedule(
      self, tmp_path):
    workdir = str(tmp_path / "exp")
    train_lib.train(scheduled_config(num_steps=2), workdir)
    # Resume mid-schedule (the optimizer state carries the schedule
    # count, so the restored run continues decaying, not restarting).
    train_lib.train(scheduled_config(num_steps=4), workdir)

    with open(os.path.join(workdir, "metrics.jsonl")) as f:
      rows = [json.loads(l) for l in f if "g_lr" in l]
    lr_by_step = {r["step"]: r["g_lr"] for r in rows if "g_lr" in r}
    # warmup=1, decay=4: peak at step 1, strictly decaying to ~0 at 4.
    assert set(lr_by_step) == {1, 2, 3, 4}
    assert lr_by_step[1] > lr_by_step[2] > lr_by_step[3] > lr_by_step[4]
    assert lr_by_step[4] == pytest.approx(0.0, abs=1e-10)
    d_by_step = {r["step"]: r["d_lr"] for r in rows if "d_lr" in r}
    # D's stretched schedule decays on the same outer-step wall-clock.
    assert d_by_step[2] > d_by_step[3] > d_by_step[4]
    for r in rows:
      assert np.isfinite(r.get("d_loss", 0.0))

  def test_schedule_mismatch_vs_checkpoint_fails_loudly(
      self, trained_workdir, tmp_path):
    """The documented restriction (engine/state.py create_optimizers):
    lr_schedule must be chosen before training starts — a scheduled
    optimizer state has a different checkpoint structure, and restoring
    a constant-LR checkpoint into a scheduled run must raise, not
    silently mis-train."""
    # The shared fixture run IS the constant-LR training; the failed
    # restore below may touch the workdir, so take a copy.
    workdir = _mutable_copy(trained_workdir, tmp_path)
    with pytest.raises(Exception) as excinfo:
      train_lib.train(scheduled_config(num_steps=4), workdir)
    # Orbax surfaces the structural mismatch; accept any exception whose
    # message points at the tree/structure difference.
    msg = str(excinfo.value).lower()
    assert any(w in msg for w in ("structure", "tree", "mismatch",
                                  "scalebyschedule", "count"))


class TestGenerateMode:

  def test_generate_from_checkpoint(self, trained_workdir, tmp_path):
    from xmcgan_image_generation_tpu import generate as gen_lib
    import glob as globlib
    # generate() only reads the checkpoint, but it writes its PNGs under
    # the workdir — use a copy so the shared fixture dir stays pristine.
    workdir = _mutable_copy(trained_workdir, tmp_path)
    config = smoke_config()
    out_dir = gen_lib.generate(config, workdir)
    pngs = globlib.glob(os.path.join(out_dir, "*.png"))
    assert len(pngs) == 3  # generated, ema, real

  def test_generate_without_checkpoint_raises(self, tmp_path):
    from xmcgan_image_generation_tpu import generate as gen_lib
    with pytest.raises(FileNotFoundError):
      gen_lib.generate(smoke_config(), str(tmp_path / "empty"))
