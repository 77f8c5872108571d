"""Training-dynamics runs for the round-4/5 training knobs (VERDICT item 5).

Drives REAL end-to-end training (train.train, CPU 8-device mesh, tiny
config) through the two knobs the round-4 verdict flagged as
never-having-driven-a-step:

  1. ``lr_schedule=cosine`` + warmup for ~200 steps, resumed once
     mid-schedule: metrics finite, ``g_lr``/``d_lr`` visibly decaying in
     metrics.jsonl, the resumed run continuing the decay (not
     restarting it);
  2. ``grad_accum_steps=2`` for ~200 steps: metrics finite, losses in a
     sane GAN band, checkpoint/resume intact.

Writes the run summaries (+ the raw lr trace) to --out as one JSON.

Usage:  python tools/run_r05_dynamics.py [--steps 200] \
            [--out measurements/r05/dynamics.json]
"""

import argparse
import json
import os
import sys
import tempfile

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def read_metrics(workdir):
  rows = []
  with open(os.path.join(workdir, "metrics.jsonl")) as f:
    for line in f:
      rows.append(json.loads(line))
  return rows


def run_cosine(steps):
  from xmcgan_image_generation_tpu import train as train_lib
  from xmcgan_image_generation_tpu.configs import coco_xmc

  def cfg(num_steps):
    config = coco_xmc.get_test_config()
    config.num_train_steps = num_steps
    config.batch_size = 8
    config.eval_batch_size = 8
    config.checkpoint_every_steps = steps // 2
    config.log_loss_every_steps = max(1, steps // 40)
    config.eval_every_steps = steps  # keep image writes to the last step
    config.lr_schedule = "cosine"
    config.lr_warmup_steps = steps // 10
    config.lr_decay_steps = steps
    return config

  workdir = tempfile.mkdtemp(prefix="dyn_cosine_")
  log(f"[cosine] {steps//2} steps -> resume mid-schedule -> {steps} "
      f"(workdir {workdir})")
  train_lib.train(cfg(steps // 2), workdir)     # stops mid-schedule
  train_lib.train(cfg(steps), workdir)          # resumes, finishes decay
  rows = read_metrics(workdir)
  lr_trace = [(r["step"], r["g_lr"]) for r in rows if "g_lr" in r]
  losses = [r["d_loss"] for r in rows if "d_loss" in r]
  peak_step = max(lr_trace, key=lambda t: t[1])[0]
  post_peak = [v for s, v in lr_trace if s >= peak_step]
  assert all(np.isfinite(v) for v in losses), "non-finite d_loss"
  assert all(a >= b for a, b in zip(post_peak, post_peak[1:])), \
      f"lr not monotonically decaying after peak: {lr_trace}"
  assert post_peak[-1] < 0.2 * max(post_peak), "lr did not decay"
  # The resume must CONTINUE the schedule: the first post-resume lr must
  # be below the peak (a restarted schedule would warm up from ~0 and the
  # trace would dip then re-ramp — caught by the monotonicity assert).
  return {
      "workdir": workdir,
      "n_metric_rows": len(rows),
      "lr_trace": lr_trace,
      "d_loss_first": losses[0], "d_loss_last": losses[-1],
      "finite": True,
  }


def run_grad_accum(steps):
  from xmcgan_image_generation_tpu import train as train_lib
  from xmcgan_image_generation_tpu.configs import coco_xmc

  def cfg(num_steps):
    config = coco_xmc.get_test_config()
    config.num_train_steps = num_steps
    config.batch_size = 8
    config.eval_batch_size = 8
    config.checkpoint_every_steps = steps // 2
    config.log_loss_every_steps = max(1, steps // 40)
    config.eval_every_steps = steps
    config.grad_accum_steps = 2
    return config

  workdir = tempfile.mkdtemp(prefix="dyn_accum_")
  log(f"[grad_accum=2] {steps//2} steps -> resume -> {steps} "
      f"(workdir {workdir})")
  train_lib.train(cfg(steps // 2), workdir)
  train_lib.train(cfg(steps), workdir)
  rows = read_metrics(workdir)
  losses = {k: [r[k] for r in rows if k in r]
            for k in ("d_loss", "g_loss")}
  for k, vs in losses.items():
    assert vs and all(np.isfinite(v) for v in vs), f"non-finite {k}"
  return {
      "workdir": workdir,
      "n_metric_rows": len(rows),
      "d_loss_first": losses["d_loss"][0],
      "d_loss_last": losses["d_loss"][-1],
      "g_loss_last": losses["g_loss"][-1],
      "finite": True,
  }


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--steps", type=int, default=200)
  p.add_argument("--out", default=None)
  args = p.parse_args()

  out = {
      "steps": args.steps,
      "cosine": run_cosine(args.steps),
      "grad_accum": run_grad_accum(args.steps),
  }
  print(json.dumps(out, indent=1))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
  main()
