"""Continuous-evaluation service (the reference's ``--mode=test`` path).

Capability parity with `test` (reference xmcgan/train_utils.py:464-514):
precompute real-image Inception statistics once, then poll the training
workdir for new checkpoints, score each (FID + IS, normal and EMA weights,
mean +- std over ``eval_avg_num`` repeats), append to ``scores.csv`` and the
metric writer, and exit on timeout or TRAIN_DONE.
"""

from __future__ import annotations

import logging
from typing import Optional

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from xmcgan_image_generation_tpu.data import create_datasets
from xmcgan_image_generation_tpu.data.pipeline import template_batch
from xmcgan_image_generation_tpu.engine import create_train_state
from xmcgan_image_generation_tpu.parallel import MeshRules
from xmcgan_image_generation_tpu.utils.checkpoint import (
    CheckpointManager,
    checkpoints_dir,
)
from xmcgan_image_generation_tpu.utils.eval_metrics import EvalMetric
from xmcgan_image_generation_tpu.utils.metric_writer import MetricWriter
from xmcgan_image_generation_tpu.utils.task_manager import (
    TaskManagerWithCsvResults,
)

log = logging.getLogger("xmcgan_tpu")


# Control values broadcast by the coordinator (process 0).  Real checkpoint
# steps are >= 0.
_SERVICE_DONE = -1
_HEARTBEAT = -2


def _broadcast_step(value: int, deadline: Optional[float] = None) -> int:
  """One coordinator->workers broadcast of a control value / step.

  ``deadline`` (seconds, workers only) bounds the wait: a dead coordinator
  must FAIL the job, not hang it until the backend's own timeout (24h on
  TPU barriers).  Collectives cannot be cancelled, so the bounded wait
  joins a daemon thread and raises on expiry.
  """
  from jax.experimental import multihost_utils

  if deadline is None:
    return int(multihost_utils.broadcast_one_to_all(np.int64(value)))

  import threading

  result = {}

  def run():
    try:
      result["step"] = int(
          multihost_utils.broadcast_one_to_all(np.int64(value)))
    except Exception as e:  # noqa: BLE001 - re-raised on the main thread
      result["error"] = e

  thread = threading.Thread(target=run, daemon=True)
  thread.start()
  thread.join(deadline)
  if thread.is_alive():
    raise RuntimeError(
        f"eval-service worker: no broadcast from the coordinator within "
        f"{deadline:.0f}s — process 0 is gone; failing the job")
  if "error" in result:
    raise result["error"]
  return result["step"]


def _synchronized_steps(task_manager, timeout: int,
                        heartbeat_interval: float = 5.0,
                        worker_deadline: Optional[float] = None):
  """Yields checkpoint steps to evaluate, identically on every process.

  Each process polling the directory independently races (process 0 can
  score a checkpoint and append scores.csv before process 1 even lists
  it, leaving process 1 with nothing to evaluate while process 0 waits in
  the FID all-gather).  Process 0 is the single decision-maker; the step
  sequence is broadcast, with ``_SERVICE_DONE`` as the end-of-service
  sentinel.

  While process 0 polls the filesystem between checkpoints it broadcasts a
  ``_HEARTBEAT`` sentinel every ``heartbeat_interval`` seconds, so no
  single collective ever waits longer than the poll interval — backend
  collective timeouts (gloo's ~30s CPU window, TPU barrier timeouts) stay
  unreachable however far apart checkpoints land.  Workers additionally
  enforce ``worker_deadline`` (default: max(12x heartbeat, 60s)) per
  broadcast: if process 0 dies, the service fails fast instead of hanging.
  """
  if jax.process_count() == 1:
    yield from task_manager.unevaluated_checkpoints(timeout=timeout)
    return

  if worker_deadline is None:
    worker_deadline = max(12.0 * heartbeat_interval, 60.0)

  if jax.process_index() == 0:
    for step in task_manager.unevaluated_checkpoints(
        timeout=timeout,
        poll_interval=heartbeat_interval,
        poll_callback=lambda: _broadcast_step(_HEARTBEAT)):
      _broadcast_step(step)
      yield step
    _broadcast_step(_SERVICE_DONE)
  else:
    while True:
      step = _broadcast_step(0, deadline=worker_deadline)
      if step == _HEARTBEAT:
        continue
      if step < 0:
        return
      yield step


def evaluate_continuously(config: ml_collections.ConfigDict, workdir: str,
                          timeout: int = 24 * 3600) -> None:
  """Runs the checkpoint-polling FID/IS service against ``workdir``."""
  rules = MeshRules.create(config.get("mesh_data", -1),
                           config.get("mesh_model", 1))
  if jax.process_count() > 1:
    # Establish the cross-process collective channels while the processes
    # are still in lockstep: gloo context creation has a short rendezvous
    # window, and the service's later collectives run after minutes of
    # per-process compile/compute whose skew could exceed it.
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("eval_service_start")
  rng = jax.random.PRNGKey(config.seed)
  rng, eval_rng, model_rng = jax.random.split(rng, 3)

  _, eval_loader, _ = create_datasets(config, seed=config.seed)
  eval_iter = iter(eval_loader)
  if not config.return_text:
    # Overlap host decode with device compute across the 30k-image pools
    # (text/filename fields cannot be device-prefetched).
    from xmcgan_image_generation_tpu.data.pipeline import (
        DevicePrefetchIterator,
    )

    eval_iter = DevicePrefetchIterator(
        eval_iter, rules.mesh, size=config.get("prefetch_batches", 2))

  eval_metric = EvalMetric(eval_iter, config, mesh=rules.mesh)
  ckpt_dir = checkpoints_dir(workdir)
  task_manager = TaskManagerWithCsvResults(ckpt_dir)
  writer = MetricWriter(workdir, just_logging=jax.process_index() > 0)

  # Template state for restoration — shapes come from the loader spec, not
  # from consuming a batch: the real pool must be exactly the first
  # ``eval_num`` loader images (reference eval_metrics.py:70-88).
  init_batch = {k: jnp.asarray(v)
                for k, v in template_batch(config).items()}
  generator, _, template = create_train_state(config, model_rng, init_batch)
  ckpt = CheckpointManager(ckpt_dir, with_data_iter=False)

  for step in _synchronized_steps(task_manager, timeout):
    log.info("Evaluating checkpoint at step %d", step)
    # Restore straight into the replicated mesh sharding (multi-host safe).
    state = ckpt.restore(step, template, sharding=rules.replicated)
    (fid, fid_std, inception_score, inception_score_std,
     ema_fid, ema_fid_std, ema_is, ema_is_std) = (
         eval_metric.calculate_inception_fid(generator, state, eval_rng))
    result = {
        "eval/fid": fid,
        "eval/fid_std": fid_std,
        "eval/inception_score": inception_score,
        "eval/inception_score_std": inception_score_std,
        "eval/ema_fid": ema_fid,
        "eval/ema_fid_std": ema_fid_std,
        "eval/ema_inception_score": ema_is,
        "eval/ema_inception_score_std": ema_is_std,
    }
    if jax.process_index() == 0:
      # One writer: every process polls/evaluates in lockstep (the FID
      # pools are gathered collectively), but the CSV append is host-side.
      task_manager.add_eval_result(step, result)
    writer.write_scalars(step, result)
  writer.flush()
  ckpt.close()
  log.info("Evaluation service finished.")
