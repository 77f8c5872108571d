"""Continuous-evaluation service (the reference's ``--mode=test`` path).

Capability parity with `test` (reference xmcgan/train_utils.py:464-514):
precompute real-image Inception statistics once, then poll the training
workdir for new checkpoints, score each (FID + IS, normal and EMA weights,
mean +- std over ``eval_avg_num`` repeats), append to ``scores.csv`` and the
metric writer, and exit on timeout or TRAIN_DONE.
"""

from __future__ import annotations

import logging

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


def _synchronized_steps(task_manager, timeout: int):
  """Yields checkpoint steps to evaluate, identically on every process.

  Each process polling the directory independently races (process 0 can
  score a checkpoint and append scores.csv before process 1 even lists
  it, leaving process 1 with nothing to evaluate while process 0 waits in
  the FID all-gather).  Process 0 is the single decision-maker; the step
  sequence is broadcast, with -1 as the end-of-service sentinel.
  """
  if jax.process_count() == 1:
    yield from task_manager.unevaluated_checkpoints(timeout=timeout)
    return
  from jax.experimental import multihost_utils

  if jax.process_index() == 0:
    for step in task_manager.unevaluated_checkpoints(timeout=timeout):
      multihost_utils.broadcast_one_to_all(np.int64(step))
      yield step
    multihost_utils.broadcast_one_to_all(np.int64(-1))
  else:
    while True:
      step = int(multihost_utils.broadcast_one_to_all(np.int64(0)))
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
