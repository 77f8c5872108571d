"""One-shot sample generation from a trained checkpoint (``--mode=generate``).

A serving-path addition beyond the reference's surface: restore the latest
(or a given) checkpoint from a training workdir, run the generator on eval
captions with both normal and EMA weights, and write PNG grids to
``{workdir}/samples``.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import ml_collections

from xmcgan_image_generation_tpu.data import create_datasets
from xmcgan_image_generation_tpu.data.pipeline import host_batch_to_global
from xmcgan_image_generation_tpu.engine import create_train_state
from xmcgan_image_generation_tpu.engine.sampling import generate_batch
from xmcgan_image_generation_tpu.parallel import MeshRules, to_host
from xmcgan_image_generation_tpu.utils import fileio
from xmcgan_image_generation_tpu.utils import image_utils
from xmcgan_image_generation_tpu.utils.checkpoint import (
    CheckpointManager,
    checkpoints_dir,
)

log = logging.getLogger("xmcgan_tpu")


def generate(config: ml_collections.ConfigDict, workdir: str,
             step: Optional[int] = None, num_batches: int = 1) -> str:
  """Writes sample grids from a checkpoint; returns the output directory."""
  rules = MeshRules.create(config.get("mesh_data", -1),
                           config.get("mesh_model", 1))
  rng = jax.random.PRNGKey(config.seed)
  rng, model_rng, sample_rng = jax.random.split(rng, 3)

  _, eval_loader, _ = create_datasets(config, seed=config.seed)
  eval_iter = iter(eval_loader)
  init_batch = {k: jnp.asarray(v) for k, v in next(eval_iter).items()
                if k not in ("text", "filename")}
  generator, _, template = create_train_state(config, model_rng, init_batch)

  ckpt = CheckpointManager(checkpoints_dir(workdir), with_data_iter=False)
  step = step if step is not None else ckpt.latest_step()
  if step is None:
    raise FileNotFoundError(f"No checkpoints in {checkpoints_dir(workdir)}")
  state = ckpt.restore(step, template, sharding=rules.replicated)
  ckpt.close()
  log.info("Generating from checkpoint step %d", step)

  sample_fn = jax.jit(functools.partial(
      generate_batch, generator=generator, config=config))
  out_dir = fileio.join(workdir, "samples")
  fileio.makedirs(out_dir, exist_ok=True)
  for i in range(num_batches):
    batch = {k: v for k, v in next(eval_iter).items()
             if k not in ("text", "filename")}
    batch = host_batch_to_global(batch, rules.mesh)
    out = to_host(sample_fn(
        jax.random.fold_in(sample_rng, i), state, batch))
    if jax.process_index() != 0:
      continue
    for name in ("generated_image", "ema_generated_image", "image"):
      path = fileio.join(out_dir,
                          f"step{step:08d}_batch{i}_{name}.png")
      image_utils.save_image(out[name], path, config.show_num)
  log.info("Wrote samples to %s", out_dir)
  return out_dir
