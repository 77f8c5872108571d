"""The jitted outer training step: n-critic loop over a super-batch.

Parity with reference xmcgan/train_utils.py:69-130: the input pipeline
delivers a super-batch of ``d_step_per_g_step * batch_size`` examples; the
step splits it, runs ``d_step_per_g_step - 1`` discriminator-only updates,
then one joint G+D update.  The whole loop is unrolled inside a single
`jax.jit` over the mesh — one compiled SPMD program per outer step, no
per-substep dispatch.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import ml_collections

from xmcgan_image_generation_tpu.engine import xmc_gan
from xmcgan_image_generation_tpu.engine.state import TrainState

Array = jnp.ndarray
Batch = Dict[str, Array]


def split_batch(batch: Batch, splits: int, axis: int = 0) -> List[Batch]:
  """Splits every array in the batch into ``splits`` equal sub-batches.

  Parity with `split_input_dict` (reference train_utils.py:69-88).  Under
  GSPMD each sub-batch stays sharded over the data axis.
  """
  split_tree = jax.tree_util.tree_map(
      lambda x: jnp.split(x, splits, axis=axis), batch)
  return [
      {k: split_tree[k][i] for k in batch} for i in range(splits)
  ]


def train_step(
    rng: jax.Array,
    state: TrainState,
    batch: Batch,
    *,
    gan_model: Any = xmc_gan,
    generator: functools.partial,
    discriminator: functools.partial,
    config: ml_collections.ConfigDict,
    additional_data: Dict[str, Any],
) -> Tuple[TrainState, Dict[str, Array]]:
  """One outer step: (n-1) D updates + 1 joint G+D update.

  Parity with reference train_utils.py:91-130.
  """
  n = config.d_step_per_g_step
  rngs = jax.random.split(rng, n)
  sub_batches = split_batch(batch, n)
  for i in range(n - 1):
    state = gan_model.train_d(rngs[i], state, sub_batches[i], generator,
                              discriminator, config)
  state, metrics = gan_model.train_g_d(rngs[-1], state, sub_batches[-1],
                                       generator, discriminator, config,
                                       additional_data)
  return state, metrics
