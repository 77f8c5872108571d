"""Inference-mode sampling from the generator (normal + EMA weights).

Parity with `generate_batch` (reference xmcgan/train_utils.py:245-309).
Under GSPMD the output of the jitted sampler is already a global array, so
the reference's explicit `jax.lax.all_gather` for grid assembly
(train_utils.py:286-290) disappears — the host reads the logical array.
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import ml_collections

from xmcgan_image_generation_tpu.engine.state import TrainState

Array = jnp.ndarray


def generate_batch(
    rng: jax.Array,
    state: TrainState,
    batch: Dict[str, Array],
    *,
    generator: functools.partial,
    config: ml_collections.ConfigDict,
) -> Dict[str, Array]:
  """Generates images for a batch with both normal and EMA weights.

  Returns float32 images in [0, 1]: ``generated_image``,
  ``ema_generated_image`` and the pass-through ``image`` (real).
  """
  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  if "z" in batch:
    z = batch["z"].astype(dtype)
  else:
    z = jax.random.normal(
        rng, (batch["image"].shape[0], config.z_dim), dtype)
  g_variables = {"params": state.g_params, **state.generator_state}
  ema_variables = {"params": state.ema_params, **state.generator_state}
  generated = generator(train=False).apply(
      g_variables, (batch, z), mutable=False)
  ema_generated = generator(train=False).apply(
      ema_variables, (batch, z), mutable=False)
  return dict(
      generated_image=generated.astype(jnp.float32),
      ema_generated_image=ema_generated.astype(jnp.float32),
      image=batch["image"].astype(jnp.float32),
  )
