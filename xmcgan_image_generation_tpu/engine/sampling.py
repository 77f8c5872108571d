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


def generate_sample(
    rng: jax.Array,
    state: TrainState,
    *,
    generator: functools.partial,
    config: ml_collections.ConfigDict,
    sample_size: int = 0,
) -> Dict[str, Array]:
  """Unconditional-style sampling from synthetic random conditions.

  Parity with `generate_sample` (reference xmcgan/train_utils.py:196-242),
  which draws random one-hot labels; the text-conditional model here needs
  a full condition dict, so random sentence/word features are synthesized
  from the rng.  Useful for quick visual sanity checks without data.
  """
  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  n = sample_size or min(config.show_num, config.batch_size)
  z_rng, s_rng, w_rng, l_rng = jax.random.split(rng, 4)
  bert_dim = 768
  text_len = 17
  batch = {
      "sentence_embedding": jax.random.normal(s_rng, (n, bert_dim), dtype),
      "embedding": jax.random.normal(w_rng, (n, text_len, bert_dim), dtype),
      "max_len": jax.random.randint(
          l_rng, (n, 1), 3, text_len + 1).astype(dtype),
      "image": jnp.zeros((n, config.image_size, config.image_size, 3),
                         dtype),
      "z": jax.random.normal(z_rng, (n, config.z_dim), dtype),
  }
  out = generate_batch(rng, state, batch, generator=generator,
                       config=config)
  del out["image"]
  return out


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
  from xmcgan_image_generation_tpu.ops.images import image_to_float

  return dict(
      generated_image=generated.astype(jnp.float32),
      ema_generated_image=ema_generated.astype(jnp.float32),
      image=image_to_float(batch["image"]),
  )
