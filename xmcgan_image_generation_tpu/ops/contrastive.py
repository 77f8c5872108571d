"""Cross-modal contrastive (NT-Xent / InfoNCE) loss.

Capability parity with `contrastive_loss` in reference
xmcgan/libml/attention_lib.py:46-79, redesigned for SPMD:

* The whole computation runs under one jitted GSPMD program, so when the
  batch is sharded over the ``data`` mesh axis the similarity matmul
  gathers features across devices — the negative pool is the *global*
  batch.  This ships the ``sync_match`` behaviour the reference declared
  but left `NotImplementedError` (reference libml/attention_lib.py:58-59).
* Features are promoted to float32 before normalization: a temperature of
  0.1 amplifies bf16 rounding in the logits, and the two matmuls here are
  negligible next to the conv stacks.

An optional fused Pallas kernel covers the whole
l2norm -> similarity -> bidirectional CE pipeline
(`xmcgan_image_generation_tpu.ops.pallas.ntxent`).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from xmcgan_image_generation_tpu.ops import losses

Array = jnp.ndarray


def l2_normalize(x: Array, axis=None, epsilon: float = 1e-12) -> Array:
  """L2 normalization with the reference's max-clamped denominator.

  Matches reference libml/attention_lib.py:30-33 (rsqrt of
  ``max(sum(x^2), eps)``) rather than the additive-eps variant used by the
  spectral-norm power iteration.
  """
  square_sum = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
  return x * jax.lax.rsqrt(jnp.maximum(square_sum, epsilon))


def logit_statistics(logits: Array, labels: Array) -> Tuple[Array, Array]:
  """Diagnostics: top-1 accuracy and prediction entropy.

  Parity with `get_statistics` (reference libml/attention_lib.py:36-43).
  """
  prob = jax.nn.softmax(logits)
  entropy = -jnp.mean(jnp.sum(prob * jnp.log(prob + 1e-8), axis=-1))
  acc = jnp.argmax(logits, axis=-1) == jnp.argmax(labels, axis=-1)
  return jnp.mean(acc.astype(jnp.float32)), entropy


def nt_xent(
    feat_a: Array,
    feat_b: Array,
    *,
    l2_norm: bool = True,
    temperature: float = 0.1,
    use_pallas: bool = False,
    group_size: int = -1,
) -> Tuple[Array, Array, Array]:
  """Symmetric InfoNCE between two aligned feature batches.

  ``feat_a[i]`` and ``feat_b[i]`` are a positive pair; every other row in
  the (global) batch is a negative.

  Args:
    feat_a: ``[batch, dim]`` features (e.g. image pool).
    feat_b: ``[batch, dim]`` aligned features (e.g. sentence embedding).
    l2_norm: Normalize rows before the similarity matmul.
    temperature: Softmax temperature (0.1, reference
      libml/attention_lib.py:50).

  Returns:
    ``(loss, accuracy, entropy)`` scalars.  ``loss`` is the sum of the two
    directional cross entropies (a->b plus b->a), matching reference
    libml/attention_lib.py:64-79.

  ``group_size > 0`` restricts the negative pool to contiguous groups of
  that many examples (means of the per-group losses) — the *local*
  per-device negatives the reference's pmap induces (its default
  behavior), which under GSPMD sharding costs no cross-device traffic.
  The default (-1) is the global pool.
  """
  if group_size and group_size > 0:
    batch = feat_a.shape[0]
    if batch % group_size:
      raise ValueError(
          f"batch {batch} not divisible by contrastive group_size="
          f"{group_size}")
    groups = batch // group_size
    a = feat_a.reshape(groups, group_size, -1)
    b = feat_b.reshape(groups, group_size, -1)
    per_group = jax.vmap(functools.partial(
        nt_xent, l2_norm=l2_norm, temperature=temperature))
    loss, acc, ent = per_group(a, b)
    return jnp.mean(loss), jnp.mean(acc), jnp.mean(ent)

  if use_pallas and l2_norm:
    from xmcgan_image_generation_tpu.ops.pallas.ntxent import nt_xent_fused
    return nt_xent_fused(feat_a, feat_b, temperature)

  feat_a = feat_a.astype(jnp.float32)
  feat_b = feat_b.astype(jnp.float32)
  if l2_norm:
    feat_a = l2_normalize(feat_a, axis=-1)
    feat_b = l2_normalize(feat_b, axis=-1)
  batch = feat_a.shape[0]
  labels = jax.nn.one_hot(jnp.arange(batch), batch, dtype=jnp.float32)
  # Under GSPMD with feat_* sharded on the data axis this matmul induces an
  # all-gather over ICI: the negatives are the global batch.
  logits_ab = jnp.matmul(feat_a, feat_b.T,
                         preferred_element_type=jnp.float32) / temperature
  logits_ba = logits_ab.T
  loss_ab = jnp.mean(losses.softmax_cross_entropy(labels=labels,
                                                  logits=logits_ab))
  loss_ba = jnp.mean(losses.softmax_cross_entropy(labels=labels,
                                                  logits=logits_ba))
  loss = loss_ab + loss_ba
  acc_ab, ent_ab = logit_statistics(logits_ab, labels)
  acc_ba, ent_ba = logit_statistics(logits_ba, labels)
  return loss, 0.5 * (acc_ab + acc_ba), 0.5 * (ent_ab + ent_ba)


# Public alias matching the reference symbol name.
contrastive_loss = nt_xent
