"""Region-word attention and the AttnGAN-style word matching loss.

Capability parity with reference xmcgan/libml/attention_lib.py:82-219,
redesigned for the TPU:

* `word_loss` is a single batched einsum program over the full
  caption x image score matrix instead of the reference's `jax.vmap` over
  per-caption tiled copies (reference libml/attention_lib.py:150-169).
  Same math, but XLA sees one fused [B, B, R, L] contraction pipeline it
  can tile onto the MXU, and under GSPMD the caption axis shards over the
  ``data`` mesh axis so the B^2 blow-up splits across devices.
* Softmax/logsumexp/normalization run in float32 and matmuls accumulate in
  float32 (matmul *inputs* use the backend's default precision — bf16 on
  the MXU — which is the standard TPU speed/accuracy point); the attention
  sharpening gammas (5/15/50) make f32 accumulation matter.
* Masked positions use an additive ``-1e9`` before softmax/logsumexp, as
  the reference does; cosine denominators are eps-guarded so zero padding
  vectors cannot produce NaNs (the reference divides unguarded,
  libml/attention_lib.py:23-27).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from xmcgan_image_generation_tpu.ops import losses
from xmcgan_image_generation_tpu.ops.contrastive import (
    l2_normalize,
    logit_statistics,
)

Array = jnp.ndarray
NEG_INF = -1e9


def _constrain_caption_rows(x: Array) -> Array:
  """Pins dim 0 (the caption axis) of a word-loss intermediate to the
  ``data`` mesh axis.

  Left to propagation alone, GSPMD can replicate the [B, B, ...]
  contraction chain onto every device (observed at flagship shapes:
  a per-device f32[64, 64, 16, 192] — tests/test_multichip_aot.py
  exists to catch exactly this).  With the constraint each device keeps
  its caption rows and all-gathers only the [B, R, D] normalized region
  features.  No-op without an ambient mesh or when the batch doesn't
  divide the data axis.
  """
  from xmcgan_image_generation_tpu.parallel import context as mesh_context
  from xmcgan_image_generation_tpu.parallel import mesh as mesh_lib

  mesh = mesh_context.get_ambient_mesh()
  if mesh is None:
    return x
  data = int(mesh.shape.get(mesh_lib.DATA_AXIS, 1))
  if data <= 1 or x.shape[0] % data:
    return x
  spec = jax.sharding.PartitionSpec(
      mesh_lib.DATA_AXIS, *([None] * (x.ndim - 1)))
  return jax.lax.with_sharding_constraint(
      x, jax.sharding.NamedSharding(mesh, spec))


def padding_mask(max_len: Array, total_len: int) -> Array:
  """``[batch, total_len]`` float mask, 1.0 at padding word positions.

  ``max_len`` is the per-example true caption length (float or int,
  possibly shaped ``[batch]`` or ``[batch, 1]``).  Matches the mask the
  reference builds inline (reference nets/xmc_net.py:225-228).
  """
  max_len = jnp.reshape(max_len, (-1, 1)).astype(jnp.float32)
  positions = jnp.arange(total_len, dtype=jnp.float32)[None, :]
  return (positions >= max_len).astype(jnp.float32)


def cosine_similarity(x1: Array, x2: Array) -> Array:
  """Row-wise cosine similarity (reference libml/attention_lib.py:23-27,
  with an eps-guarded denominator)."""
  dot = jnp.sum(x1 * x2, axis=-1)
  norm = jnp.linalg.norm(x1, axis=-1) * jnp.linalg.norm(x2, axis=-1)
  return dot / jnp.maximum(norm, 1e-12)


def attention(region_feat: Array, word_feat: Array, gamma: float,
              mask: Optional[Array] = None) -> Array:
  """Region attention *for each word* (softmax over regions).

  Returns per-word region context built from the normalized region
  features; the inner op of `word_loss`.  Parity with reference
  libml/attention_lib.py:105-127.
  """
  rn = l2_normalize(region_feat.astype(jnp.float32), axis=-1)
  wn = l2_normalize(word_feat.astype(jnp.float32), axis=-1)
  logits = jnp.einsum("brd,bwd->brw", rn, wn,
                      preferred_element_type=jnp.float32) * gamma
  if mask is not None:
    if mask.ndim == 2:
      mask = mask[:, None, :]
    logits = logits + mask.astype(jnp.float32) * NEG_INF
  alpha = jax.nn.softmax(logits, axis=1)  # over regions
  return jnp.einsum("brw,brd->bwd", alpha, rn,
                    preferred_element_type=jnp.float32)


def attention_for_word(
    image_feat: Array,
    word_feat: Array,
    mask: Optional[Array] = None,
    l2_norm: bool = True,
    temperature: float = 0.1,
) -> Array:
  """Word context per region with a plain temperature softmax over words.

  Parity with the reference's (unused but public) helper
  libml/attention_lib.py:82-102.
  """
  if l2_norm:
    image_feat = l2_normalize(image_feat.astype(jnp.float32), axis=-1)
    word_feat = l2_normalize(word_feat.astype(jnp.float32), axis=-1)
  logits = jnp.einsum("brd,bwd->brw", image_feat, word_feat,
                      preferred_element_type=jnp.float32) / temperature
  if mask is not None:
    if mask.ndim == 2:
      mask = mask[:, None, :]
    logits = logits + mask.astype(jnp.float32) * NEG_INF
  attn = jax.nn.softmax(logits, axis=-1)
  return jnp.einsum("brw,bwd->brd", attn, word_feat,
                    preferred_element_type=jnp.float32)


def attention_for_g(
    region_feat: Array,
    word_feat: Array,
    gamma: float,
    mask: Optional[Array] = None,
) -> Tuple[Array, Array]:
  """Word context for each image region (generator side).

  For every region, attends over the words of the *aligned* caption with a
  sharpened softmax and returns the attention-weighted combination of the
  normalized word features.  Parity with reference
  libml/attention_lib.py:194-219.

  Args:
    region_feat: ``[batch, regions, dim]``.
    word_feat: ``[batch, words, dim]``.
    gamma: Softmax sharpening factor (15 for the generator).
    mask: Optional ``[batch, words]`` or ``[batch, regions, words]`` float
      mask, 1.0 at padding words.

  Returns:
    ``(region_context, attn)`` with shapes ``[batch, regions, dim]`` and
    ``[batch, regions, words]``.
  """
  rn = l2_normalize(region_feat.astype(jnp.float32), axis=-1)
  wn = l2_normalize(word_feat.astype(jnp.float32), axis=-1)
  logits = jnp.einsum("brd,bwd->brw", rn, wn,
                      preferred_element_type=jnp.float32) * gamma
  if mask is not None:
    if mask.ndim == 2:
      mask = mask[:, None, :]
    logits = logits + mask.astype(jnp.float32) * NEG_INF
  attn = jax.nn.softmax(logits, axis=-1)
  region_context = jnp.einsum("brw,bwd->brd", attn, wn,
                              preferred_element_type=jnp.float32)
  return region_context, attn


def word_loss(
    region_feat: Array,
    word_feat: Array,
    max_len: Array,
    gamma1: float = 5.0,
    gamma2: float = 5.0,
    gamma3: float = 50.0,
    use_pallas: bool = False,
    group_size: int = -1,
    constrain_sharding: bool = True,
) -> Tuple[Array, Array, Array]:
  """AttnGAN word-region matching loss over the full batch.

  Scores every (image i, caption j) pair: each word of caption j attends
  over image i's regions (softmax over regions, sharpened by ``gamma1``),
  per-word cosine similarities are aggregated with a masked
  ``logsumexp / gamma2`` soft-max, and the resulting ``[B, B]`` score
  matrix (scaled by ``gamma3``) feeds a symmetric cross entropy with the
  diagonal as positives.  Parity with reference
  libml/attention_lib.py:130-191 (including its quirks: region context is
  built from *normalized* region features, and accuracy/entropy are
  averaged over both directions).

  Args:
    region_feat: ``[B, R, D]`` image region features.
    word_feat: ``[B, L, D]`` word features of the aligned captions.
    max_len: ``[B]`` or ``[B, 1]`` true caption lengths.
    gamma1: Region-attention sharpening (AttnGAN gamma1).
    gamma2: Word-aggregation sharpening (AttnGAN gamma2).
    gamma3: Score-matrix scale (AttnGAN gamma3).

  Returns:
    ``(loss, accuracy, entropy)`` scalars.

  ``group_size > 0`` restricts matching to contiguous example groups (the
  reference's per-device local pools); -1 matches over the global batch.
  """
  if group_size and group_size > 0:
    batch = region_feat.shape[0]
    if batch % group_size:
      raise ValueError(
          f"batch {batch} not divisible by contrastive group_size="
          f"{group_size}")
    groups = batch // group_size
    # Grouped mode stays on the XLA path (pallas_call is not vmappable);
    # sharding constraints don't apply under vmap's batched tracing.
    per_group = jax.vmap(
        lambda r, w, m: word_loss(r, w, m, gamma1, gamma2, gamma3,
                                  constrain_sharding=False))
    loss, acc, ent = per_group(
        region_feat.reshape((groups, group_size) + region_feat.shape[1:]),
        word_feat.reshape((groups, group_size) + word_feat.shape[1:]),
        jnp.reshape(max_len, (groups, group_size, -1)))
    return jnp.mean(loss), jnp.mean(acc), jnp.mean(ent)

  batch, _, _ = region_feat.shape
  total_len = word_feat.shape[1]
  # mask[j, w]: 1.0 where word w of caption j is padding.
  mask = padding_mask(max_len, total_len)

  if use_pallas:
    from xmcgan_image_generation_tpu.ops.pallas.word_scores import (
        make_sharded_word_scores,
        word_scores,
    )
    from xmcgan_image_generation_tpu.parallel import context as mesh_context
    from xmcgan_image_generation_tpu.parallel import mesh as mesh_lib

    mesh = mesh_context.get_ambient_mesh()
    data_size = (int(mesh.shape.get(mesh_lib.DATA_AXIS, 1))
                 if mesh is not None else 1)
    if data_size > 1 and batch % data_size == 0:
      # Explicit shard_map dispatch over the ambient mesh: each device
      # runs the kernel on its image shard against the all-gathered
      # captions, producing its rows of the [B, B] score matrix — no
      # redundant whole-batch grids per device, no all-gather of the
      # [B, R, D] region features.
      scores_fn = make_sharded_word_scores(
          mesh, gamma1=gamma1, gamma2=gamma2)
      scores_ji = scores_fn(region_feat, word_feat, mask) * gamma3
    else:
      scores_ji = word_scores(region_feat, word_feat, mask, gamma1,
                              gamma2) * gamma3
    return _word_loss_from_scores(scores_ji)

  rn = l2_normalize(region_feat.astype(jnp.float32), axis=-1)
  wn = l2_normalize(word_feat.astype(jnp.float32), axis=-1)

  # sim[j, i, r, w] = <region r of image i, word w of caption j>.
  sim = jnp.einsum("ird,jwd->jirw", rn, wn,
                   preferred_element_type=jnp.float32)
  if constrain_sharding:
    sim = _constrain_caption_rows(sim)
  attn_logits = sim * gamma1 + mask[:, None, None, :] * NEG_INF
  # Attention over regions for each word (reference attention(),
  # libml/attention_lib.py:105-127: softmax over axis=-2).
  alpha = jax.nn.softmax(attn_logits, axis=2)
  # Per-word region context, built from the normalized region features.
  context = jnp.einsum("jirw,ird->jiwd", alpha, rn,
                       preferred_element_type=jnp.float32)
  if constrain_sharding:
    context = _constrain_caption_rows(context)
  # Cosine similarity word <-> its context (|wn| == 1 after normalize).
  num = jnp.einsum("jiwd,jwd->jiw", context, wn,
                   preferred_element_type=jnp.float32)
  ctx_sq = jnp.sum(jnp.square(context), axis=-1)
  row_sim = num * jax.lax.rsqrt(jnp.maximum(ctx_sq, 1e-12))
  # Masked soft aggregation over words: logsumexp(gamma2 * sim) / gamma2.
  row_sim = row_sim * gamma2 + mask[:, None, :] * NEG_INF
  scores_ji = jax.nn.logsumexp(row_sim, axis=-1) / gamma2  # [caption, image]
  return _word_loss_from_scores(scores_ji * gamma3)


def _word_loss_from_scores(
    scores_ji: Array) -> Tuple[Array, Array, Array]:
  """Symmetric CE + stats on the [caption, image] score matrix."""
  batch = scores_ji.shape[0]
  scores_ij = scores_ji.T
  labels = jax.nn.one_hot(jnp.arange(batch), batch, dtype=jnp.float32)
  loss_i2c = jnp.mean(losses.softmax_cross_entropy(labels=labels,
                                                   logits=scores_ij))
  loss_c2i = jnp.mean(losses.softmax_cross_entropy(labels=labels,
                                                   logits=scores_ji))
  loss = loss_i2c + loss_c2i
  acc_ij, ent_ij = logit_statistics(scores_ij, labels)
  acc_ji, ent_ji = logit_statistics(scores_ji, labels)
  return loss, 0.5 * (acc_ij + acc_ji), 0.5 * (ent_ij + ent_ji)
