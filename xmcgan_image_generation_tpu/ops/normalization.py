"""Conditional batch normalization (global and spatially-local variants).

Capability parity with reference xmcgan/libml/layers.py:244-273.

Cross-replica semantics: the reference computes BatchNorm statistics over
the *per-device* batch by default, with an opt-in grouped cross-replica mode
(reference nets/xmc_net.py:192-201, utils/device_utils.py:18-26).  Under
GSPMD the batch is one logical array sharded over the ``data`` axis, so the
natural (and BigGAN-standard) behaviour is statistics over the *global*
batch — XLA inserts the cross-device reduction over ICI.  This framework
defaults to global-batch statistics; ``batch_norm_group_size > 0`` selects
`GroupedBatchNorm`, which reproduces the reference's grouped semantics in
*example space*: statistics over contiguous groups of ``group_size``
examples of the logical batch (device groups in the reference are exactly
contiguous example groups after its per-device sharding) — no explicit
collectives needed; XLA partitions the grouped reduction itself.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
from flax.linen.initializers import ones, zeros
import jax
import jax.numpy as jnp

Array = jnp.ndarray


class GroupedBatchNorm(nn.Module):
  """BatchNorm with statistics over fixed-size groups of examples.

  In training, the batch is split into contiguous groups of ``group_size``
  examples and each group is normalized with its own statistics (the
  "virtual batch" / grouped cross-replica BN of reference
  nets/xmc_net.py:192-201).  Running averages accumulate the *global*
  batch statistics and are used in inference mode.

  Attributes:
    group_size: Examples per statistics group (must divide the batch).
    use_running_average: Inference mode.
    momentum: Running-average momentum.
    epsilon: Variance floor.
    use_bias / use_scale: Learned affine parameters (off under the
      conditional modulation wrappers).
    dtype: Compute dtype.
  """

  group_size: int
  use_running_average: bool = False
  momentum: float = 0.9
  epsilon: float = 1e-5
  use_bias: bool = True
  use_scale: bool = True
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    features = x.shape[-1]
    ra_mean = self.variable("batch_stats", "mean",
                            lambda s: jnp.zeros(s, jnp.float32),
                            (features,))
    ra_var = self.variable("batch_stats", "var",
                           lambda s: jnp.ones(s, jnp.float32),
                           (features,))
    batch = x.shape[0]
    if batch % self.group_size:
      raise ValueError(
          f"batch {batch} not divisible by batch_norm_group_size="
          f"{self.group_size}")

    if self.use_running_average:
      mean = ra_mean.value.astype(jnp.float32)
      var = ra_var.value.astype(jnp.float32)
      x32 = x.astype(jnp.float32)
      y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
    else:
      num_groups = batch // self.group_size
      xg = x.astype(jnp.float32).reshape(
          (num_groups, self.group_size) + x.shape[1:])
      group_axes = tuple(range(1, xg.ndim - 1))
      g_mean = jnp.mean(xg, axis=group_axes, keepdims=True)
      g_sq = jnp.mean(jnp.square(xg), axis=group_axes, keepdims=True)
      g_var = g_sq - jnp.square(g_mean)
      y = (xg - g_mean) * jax.lax.rsqrt(g_var + self.epsilon)
      y = y.reshape(x.shape)
      if not self.is_initializing():
        # Running averages track the global-batch statistics.
        global_mean = jnp.mean(g_mean, axis=0).reshape(features)
        global_var = (jnp.mean(g_sq, axis=0)
                      - jnp.square(jnp.mean(g_mean, axis=0))).reshape(
                          features)
        ra_mean.value = (self.momentum * ra_mean.value
                         + (1 - self.momentum) * global_mean)
        ra_var.value = (self.momentum * ra_var.value
                        + (1 - self.momentum) * global_var)
    y = y.astype(self.dtype)
    if self.use_scale:
      y = y * self.param("scale", ones, (features,)).astype(self.dtype)
    if self.use_bias:
      y = y + self.param("bias", zeros, (features,)).astype(self.dtype)
    return y


class ConditionalBatchNorm(nn.Module):
  """BatchNorm modulated by per-sample (gamma, beta) from a dense embedding.

  ``x`` is normalized without learned scale/bias, then modulated as
  ``x * (gamma + 1) + beta`` where gamma/beta are linear in the conditioning
  vector (reference libml/layers.py:244-258).

  Attributes:
    norm_fn: Partially-applied `nn.BatchNorm` factory.
    dense_fn: Dense layer factory (spectral-norm or plain).
  """

  norm_fn: Any
  dense_fn: Any

  @nn.compact
  def __call__(self, x: Array, emb: Array) -> Array:
    filters = x.shape[-1]
    gamma = self.dense_fn(filters)(emb).reshape(-1, 1, 1, filters)
    beta = self.dense_fn(filters)(emb).reshape(-1, 1, 1, filters)
    x = self.norm_fn(use_bias=False, use_scale=False)(x)
    return x * (gamma + 1.0) + beta


class FusedSpatialModulation(nn.Module):
  """LocalConditionalBatchNorm computed at native conditioning resolution.

  Mathematically *identical* to the reference's pipeline — build
  ``spatial_cond = concat(upsample^k(region_ctx), tile(global_cond))`` and
  take gamma/beta as 1x1 convs of it (reference nets/xmc_net.py:233-241,
  libml/layers.py:261-273) — using two exact identities:

    conv1x1(nearest_up(x)) == nearest_up(conv1x1(x))
    conv1x1(concat(a, tile(g))) == conv1x1_a(a) + dense_g(g) broadcast

  so the modulation convs run on the 16x16 context map instead of the
  full-resolution concat (up to 1024 channels at 128x128 per block in the
  reference formulation), and the giant spatial_cond tensors are never
  materialized.  Parameter count is identical (one kernel split in two).

  Restriction: the identity requires PLAIN 1x1 convs.  Under spectral
  normalization the two split kernels would be normalized independently,
  which is NOT equal to jointly normalizing the reference's concat kernel —
  `Generator` therefore only selects this path when ``g_spectral_norm`` is
  off (the reference default) and otherwise uses the exact reference-layout
  `LocalConditionalBatchNorm` pipeline.

  Attributes:
    norm_fn / conv_fn / dense_fn: Layer factories.
    factor: Nearest-upsample factor from the context resolution to ``x``'s.
  """

  norm_fn: Any
  conv_fn: Any
  dense_fn: Any
  factor: int = 1

  @nn.compact
  def __call__(self, x: Array, region_ctx: Array,
               global_cond: Array) -> Array:
    from xmcgan_image_generation_tpu.ops.pooling import upsample

    filters = x.shape[-1]

    def modulation(name):
      local = self.conv_fn(filters, kernel_size=(1, 1), use_bias=False,
                           name=f"{name}_ctx")(region_ctx)
      if self.factor > 1:
        local = upsample(local, self.factor)
      glob = self.dense_fn(filters, name=f"{name}_global")(global_cond)
      return local + glob[:, None, None, :]

    gamma = modulation("gamma")
    beta = modulation("beta")
    x = self.norm_fn(use_bias=False, use_scale=False)(x)
    return x * (gamma + 1.0) + beta


class LocalConditionalBatchNorm(nn.Module):
  """BatchNorm with *spatial* modulation (attentional self-modulation).

  gamma/beta are 1x1 convs of a spatial conditioning map — each pixel gets
  its own affine modulation (reference libml/layers.py:261-273).

  Attributes:
    norm_fn: Partially-applied `nn.BatchNorm` factory.
    conv_fn: Conv layer factory (spectral-norm or plain).
  """

  norm_fn: Any
  conv_fn: Any

  @nn.compact
  def __call__(self, x: Array, emb: Array) -> Array:
    filters = x.shape[-1]
    gamma = self.conv_fn(filters, kernel_size=(1, 1))(emb)
    beta = self.conv_fn(filters, kernel_size=(1, 1))(emb)
    x = self.norm_fn(use_bias=False, use_scale=False)(x)
    return x * (gamma + 1.0) + beta
