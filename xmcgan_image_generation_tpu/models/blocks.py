"""Residual generator/discriminator blocks.

Capability parity with reference xmcgan/nets/common.py:58-187 (DiscBlock,
DiscBlockDeep, DiscOptimizedBlock, GenBlock, GenSpatialBlock).  Layout is
NHWC throughout — the native TPU conv layout — and every block is shape-
static so XLA can tile the 3x3 convs onto the MXU without re-specialization.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from xmcgan_image_generation_tpu.ops.normalization import (
    ConditionalBatchNorm,
    FusedSpatialModulation,
    LocalConditionalBatchNorm,
)
from xmcgan_image_generation_tpu.ops.pooling import dsample, upsample

Array = jnp.ndarray


class DiscBlock(nn.Module):
  """Pre-activation residual block with optional 2x downsample.

  Parity with reference nets/common.py:58-79: act-conv3-act-conv3 trunk, a
  1x1 projection shortcut when downsampling or changing width, and average-
  pool downsampling applied to both branches after the convs.
  """

  filters: int
  downsample: bool
  conv_fn: Any
  activation_fn: Any = nn.relu
  dtype: Any = jnp.float32
  scale_fuse: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    needs_projection = self.downsample or x.shape[-1] != self.filters
    shortcut = x
    x = self.activation_fn(x)
    x = self.conv_fn(self.filters, kernel_size=(3, 3))(x)
    x = self.activation_fn(x)
    if self.scale_fuse and self.downsample:
      # Fold the trailing 2x2 average pool into this conv (one 4x4
      # stride-2 conv — ops/scale_fuse.py), and pool the shortcut BEFORE
      # its 1x1 projection (linear ops commute; 4x cheaper projection).
      x = self.conv_fn(self.filters, kernel_size=(3, 3),
                       scale_op="pool")(x)
      shortcut = dsample(shortcut)
      if needs_projection:
        shortcut = self.conv_fn(self.filters, kernel_size=(1, 1))(shortcut)
    else:
      x = self.conv_fn(self.filters, kernel_size=(3, 3))(x)
      if needs_projection:
        shortcut = self.conv_fn(self.filters, kernel_size=(1, 1))(shortcut)
      if self.downsample:
        x = dsample(x)
        shortcut = dsample(shortcut)
    return x + shortcut


class DiscBlockDeep(nn.Module):
  """Bottleneck discriminator block (BigGAN-deep style).

  Parity with reference nets/common.py:82-114.  Unused by xmc_net's default
  schedule but part of the block library's public surface.
  """

  filters: int
  downsample: bool
  conv_fn: Any
  bottleneck_ratio: int = 4
  activation_fn: Any = nn.relu
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    in_channels = x.shape[-1]
    hidden = self.filters // self.bottleneck_ratio
    residual = x
    x = self.activation_fn(x)
    x = self.conv_fn(hidden, kernel_size=(1, 1), name="conv0")(x)
    x = self.activation_fn(x)
    x = self.conv_fn(hidden, kernel_size=(3, 3), name="conv1")(x)
    x = self.activation_fn(x)
    x = self.conv_fn(hidden, kernel_size=(3, 3), name="conv2")(x)
    x = self.activation_fn(x)
    if self.downsample:
      residual = dsample(residual)
      x = dsample(x)
    x = self.conv_fn(self.filters, kernel_size=(1, 1), name="conv3")(x)
    if in_channels != self.filters:
      extra = self.conv_fn(
          self.filters - in_channels, kernel_size=(1, 1),
          name="conv_sc")(residual)
      residual = jnp.concatenate([residual, extra], axis=-1)
    return x + residual


class DiscOptimizedBlock(nn.Module):
  """First discriminator block (conv before activation, as in SNGAN).

  Parity with reference nets/common.py:117-133.
  """

  filters: int
  conv_fn: Any
  activation_fn: Any = nn.relu
  dtype: Any = jnp.float32
  scale_fuse: bool = False

  @nn.compact
  def __call__(self, x: Array) -> Array:
    shortcut = x
    x = self.conv_fn(self.filters, kernel_size=(3, 3))(x)
    x = self.activation_fn(x)
    if self.scale_fuse:
      x = self.conv_fn(self.filters, kernel_size=(3, 3),
                       scale_op="pool")(x)
    else:
      x = self.conv_fn(self.filters, kernel_size=(3, 3))(x)
      x = dsample(x)
    shortcut = dsample(shortcut)
    shortcut = self.conv_fn(self.filters, kernel_size=(1, 1))(shortcut)
    return x + shortcut


class GenBlock(nn.Module):
  """Upsampling generator block with global conditional BatchNorm.

  Parity with reference nets/common.py:136-160: CBN-act-up-conv3,
  CBN-act-conv3, plus an upsample+1x1 shortcut.

  ``scale_fuse`` folds the upsample into the first conv (2.25x fewer
  FLOPs, 4x less input bandwidth — ops/scale_fuse.py) and reorders the
  1x1 shortcut before its upsample (bit-identical, 4x cheaper); the
  param tree is unchanged.
  """

  filters: int
  conv_fn: Any
  dense_fn: Any
  norm_fn: Any
  activation_fn: Any = nn.relu
  dtype: Any = jnp.float32
  scale_fuse: bool = False

  @nn.compact
  def __call__(self, x: Array, cond: Array) -> Array:
    shortcut = x
    x = ConditionalBatchNorm(
        norm_fn=self.norm_fn, dense_fn=self.dense_fn)(x, cond)
    x = self.activation_fn(x)
    if self.scale_fuse:
      x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True,
                       scale_op="up")(x)
    else:
      x = upsample(x)
      x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True)(x)
    x = ConditionalBatchNorm(
        norm_fn=self.norm_fn, dense_fn=self.dense_fn)(x, cond)
    x = self.activation_fn(x)
    x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True)(x)
    if self.scale_fuse:
      shortcut = self.conv_fn(
          self.filters, kernel_size=(1, 1), use_bias=True)(shortcut)
      shortcut = upsample(shortcut)
    else:
      shortcut = upsample(shortcut)
      shortcut = self.conv_fn(
          self.filters, kernel_size=(1, 1), use_bias=True)(shortcut)
    return x + shortcut


class GenSpatialBlockFused(nn.Module):
  """`GenSpatialBlock` with native-resolution spatial modulation.

  Exactly the reference block's function (see `FusedSpatialModulation`)
  but conditioned directly on the 16x16 region-context map and the global
  vector — the progressively-upsampled ``spatial_cond`` tensors of the
  reference never exist.  ``factor`` is the input resolution over the
  context resolution.
  """

  filters: int
  conv_fn: Any
  dense_fn: Any
  norm_fn: Any
  factor: int
  activation_fn: Any = nn.relu
  dtype: Any = jnp.float32
  scale_fuse: bool = False

  @nn.compact
  def __call__(self, x: Array, region_ctx: Array,
               global_cond: Array) -> Array:
    shortcut = x
    x = FusedSpatialModulation(
        norm_fn=self.norm_fn, conv_fn=self.conv_fn,
        dense_fn=self.dense_fn, factor=self.factor)(
            x, region_ctx, global_cond)
    x = self.activation_fn(x)
    if self.scale_fuse:
      x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True,
                       scale_op="up")(x)
    else:
      x = upsample(x)
      x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True)(x)
    x = FusedSpatialModulation(
        norm_fn=self.norm_fn, conv_fn=self.conv_fn,
        dense_fn=self.dense_fn, factor=2 * self.factor)(
            x, region_ctx, global_cond)
    x = self.activation_fn(x)
    x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True)(x)
    if self.scale_fuse:
      shortcut = self.conv_fn(
          self.filters, kernel_size=(1, 1), use_bias=True)(shortcut)
      shortcut = upsample(shortcut)
    else:
      shortcut = upsample(shortcut)
      shortcut = self.conv_fn(
          self.filters, kernel_size=(1, 1), use_bias=True)(shortcut)
    return x + shortcut


class GenSpatialBlock(nn.Module):
  """Upsampling generator block with spatially-local conditional BatchNorm.

  Takes two conditioning maps — one at the input resolution, one at the
  (2x) output resolution.  Parity with reference nets/common.py:163-186.
  """

  filters: int
  conv_fn: Any
  dense_fn: Any
  norm_fn: Any
  activation_fn: Any = nn.relu
  dtype: Any = jnp.float32
  scale_fuse: bool = False

  @nn.compact
  def __call__(self, x: Array, cond_in: Array, cond_out: Array) -> Array:
    shortcut = x
    x = LocalConditionalBatchNorm(
        norm_fn=self.norm_fn, conv_fn=self.conv_fn)(x, cond_in)
    x = self.activation_fn(x)
    if self.scale_fuse:
      x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True,
                       scale_op="up")(x)
    else:
      x = upsample(x)
      x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True)(x)
    x = LocalConditionalBatchNorm(
        norm_fn=self.norm_fn, conv_fn=self.conv_fn)(x, cond_out)
    x = self.activation_fn(x)
    x = self.conv_fn(self.filters, kernel_size=(3, 3), use_bias=True)(x)
    if self.scale_fuse:
      shortcut = self.conv_fn(
          self.filters, kernel_size=(1, 1), use_bias=True)(shortcut)
      shortcut = upsample(shortcut)
    else:
      shortcut = upsample(shortcut)
      shortcut = self.conv_fn(
          self.filters, kernel_size=(1, 1), use_bias=True)(shortcut)
    return x + shortcut
