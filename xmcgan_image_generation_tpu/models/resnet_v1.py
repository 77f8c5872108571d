"""ResNet V1 feature towers (frozen-extractor family).

Capability parity with reference xmcgan/utils/resnet_v1.py:28-186: the
standard ResNet-v1 families 18..200, returning the final 7x7 spatial
feature map *and* the classification head — the pretrained image-image
contrastive loss consumes the head logits (reference xmc_gan.py:85-90).
Golden parameter counts (e.g. ResNet-50 = 25,557,032 @ 1000 classes) match
the reference's own regression test (utils/resnet_v1_test.py:27-40).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class BasicBlock(nn.Module):
  """Two 3x3 convs with identity/projection shortcut (ResNet-18/34)."""

  filters: int
  norm: Any
  strides: Tuple[int, int] = (1, 1)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    nn_conv = functools.partial(nn.Conv, dtype=self.dtype)
    residual = x
    y = nn_conv(self.filters, (3, 3), strides=self.strides, use_bias=False,
                name="conv1")(x)
    y = self.norm(name="bn1")(y)
    y = nn.relu(y)
    y = nn_conv(self.filters, (3, 3), use_bias=False, name="conv2")(y)
    # Zero-init the last BN scale (Fixup-style residual init).
    y = self.norm(scale_init=nn.initializers.zeros, name="bn2")(y)
    if residual.shape != y.shape:
      residual = nn_conv(self.filters, (1, 1), strides=self.strides,
                          use_bias=False, name="proj_conv")(residual)
      residual = self.norm(name="proj_bn")(residual)
    return nn.relu(residual + y)


class BottleneckBlock(nn.Module):
  """1x1 -> 3x3 -> 1x1 bottleneck (ResNet-50+)."""

  filters: int
  norm: Any
  strides: Tuple[int, int] = (1, 1)
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array) -> Array:
    nn_conv = functools.partial(nn.Conv, dtype=self.dtype)
    residual = x
    y = nn_conv(self.filters, (1, 1), use_bias=False, name="conv1")(x)
    y = self.norm(name="bn1")(y)
    y = nn.relu(y)
    y = nn_conv(self.filters, (3, 3), strides=self.strides, use_bias=False,
                name="conv2")(y)
    y = self.norm(name="bn2")(y)
    y = nn.relu(y)
    y = nn_conv(4 * self.filters, (1, 1), use_bias=False, name="conv3")(y)
    y = self.norm(name="bn3")(y)
    if residual.shape != y.shape:
      residual = nn_conv(4 * self.filters, (1, 1), strides=self.strides,
                          use_bias=False, name="proj_conv")(residual)
      residual = self.norm(name="proj_bn")(residual)
    return nn.relu(residual + y)


class ResNet(nn.Module):
  """ResNet V1 returning ``(spatial_features, logits)``.

  Attributes:
    num_classes: Classification head width.
    block_cls: `BasicBlock` or `BottleneckBlock`.
    stage_sizes: Blocks per stage.
    width_factor: Multiplier on the 64-channel stem width.
  """

  num_classes: int
  block_cls: Callable
  stage_sizes: Sequence[int]
  width_factor: int = 1
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, *, train: bool) -> Tuple[Array, Array]:
    width = 64 * self.width_factor
    norm = functools.partial(
        nn.BatchNorm, use_running_average=not train, momentum=0.9,
        dtype=self.dtype)
    conv = functools.partial(nn.Conv, dtype=self.dtype)
    x = x.astype(self.dtype)
    x = conv(width, (7, 7), strides=(2, 2), use_bias=False,
             name="init_conv")(x)
    x = norm(name="init_bn")(x)
    x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
    for i, stage_size in enumerate(self.stage_sizes):
      for j in range(stage_size):
        strides = (2, 2) if i > 0 and j == 0 else (1, 1)
        x = self.block_cls(
            filters=width * 2**i, norm=norm, strides=strides,
            dtype=self.dtype, name=f"stage{i + 1}_block{j + 1}")(x)
    pool = x
    out = jnp.mean(pool, axis=(1, 2))
    out = nn.Dense(self.num_classes, kernel_init=nn.initializers.zeros,
                   dtype=self.dtype, name="head")(out)
    return pool, out


ResNet18 = functools.partial(ResNet, stage_sizes=[2, 2, 2, 2],
                             block_cls=BasicBlock)
ResNet34 = functools.partial(ResNet, stage_sizes=[3, 4, 6, 3],
                             block_cls=BasicBlock)
ResNet50 = functools.partial(ResNet, stage_sizes=[3, 4, 6, 3],
                             block_cls=BottleneckBlock)
ResNet101 = functools.partial(ResNet, stage_sizes=[3, 4, 23, 3],
                              block_cls=BottleneckBlock)
ResNet152 = functools.partial(ResNet, stage_sizes=[3, 8, 36, 3],
                              block_cls=BottleneckBlock)
ResNet200 = functools.partial(ResNet, stage_sizes=[3, 24, 36, 3],
                              block_cls=BottleneckBlock)
