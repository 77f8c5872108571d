"""InceptionV3 for FID / Inception-Score evaluation.

Capability parity with reference xmcgan/utils/inception_arch.py:70-405 (a
Flax transcription of Keras InceptionV3): returns the 2048-d pool feature
and the 1000-way logits.  Layer/branch naming follows the Keras ``mixedN``
scheme so converted Keras weights drop in (see
`utils/inception_weights.py`).  Average pooling inside the inception
branches uses TF SAME-padding semantics (padding cells excluded) — getting
this wrong shifts FID by whole points (reference inception_arch.py:49-67).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from xmcgan_image_generation_tpu.ops.pooling import tf_avg_pool

Array = jnp.ndarray


class ConvBN(nn.Module):
  """Conv -> BatchNorm(scale-free) -> ReLU, Keras-InceptionV3 style."""

  features: int
  kernel_size: Tuple[int, int]
  strides: Tuple[int, int] = (1, 1)
  padding: str = "SAME"
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    x = nn.Conv(
        self.features, self.kernel_size, strides=self.strides,
        padding=self.padding, use_bias=False, dtype=self.dtype,
        name="conv")(x)
    x = nn.BatchNorm(
        use_running_average=not train, use_scale=False, epsilon=1e-3,
        momentum=0.99, dtype=self.dtype, name="bn")(x)
    return nn.relu(x)


def _avg_pool_3x3_same(x: Array) -> Array:
  return tf_avg_pool(x, (3, 3), (1, 1), "SAME")


def _max_pool(x: Array, window=(3, 3), strides=(2, 2)) -> Array:
  return nn.max_pool(x, window, strides=strides, padding="VALID")


class InceptionA(nn.Module):
  """35x35 block (mixed0/1/2): 1x1, 5x5, double-3x3 and pool branches."""

  pool_features: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    cbn = lambda f, k, name: ConvBN(f, k, dtype=self.dtype, name=name)
    b0 = cbn(64, (1, 1), "b0_1x1")(x, train)
    b1 = cbn(48, (1, 1), "b1_1x1")(x, train)
    b1 = cbn(64, (5, 5), "b1_5x5")(b1, train)
    b2 = cbn(64, (1, 1), "b2_1x1")(x, train)
    b2 = cbn(96, (3, 3), "b2_3x3a")(b2, train)
    b2 = cbn(96, (3, 3), "b2_3x3b")(b2, train)
    b3 = _avg_pool_3x3_same(x)
    b3 = cbn(self.pool_features, (1, 1), "b3_1x1")(b3, train)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionB(nn.Module):
  """Reduction block to 17x17 (mixed3)."""

  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    cbn = lambda f, k, name, **kw: ConvBN(f, k, dtype=self.dtype,
                                          name=name, **kw)
    b0 = cbn(384, (3, 3), "b0_3x3", strides=(2, 2), padding="VALID")(x, train)
    b1 = cbn(64, (1, 1), "b1_1x1")(x, train)
    b1 = cbn(96, (3, 3), "b1_3x3a")(b1, train)
    b1 = cbn(96, (3, 3), "b1_3x3b", strides=(2, 2), padding="VALID")(
        b1, train)
    b2 = _max_pool(x)
    return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionC(nn.Module):
  """17x17 block with 7x1/1x7 factorized convs (mixed4..7)."""

  mid_channels: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    c = self.mid_channels
    cbn = lambda f, k, name: ConvBN(f, k, dtype=self.dtype, name=name)
    b0 = cbn(192, (1, 1), "b0_1x1")(x, train)
    b1 = cbn(c, (1, 1), "b1_1x1")(x, train)
    b1 = cbn(c, (1, 7), "b1_1x7")(b1, train)
    b1 = cbn(192, (7, 1), "b1_7x1")(b1, train)
    b2 = cbn(c, (1, 1), "b2_1x1")(x, train)
    b2 = cbn(c, (7, 1), "b2_7x1a")(b2, train)
    b2 = cbn(c, (1, 7), "b2_1x7a")(b2, train)
    b2 = cbn(c, (7, 1), "b2_7x1b")(b2, train)
    b2 = cbn(192, (1, 7), "b2_1x7b")(b2, train)
    b3 = _avg_pool_3x3_same(x)
    b3 = cbn(192, (1, 1), "b3_1x1")(b3, train)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionD(nn.Module):
  """Reduction block to 8x8 (mixed8)."""

  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    cbn = lambda f, k, name, **kw: ConvBN(f, k, dtype=self.dtype,
                                          name=name, **kw)
    b0 = cbn(192, (1, 1), "b0_1x1")(x, train)
    b0 = cbn(320, (3, 3), "b0_3x3", strides=(2, 2), padding="VALID")(
        b0, train)
    b1 = cbn(192, (1, 1), "b1_1x1")(x, train)
    b1 = cbn(192, (1, 7), "b1_1x7")(b1, train)
    b1 = cbn(192, (7, 1), "b1_7x1")(b1, train)
    b1 = cbn(192, (3, 3), "b1_3x3", strides=(2, 2), padding="VALID")(
        b1, train)
    b2 = _max_pool(x)
    return jnp.concatenate([b0, b1, b2], axis=-1)


class InceptionE(nn.Module):
  """8x8 block with split 1x3/3x1 branches (mixed9/10)."""

  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Array:
    cbn = lambda f, k, name: ConvBN(f, k, dtype=self.dtype, name=name)
    b0 = cbn(320, (1, 1), "b0_1x1")(x, train)
    b1 = cbn(384, (1, 1), "b1_1x1")(x, train)
    b1a = cbn(384, (1, 3), "b1_1x3")(b1, train)
    b1b = cbn(384, (3, 1), "b1_3x1")(b1, train)
    b1 = jnp.concatenate([b1a, b1b], axis=-1)
    b2 = cbn(448, (1, 1), "b2_1x1")(x, train)
    b2 = cbn(384, (3, 3), "b2_3x3")(b2, train)
    b2a = cbn(384, (1, 3), "b2_1x3")(b2, train)
    b2b = cbn(384, (3, 1), "b2_3x1")(b2, train)
    b2 = jnp.concatenate([b2a, b2b], axis=-1)
    b3 = _avg_pool_3x3_same(x)
    b3 = cbn(192, (1, 1), "b3_1x1")(b3, train)
    return jnp.concatenate([b0, b1, b2, b3], axis=-1)


class InceptionV3(nn.Module):
  """Full network; expects 299x299 inputs in [-1, 1].

  Returns ``(pool, logits)``: the 2048-d global-average pool and 1000-way
  logits (the FID feature and IS input, reference
  utils/inception_arch.py:70-405).
  """

  num_classes: int = 1000
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: Array, train: bool = False) -> Tuple[Array, Array]:
    cbn = lambda f, k, name, **kw: ConvBN(f, k, dtype=self.dtype,
                                          name=name, **kw)
    # Stem.
    x = cbn(32, (3, 3), "stem_conv0", strides=(2, 2), padding="VALID")(
        x, train)
    x = cbn(32, (3, 3), "stem_conv1", padding="VALID")(x, train)
    x = cbn(64, (3, 3), "stem_conv2")(x, train)
    x = _max_pool(x)
    x = cbn(80, (1, 1), "stem_conv3", padding="VALID")(x, train)
    x = cbn(192, (3, 3), "stem_conv4", padding="VALID")(x, train)
    x = _max_pool(x)
    # 35x35.
    x = InceptionA(32, dtype=self.dtype, name="mixed0")(x, train)
    x = InceptionA(64, dtype=self.dtype, name="mixed1")(x, train)
    x = InceptionA(64, dtype=self.dtype, name="mixed2")(x, train)
    # 17x17.
    x = InceptionB(dtype=self.dtype, name="mixed3")(x, train)
    x = InceptionC(128, dtype=self.dtype, name="mixed4")(x, train)
    x = InceptionC(160, dtype=self.dtype, name="mixed5")(x, train)
    x = InceptionC(160, dtype=self.dtype, name="mixed6")(x, train)
    x = InceptionC(192, dtype=self.dtype, name="mixed7")(x, train)
    # 8x8.
    x = InceptionD(dtype=self.dtype, name="mixed8")(x, train)
    x = InceptionE(dtype=self.dtype, name="mixed9")(x, train)
    x = InceptionE(dtype=self.dtype, name="mixed10")(x, train)
    pool = jnp.mean(x, axis=(1, 2))
    logits = nn.Dense(self.num_classes, name="predictions")(pool)
    return pool, logits
