"""Pooling / resampling primitives.

Capability parity with reference xmcgan/nets/common.py:23-55, with a TPU
fast path: the reference computes TF-compatible SAME-padding average
pooling as *two* `reduce_window` passes (sum + count) everywhere
(reference nets/common.py:39-45).  For the GAN's 2x2/stride-2 pooling on
even-sized maps no padding window ever straddles the border, so the count
is constant and one fused ``reduce_window * 0.25`` suffices — half the HBM
traffic on every discriminator downsample.  The general two-pass form is
kept for odd sizes (InceptionV3's 299x299 pyramid needs it, where the
padding-aware denominator shifts FID by whole points — reference
utils/inception_arch.py:49-67).
"""

from __future__ import annotations

from typing import Tuple

from jax import lax
import jax.numpy as jnp

Array = jnp.ndarray


def tf_avg_pool(x: Array, window_shape: Tuple[int, ...],
                strides: Tuple[int, ...], padding: str) -> Array:
  """TF-semantics average pooling (padding cells excluded from the mean).

  Args:
    x: ``[N, spatial..., C]`` input.
    window_shape: Spatial window, e.g. ``(2, 2)``.
    strides: Spatial strides, same rank as ``window_shape``.
    padding: ``'SAME'`` or ``'VALID'`` (case-insensitive).

  Returns:
    The pooled tensor.
  """
  padding = padding.upper()
  window = (1,) + tuple(window_shape) + (1,)
  stride = (1,) + tuple(strides) + (1,)
  spatial = x.shape[1:-1]

  # Fast path: no window ever overlaps padding => denominator is constant.
  # With SAME padding the last window starts at (ceil(s/st)-1)*st; padding is
  # only needed when it runs past the input.
  def _no_padding_needed(s: int, w: int, st: int) -> bool:
    out = -(-s // st)
    return (out - 1) * st + w <= s

  if padding == "VALID" or all(
      _no_padding_needed(s, w, st)
      for s, w, st in zip(spatial, window_shape, strides)):
    denom = 1.0
    for w in window_shape:
      denom *= w
    pooled = lax.reduce_window(x, 0.0, lax.add, window, stride, padding)
    return pooled / denom

  pool_sum = lax.reduce_window(x, 0.0, lax.add, window, stride, padding)
  pool_cnt = lax.reduce_window(
      jnp.ones_like(x), 0.0, lax.add, window, stride, padding)
  return pool_sum / pool_cnt


def upsample(x: Array, factor: int = 2) -> Array:
  """Nearest-neighbor 2x (or ``factor``x) spatial upsampling.

  Parity with reference nets/common.py:48-51.  Implemented as reshape +
  broadcast rather than `jax.image.resize`: for integer nearest-neighbor
  factors this lowers to a pure layout change XLA fuses into the following
  conv, with no gather.
  """
  n, h, w, c = x.shape
  x = jnp.broadcast_to(x[:, :, None, :, None, :],
                       (n, h, factor, w, factor, c))
  return x.reshape(n, h * factor, w * factor, c)


def dsample(x: Array) -> Array:
  """2x2 stride-2 average downsample (reference nets/common.py:54-55)."""
  return tf_avg_pool(x, (2, 2), strides=(2, 2), padding="SAME")
