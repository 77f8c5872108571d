"""On-device image dtype normalization.

The input pipeline ships images as ``uint8`` (see
data/preprocessing.py): the host-side resize always quantizes through
uint8 anyway, so transporting the quantized bytes and dividing by 255 on
device is bit-identical to the float pipeline while moving 4x fewer
bytes through worker IPC and host->HBM transfer.  The division fuses
into the first consumer op under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def image_to_float(x: Array, dtype=jnp.float32) -> Array:
  """``uint8 [0, 255]`` or ``float [0, 1]`` image -> float ``[0, 1]``.

  Accepts either transport dtype so every consumer works with both the
  uint8 (default) and the legacy float32 loader output.
  """
  if x.dtype == jnp.uint8:
    return x.astype(dtype) / jnp.asarray(255.0, dtype)
  return x.astype(dtype)
