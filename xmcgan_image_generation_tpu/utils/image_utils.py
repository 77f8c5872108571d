"""Image grid assembly and PNG export.

Parity with reference xmcgan/utils/image_utils.py:23-94 (`make_grid`,
`save_image`), without the legacy `jax.ops.index_update` path — grids are
plain numpy reshapes on host.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np


def make_grid(images: np.ndarray, max_images: int = 64) -> np.ndarray:
  """Tiles ``[N, H, W, C]`` into one ``[rows*H, cols*W, C]`` image.

  Uses the first ``min(N, max_images)`` images, arranged in the most
  square grid that fits.
  """
  images = np.asarray(images, np.float32)
  n = min(images.shape[0], max_images)
  images = images[:n]
  cols = int(math.ceil(math.sqrt(n)))
  rows = int(math.ceil(n / cols))
  _, h, w, c = images.shape
  pad = rows * cols - n
  if pad:
    images = np.concatenate(
        [images, np.zeros((pad, h, w, c), images.dtype)], axis=0)
  grid = images.reshape(rows, cols, h, w, c)
  grid = grid.transpose(0, 2, 1, 3, 4).reshape(rows * h, cols * w, c)
  return grid


def save_image(images: np.ndarray, path: str,
               max_images: Optional[int] = 64) -> None:
  """Writes a [0, 1] float image (or batch of images) to a PNG file.

  ``path`` may be local or remote (gs://...) — writes ride the fileio
  seam."""
  from PIL import Image  # Imported lazily; PIL only needed for export.

  from xmcgan_image_generation_tpu.utils import fileio

  images = np.asarray(images, np.float32)
  if images.ndim == 4:
    images = make_grid(images, max_images or images.shape[0])
  arr = np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8)
  if arr.shape[-1] == 1:
    arr = arr[..., 0]
  with fileio.open(path, "wb") as f:
    Image.fromarray(arr).save(f, format="PNG")
