"""Architecture registry.

Parity with the selection at reference xmcgan/train_utils.py:154-158 —
``xmc_net`` is the shipped family; the registry makes adding others a
one-liner.
"""

from __future__ import annotations

import functools
from typing import Any, Tuple

import ml_collections

from xmcgan_image_generation_tpu.models import xmc_net

_ARCHITECTURES = {
    "xmc_net": (xmc_net.Generator, xmc_net.Discriminator),
}


def get_architecture(
    config: ml_collections.ConfigDict, dtype: Any
) -> Tuple[functools.partial, functools.partial]:
  """Returns partially-applied (generator, discriminator) module factories.

  Each factory takes ``train=...`` and yields a linen module, mirroring the
  calling convention of the reference (xmcgan/train_utils.py:159-161).
  """
  if config.architecture not in _ARCHITECTURES:
    raise ValueError(
        f"Architecture {config.architecture!r} is not supported; "
        f"available: {sorted(_ARCHITECTURES)}")
  gen_cls, disc_cls = _ARCHITECTURES[config.architecture]
  generator = functools.partial(gen_cls, config=config, dtype=dtype)
  discriminator = functools.partial(disc_cls, config=config, dtype=dtype)
  return generator, discriminator
