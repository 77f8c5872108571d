"""GAN-algorithm registry.

The orchestrator selects the loss/update module by ``config.model_name``
(the reference hard-checks ``"xmc"`` at train_utils.py:325-328); the
registry keeps that extensible.
"""

from __future__ import annotations

import ml_collections

from xmcgan_image_generation_tpu.engine import xmc_gan

_ALGORITHMS = {"xmc": xmc_gan}


def get_gan_algorithm(config: ml_collections.ConfigDict):
  """Returns the module implementing train_d / train_g_d /
  create_additional_data."""
  if config.model_name not in _ALGORITHMS:
    raise NotImplementedError(
        f"GAN algorithm {config.model_name!r} is not implemented; "
        f"available: {sorted(_ALGORITHMS)}")
  return _ALGORITHMS[config.model_name]
