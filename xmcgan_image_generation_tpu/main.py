"""CLI entry point.

Usage parity with the reference (reference xmcgan/main.py:31-64):

  python -m xmcgan_image_generation_tpu.main \\
      --config=xmcgan_image_generation_tpu/configs/coco_xmc.py \\
      --workdir=/tmp/exp --mode=train

``--mode=test`` runs the continuous-evaluation service against the same
workdir (the reference's test.sh path).  ``--config=<file>:test`` loads
``get_test_config`` via ml_collections' config-flags syntax.
"""

from __future__ import annotations

import logging

from absl import app
from absl import flags
import jax
from ml_collections import config_flags

FLAGS = flags.FLAGS

_CONFIG = config_flags.DEFINE_config_file(
    "config", None, "Training configuration.", lock_config=True)
_WORKDIR = flags.DEFINE_string("workdir", None, "Work unit directory.")
_MODE = flags.DEFINE_string(
    "mode", "train",
    "Mode: 'train', 'test' (continuous eval), 'generate' (write sample "
    "grids from the latest checkpoint), or 'export' (write standalone "
    "StableHLO serving artifacts from the latest checkpoint).")
_MULTIPROCESS = flags.DEFINE_bool(
    "multiprocess", False,
    "Call jax.distributed.initialize() for multi-controller runs.")
_BACKEND_TARGET = flags.DEFINE_string(
    "jax_backend_target", None,
    "JAX backend target (e.g. a remote runtime address) — passthrough "
    "parity with the reference (reference main.py:46-50).")
_XLA_BACKEND = flags.DEFINE_string(
    "jax_xla_backend", None,
    "JAX platform name to force (e.g. 'cpu', 'tpu').")
flags.mark_flags_as_required(["config", "workdir"])


def main(argv):
  del argv
  logging.basicConfig(
      level=logging.INFO,
      format="%(asctime)s %(levelname)s %(name)s: %(message)s")
  if _BACKEND_TARGET.value:
    jax.config.update("jax_backend_target", _BACKEND_TARGET.value)
  if _XLA_BACKEND.value:
    jax.config.update("jax_platforms", _XLA_BACKEND.value)
  if _MULTIPROCESS.value:
    jax.distributed.initialize()
  logging.info("JAX process: %d / %d", jax.process_index(),
               jax.process_count())
  logging.info("JAX devices: %r", jax.devices())

  config = _CONFIG.value
  workdir = _WORKDIR.value
  if _MODE.value == "train":
    from xmcgan_image_generation_tpu import train as train_lib
    train_lib.train(config, workdir)
  elif _MODE.value == "test":
    from xmcgan_image_generation_tpu import evaluate as eval_lib
    eval_lib.evaluate_continuously(config, workdir)
  elif _MODE.value == "generate":
    from xmcgan_image_generation_tpu import generate as gen_lib
    gen_lib.generate(config, workdir)
  elif _MODE.value == "export":
    # Process 0 only: concurrent writers on a shared filesystem would
    # tear the artifact files (same guard as --mode=generate).
    if jax.process_index() == 0:
      from xmcgan_image_generation_tpu.utils import serving
      for path in serving.export_from_workdir(config, workdir):
        logging.info("Wrote serving artifact %s", path)
  else:
    raise app.UsageError(f"Unknown --mode {_MODE.value!r}")


if __name__ == "__main__":
  app.run(main)
