"""Export a trained generator as a standalone StableHLO serving artifact.

Restores a checkpoint from a training workdir and writes, per weight set
(EMA and/or normal), a ``jax.export`` serialization plus a JSON sidecar
describing the input/output interface.  The artifact runs on any PJRT
runtime via ``jax.export.deserialize(data).call(...)`` — no framework,
Flax modules, or checkpoint needed at serving time.

Usage (defaults: EMA weights, symbolic batch dimension):
  python tools/export_serving.py --workdir /path/to/run \\
      [--config_module coco_xmc[:variant]] [--step N] [--batch_size N] \\
      [--weights ema|normal|both] [--platforms tpu,cpu] [--out DIR]
"""

import argparse
import importlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def load_config(spec: str):
  module, _, variant = spec.partition(":")
  mod = importlib.import_module(
      f"xmcgan_image_generation_tpu.configs.{module}")
  return mod.get_config(variant) if variant else mod.get_config()


def synthesize_init_batch(config, batch=2):
  """A template batch for model init — shapes only, no data needed."""
  from xmcgan_image_generation_tpu.utils.serving import (
      BERT_DIM, COCO_MAX_TEXT_LENGTH)
  s = config.image_size
  return {
      "image": jnp.zeros((batch, s, s, 3), jnp.float32),
      "sentence_embedding": jnp.zeros((batch, BERT_DIM), jnp.float32),
      "embedding": jnp.zeros((batch, COCO_MAX_TEXT_LENGTH, BERT_DIM),
                             jnp.float32),
      "max_len": jnp.full((batch, 1), float(COCO_MAX_TEXT_LENGTH),
                          jnp.float32),
      "z": jnp.zeros((batch, config.z_dim), jnp.float32),
  }


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--workdir", required=True)
  p.add_argument("--config_module", default="coco_xmc",
                 help="configs/<module>[:variant], e.g. coco_xmc_256")
  p.add_argument("--step", type=int, default=None,
                 help="checkpoint step (default: latest)")
  p.add_argument("--batch_size", type=int, default=0,
                 help="static batch size; 0 = symbolic (any batch)")
  p.add_argument("--weights", choices=("ema", "normal", "both"),
                 default="ema")
  p.add_argument("--platforms", default="",
                 help="comma-separated lowering targets, e.g. tpu,cpu")
  p.add_argument("--out", default=None,
                 help="output dir (default: {workdir}/serving)")
  args = p.parse_args()

  from xmcgan_image_generation_tpu.engine import create_train_state
  from xmcgan_image_generation_tpu.parallel import MeshRules
  from xmcgan_image_generation_tpu.utils import serving
  from xmcgan_image_generation_tpu.utils.checkpoint import (
      CheckpointManager, checkpoints_dir)

  config = load_config(args.config_module)
  rules = MeshRules.create(config.get("mesh_data", -1),
                           config.get("mesh_model", 1))
  generator, _, template = create_train_state(
      config, jax.random.PRNGKey(config.seed),
      synthesize_init_batch(config))

  ckpt = CheckpointManager(checkpoints_dir(args.workdir),
                           with_data_iter=False)
  step = args.step if args.step is not None else ckpt.latest_step()
  if step is None:
    raise FileNotFoundError(
        f"No checkpoints in {checkpoints_dir(args.workdir)}")
  state = ckpt.restore(step, template, sharding=rules.replicated)
  ckpt.close()

  out_dir = args.out or os.path.join(args.workdir, "serving")
  os.makedirs(out_dir, exist_ok=True)
  batch = args.batch_size or None
  platforms = tuple(s for s in args.platforms.split(",") if s) or None

  names = {"ema": ["ema"], "normal": ["normal"],
           "both": ["ema", "normal"]}[args.weights]
  for name in names:
    params = state.ema_params if name == "ema" else state.g_params
    variables = {"params": params, **state.generator_state}
    exported = serving.export_generator(
        generator, variables, config, batch_size=batch, platforms=platforms)
    base = os.path.join(out_dir, f"generator_{name}_step{step:08d}")
    with open(base + ".stablehlo", "wb") as f:
      f.write(bytes(exported.serialize()))
    with open(base + ".json", "w") as f:
      f.write(serving.artifact_metadata(
          config, weights=name, step=step, batch_size=batch))
    print(f"wrote {base}.stablehlo "
          f"({os.path.getsize(base + '.stablehlo') / 1e6:.1f} MB) + .json")


if __name__ == "__main__":
  main()
