"""Export a trained generator as a standalone StableHLO serving artifact.

Restores a checkpoint from a training workdir and writes, per weight set
(EMA and/or normal), a ``jax.export`` serialization plus a JSON sidecar
describing the input/output interface.  The artifact runs on any PJRT
runtime via ``jax.export.deserialize(data).call(...)`` — no framework,
Flax modules, or checkpoint needed at serving time.

Equivalent to ``python -m xmcgan_image_generation_tpu.main --mode=export``;
this standalone form takes the config as a module[:variant] name.

Usage (defaults: EMA weights, symbolic batch dimension):
  python tools/export_serving.py --workdir /path/to/run \\
      [--config_module coco_xmc[:variant]] [--step N] [--batch_size N] \\
      [--weights ema|normal|both] [--platforms tpu,cpu] [--out DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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
  p.add_argument("--platforms", default="tpu,cpu",
                 help="comma-separated lowering targets (default tpu,cpu: "
                      "platform-polymorphic artifact)")
  p.add_argument("--out", default=None,
                 help="output dir (default: {workdir}/serving)")
  p.add_argument("--quantize", choices=("int8",), default=None,
                 help="weight-only quantization (lossy; ~4x smaller "
                      "artifact than f32)")
  args = p.parse_args()

  from xmcgan_image_generation_tpu.utils import serving

  platforms = tuple(s for s in args.platforms.split(",") if s) or None
  written = serving.export_from_workdir(
      serving.load_config_module(args.config_module), args.workdir,
      step=args.step, batch_size=args.batch_size or None,
      weights=args.weights, platforms=platforms, out_dir=args.out,
      quantize=args.quantize)
  for path in written:
    print(f"wrote {path} ({os.path.getsize(path) / 1e6:.1f} MB) + .json")


if __name__ == "__main__":
  main()
