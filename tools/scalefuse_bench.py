"""Scale-fused vs naive resample+conv microbench (real chip).

For every flagship G upsample-conv and D conv-pool shape, times the
naive pipeline (nearest-up 2x -> conv3x3 / conv3x3 -> avgpool2) against
the fused formulation (ops/scale_fuse.py), forward and forward+backward.
MXU% is reported against the NAIVE FLOP count for both variants, so a
fused MXU% above 100/2.25 = 44% of the naive roofline means real
wall-clock win.

Usage (serially, nothing else on the box):
  python tools/scalefuse_bench.py [--batch_size 56] [--json_out f.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_step import PEAK_TFLOPS, log, time_fn  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DTYPE = jnp.bfloat16


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--batch_size", type=int, default=56)
  parser.add_argument("--steps", type=int, default=8)
  parser.add_argument("--json_out", default="")
  parser.add_argument("--only", default="", help="substring filter")
  args = parser.parse_args()

  from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  from xmcgan_image_generation_tpu.ops import scale_fuse
  from xmcgan_image_generation_tpu.ops.pooling import dsample, upsample

  config = get_config()
  gf, df = config.gf_dim, config.df_dim
  b = args.batch_size
  log(f"devices: {jax.devices()}")

  def conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

  # (name, input res, ci, co, kind); G conv1 inputs are PRE-upsample.
  shapes = [
      ("G up 4->8 1536->1536", 4, 16 * gf, 16 * gf, "up"),
      ("G up 8->16 1536->768", 8, 16 * gf, 8 * gf, "up"),
      ("G up 16->32 768->384", 16, 8 * gf, 4 * gf, "up"),
      ("G up 32->64 384->192", 32, 4 * gf, 2 * gf, "up"),
      ("G up 64->128 192->96", 64, 2 * gf, 1 * gf, "up"),
      ("D pool 128 96->96", 128, df, df, "pool"),
      ("D pool 64 192->192", 64, 2 * df, 2 * df, "pool"),
      ("D pool 32 384->384", 32, 4 * df, 4 * df, "pool"),
      ("D pool 16 768->768", 16, 8 * df, 8 * df, "pool"),
      ("D pool 8 1536->1536", 8, 16 * df, 16 * df, "pool"),
  ]

  results = []
  for name, res, ci, co, kind in shapes:
    if args.only and args.only not in name:
      continue
    bn = b if kind == "up" else 2 * b
    x = jnp.ones((bn, res, res, ci), DTYPE)
    w = jnp.ones((3, 3, ci, co), DTYPE)
    if kind == "up":
      naive = lambda x_, w_: conv(upsample(x_), w_)  # noqa: E731
      fused = scale_fuse.upsample_conv
      naive_flops = 2.0 * bn * (2 * res) ** 2 * ci * co * 9
    else:
      naive = lambda x_, w_: dsample(conv(x_, w_))  # noqa: E731
      fused = scale_fuse.conv_pool
      naive_flops = 2.0 * bn * res * res * ci * co * 9

    def fwd_bwd(fn):
      def f(x_, w_):
        g = jax.grad(
            lambda a, c: jnp.sum(fn(a, c).astype(jnp.float32)), (0, 1))(
                x_, w_)
        return g
      return f

    row = {"shape": name, "B": bn, "res": res, "ci": ci, "co": co}
    line = f"{name:24s}"
    variants = [("naive", naive, 1.0),
                ("fused", fused, 1.0),
                ("naive+bwd", fwd_bwd(naive), 2.0),
                ("fused+bwd", fwd_bwd(fused), 2.0)]
    if kind == "up":
      # Same-process A/B of the two fused formulations (phase kernels +
      # depth-to-space vs one base-dilated conv; ops/scale_fuse.py).
      dil = scale_fuse.upsample_conv_dilated
      variants += [("dilated", dil, 1.0), ("dilated+bwd", fwd_bwd(dil), 2.0)]
    for tag, fn, fmul in variants:
      try:
        sec = time_fn(jax.jit(fn), x, w, steps=args.steps)
        tfs = naive_flops * fmul / sec / 1e12
        row[tag] = {"ms": sec * 1e3, "roofline_pct": tfs / PEAK_TFLOPS}
        line += f"  {tag} {sec*1e3:6.2f}ms {tfs/PEAK_TFLOPS*100:5.1f}%"
      except Exception as e:  # noqa: BLE001
        row[tag] = {"error": str(e)[:120]}
        line += f"  {tag} FAIL"
    log(line)
    results.append(row)

  if args.json_out:
    with open(args.json_out, "w") as f:
      json.dump(results, f, indent=1)
    log(f"wrote {args.json_out}")


if __name__ == "__main__":
  main()
