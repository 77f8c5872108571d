"""Block-level backward attribution on the real chip.

tools/convgrad_bench.py showed XLA's *conv* gradients standalone run at
96-98% MXU at every flagship mid-stack shape — so the full step's ~47%
backward cannot be the conv-grad emitters.  This tool times each actual
G/D block (models/blocks.py) forward and forward+backward at flagship
shapes to localize where the dilution lives: conditional BatchNorm
chains, upsample/dsample glue, spectral-norm plumbing, or inter-block
boundaries.

Per block it also times isolation variants:
  conv-only   the same trunk with normalization removed
  sn off      plain nn.Conv instead of SpectralConv (D blocks)

Usage (serially, nothing else on the box):
  python tools/blockgrad_bench.py [--batch_size 56] [--json_out f.json]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

from profile_step import log, report_row, time_fn, cost  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

DTYPE = jnp.bfloat16


class ConvOnlyGenTrunk(nn.Module):
  """GenBlock minus the two ConditionalBatchNorms (isolation variant)."""
  filters: int
  conv_fn: object

  @nn.compact
  def __call__(self, x, cond):
    from xmcgan_image_generation_tpu.ops.pooling import upsample
    del cond
    shortcut = x
    x = nn.relu(x)
    x = upsample(x)
    x = self.conv_fn(self.filters, kernel_size=(3, 3))(x)
    x = nn.relu(x)
    x = self.conv_fn(self.filters, kernel_size=(3, 3))(x)
    shortcut = upsample(shortcut)
    shortcut = self.conv_fn(self.filters, kernel_size=(1, 1))(shortcut)
    return x + shortcut


def bench_module(name, module, args, mutable, results):
  """Times fwd and fwd+bwd of ``module.apply`` and prints both rows."""
  # Eager init = one tunnel dispatch per param; jit it (verify skill note).
  variables = jax.jit(module.init)(jax.random.PRNGKey(0), *args)
  params = variables.get("params", {})
  other = {k: v for k, v in variables.items() if k != "params"}

  def fwd(params, args):
    out = module.apply({"params": params, **other}, *args, mutable=mutable)
    return out[0] if mutable else out

  def fwd_bwd(params, args):
    def loss(p, a):
      y = fwd(p, a)
      return jnp.sum(y.astype(jnp.float32))
    g = jax.grad(loss, argnums=(0, 1))(params, args)
    return g

  rows = {}
  for tag, fn in (("fwd", fwd), ("fwd+bwd", fwd_bwd)):
    sec = time_fn(jax.jit(fn), params, args)
    flops, byts = cost(fn, params, args)
    rows[tag] = report_row(f"{name} {tag}", sec, flops, byts)
  results.append({"block": name, **{k: v for k, v in rows.items()}})


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--batch_size", type=int, default=56)
  parser.add_argument("--json_out", default="")
  parser.add_argument("--only", default="", help="substring filter")
  args = parser.parse_args()

  from xmcgan_image_generation_tpu.models import blocks
  from xmcgan_image_generation_tpu.models.xmc_net import (
      _layer_factories, _make_norm_fn)
  from xmcgan_image_generation_tpu.configs.coco_xmc import get_config

  config = get_config()
  gf, df = config.gf_dim, config.df_dim
  b = args.batch_size
  log(f"devices: {jax.devices()}  batch {b} (G) / {2*b} (D)")

  g_conv, g_dense = _layer_factories(False, True, DTYPE)  # G: no SN
  d_conv, d_dense = _layer_factories(True, True, DTYPE)  # D: spectral norm
  dp_conv, _ = _layer_factories(False, True, DTYPE)  # D variant: SN off
  norm_fn = _make_norm_fn(config, True, DTYPE)

  key = jax.random.PRNGKey(1)
  cond = jax.random.normal(key, (b, 2 * config.z_dim), DTYPE)
  region = jax.random.normal(key, (b, 16, 16, 768), DTYPE)

  cases = []
  # The two globally-conditioned GenBlocks (4->8, 8->16).
  for res, cin, cout in ((4, 16 * gf, 16 * gf), (8, 16 * gf, 8 * gf)):
    x = jax.random.normal(key, (b, res, res, cin), DTYPE)
    cases.append((f"GenBlock {res}px {cin}->{cout}",
                  blocks.GenBlock(filters=cout, conv_fn=g_conv,
                                  dense_fn=g_dense, norm_fn=norm_fn,
                                  dtype=DTYPE),
                  (x, cond), ["batch_stats"]))
    cases.append((f"convonly {res}px {cin}->{cout}",
                  ConvOnlyGenTrunk(filters=cout, conv_fn=g_conv),
                  (x, cond), False))
  # The spatially-modulated blocks (16->32, 32->64, 64->128).
  for res, cin, cout, factor in ((16, 8 * gf, 4 * gf, 1),
                                 (32, 4 * gf, 2 * gf, 2),
                                 (64, 2 * gf, 1 * gf, 4)):
    x = jax.random.normal(key, (b, res, res, cin), DTYPE)
    cases.append((f"GenSpatialF {res}px {cin}->{cout}",
                  blocks.GenSpatialBlockFused(
                      filters=cout, conv_fn=g_conv, dense_fn=g_dense,
                      norm_fn=norm_fn, factor=factor, dtype=DTYPE),
                  (x, region, cond), ["batch_stats"]))
    cases.append((f"convonly {res}px {cin}->{cout}",
                  ConvOnlyGenTrunk(filters=cout, conv_fn=g_conv),
                  (x, cond), False))
  # D stack at 2B — real flagship shapes: DiscOptimizedBlock is df wide
  # at 128px; DiscBlock_i convs run at the block's input resolution.
  x = jax.random.normal(key, (2 * b, 128, 128, 3), DTYPE)
  cases.append(("DiscOpt 128px 3->96",
                blocks.DiscOptimizedBlock(filters=df, conv_fn=d_conv,
                                          dtype=DTYPE),
                (x,), ["spectral_norm_stats"]))
  d_specs = ((64, df, 2 * df, True), (32, 2 * df, 4 * df, True),
             (16, 4 * df, 8 * df, True), (8, 8 * df, 16 * df, True),
             (4, 16 * df, 16 * df, False))
  for res, cin, cout, down in d_specs:
    x = jax.random.normal(key, (2 * b, res, res, cin), DTYPE)
    cases.append((f"DiscBlock {res}px {cin}->{cout}",
                  blocks.DiscBlock(filters=cout, downsample=down,
                                   conv_fn=d_conv, dtype=DTYPE),
                  (x,), ["spectral_norm_stats"]))
    cases.append((f"snoff {res}px {cin}->{cout}",
                  blocks.DiscBlock(filters=cout, downsample=down,
                                   conv_fn=dp_conv, dtype=DTYPE),
                  (x,), False))

  results = []
  for name, module, margs, mutable in cases:
    if args.only and args.only not in name:
      continue
    try:
      bench_module(name, module, margs, mutable, results)
    except Exception as e:  # noqa: BLE001
      log(f"{name}: FAIL {str(e)[:160]}")

  if args.json_out:
    with open(args.json_out, "w") as f:
      json.dump(results, f, indent=1)
    log(f"wrote {args.json_out}")


if __name__ == "__main__":
  main()
