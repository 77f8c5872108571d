"""Conv *backward* microbench: XLA's native conv gradients vs matmul
reformulations, per flagship block shape (real chip).

Motivation (BENCH_NOTES round 3): forward conv phases run at ~63% MXU,
mid-stack shapes standalone at 88-99%, but the backward runs at ~47% —
the full-step ceiling.  A 3x3 stride-1 SAME conv's gradients can be
rewritten as plain MXU matmuls:

  grad-weight  dW[t,ci,co] = sum_{b,y,x} Xpad[b,(y,x)+t,ci] * dY[b,y,x,co]
               => per-tap [Ci, BHW] @ [BHW, Co]  (9 taps), or one
                  im2col concat [9Ci, BHW] @ [BHW, Co]
  grad-input   dX = conv(dY, flip(W)^T)  (itself a fwd-shaped conv), or
               per-tap [BHW, Co] @ [Co, Ci] with shifted dY slices.

This tool times, for every distinct G/D block conv shape of the 128px
flagship (same list as tools/profile_step.py conv_micro):

  fwd          lax conv (reference point)
  vjp(native)  XLA's fused d(x,w) backward
  gw natv/tap9/cat   grad-weight: native vs 9-tap dots vs im2col matmul
  gi natv/tap9       grad-input: native vs 9-tap dots
  vjp(best)    the winning reformulated combo as one jitted program

If a reformulation wins consistently, it becomes a custom-VJP conv in
ops/ (see ops/mxu_conv.py).  Reference conv use: the reference relies on
cuDNN's autotuned backward (torch/TF on GPU); on TPU the equivalent
decision — which algorithm computes the gradient — is made here.

Usage (serially, nothing else on the box):
  python tools/convgrad_bench.py [--batch_size 56] [--json_out f.json]
"""

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from profile_step import PEAK_TFLOPS, log, time_fn  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def conv_fwd(x, w):
  # Pure-bf16 conv — exactly the model's conv (ops/spectral_norm.py:145,
  # nn.Conv with dtype=bf16); mixing in preferred_element_type breaks the
  # native transpose rule's dtype check and isn't what the model runs.
  return jax.lax.conv_general_dilated(
      x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _tap_slices(xp, h, w):
  """The 9 shifted [B,H,W,C] views of a (1,1)-padded NHWC array."""
  b, _, _, c = xp.shape
  return [jax.lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + w, c))
          for dy in range(3) for dx in range(3)]


def gw_native(x, w, dy):
  _, vjp = jax.vjp(lambda w_: conv_fwd(x, w_), w)
  return vjp(dy)[0]


def gi_native(x, w, dy):
  _, vjp = jax.vjp(lambda x_: conv_fwd(x_, w), x)
  return vjp(dy)[0]


def vjp_native(x, w, dy):
  _, vjp = jax.vjp(conv_fwd, x, w)
  return vjp(dy)


def gw_tap9(x, w, dy):
  del w
  b, h, wd, ci = x.shape
  co = dy.shape[-1]
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  dyf = dy.reshape(-1, co)
  taps = [jax.lax.dot_general(s.reshape(-1, ci), dyf,
                              (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          for s in _tap_slices(xp, h, wd)]
  return jnp.stack(taps).reshape(3, 3, ci, co).astype(jnp.bfloat16)


def gw_cat(x, w, dy):
  del w
  b, h, wd, ci = x.shape
  co = dy.shape[-1]
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  xcat = jnp.concatenate(_tap_slices(xp, h, wd), axis=-1).reshape(-1, 9 * ci)
  out = jax.lax.dot_general(xcat, dy.reshape(-1, co),
                            (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
  return out.reshape(3, 3, ci, co).astype(jnp.bfloat16)


def gi_tap9(x, w, dy):
  b, h, wd, ci = x.shape
  co = dy.shape[-1]
  dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))
  # dX[.,p,.] = sum_t dY[., p - (t-1), .] @ W[t]^T ; shifting dY by -(t-1)
  # means slicing the padded dY at offset (2-dy, 2-dx).
  slices = _tap_slices(dyp, h, wd)
  acc = jnp.zeros((b * h * wd, ci), jnp.float32)
  for dyy in range(3):
    for dxx in range(3):
      s = slices[(2 - dyy) * 3 + (2 - dxx)].reshape(-1, co)
      acc = acc + jax.lax.dot_general(s, w[dyy, dxx],
                                      (((1,), (1,)), ((), ())),
                                      preferred_element_type=jnp.float32)
  return acc.reshape(b, h, wd, ci).astype(jnp.bfloat16)


def shapes_for(config, batch):
  """Distinct G/D 3x3 conv shapes of the 128px flagship.

  G: blocks run conv1 at output res (post-upsample) and conv2 at the
  same res (models/xmc_net.py _GEN_CHANNELS).  D: DiscOptimizedBlock is
  df wide at 128px; DiscBlock_i convs run at the block's INPUT res
  (downsample happens after conv2) — _DISC_CHANNELS/_DISC_DOWNSAMPLE.
  """
  gf, df = config.gf_dim, config.df_dim
  out = []
  g_ch = [16, 16, 8, 4, 2, 1]
  res = 4
  for i in range(5):
    res *= 2
    out.append((f"G {res}px {g_ch[i]*gf}->{g_ch[i+1]*gf}", batch, res,
                g_ch[i] * gf, g_ch[i + 1] * gf))
  out.append(("D 128px 3->96", 2 * batch, 128, 3, df))
  out.append(("D 128px 96->96", 2 * batch, 128, df, df))
  d_ch = [2, 4, 8, 16, 16]
  r, cin = 64, df
  for i, mult in enumerate(d_ch):
    out.append((f"D {r}px {cin}->{mult*df}", 2 * batch, r, cin, mult * df))
    out.append((f"D {r}px {mult*df}->{mult*df}", 2 * batch, r,
                mult * df, mult * df))
    if i < 4:
      r //= 2
    cin = mult * df
  return out


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--batch_size", type=int, default=56)
  parser.add_argument("--steps", type=int, default=8)
  parser.add_argument("--json_out", default="")
  parser.add_argument("--only", default="",
                      help="substring filter on shape names")
  args = parser.parse_args()

  from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  config = get_config()
  log(f"devices: {jax.devices()}")

  variants = [
      ("fwd", conv_fwd, 1.0),
      ("vjp_native", vjp_native, 2.0),
      ("gw_native", gw_native, 1.0),
      ("gw_tap9", gw_tap9, 1.0),
      ("gw_cat", gw_cat, 1.0),
      ("gi_native", gi_native, 1.0),
      ("gi_tap9", gi_tap9, 1.0),
  ]

  results = []
  for name, b, r, ci, co in shapes_for(config, args.batch_size):
    if args.only and args.only not in name:
      continue
    x = jnp.ones((b, r, r, ci), jnp.bfloat16)
    w = jnp.ones((3, 3, ci, co), jnp.bfloat16)
    dy = jnp.ones((b, r, r, co), jnp.bfloat16)
    flops1 = 2.0 * b * r * r * ci * co * 9
    row = {"shape": name, "B": b, "res": r, "ci": ci, "co": co}
    line = f"{name:22s}"
    for vname, fn, fmul in variants:
      fargs = (x, w) if vname == "fwd" else (x, w, dy)
      try:
        sec = time_fn(jax.jit(fn), *fargs, steps=args.steps)
        tfs = flops1 * fmul / sec / 1e12
        row[vname] = {"ms": sec * 1e3, "tflops": tfs,
                      "mxu": tfs / PEAK_TFLOPS}
        line += f"  {vname} {sec*1e3:6.2f}ms {tfs/PEAK_TFLOPS*100:4.1f}%"
      except Exception as e:  # noqa: BLE001
        row[vname] = {"error": str(e)[:120]}
        line += f"  {vname} FAIL"
    log(line)
    results.append(row)

  if args.json_out:
    with open(args.json_out, "w") as f:
      json.dump(results, f, indent=1)
    log(f"wrote {args.json_out}")


if __name__ == "__main__":
  main()
