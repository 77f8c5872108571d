"""HBM-byte attribution of the compiled flagship train step.

The fused 128px step is bandwidth-leaning (BENCH_NOTES: 80.5% of peak
HBM at 46% MXU), so the perf frontier is bytes, not FLOPs.  This tool
answers "which bytes, and are they reducible?":

1. compiles the full train step (same build path as bench.py),
2. walks the ENTRY computation of the post-fusion HLO, charging every
   top-level instruction its result bytes (one HBM write) plus the bytes
   of every distinct top-level operand (one HBM read each — XLA fusions
   read each parameter once),
3. buckets the traffic by op kind and by feature-map scale (the largest
   spatial extent appearing in the instruction's shapes), and
4. compares the total against an analytic floor: parameter reads +
   one-write-one-read for every inter-fusion activation.

Caveats: logical bytes, not measured DMA — tile padding (96→128 lanes)
and double-buffering are invisible; transient fusion-internal traffic is
(correctly) excluded.  The round-3 profile measured the forward at ~101%
of these logical bytes, so the estimate is tight at flagship shapes.

Usage:
  python tools/bytes_census.py [--image_size 128] [--batch_size 56]
      [--scale_fused_convs 1] [--out /tmp/bytes_census.json]
"""

import argparse
import collections
import json
import re
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1,
    "bf16": 2, "f16": 2, "s16": 2, "u16": 2,
    "f32": 4, "s32": 4, "u32": 4,
    "f64": 8, "s64": 8, "u64": 8, "c64": 8,
    "c128": 16,
}

_SHAPE_RE = re.compile(
    r"(pred|bf16|f16|f32|f64|s8|u8|s16|u16|s32|u32|s64|u64|c64|c128)"
    r"\[([0-9,]*)\]")
# `%name = <type> opcode(...)` or `name = <type> opcode(...)` (top level).
_INSTR_RE = re.compile(
    r"^\s+(%?[\w.\-]+)\s*=\s*(\(?)((?:[a-z0-9]+\[[0-9,]*\]"
    r"(?:\{[^}]*\})?(?:,\s*)?)+)\)?\s*([\w\-]+)\(([^\n]*)$")
_OPERAND_RE = re.compile(r"%?([\w.\-]+)")


def _shape_bytes(type_str):
  total = 0
  dims_all = []
  for m in _SHAPE_RE.finditer(type_str):
    n = _DTYPE_BYTES[m.group(1)]
    dims = [int(d) for d in m.group(2).split(",") if d]
    for d in dims:
      n *= d
    total += n
    dims_all.append(dims)
  return total, dims_all


def _scale_bucket(dims_all):
  """The feature-map scale of an instruction: the largest dim that looks
  like a spatial extent (power-of-two in [4, 256]) in any of its shapes."""
  spatial = 0
  for dims in dims_all:
    for d in dims[1:]:  # skip the batch dim
      if d in (4, 8, 16, 32, 64, 128, 224, 256) and d > spatial:
        spatial = d
  return f"{spatial}px" if spatial else "vector"


def parse_entry(hlo_text):
  """Yields (name, opcode, result_bytes, dims, operand_names) for every
  instruction of the ENTRY computation."""
  in_entry = False
  for line in hlo_text.splitlines():
    if line.startswith("ENTRY "):
      in_entry = True
      continue
    if in_entry:
      if line.startswith("}"):
        break
      m = _INSTR_RE.match(line)
      if not m:
        continue
      name, _, type_str, opcode, rest = m.groups()
      nbytes, dims_all = _shape_bytes(type_str)
      # Operands: the names inside the first (...) — cut at the first
      # close paren at depth 0 is overkill; names are comma-separated
      # %refs before any attribute (attrs follow "), ").
      arg_str = rest.split("),", 1)[0]
      operands = [o for o in _OPERAND_RE.findall(arg_str)]
      yield name.lstrip("%"), opcode, nbytes, dims_all, operands


def census(hlo_text):
  instrs = list(parse_entry(hlo_text))
  result_bytes = {name: nbytes for name, _, nbytes, _, _ in instrs}
  by_kind = collections.Counter()
  by_scale = collections.Counter()
  by_kind_scale = collections.Counter()
  total = 0
  for name, opcode, nbytes, dims_all, operands in instrs:
    if opcode in ("parameter", "constant", "get-tuple-element", "tuple",
                  "bitcast"):
      continue  # no data movement of their own
    traffic = nbytes  # the write
    for op in set(operands):
      traffic += result_bytes.get(op, 0)  # each distinct operand read once
    kind = opcode
    if opcode == "fusion":
      kind = "fusion"
    scale = _scale_bucket(dims_all)
    by_kind[kind] += traffic
    by_scale[scale] += traffic
    by_kind_scale[f"{kind}@{scale}"] += traffic
    total += traffic
  return {
      "total_gb": round(total / 1e9, 2),
      "by_kind_gb": {k: round(v / 1e9, 2)
                     for k, v in by_kind.most_common(12)},
      "by_scale_gb": {k: round(v / 1e9, 2)
                      for k, v in by_scale.most_common()},
      "top_kind_scale_gb": {k: round(v / 1e9, 2)
                            for k, v in by_kind_scale.most_common(16)},
      "n_entry_instructions": len(instrs),
  }


def analytic_floor(config, batch_size):
  """Back-of-envelope minimum bytes/step the algorithm must move.

  Parameters: each of the ~5 program regions (G fwd x2, D fwd x3 incl.
  CSE'd joint, 3 backwards, optimizer) re-reads the weights it uses once.
  Activations: every inter-block tensor is written once and read once in
  the forward, and read once more in the backward (saved residuals).
  This ignores BN-stat second passes and optimizer state, so it is a hard
  floor, not a target.
  """
  b = batch_size
  bpe = 2  # bf16
  g_scales = [(4, 16), (8, 16), (16, 8), (32, 4), (64, 2), (128, 1)]
  gf = config.gf_dim
  act = 0
  for s, mult in g_scales:
    act += b * s * s * mult * gf * bpe  # one block-boundary tensor
  d_scales = [(128, 1), (64, 2), (32, 4), (16, 8), (8, 16), (4, 16)]
  df = config.df_dim
  for s, mult in d_scales:
    act += 2 * b * s * s * mult * df * bpe  # D sees 2B images
  # fwd write+read + bwd read = 3 accesses; G runs twice (critic + joint),
  # D three times (critic, joint-G CSE, joint-D) with 3 backwards total.
  act_traffic = 3 * act * 2.5
  params = (78.5e6 + 87.9e6) * 4
  param_traffic = params * 3.5
  return {
      "activation_floor_gb": round(act_traffic / 1e9, 2),
      "param_floor_gb": round(param_traffic / 1e9, 2),
      "floor_gb": round((act_traffic + param_traffic) / 1e9, 2),
  }


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--image_size", type=int, default=128)
  p.add_argument("--batch_size", type=int, default=56)
  p.add_argument("--scale_fused_convs", type=int, default=1)
  p.add_argument("--out", default=None)
  args = p.parse_args()

  sys.path.insert(0, __file__.rsplit("/", 2)[0])
  from bench import build  # same step construction as the benchmark

  if args.image_size == 256:
    from xmcgan_image_generation_tpu.configs.coco_xmc_256 import get_config
  else:
    from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  config = get_config()
  config.image_size = args.image_size
  config.data_source = "synthetic"
  config.scale_fused_convs = bool(args.scale_fused_convs)

  import functools

  from xmcgan_image_generation_tpu.parallel import MeshRules
  from xmcgan_image_generation_tpu.data.pipeline import host_batch_to_global
  import numpy as np

  step, state, super_batch = build(config, args.batch_size)
  rules = MeshRules.create()
  state = jax.device_put(state, rules.replicated)
  batch = host_batch_to_global(
      jax.tree_util.tree_map(np.asarray, super_batch), rules.mesh)
  compiled = jax.jit(step, donate_argnums=(1,)).lower(
      jax.random.PRNGKey(1), state, batch).compile()
  text = compiled.as_text()
  ca = compiled.cost_analysis()

  out = {
      "config": {"image_size": args.image_size,
                 "batch_size": args.batch_size,
                 "scale_fused_convs": bool(args.scale_fused_convs)},
      "cost_analysis": {
          "tflop": round(ca.get("flops", 0) / 1e12, 2),
          "gb": round(ca.get("bytes accessed", 0) / 1e9, 2),
      },
      "census": census(text),
      "analytic_floor": analytic_floor(config, args.batch_size),
  }
  print(json.dumps(out, indent=1))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
