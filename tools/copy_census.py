"""What are the copies in the compiled flagship step?

The round-4 byte census (tools/bytes_census.py) attributes ~13-16 GB of
the 125 GB step to copy / copy-start / copy-done instructions — pure
data movement with no arithmetic.  This tool recompiles the step (warm
persistent cache) and prints every copy over a size threshold with its
operand's producing instruction, so the copies can be traced to their
cause (layout conversion around a custom-call, donation aliasing,
depth-to-space transposes, ...).

Usage:
  python tools/copy_census.py [--image_size 128] [--batch_size 56]
      [--min_mb 8]
"""

import argparse
import collections
import re
import sys

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--image_size", type=int, default=128)
  p.add_argument("--batch_size", type=int, default=56)
  p.add_argument("--scale_fused_convs", type=int, default=1)
  p.add_argument("--use_pallas", type=int, default=1)
  p.add_argument("--min_mb", type=float, default=8.0)
  args = p.parse_args()

  sys.path.insert(0, __file__.rsplit("/", 2)[0])
  from bench import build
  from tools.bytes_census import _SHAPE_RE, _DTYPE_BYTES, parse_entry

  if args.image_size == 256:
    from xmcgan_image_generation_tpu.configs.coco_xmc_256 import get_config
  else:
    from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  config = get_config()
  config.image_size = args.image_size
  config.data_source = "synthetic"
  config.scale_fused_convs = bool(args.scale_fused_convs)
  config.use_pallas = bool(args.use_pallas)

  import numpy as np

  from xmcgan_image_generation_tpu.parallel import MeshRules
  from xmcgan_image_generation_tpu.data.pipeline import host_batch_to_global

  step, state, super_batch = build(config, args.batch_size)
  rules = MeshRules.create()
  state = jax.device_put(state, rules.replicated)
  batch = host_batch_to_global(
      jax.tree_util.tree_map(np.asarray, super_batch), rules.mesh)
  compiled = jax.jit(step, donate_argnums=(1,)).lower(
      jax.random.PRNGKey(1), state, batch).compile()
  text = compiled.as_text()

  instrs = {name: (opcode, nbytes, dims_all, operands)
            for name, opcode, nbytes, dims_all, operands in parse_entry(text)}

  copies = []
  for name, (opcode, nbytes, dims_all, operands) in instrs.items():
    if opcode not in ("copy", "copy-start"):
      continue
    if nbytes / 1e6 < args.min_mb:
      continue
    src = operands[0] if operands else "?"
    src_op = instrs.get(src, ("?", 0, [], []))[0]
    copies.append((nbytes, name, dims_all, src, src_op))
  copies.sort(reverse=True)

  total = sum(nbytes for nbytes, *_ in copies)
  log(f"{len(copies)} copies >= {args.min_mb} MB, {total/1e9:.2f} GB result "
      "bytes total (each copy moves ~2x: read + write)")
  by_src = collections.Counter()
  for nbytes, name, dims_all, src, src_op in copies:
    by_src[src_op] += nbytes
    print(f"{nbytes/1e6:9.1f} MB  {name:40s} dims={dims_all}  "
          f"src={src} ({src_op})")
  print("\nBy source op kind (result bytes):")
  for op, nbytes in by_src.most_common():
    print(f"  {op:20s} {nbytes/1e9:.2f} GB")

  # Raw-line context for the 5 biggest, to see layout annotations.
  print("\nHLO lines of the 5 largest copies:")
  biggest = {name for _, name, *_ in copies[:5]}
  for line in text.splitlines():
    m = re.match(r"^\s+%?([\w.\-]+)\s*=", line)
    if m and m.group(1).lstrip("%") in biggest:
      print(line.strip()[:400])


if __name__ == "__main__":
  main()
