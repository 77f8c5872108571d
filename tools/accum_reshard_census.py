"""Does microbatch stacking cost a cross-device reshard? (ADVICE r04 #3)

``stack_microbatches`` keeps ``split_batch``'s contiguous-row partition
and re-pins dim 1 to the data axis; under GSPMD a row-sharded batch
reshaped this way can need an all-to-all over the batch bytes every
step.  The partition is deliberate — it preserves the tested
sharded-vs-unsharded equivalence (tests/test_grad_accum.py pins the
microbatch composition to split_batch's) — so the question is the COST,
not the correctness.  This tool compiles the flagship 128px step over
the 8-device CPU mesh at ``grad_accum_steps`` 1 / 2 / 4 and reports the
collective census delta plus the total all-to-all bytes, so the cost
can be stated in ms against ICI bandwidth instead of hand-waved.

Usage:  python tools/accum_reshard_census.py [--out FILE]
"""

import argparse
import json
import os
import re
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def collective_bytes(hlo_text, opcodes=("all-to-all", "collective-permute")):
  """Total result bytes of the given collective opcodes (start/done pairs
  counted once, on the -start)."""
  from tools.bytes_census import _shape_bytes

  total = {op: 0 for op in opcodes}
  count = {op: 0 for op in opcodes}
  for line in hlo_text.splitlines():
    m = re.search(r"=\s*(\(?(?:[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?(?:,\s*)?)+"
                  r"\)?)\s*([\w\-]+)\(", line)
    if not m:
      continue
    op = m.group(2)
    base = op[:-6] if op.endswith("-start") else op
    if base in opcodes and not op.endswith("-done"):
      nbytes, _ = _shape_bytes(m.group(1))
      total[base] += nbytes
      count[base] += 1
  return {op: {"count": count[op], "mb": round(total[op] / 1e6, 1)}
          for op in opcodes}


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--out", default=None)
  args = p.parse_args()

  from xmcgan_image_generation_tpu.parallel.audit import (
      flagship_config, lowered_step)
  from xmcgan_image_generation_tpu.parallel.introspect import (
      collective_counts)

  results = {}
  for k in (1, 2, 4):
    config = flagship_config("128", 8)
    config.grad_accum_steps = k
    text = lowered_step(config, 8).compile().as_text()
    results[f"k{k}"] = {
        "collectives": collective_counts(text),
        "reshard": collective_bytes(text),
    }
    print(f"k={k}: {json.dumps(results[f'k{k}'])}", file=sys.stderr,
          flush=True)

  base = results["k1"]["reshard"]
  out = {"per_k": results}
  for k in (2, 4):
    delta = {
        op: {
            "count": results[f"k{k}"]["reshard"][op]["count"]
                     - base[op]["count"],
            "mb": round(results[f"k{k}"]["reshard"][op]["mb"]
                        - base[op]["mb"], 1),
        } for op in base
    }
    out[f"delta_k{k}_vs_k1"] = delta
  # Cost estimate: batch bytes over ICI. v5e ICI ~ 100 GB/s/link usable;
  # even charging ALL moved bytes to one link, the table below lets the
  # reader do ms = mb / 100e3.
  print(json.dumps(out, indent=1))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)


if __name__ == "__main__":
  main()
