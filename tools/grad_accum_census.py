"""Collective census of the grad-accum microbatch re-pinning (AOT, CPU).

`engine/step.stack_microbatches` keeps `split_batch`'s contiguous-row
example->microbatch assignment (load-bearing: microbatch composition is
semantics here — the contrastive losses pool negatives within a
microbatch, reference libml/losses.py pools within a device batch) and
then pins dim 1 to the data axis.  Under GSPMD a row-sharded batch
reshaped this way needs a cross-device redistribution of the batch
bytes every step (advisor round-4 finding).  This tool prices that
redistribution: it AOT-compiles the FULL flagship-128 train step over an
8-device mesh at k=1/2/4 and censuses per-device collective bytes
(parallel/introspect.collective_bytes), so the worry becomes a number
against the step's ~13 GB/device HBM budget.

Compile-only; runs on the CPU AOT backend like the driver dry run.

Usage:
  python tools/grad_accum_census.py [--n_devices 8]
      [--out measurements/r05/grad_accum_census.json]
"""

import argparse
import json
import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_census_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--n_devices", type=int, default=8)
  p.add_argument("--out", default=None)
  args = p.parse_args()

  sys.path.insert(0, __file__.rsplit("/", 2)[0])
  from xmcgan_image_generation_tpu.parallel import audit
  from xmcgan_image_generation_tpu.parallel.introspect import (
      collective_bytes, collective_counts)

  points = {}
  for k in (1, 2, 4):
    config = audit.flagship_config("128", args.n_devices)
    config.grad_accum_steps = k
    log(f"lower+compile flagship-128 @{args.n_devices}dev k={k} ...")
    text = audit.lowered_step(config, args.n_devices).compile().as_text()
    counts = collective_counts(text)
    nbytes = collective_bytes(text)
    points[f"k{k}"] = {
        "collective_counts": counts,
        "collective_mb_per_device": {
            kind: round(v / 1e6, 2) for kind, v in sorted(nbytes.items())
        },
        "total_collective_mb_per_device": round(sum(nbytes.values()) / 1e6, 2),
    }
    log(f"  {points[f'k{k}']}")

  base = points["k1"]["total_collective_mb_per_device"]
  record = {
      "n_devices": args.n_devices,
      "variant": "flagship-128 (batch 8/device, bf16, scale-fused)",
      "points": points,
      "delta_vs_k1_mb": {
          k: round(points[k]["total_collective_mb_per_device"] - base, 2)
          for k in points
      },
      "note": "per-device OUTPUT bytes of every collective in the compiled "
              "step; compare against the step's ~13 GB/device HBM traffic "
              "(measurements/r05/roofline_dilated.json) to price the "
              "microbatch re-pinning redistribution",
  }
  print(json.dumps(record, indent=1))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(record, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
  main()
