"""Per-phase roofline decomposition of the flagship train step.

Closes the round-4 HBM post-mortem's accounting gap (VERDICT r04 item 3):
the step-level arithmetic said ~112 GB real traffic => 137 ms bandwidth
floor and ~17 TFLOP => ~86 ms compute floor, yet the measured 199.7 ms
sits above max(137, 86) and below the fully-serialized 223 — "each phase
sits near its own local roofline" was narrative, not arithmetic.  This
tool emits the arithmetic: for each phase of a PARTITION of the outer
step (the critic sub-step and the joint G+D sub-step — the outer step
executes exactly these two programs back to back, engine/step.py), it
measures

  * ms (scan-timed on the chip, tools/profile_step.time_fn),
  * the compute floor  = TFLOP / 197 TFLOP/s   (v5e bf16 peak),
  * the bandwidth floor = GB / 819 GB/s        (v5e HBM peak),

with GB given two ways: raw XLA cost-analysis bytes, and the byte-census
total corrected for async-prefetch double-charging (each copy-start/done
pair charged once, the BENCH_NOTES round-4 convention).  The claim to
check is   Σ_phases max(compute_floor, bw_floor) ≈ measured_full;
any gap is overlap slack that a scheduler change could attack.

Usage (serial, nothing else running — 1-core host):
  python tools/roofline_decomp.py [--image_size 128] [--batch_size 56]
      [--out measurements/r05/roofline.json]
"""

import argparse
import json
import sys

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_TFLOPS = 197.0
PEAK_GBS = 819.0


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def corrected_bytes(hlo_text):
  """Census total minus the async-copy double charge (GB).

  The ENTRY walk charges a copy-start/copy-done prefetch pair twice for
  the same buffer (the pair's own write+read, then the consumer's
  operand read of identical bytes).  Charging each prefetched buffer
  once = subtracting half the pair traffic — the round-4 convention
  that turned 124.95 GB into ~112 GB real.
  """
  from tools.bytes_census import census

  c = census(hlo_text)
  pair_gb = sum(v for k, v in c["by_kind_gb"].items()
                if k in ("copy-start", "copy-done"))
  return c["total_gb"] - pair_gb / 2.0, c["total_gb"], pair_gb


def main():
  p = argparse.ArgumentParser()
  p.add_argument("--image_size", type=int, default=128)
  p.add_argument("--batch_size", type=int, default=56)
  p.add_argument("--steps", type=int, default=10)
  p.add_argument("--out", default=None)
  args = p.parse_args()

  sys.path.insert(0, __file__.rsplit("/", 2)[0])
  from tools.profile_step import time_fn

  from xmcgan_image_generation_tpu.engine import xmc_gan
  from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
  from xmcgan_image_generation_tpu.engine import create_train_state
  from xmcgan_image_generation_tpu.data.pipeline import host_batch_to_global
  from xmcgan_image_generation_tpu.parallel import MeshRules
  from __graft_entry__ import _example_batch

  if args.image_size == 256:
    from xmcgan_image_generation_tpu.configs.coco_xmc_256 import get_config
  else:
    from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  config = get_config()
  config.image_size = args.image_size
  config.data_source = "synthetic"
  config.batch_size = args.batch_size

  rules = MeshRules.create()
  super_batch = _example_batch(
      config, config.batch_size * config.d_step_per_g_step)
  super_batch = host_batch_to_global(super_batch, rules.mesh)
  sub_batches = split_batch(super_batch, config.d_step_per_g_step)
  generator, discriminator, state = create_train_state(
      config, jax.random.PRNGKey(0), sub_batches[0])
  state = jax.device_put(state, rules.replicated)
  additional_data = xmc_gan.create_additional_data(config)
  rng = jax.random.PRNGKey(1)

  # The outer step IS (d_step_per_g_step - 1) critic sub-steps + 1 joint
  # sub-step, unrolled in one jit (engine/step.py) — a true partition.
  def critic(state, batch):
    return xmc_gan.train_d(rng, state, batch, generator, discriminator,
                           config)

  def joint(state, batch):
    return xmc_gan.train_g_d(rng, state, batch, generator, discriminator,
                             config, additional_data)

  def full(state, batch):
    return train_step(rng, state, batch, generator=generator,
                      discriminator=discriminator, config=config,
                      additional_data=additional_data)

  n_critic = config.d_step_per_g_step - 1
  phases = [(f"critic sub-step (x{n_critic})", critic, sub_batches[0],
             n_critic),
            ("joint G+D sub-step", joint, sub_batches[-1], 1),
            ("FULL outer step", full, super_batch, 1)]

  rows = []
  for name, fn, batch, mult in phases:
    jfn = jax.jit(fn)
    lowered = jfn.lower(state, batch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
      ca = ca[0]
    tflop = float(ca.get("flops", 0)) / 1e12
    ca_gb = float(ca.get("bytes accessed", 0)) / 1e9
    real_gb, census_gb, pair_gb = corrected_bytes(compiled.as_text())
    sec = time_fn(jfn, state, batch, steps=args.steps)
    ms = sec * 1e3
    compute_floor = tflop / PEAK_TFLOPS * 1e3
    bw_floor = real_gb / PEAK_GBS * 1e3
    bw_floor_ca = ca_gb / PEAK_GBS * 1e3
    row = dict(name=name, multiplier=mult, ms=round(ms, 2),
               tflop=round(tflop, 2), cost_analysis_gb=round(ca_gb, 2),
               census_gb=round(census_gb, 2),
               copy_pair_gb=round(pair_gb, 2),
               corrected_gb=round(real_gb, 2),
               compute_floor_ms=round(compute_floor, 2),
               bw_floor_ms=round(bw_floor, 2),
               bw_floor_ms_cost_analysis=round(bw_floor_ca, 2),
               local_floor_ms=round(max(compute_floor, bw_floor), 2),
               floor_utilization=round(
                   max(compute_floor, bw_floor) / ms, 4) if ms else 0)
    rows.append(row)
    log(f"{name:26s} {ms:8.2f} ms | floors: compute {compute_floor:7.2f}"
        f"  bw {bw_floor:7.2f} (ca {bw_floor_ca:7.2f}) | "
        f"max {row['local_floor_ms']:7.2f} ({row['floor_utilization']*100:.0f}%)")

  parts = [r for r in rows if not r["name"].startswith("FULL")]
  full_row = rows[-1]
  sum_measured = sum(r["ms"] * r["multiplier"] for r in parts)
  sum_floor = sum(r["local_floor_ms"] * r["multiplier"] for r in parts)
  out = {
      "config": {"image_size": args.image_size,
                 "batch_size": args.batch_size,
                 "d_step_per_g_step": config.d_step_per_g_step},
      "peaks": {"tflops": PEAK_TFLOPS, "gbs": PEAK_GBS},
      "phases": rows,
      "sum_phase_measured_ms": round(sum_measured, 2),
      "sum_phase_local_floors_ms": round(sum_floor, 2),
      "full_measured_ms": full_row["ms"],
      "overlap_slack_ms": round(full_row["ms"] - sum_floor, 2),
      "slack_fraction": round(
          (full_row["ms"] - sum_floor) / full_row["ms"], 4),
  }
  print(json.dumps(out, indent=1))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
  main()
