"""Same-process A/B: phase vs base-dilated scale-fused upsample-convs.

The round-4 copy census identified the phase formulation's
depth-to-space interleave transposes (~3.5 GB/step at 128px) as the one
standing logical waste, estimated worth ~+2% — below the 2.3%
cross-process measurement floor, so only a SAME-process A/B (resolves
~1%, BENCH_NOTES variance section) can decide it.  This tool jits the
FULL flagship train step under both ``config.upconv_method`` settings
("phase": 2x2 phase kernels + depth-to-space; "dilated": one
base-dilated 4x4 conv — ops/scale_fuse.py) in one process, interleaves
``--repeats`` scan-differenced timing windows per arm (A B A B ... so
drift hits both arms equally), applies the 4x window-validity rule to
each arm, and records each arm's cost-analysis FLOPs plus the
copy-census bytes so the wall-clock verdict comes with the traffic
arithmetic that motivated the experiment.

Usage (serial, nothing else on the box):
  python tools/upconv_ab.py [--image_size 128] [--batch_size 56]
      [--repeats 5] [--out measurements/r05/upconv_ab.json]
"""

import argparse
import json
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
  p.add_argument("--steps", type=int, default=10)
  p.add_argument("--repeats", type=int, default=5)
  p.add_argument("--out", default=None)
  args = p.parse_args()

  sys.path.insert(0, __file__.rsplit("/", 2)[0])
  from bench import spread_stats
  from tools.profile_step import time_fn
  from tools.roofline_decomp import corrected_bytes

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

  rules = MeshRules.create()
  log(f"devices: {jax.devices()}")

  arms = {}
  state0 = None
  for method in ("phase", "dilated"):
    config = get_config()
    config.image_size = args.image_size
    config.data_source = "synthetic"
    config.batch_size = args.batch_size
    config.upconv_method = method

    super_batch = _example_batch(
        config, config.batch_size * config.d_step_per_g_step)
    super_batch = host_batch_to_global(super_batch, rules.mesh)
    sub_batches = split_batch(super_batch, config.d_step_per_g_step)
    generator, discriminator, state = create_train_state(
        config, jax.random.PRNGKey(0), sub_batches[0])
    # Both arms share one param tree (the knob must not change it).
    if state0 is None:
      state0 = jax.device_put(state, rules.replicated)
    additional_data = xmc_gan.create_additional_data(config)
    rng = jax.random.PRNGKey(1)

    def full(state, batch, *, _g=generator, _d=discriminator, _c=config,
             _a=additional_data):
      return train_step(rng, state, batch, generator=_g, discriminator=_d,
                        config=_c, additional_data=_a)

    jfn = jax.jit(full)
    compiled = jfn.lower(state0, super_batch).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
      ca = ca[0]
    real_gb, census_gb, pair_gb = corrected_bytes(compiled.as_text())
    arms[method] = {
        "fn": jfn,
        "batch": super_batch,
        "record": {
            "tflop": round(float(ca.get("flops", 0)) / 1e12, 3),
            "cost_analysis_gb": round(
                float(ca.get("bytes accessed", 0)) / 1e9, 2),
            "census_gb": round(census_gb, 2),
            "copy_pair_gb": round(pair_gb, 2),
            "corrected_gb": round(real_gb, 2),
            "windows_ms": [],
        },
    }
    log(f"{method}: compiled; {arms[method]['record']['tflop']} TFLOP, "
        f"corrected {real_gb:.1f} GB")

  # Interleaved windows: drift (thermal, tunnel) hits both arms equally.
  for i in range(args.repeats):
    for method in ("phase", "dilated"):
      sec = time_fn(arms[method]["fn"], state0, arms[method]["batch"],
                    steps=args.steps)
      arms[method]["record"]["windows_ms"].append(round(sec * 1e3, 3))
      log(f"window {i} {method}: {sec * 1e3:.2f} ms")

  out = {"config": {"image_size": args.image_size,
                    "batch_size": args.batch_size,
                    "steps_per_window": args.steps}}
  for method in ("phase", "dilated"):
    rec = arms[method]["record"]
    rec["ms"] = spread_stats(rec.pop("windows_ms"))
    out[method] = rec
  ratio = out["dilated"]["ms"]["median"] / out["phase"]["ms"]["median"]
  out["dilated_over_phase"] = round(ratio, 4)
  out["verdict"] = ("dilated" if ratio < 0.99 else
                    "phase" if ratio > 1.01 else "tie (within ~1%)")
  print(json.dumps(out, indent=1))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(out, f, indent=1)
    log(f"wrote {args.out}")


if __name__ == "__main__":
  main()
