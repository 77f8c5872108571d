"""Real-TPU regression probe: full jitted train step, XLA vs Pallas path.

pytest's conftest pins the suite to the 8-device virtual CPU platform, so
this check runs outside pytest, on the actual chip:

  python tools/tpu_smoke.py [--image_size 128] [--batch_size 56] [--steps 3]

Runs the flagship config's train step twice from identical state — once
with ``use_pallas=False`` and once with ``True`` — and asserts every step
metric matches within bf16 tolerance.  Exits non-zero on mismatch.  This is
the ``use_pallas`` regression test the 128px training config relies on.
"""

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--image_size", type=int, default=128)
  parser.add_argument("--batch_size", type=int, default=56)
  parser.add_argument("--steps", type=int, default=3)
  parser.add_argument("--rtol", type=float, default=5e-3)
  parser.add_argument("--atol", type=float, default=5e-3)
  parser.add_argument("--time_steps", type=int, default=0,
                      help="also time each path over this many chained "
                           "steps (bench.py-style loop)")
  args = parser.parse_args()

  from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  from xmcgan_image_generation_tpu.data.pipeline import host_batch_to_global
  from xmcgan_image_generation_tpu.engine import create_train_state
  from xmcgan_image_generation_tpu.engine import xmc_gan
  from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
  from xmcgan_image_generation_tpu.parallel import MeshRules
  from __graft_entry__ import _example_batch

  config = get_config()
  config.image_size = args.image_size
  config.batch_size = args.batch_size
  config.data_source = "synthetic"

  super_batch = _example_batch(
      config, config.batch_size * config.d_step_per_g_step)
  init_batch = split_batch(
      {k: jnp.asarray(v) for k, v in super_batch.items()},
      config.d_step_per_g_step)[0]
  generator, discriminator, state0 = create_train_state(
      config, jax.random.PRNGKey(0), init_batch)
  additional_data = xmc_gan.create_additional_data(config)
  rules = MeshRules.create()
  batch = host_batch_to_global(super_batch, rules.mesh)

  results = {}
  for use_pallas in (False, True):
    import copy

    cfg = copy.deepcopy(config)
    cfg.use_pallas = use_pallas
    # Rebuild the model factories from cfg: the modules read use_pallas
    # from the config object they were constructed with, so reusing the
    # originals would silently keep both phases on the XLA path.  The
    # parameter trees are identical across the two paths, so state0
    # applies unchanged.
    from xmcgan_image_generation_tpu.models import get_architecture

    dtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32
    gen_p, disc_p = get_architecture(cfg, dtype)
    step_fn = jax.jit(functools.partial(
        train_step, generator=gen_p, discriminator=disc_p,
        config=cfg, additional_data=additional_data))
    state = jax.device_put(
        jax.tree_util.tree_map(jnp.copy, state0), rules.replicated)
    metrics = None
    for i in range(args.steps):
      state, metrics = step_fn(
          jax.random.fold_in(jax.random.PRNGKey(1), i), state, batch)
    results[use_pallas] = {k: float(v) for k, v in metrics.items()}
    print(f"use_pallas={use_pallas}: "
          + " ".join(f"{k}={v:.4f}" for k, v in results[use_pallas].items()),
          flush=True)

    if args.time_steps:
      import time

      # Release the correctness phase's state before timing: at batch 84
      # an extra live TrainState copy OOMs the 16 GB chip.
      state = metrics = None

      timed_fn = jax.jit(functools.partial(
          train_step, generator=gen_p, discriminator=disc_p,
          config=cfg, additional_data=additional_data),
          donate_argnums=(1,))
      tstate = jax.device_put(
          jax.tree_util.tree_map(jnp.copy, state0), rules.replicated)
      tstate, m = timed_fn(jax.random.PRNGKey(2), tstate, batch)
      jax.block_until_ready(m["d_loss"])
      t0 = time.perf_counter()
      for i in range(args.time_steps):
        tstate, m = timed_fn(
            jax.random.fold_in(jax.random.PRNGKey(3), i), tstate, batch)
      jax.block_until_ready(m["d_loss"])
      ms = (time.perf_counter() - t0) / args.time_steps * 1e3
      imgs = args.batch_size * config.d_step_per_g_step / (ms / 1e3)
      print(f"use_pallas={use_pallas}: {ms:.1f} ms/step "
            f"({imgs:.1f} images/sec/chip)", flush=True)
      tstate = m = None  # Free before the next path's state copy.

  failed = []
  for key, ref in results[False].items():
    got = results[True][key]
    if not np.isfinite(got) or abs(got - ref) > args.atol + args.rtol * abs(ref):
      failed.append(f"{key}: xla={ref:.5f} pallas={got:.5f}")
  if failed:
    print("PALLAS/XLA MISMATCH:\n" + "\n".join(failed))
    sys.exit(1)
  print(f"OK: pallas path matches xla path over {args.steps} steps "
        f"at batch {args.batch_size}/{args.image_size}px")


if __name__ == "__main__":
  main()
