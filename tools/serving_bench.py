"""Inference/serving throughput: exported artifact vs in-framework jit.

Times single-device generator inference (the serving hot path) two ways:

  1. in-framework: ``jax.jit`` of the inference-mode generator apply;
  2. exported: the ``jax.export`` StableHLO artifact round-tripped through
     ``serialize``/``deserialize`` (what a standalone serving runtime runs).

Both paths execute the same program on the same weights, so any gap is
serialization/calling overhead — expected ~0.  Prints one JSON line with
images/sec for each path.

Usage (random-init weights unless --workdir has a checkpoint):
  python tools/serving_bench.py [--config_module coco_xmc[:variant]]
      [--workdir DIR] [--batch_size 64] [--steps 20]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import bench  # spread_stats / valid_median (the 4x window-validity rule)

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def time_calls(fn, inputs, steps, windows=5):
  """Times ``windows`` independent windows of ``steps`` calls each.

  Returns (sec_per_call_median, per_window_list).  The median is over
  windows passing bench.py's 4x validity rule: the `call_exported`
  dispatch over the axon tunnel has shown bimodal per-launch behavior
  (BENCH_NOTES round-4 serving record), so every serving measurement
  records its raw windows and flags implausible ones instead of
  silently averaging over them.
  """
  out = fn(*inputs)            # compile + warm
  jax.block_until_ready(out)
  per_window = []
  for _ in range(windows):
    t0 = time.perf_counter()
    for _ in range(steps):
      out = fn(*inputs)
    jax.block_until_ready(out)
    per_window.append((time.perf_counter() - t0) / steps)
  return bench.valid_median(per_window), per_window


def main():
  p = argparse.ArgumentParser(description=__doc__)
  p.add_argument("--config_module", default="coco_xmc")
  p.add_argument("--workdir", default=None,
                 help="training workdir with checkpoints (default: "
                      "random-init weights — timing only)")
  p.add_argument("--batch_size", type=int, default=64)
  p.add_argument("--steps", type=int, default=20)
  p.add_argument("--windows", type=int, default=5,
                 help="independent timing windows per path; medians are "
                      "over windows passing the 4x validity rule")
  p.add_argument("--sizes", action="store_true",
                 help="also export f32/bf16/int8 artifacts and report "
                      "byte sizes + the int8 output deviation vs the "
                      "full-precision artifact")
  p.add_argument("--symbolic", action="store_true",
                 help="also export ONE symbolic-batch artifact and time "
                      "it at batch 8/32/64 (each batch size is its own "
                      "XLA specialization at call time)")
  args = p.parse_args()

  from xmcgan_image_generation_tpu.engine import create_train_state
  from xmcgan_image_generation_tpu.utils import serving

  config = serving.load_config_module(args.config_module)
  b = args.batch_size
  generator, _, state = create_train_state(
      config, jax.random.PRNGKey(config.seed),
      serving.make_init_batch(config))
  if args.workdir:
    from xmcgan_image_generation_tpu.parallel import MeshRules
    from xmcgan_image_generation_tpu.utils.checkpoint import (
        CheckpointManager, checkpoints_dir)
    rules = MeshRules.create(config.get("mesh_data", -1),
                             config.get("mesh_model", 1))
    ckpt = CheckpointManager(checkpoints_dir(args.workdir),
                             with_data_iter=False)
    step = ckpt.latest_step()
    if step is not None:
      state = ckpt.restore(step, state, sharding=rules.replicated)
      log(f"restored checkpoint step {step}")
    ckpt.close()
  variables = {"params": state.ema_params, **state.generator_state}

  rng = np.random.RandomState(0)
  inputs = tuple(jnp.asarray(x) for x in (
      rng.randn(b, serving.BERT_DIM).astype(np.float32),
      rng.randn(b, serving.COCO_MAX_TEXT_LENGTH,
                serving.BERT_DIM).astype(np.float32),
      rng.randint(3, 18, size=(b, 1)).astype(np.float32),
      rng.randn(b, config.z_dim).astype(np.float32),
  ))

  jitted = jax.jit(serving.generator_serving_fn(generator, variables,
                                                config))
  sec_jit, jit_windows = time_calls(jitted, inputs, args.steps,
                                    args.windows)
  log(f"in-framework jit: {sec_jit*1e3:.2f} ms/batch, "
      f"{b/sec_jit:.1f} images/sec")

  exported = serving.export_generator(generator, variables, config,
                                      batch_size=b)
  restored = serving.load_exported(bytes(exported.serialize()))
  sec_art, art_windows = time_calls(restored.call, inputs, args.steps,
                                    args.windows)
  log(f"exported artifact: {sec_art*1e3:.2f} ms/batch, "
      f"{b/sec_art:.1f} images/sec")

  result = {
      "metric": f"xmcgan-{config.image_size}px generator serving "
                f"throughput (batch {b})",
      "images_per_sec_jit": round(b / sec_jit, 2),
      "images_per_sec_exported": round(b / sec_art, 2),
      "export_overhead": round(sec_art / sec_jit, 4),
      "unit": "images/sec",
      # Raw per-window records (ms/batch) + the validity verdicts: the
      # exported-path dispatch has shown bimodal per-launch behavior over
      # the axon tunnel, so the raw windows ARE the finding, not noise.
      "jit_windows_ms": bench.spread_stats([s * 1e3 for s in jit_windows]),
      "exported_windows_ms": bench.spread_stats(
          [s * 1e3 for s in art_windows]),
  }

  if args.symbolic:
    exp_sym = serving.export_generator(generator, dict(variables), config,
                                       batch_size=None)
    restored_sym = serving.load_exported(bytes(exp_sym.serialize()))
    sym = {}
    for bs in (8, 32, 64):
      r = np.random.RandomState(1)
      ins = tuple(jnp.asarray(x) for x in (
          r.randn(bs, serving.BERT_DIM).astype(np.float32),
          r.randn(bs, serving.COCO_MAX_TEXT_LENGTH,
                  serving.BERT_DIM).astype(np.float32),
          r.randint(3, 18, size=(bs, 1)).astype(np.float32),
          r.randn(bs, config.z_dim).astype(np.float32),
      ))
      sec, sym_windows = time_calls(restored_sym.call, ins, args.steps,
                                    args.windows)
      sym[f"batch_{bs}"] = round(bs / sec, 2)
      sym[f"batch_{bs}_windows_ms"] = bench.spread_stats(
          [s * 1e3 for s in sym_windows])
      log(f"symbolic artifact @ batch {bs}: {sec*1e3:.2f} ms/batch, "
          f"{bs/sec:.1f} images/sec")
    result["images_per_sec_symbolic_artifact"] = sym

  if args.sizes:
    import copy

    from xmcgan_image_generation_tpu.models import get_architecture

    sizes = {}
    outputs = {}
    # bf16 first: the execute step is best-effort (the axon tunnel's
    # remote-compile endpoint rejects request bodies the size of the f32
    # artifact with HTTP 413), and the int8-vs-bf16 deviation bound is
    # the one that gates the quantized-serving opt-in.
    for name, dtype, quantize in (("bf16", "bfloat16", None),
                                  ("int8", "bfloat16", "int8"),
                                  ("f32", "float32", None)):
      cfg = copy.deepcopy(config)
      cfg.dtype = dtype
      # Rebuild the generator module with the variant's compute dtype —
      # the module bakes its dtype in at construction; the params tree is
      # structurally identical across dtypes.
      gen_v, _ = get_architecture(
          cfg, jnp.float32 if dtype == "float32" else jnp.bfloat16)
      exp = serving.export_generator(gen_v, dict(variables), cfg,
                                     batch_size=b, quantize=quantize)
      blob = bytes(exp.serialize())
      sizes[name] = len(blob)
      log(f"artifact {name}: {len(blob)/1e6:.2f} MB")
      try:
        outputs[name] = np.asarray(
            serving.load_exported(blob).call(*inputs))
      except Exception as e:  # size limits of the transport, OOM, ...
        log(f"artifact {name}: execute skipped ({type(e).__name__}: "
            f"{str(e)[:120]})")
    result["artifact_bytes"] = sizes
    for what_a, what_b in (("int8", "bf16"), ("bf16", "f32")):
      if what_a in outputs and what_b in outputs:
        result[f"{what_a}_max_abs_dev_vs_{what_b}"] = round(
            float(np.max(np.abs(outputs[what_a].astype(np.float64)
                                - outputs[what_b].astype(np.float64)))), 5)

  print(json.dumps(result))


if __name__ == "__main__":
  main()
