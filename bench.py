"""Training-throughput benchmark.

Measures images/sec/chip of the full XMC-GAN 128px training step (the
workload behind BASELINE.md's headline numbers) on the available devices,
and compares the GSPMD design against a reference-style pmap step (the
reference's execution model: per-device batches, replicated params, no
buffer donation, explicit cross-replica averaging — reference
train_utils.py:379-388).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def log(*a):
  print(*a, file=sys.stderr, flush=True)


def _is_oom(e: Exception) -> bool:
  msg = str(e)
  return any(s in msg for s in (
      "RESOURCE_EXHAUSTED", "Out of memory", "Ran out of memory",
      "hbm capacity", "ResourceExhausted"))


def build(config, batch_size):
  from xmcgan_image_generation_tpu.engine import create_train_state
  from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
  from xmcgan_image_generation_tpu.engine import xmc_gan
  from __graft_entry__ import _example_batch

  config.batch_size = batch_size
  super_batch = _example_batch(
      config, config.batch_size * config.d_step_per_g_step)
  super_batch = {k: jnp.asarray(v) for k, v in super_batch.items()}
  init_batch = split_batch(super_batch, config.d_step_per_g_step)[0]
  generator, discriminator, state = create_train_state(
      config, jax.random.PRNGKey(0), init_batch)
  additional_data = xmc_gan.create_additional_data(config)
  step = functools.partial(
      train_step, generator=generator, discriminator=discriminator,
      config=config, additional_data=additional_data)
  return step, state, super_batch


def time_steps(run_one, state, n_steps, repeats=1):
  """Times ``repeats`` independent windows of ``n_steps`` steps each.

  Returns the per-step seconds of every window (len == repeats).  The
  tunneled chip shows ±10-20% run-to-run variance (BENCH_NOTES), so
  single-window numbers cannot separate few-percent effects from noise;
  multi-window medians + IQR can.
  """
  # Warmup (compile + first execute).
  state = run_one(state, 0)
  jax.block_until_ready(state)
  times = []
  i = 1
  for _ in range(repeats):
    t0 = time.perf_counter()
    for _ in range(n_steps):
      state = run_one(state, i)
      i += 1
    jax.block_until_ready(state)
    times.append((time.perf_counter() - t0) / n_steps)
  return times


def spread_stats(values, gap=4.0):
  """Median / IQR / extremes of a list of samples, JSON-able.

  Same-program same-chip windows cannot legitimately differ by more
  than ``gap``x (the conv-pipeline A/B integrity rule): such a window is
  a broken measurement (tunnel dispatch glitch, queued executions not
  drained), never a real result.  Broken windows are excluded from the
  median/IQR but kept in ``windows`` with their index in
  ``suspect_windows`` so the record shows what was discarded.
  """
  v = np.asarray(values, np.float64)
  med_all = float(np.median(v))
  ok = (v > med_all / gap) & (v < med_all * gap)
  if not ok.any():  # degenerate; keep everything rather than nothing
    ok = np.ones_like(ok)
  vv = v[ok]
  q1, med, q3 = np.percentile(vv, [25, 50, 75])
  out = {
      "n": int(v.size),
      "median": round(float(med), 4),
      "iqr": round(float(q3 - q1), 4),
      "min": round(float(vv.min()), 4),
      "max": round(float(vv.max()), 4),
      "windows": [round(float(x), 4) for x in v],
  }
  if not ok.all():
    out["suspect_windows"] = [int(i) for i in np.flatnonzero(~ok)]
    out["n_valid"] = int(ok.sum())
  return out


def valid_median(values, gap=4.0):
  """Median over windows that pass the ``gap``x validity rule."""
  return spread_stats(values, gap=gap)["median"]


def bench_gspmd(step, state, super_batch, n_steps, repeats=1,
                compiler_options=None):
  """Our design: single jitted SPMD program, donated state."""
  from xmcgan_image_generation_tpu.parallel import MeshRules
  from xmcgan_image_generation_tpu.data.pipeline import host_batch_to_global

  rules = MeshRules.create()
  state = jax.device_put(state, rules.replicated)
  batch = host_batch_to_global(
      jax.tree_util.tree_map(np.asarray, super_batch), rules.mesh)
  step_fn = jax.jit(step, donate_argnums=(1,))
  if compiler_options:
    # TPU compiler flags can't ride XLA_FLAGS here (the client process
    # links a CPU-only XLA; the TPU compiler lives behind the tunnel) —
    # per-compile options are the only channel that reaches it.
    step_fn = step_fn.lower(
        jax.random.PRNGKey(1), state, batch).compile(
            compiler_options=compiler_options)

  def run_one(state, i):
    new_state, _ = step_fn(jax.random.fold_in(jax.random.PRNGKey(1), i),
                           state, batch)
    return new_state

  return time_steps(run_one, state, n_steps, repeats)


def bench_reference_jit(config, batch_size, n_steps):
  """The reference *design*, executed under jit so this environment's
  per-call pmap dispatch pathology cancels out of the comparison.

  Reference semantics kept: no buffer donation (the reference keeps the
  un-donated replicated state, train_utils.py:379-388 — which is why it
  tops out at half our batch), reference-layout spatial modulation
  (materialized concat conditioning, nets/xmc_net.py:233-241), no Pallas.
  Returns (sec_per_step, images_per_step).
  """
  import copy

  ref_config = copy.deepcopy(config)
  ref_config.fused_spatial_cond = False
  ref_config.use_pallas = False
  ref_config.scale_fused_convs = False  # ours-only optimization
  step, state, super_batch = build(ref_config, batch_size)
  from xmcgan_image_generation_tpu.parallel import MeshRules
  from xmcgan_image_generation_tpu.data.pipeline import host_batch_to_global

  rules = MeshRules.create()
  state = jax.device_put(state, rules.replicated)
  batch = host_batch_to_global(
      jax.tree_util.tree_map(np.asarray, super_batch), rules.mesh)
  step_fn = jax.jit(step)  # NO donation: the reference's memory model.

  def run_one(state, i):
    new_state, _ = step_fn(jax.random.fold_in(jax.random.PRNGKey(1), i),
                           state, batch)
    return new_state

  sec = time_steps(run_one, state, n_steps)[0]
  return sec, batch_size * ref_config.d_step_per_g_step


def bench_reference_style(step, state, super_batch, n_steps):
  """Reference execution model: pmap over local devices, replicated params,
  per-device batches, no donation, explicit metric pmean."""
  n_dev = jax.local_device_count()

  def per_device(rng, state, batch):
    new_state, metrics = step(rng, state, batch)
    metrics = jax.lax.pmean(metrics, axis_name="batch")
    return new_state, metrics

  p_step = jax.pmap(per_device, axis_name="batch")
  # Replicate via one jitted broadcast program (flax_utils.replicate is a
  # device dispatch per leaf — minutes over a remote-attached TPU).
  state = jax.jit(
      lambda s: jax.tree_util.tree_map(
          lambda x: jnp.broadcast_to(x[None], (n_dev,) + x.shape), s))(state)
  batch = jax.tree_util.tree_map(
      lambda x: np.asarray(x).reshape((n_dev, -1) + x.shape[1:]),
      super_batch)

  def run_one(state, i):
    rngs = jax.random.split(
        jax.random.fold_in(jax.random.PRNGKey(1), i), n_dev)
    new_state, _ = p_step(rngs, state, batch)
    return new_state

  return time_steps(run_one, state, n_steps)[0]


def _load_baseline_cache():
  import os
  cache_path = "/tmp/xmcgan_bench_baseline.json"
  repo_seed = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_BASELINE.json")
  cache = {}
  for path in (cache_path, repo_seed):
    if os.path.exists(path):
      try:
        with open(path) as f:
          cache = {**json.load(f), **cache}
      except Exception:  # noqa: BLE001
        pass
  return cache, cache_path


def _save_baseline_cache(cache, cache_path):
  with open(cache_path, "w") as f:
    json.dump(cache, f)


def _baseline_throughput(args, config, n_steps, n_chips, batch_size):
  """Images/sec/chip of the reference design, honestly measured.

  Runs the reference's semantics (no donation, reference-layout spatial
  modulation, no Pallas) under ``jax.jit`` so this environment's per-call
  pmap dispatch pathology (tens of ms per dispatch over the remote-attached
  chip; ~800 state leaves) does not inflate the comparison.  The batch is
  capped at the reference's feasible size — without donation the step holds
  two copies of the optimizer state, which halves the largest batch that
  fits.  Cached per (device kind, image size, chips): the baseline is a
  second full compile of the big program.
  """
  cache, cache_path = _load_baseline_cache()
  key = f"jitref|{jax.devices()[0].device_kind}|{args.image_size}|{n_chips}"
  if key in cache:
    log(f"baseline (cached): {cache[key]:.2f} images/sec/chip")
    return cache[key]

  # The reference trains at global batch 56 on 7 GPUs; without donation
  # batch//2 is what fits on one chip at 128px (measured round 1).
  for bs in (batch_size // 2, batch_size // 4):
    try:
      ref_sec, images = bench_reference_jit(config, bs, n_steps)
      ref = images / ref_sec / n_chips
      log(f"reference-design jit: {ref_sec*1e3:.1f} ms/step @ batch {bs}, "
          f"{ref:.2f} images/sec/chip")
      cache[key] = ref
      _save_baseline_cache(cache, cache_path)
      return ref
    except Exception as e:  # noqa: BLE001
      if _is_oom(e):
        log(f"reference-design jit OOM at batch {bs}")
        continue
      log(f"baseline variant failed ({type(e).__name__}: {e})")
      return None
  return None


def _pmap_measured(args, config, n_steps, n_chips, step, state, super_batch,
                   batch_size):
  """Raw measured throughput of the literal pmap execution model.

  Informational only (``--pmap_baseline``): on this remote-attached-chip
  environment the number is dominated by per-call dispatch overhead and is
  NOT a fair basis for ``vs_baseline``.
  """
  cache, cache_path = _load_baseline_cache()
  key = f"{jax.devices()[0].device_kind}|{args.image_size}|{n_chips}"
  if key in cache:
    log(f"pmap measured (cached): {cache[key]:.2f} images/sec/chip")
    return cache[key]
  for bs in (batch_size, batch_size // 2, batch_size // 4):
    try:
      if bs == batch_size:
        args_ = (step, state, super_batch)
      else:
        args_ = build(config, bs)
      ref_sec = bench_reference_style(*args_, n_steps)
      ref = bs * config.d_step_per_g_step / ref_sec / n_chips
      log(f"reference-style pmap: {ref_sec*1e3:.1f} ms/step @ batch {bs}, "
          f"{ref:.2f} images/sec/chip")
      cache[key] = ref
      _save_baseline_cache(cache, cache_path)
      return ref
    except Exception as e:  # noqa: BLE001
      if _is_oom(e):
        log(f"reference-style pmap OOM at batch {bs} "
            "(the reference design does not donate buffers)")
        continue
      log(f"pmap variant failed ({type(e).__name__}: {e})")
      return None
  return None


def main():
  parser = argparse.ArgumentParser()
  parser.add_argument("--quick", action="store_true",
                      help="fewer timing steps")
  parser.add_argument("--steps", type=int, default=None)
  parser.add_argument("--repeats", type=int, default=None,
                      help="independent timing windows for the headline "
                           "measurement (median + IQR reported); default 5, "
                           "1 with --quick")
  parser.add_argument("--image_size", type=int, default=128)
  parser.add_argument("--batch_size", type=int, default=None)
  parser.add_argument("--skip_baseline", action="store_true")
  parser.add_argument("--pmap_baseline", action="store_true",
                      help="also measure the literal pmap execution model "
                           "(informational; dispatch-dominated here)")
  parser.add_argument("--use_pallas", type=int, default=None, nargs="?",
                      const=1,
                      help="1/0: fused Pallas contrastive kernels in the "
                           "step (default: the config's setting; bare "
                           "--use_pallas means 1 for compatibility)")
  parser.add_argument("--remat_min_resolution", type=int, default=None,
                      help="force remat on, rematerializing only blocks "
                           "at/above this feature-map side (0 = all)")
  parser.add_argument("--remat_policy", default=None,
                      choices=("full", "conv"),
                      help="remat policy: full (save nothing) or conv "
                           "(save conv/matmul outputs, recompute only "
                           "elementwise glue — an HBM-bandwidth lever); "
                           "forces remat on")
  parser.add_argument("--compiler_option", action="append", default=[],
                      help="TPU compiler flag as name=value, passed via "
                           "compiled-program options (XLA_FLAGS can't reach "
                           "the tunneled TPU compiler); repeatable")
  parser.add_argument("--conv_backward", default=None,
                      help="conv gradient algorithm: xla|auto|tap9|cat "
                           "(ops/mxu_conv.py)")
  parser.add_argument("--scale_fused_convs", type=int, default=None,
                      help="1/0: fold G upsamples / D pools into the "
                           "adjacent convs (ops/scale_fuse.py)")
  parser.add_argument("--upconv_method", default=None,
                      choices=["phase", "dilated"],
                      help="scale-fused upsample-conv formulation: phase "
                           "kernels + depth-to-space, or one base-dilated "
                           "conv (ops/scale_fuse.py)")
  parser.add_argument("--dual_cotangent_vjp", type=int, default=None,
                      help="1/0: reference-style single-vjp dual-cotangent "
                           "G+D gradients instead of two minimal grad "
                           "passes (engine/xmc_gan.py) — equal FLOPs, "
                           "possibly different HBM traffic")
  parser.add_argument("--grad_accum_steps", type=int, default=None,
                      help="accumulate each G/D update over this many "
                           "scanned microbatches (capacity knob: live "
                           "activations are one microbatch's; "
                           "engine/xmc_gan.py)")
  parser.add_argument("--test_config", action="store_true",
                      help="tiny get_test_config dims (CI smoke of the "
                           "bench pipeline itself; not a benchmark)")
  args = parser.parse_args()

  compiler_options = None
  if args.compiler_option:
    compiler_options = {}
    for opt in args.compiler_option:
      name, _, value = opt.partition("=")
      compiler_options[name] = value

  n_steps = args.steps or (3 if args.quick else 10)
  repeats = args.repeats or (1 if args.quick else 5)

  # Device acquisition watchdog: when the axon TPU tunnel is down, the
  # first backend touch blocks inside PJRT with multi-minute retries.
  # Fail fast with a diagnosable message instead of hanging the caller.
  import os
  import threading

  def _no_devices():
    log("FATAL: no XLA backend became ready within 180s "
        "(TPU tunnel down?); aborting benchmark")
    os._exit(3)

  watchdog = threading.Timer(180.0, _no_devices)
  watchdog.daemon = True
  watchdog.start()
  n_chips = jax.device_count()
  watchdog.cancel()
  log(f"devices: {jax.devices()}")

  if args.test_config:
    from xmcgan_image_generation_tpu.configs.coco_xmc import (
        get_test_config as get_config)
  elif args.image_size == 256:
    # The paper 256px configuration (selective remat etc.).
    from xmcgan_image_generation_tpu.configs.coco_xmc_256 import get_config
  else:
    from xmcgan_image_generation_tpu.configs.coco_xmc import get_config
  config = get_config()
  if args.test_config:
    args.image_size = config.image_size
  else:
    config.image_size = args.image_size
  config.data_source = "synthetic"
  if args.use_pallas is not None:
    config.use_pallas = bool(args.use_pallas)
  if args.remat_min_resolution is not None:
    config.remat = True
    config.remat_min_resolution = args.remat_min_resolution
  if args.remat_policy is not None:
    config.remat = True
    config.remat_policy = args.remat_policy
  if args.conv_backward is not None:
    config.conv_backward = args.conv_backward
  if args.scale_fused_convs is not None:
    config.scale_fused_convs = bool(args.scale_fused_convs)
  if args.upconv_method is not None:
    config.upconv_method = args.upconv_method
  if args.dual_cotangent_vjp is not None:
    config.dual_cotangent_vjp = bool(args.dual_cotangent_vjp)
  if args.grad_accum_steps is not None:
    config.grad_accum_steps = args.grad_accum_steps

  # Global batch: the reference's 56 (configs/coco_xmc.py:49), scaled up
  # with chip count, with OOM fallback for small-HBM parts.  256px fits
  # batch ~16 on a 16GB chip with selective remat.
  if args.batch_size:
    candidates = [args.batch_size]
  elif args.image_size >= 256:
    candidates = [16 * max(1, n_chips), 8]
  else:
    candidates = [56 * max(1, n_chips // 8), 28, 14]
  # stack_microbatches requires batch % k == 0; round non-conforming
  # fallback candidates down to the nearest divisible size so the OOM
  # fallback path never trips its ValueError.
  k = args.grad_accum_steps or 1
  if k > 1:
    candidates = sorted(
        {max(k, (bs // k) * k) for bs in candidates}, reverse=True)

  def measure_variant(cfg, cands):
    for bs in cands:
      try:
        step, state0, super_batch = build(cfg, bs)
        # Keep a pristine copy: the gspmd variant donates its state.
        state_copy = jax.jit(
            lambda s: jax.tree_util.tree_map(jnp.copy, s))(state0)
        secs = bench_gspmd(step, state0, super_batch, n_steps, repeats,
                           compiler_options=compiler_options)
        return step, state_copy, super_batch, bs, secs
      except Exception as e:  # noqa: BLE001 - OOM fallback
        if _is_oom(e):
          log(f"batch {bs} OOM, retrying smaller")
          continue
        raise
    return None

  built = measure_variant(config, candidates)
  if built is None:
    raise RuntimeError("All batch sizes OOMed")
  step, state_copy, super_batch, batch_size, secs_per_step = built

  images_per_step = batch_size * config.d_step_per_g_step
  # Median over windows passing the 4x validity rule (spread_stats):
  # a window 4x off its siblings is a broken dispatch measurement.
  sec_per_step = valid_median(secs_per_step)
  throughput = images_per_step / sec_per_step / n_chips
  throughputs = [images_per_step / s / n_chips for s in secs_per_step]
  log(f"gspmd ({'fused' if config.scale_fused_convs else 'naive'} convs): "
      f"{sec_per_step*1e3:.1f} ms/step (median of {len(secs_per_step)} "
      f"windows x {n_steps} steps), batch {batch_size}, "
      f"{throughput:.2f} images/sec/chip")

  vs_baseline = 1.0
  extra = {}
  if len(throughputs) > 1:
    extra["spread"] = spread_stats(throughputs)

  # Conv-pipeline A/B: with no explicit --scale_fused_convs, measure the
  # other pipeline (scale-fused vs naive resample+conv — ops/scale_fuse.py)
  # at the same batch and report whichever wins.  The two are numerically
  # equivalent (tests/test_scale_fuse.py); this is a pure implementation
  # choice, so the headline is the framework's best configuration.
  #
  # The alternate pipeline is measured in a FRESH subprocess.  Isolation
  # is load-bearing, not hygiene: a second large program timed in the same
  # process over the remote-attached chip has reported impossible step
  # times (45x faster than its FLOPs allow — block_until_ready returning
  # before the queued executions drain), while the identical measurement
  # in its own process is correct.  A plausibility guard backstops this:
  # the two pipelines differ by at most 2.25x in conv FLOPs, so a >4x
  # throughput gap is a broken measurement, never a real result, and the
  # primary (first-program-in-process, always-correct) number keeps the
  # headline.
  if args.scale_fused_convs is None:
    import os as _os
    import subprocess

    alt_fused = not config.scale_fused_convs
    cmd = [sys.executable, _os.path.abspath(__file__),
           "--skip_baseline", f"--scale_fused_convs={int(alt_fused)}",
           f"--batch_size={batch_size}", f"--steps={n_steps}",
           f"--repeats={repeats}"]
    if args.test_config:
      cmd.append("--test_config")
    else:
      cmd.append(f"--image_size={args.image_size}")
    if args.use_pallas is not None:
      cmd.append(f"--use_pallas={int(args.use_pallas)}")
    if args.remat_min_resolution is not None:
      cmd.append(f"--remat_min_resolution={args.remat_min_resolution}")
    if args.remat_policy is not None:
      cmd.append(f"--remat_policy={args.remat_policy}")
    if args.conv_backward is not None:
      cmd.append(f"--conv_backward={args.conv_backward}")
    if args.dual_cotangent_vjp is not None:
      cmd.append(f"--dual_cotangent_vjp={args.dual_cotangent_vjp}")
    if args.grad_accum_steps is not None:
      cmd.append(f"--grad_accum_steps={args.grad_accum_steps}")
    for opt in args.compiler_option:
      cmd += ["--compiler_option", opt]
    alt_tp, alt_spread = None, None
    try:
      proc = subprocess.run(cmd, capture_output=True, text=True,
                            timeout=1800)
      log(proc.stderr.strip())
      if proc.returncode == 0:
        alt_json = json.loads(proc.stdout.strip().splitlines()[-1])
        alt_tp = alt_json["value"]
        alt_spread = alt_json.get("spread")
      else:
        log(f"conv-pipeline A/B subprocess failed (rc={proc.returncode})")
    except Exception as e:  # noqa: BLE001 - A/B is best-effort
      log(f"conv-pipeline A/B variant failed ({type(e).__name__}: {e})")
    if alt_tp is not None:
      names = {True: "fused", False: "naive"}
      extra["conv_pipeline"] = {
          names[config.scale_fused_convs]: round(throughput, 3),
          names[alt_fused]: round(alt_tp, 3),
      }
      if "spread" in extra:
        extra["conv_pipeline"][
            f"{names[config.scale_fused_convs]}_spread"] = extra["spread"]
      if alt_spread is not None:
        extra["conv_pipeline"][f"{names[alt_fused]}_spread"] = alt_spread
      ratio = max(alt_tp, throughput) / max(1e-9, min(alt_tp, throughput))
      if ratio > 4.0:
        log(f"conv-pipeline A/B implausible ({ratio:.1f}x apart; the "
            "pipelines differ by at most 2.25x in FLOPs) — keeping the "
            "primary measurement")
        extra["conv_pipeline"]["suspect"] = True
      elif alt_tp > throughput:
        config.scale_fused_convs = alt_fused
        throughput, sec_per_step = alt_tp, images_per_step / alt_tp / n_chips
        if alt_spread is not None:
          extra["spread"] = alt_spread
        else:
          extra.pop("spread", None)
      extra["conv_pipeline"]["selected"] = names[config.scale_fused_convs]
  if not args.skip_baseline:
    ref_throughput = _baseline_throughput(
        args, config, n_steps, n_chips, batch_size)
    if ref_throughput:
      vs_baseline = throughput / ref_throughput
      extra["baseline"] = {
          "design": "reference semantics under jit (no donation, "
                    "reference-layout modulation, reference feasible batch)",
          "images_per_sec_per_chip": round(ref_throughput, 3),
      }
  if args.pmap_baseline:
    pmap_tp = _pmap_measured(args, config, n_steps, n_chips, step,
                             state_copy, super_batch, batch_size)
    if pmap_tp:
      extra["pmap_measured"] = {
          "images_per_sec_per_chip": round(pmap_tp, 3),
          "caveat": "literal pmap dispatch is pathological on this "
                    "remote-attached chip; informational only, not the "
                    "basis of vs_baseline",
      }

  print(json.dumps({
      "metric": f"xmcgan-{args.image_size}px train throughput "
                f"(batch {batch_size}, d_steps "
                f"{config.d_step_per_g_step}, "
                f"{'pallas, ' if config.use_pallas else ''}"
                f"{'scale-fused, ' if config.scale_fused_convs else ''}"
                "bf16) [baseline=jit-reference-design]",
      "value": round(throughput, 3),
      "unit": "images/sec/chip",
      "vs_baseline": round(vs_baseline, 4),
      # vs_baseline semantics marker: since round 2, the denominator is the
      # reference design executed under jit (NOT the raw pmap measurement,
      # which lives behind --pmap_baseline as "pmap_measured").  Consumers
      # comparing across rounds must match this kind.
      "vs_baseline_kind": "jit-reference-design",
      # Scope marker: this benchmark feeds one pre-placed device batch
      # (compute throughput).  End-to-end throughput with the real input
      # pipeline is host-CPU-bound on small hosts — see BENCH_NOTES.md
      # "Input pipeline end to end" (241-274 img/s on a 1-core host;
      # a ~4-core host sustains the compute rate with pre-resized shards).
      "input_pipeline": "synthetic pre-placed batch; e2e numbers in "
                        "BENCH_NOTES.md (host-bound on 1-core hosts)",
      **extra,
  }))


if __name__ == "__main__":
  main()
