"""Training orchestration: the GSPMD train loop.

Capability parity with `train` (reference xmcgan/train_utils.py:312-461),
TPU-native:

* One `jax.jit`-compiled SPMD train step over a named mesh (no pmap, no
  per-device rng plumbing, no replicate/unreplicate) with donated state.
* Host batches are assembled into global data-sharded arrays with
  `jax.make_array_from_process_local_data` — works unchanged single-host
  and multi-host (call `jax.distributed.initialize()` before `train` for
  multi-controller runs).
* Orbax checkpoints carry both TrainState and the grain iterator state, so
  a restart resumes parameters *and* the exact data position
  (the reference's tf.data-iterator resume, train_utils.py:372-376).
* Steps are annotated with `jax.profiler.StepTraceAnnotation` for xprof.
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import ml_collections

from xmcgan_image_generation_tpu.data import create_datasets
from xmcgan_image_generation_tpu.data.pipeline import (
    DevicePrefetchIterator,
)
from xmcgan_image_generation_tpu.engine import (
    create_train_state,
    get_gan_algorithm,
)
from xmcgan_image_generation_tpu.engine.sampling import generate_batch
from xmcgan_image_generation_tpu.engine.state import learning_rates
from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
from xmcgan_image_generation_tpu.parallel import MeshRules, to_host
from xmcgan_image_generation_tpu.utils import fileio
from xmcgan_image_generation_tpu.utils.checkpoint import (
    CheckpointManager,
    checkpoints_dir,
)
from xmcgan_image_generation_tpu.utils.metric_writer import (
    MetricAccumulator,
    MetricWriter,
    Profile,
    ReportProgress,
)
from xmcgan_image_generation_tpu.utils.preemption import PreemptionGuard
from xmcgan_image_generation_tpu.utils.task_manager import (
    TaskManagerWithCsvResults,
)

log = logging.getLogger("xmcgan_tpu")


def compute_num_train_steps(config: ml_collections.ConfigDict,
                            num_train_examples: int) -> int:
  """Step budget from the epoch budget.

  ``steps_per_epoch = examples // (global_batch * d_step_per_g_step)``:
  every outer step consumes a super-batch.  (The reference divides by
  ``local_device_count * d_step_per_g_step`` instead — an apparent bug
  that inflates the step count; see train_utils.py:342-345.)
  """
  if config.num_train_steps != -1:
    return config.num_train_steps
  steps_per_epoch = max(
      1, num_train_examples
      // (config.batch_size * config.d_step_per_g_step))
  return steps_per_epoch * config.num_epochs


def train(config: ml_collections.ConfigDict, workdir: str,
          test_mode: bool = False) -> None:
  """Runs the training loop; resumes from ``workdir`` checkpoints if any.

  Args:
    config: Hyperparameters (see configs/coco_xmc.py).
    workdir: Output directory for checkpoints, metrics and image grids.
    test_mode: Force a 1-step run (smoke).
  """
  fileio.makedirs(workdir, exist_ok=True)
  rules = MeshRules.create(config.get("mesh_data", -1),
                           config.get("mesh_model", 1))
  log.info("mesh: %s; %d processes", rules.mesh.shape, jax.process_count())
  if config.batch_size % rules.data_axis_size:
    raise ValueError(
        f"Global batch size {config.batch_size} must be divisible by the "
        f"data mesh axis ({rules.data_axis_size} devices).")

  gan_model = get_gan_algorithm(config)
  additional_data = gan_model.create_additional_data(config)

  rng = jax.random.PRNGKey(config.seed)
  rng, model_rng, train_rng, sample_rng = jax.random.split(rng, 4)

  train_loader, eval_loader, num_train_examples = create_datasets(
      config, seed=config.seed)
  # Device prefetch: overlaps host decode/augment + transfer with the
  # running step, with exact-resume state snapshots.
  train_iter = DevicePrefetchIterator(
      iter(train_loader), rules.mesh,
      size=config.get("prefetch_batches", 2))
  num_train_steps = 1 if test_mode else compute_num_train_steps(
      config, num_train_examples)
  log.info("num_train_steps=%d (examples=%d)", num_train_steps,
           num_train_examples)

  # Initialize model/optimizers from the first sub-batch's shapes.  The
  # consumed super-batch is kept as the abstract template for the
  # cost-analysis lowering below.
  template_batch = next(train_iter)
  init_batch = split_batch(template_batch, config.d_step_per_g_step)[0]
  generator, discriminator, state = create_train_state(
      config, model_rng, init_batch)

  ckpt = CheckpointManager(checkpoints_dir(workdir))
  task_manager = TaskManagerWithCsvResults(checkpoints_dir(workdir))
  # A restore lands straight on the mesh (multi-host safe); fresh init is
  # placed by the device_put below (a no-op after a restore).
  state = ckpt.restore_or_initialize(state, train_iter,
                                     sharding=rules.replicated)
  initial_step = int(state.step) + 1
  state = jax.device_put(state, rules.replicated)

  step_fn = jax.jit(
      functools.partial(
          train_step,
          gan_model=gan_model,
          generator=generator,
          discriminator=discriminator,
          config=config,
          additional_data=additional_data,
      ),
      donate_argnums=(1,),
  )
  sample_fn = jax.jit(
      functools.partial(generate_batch, generator=generator, config=config))

  writer = MetricWriter(workdir, just_logging=jax.process_index() > 0)
  if initial_step == 1:
    writer.write_hparams(dict(config))
  # One extra trace buys production observability: XLA cost analysis of
  # the lowered step gives model FLOPs/step, so progress reports carry
  # perf/images_per_sec and perf/tflops_per_sec_per_device (MFU against
  # the part's peak).
  flops_per_step = None
  if config.get("log_perf", True):
    try:
      flops_per_step = float(
          step_fn.lower(jax.random.fold_in(train_rng, 0), state,
                        template_batch).cost_analysis()["flops"])
      log.info("train step: %.2f TFLOP (cost analysis)",
               flops_per_step / 1e12)
    except Exception as e:  # noqa: BLE001 - observability is best-effort
      log.info("step cost analysis unavailable: %s", e)
  del template_batch, init_batch  # free the device-resident templates
  progress = ReportProgress(
      every_steps=min(100, config.log_loss_every_steps),
      num_train_steps=num_train_steps, writer=writer,
      flops_per_step=flops_per_step,
      images_per_step=config.batch_size * config.d_step_per_g_step,
      num_devices=jax.device_count())
  hooks = [progress]
  if jax.process_index() == 0 and config.get("profile", False):
    # Host-0 xprof capture (the reference's periodic_actions.Profile,
    # train_utils.py:405-412).
    hooks.append(Profile(workdir, profile_step=10, num_profile_steps=5))
  acc = MetricAccumulator()
  # Scheduled LRs are evaluated host-side at logging time (floats when
  # constant — nothing logged; callables when config.lr_schedule is set).
  g_lr_sched, d_lr_sched = learning_rates(config)

  # Preemption (SIGTERM) checkpoints at an agreed step and exits cleanly
  # WITHOUT TRAIN_DONE, so a restarted job resumes where it stopped.
  # margin must exceed the worst cross-process marker-visibility skew in
  # steps (SPMD lockstep bounds execution skew to 1; raise it on shared
  # filesystems with coarse attribute caching, e.g. NFS/gcsfuse).
  guard = PreemptionGuard(workdir, initial_step,
                          margin=config.get("preemption_margin", 2),
                          process_index=jax.process_index())
  guard.install()
  preempted_at = None

  log.info("Starting training loop at step %d.", initial_step)
  try:
    for step in range(initial_step, num_train_steps + 1):
      is_last = step == num_train_steps
      with jax.profiler.StepTraceAnnotation("train", step_num=step):
        batch = next(train_iter)
        step_rng = jax.random.fold_in(train_rng, step)
        state, metrics = step_fn(step_rng, state, batch)
        acc.update(metrics)
      for hook in hooks:
        hook(step)

      if step % config.log_loss_every_steps == 0 or is_last:
        scalars = acc.compute_and_reset()
        if callable(g_lr_sched):  # non-constant schedule: make it visible
          scalars["g_lr"] = float(g_lr_sched(step))
          scalars["d_lr"] = float(
              d_lr_sched(step * config.d_step_per_g_step))
        writer.write_scalars(step, scalars)

      if step % config.eval_every_steps == 0 or is_last:
        vis_batch = split_batch(batch, config.d_step_per_g_step)[0]
        sample = sample_fn(
            jax.random.fold_in(sample_rng, step), state, vis_batch)
        sample = to_host(sample)
        writer.write_images(
            step, {
                "generated_image": sample["generated_image"],
                "ema_generated_image": sample["ema_generated_image"],
                "original_image": sample["image"],
            }, max_images=config.show_num)

      preempt_now = guard.should_stop(step)
      if (step % config.checkpoint_every_steps == 0 or is_last
          or preempt_now):
        t0 = time.monotonic()
        ckpt.save(step, jax.device_get(state), train_iter)
        log.info("checkpoint @%d saved in %.2fs", step,
                 time.monotonic() - t0)
      if preempt_now:
        preempted_at = step
        break

    # Keep absorbing further SIGTERMs (orchestrators often re-signal
    # within the grace window) until the async Orbax save has COMMITTED;
    # restoring the default disposition earlier would let a second
    # signal kill the finalize and discard the preemption checkpoint.
    ckpt.wait_until_finished()
    ckpt.close()
  finally:
    guard.uninstall()
  writer.flush()
  if preempted_at is not None:
    log.info("Preempted: stopped and checkpointed at step %d (of %d); "
             "restart to resume.", preempted_at, num_train_steps)
    return
  guard.cleanup()  # a signal within margin of the end leaves a live marker
  if jax.process_index() == 0:
    task_manager.mark_training_done()
  log.info("Finished training at step %d.", num_train_steps)
