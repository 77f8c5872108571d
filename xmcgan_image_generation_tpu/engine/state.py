"""Train state: the checkpointed unit of a GAN training job.

Capability parity with the reference's `TrainState`
(reference xmcgan/train_utils.py:42-51) — step, both optimizers, both
mutable model-state collections, EMA parameters — modernized:

* optax `GradientTransformation`s replace the deprecated `flax.optim.Adam`;
  optimizer *state* lives in the TrainState, the transformations themselves
  are static and passed alongside.
* Everything in the state is a pytree of arrays, replicated over the mesh
  (GSPMD), and serializable with Orbax as-is.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import ml_collections
import optax

from xmcgan_image_generation_tpu.models import get_architecture


@flax.struct.dataclass
class TrainState:
  """Checkpointed training state.

  Attributes:
    step: Global step counter (int32 scalar on device).
    g_params / d_params: Generator / discriminator parameters (f32).
    g_opt_state / d_opt_state: optax Adam states.
    generator_state: Mutable collections of G (``batch_stats`` and, when G
      uses spectral norm, ``spectral_norm_stats``).
    discriminator_state: Mutable collections of D (``spectral_norm_stats``).
    ema_params: Polyak average of g_params (initialized to g_params,
      reference train_utils.py:170).
  """

  step: jnp.ndarray
  g_params: Any
  d_params: Any
  g_opt_state: Any
  d_opt_state: Any
  generator_state: Dict[str, Any]
  discriminator_state: Dict[str, Any]
  ema_params: Any


def _learning_rate(config: ml_collections.ConfigDict, base: float,
                   opt_steps_per_train_step: int = 1):
  """Learning rate (or optax schedule) for one optimizer.

  The reference trains at constant LRs only (reference
  train_utils.py:181-186); ``config.lr_schedule`` adds the standard
  production schedules on top: "constant" (default), "cosine" (linear
  warmup to ``base``, cosine decay to 0) or "linear" (linear warmup,
  linear decay to 0).  ``lr_warmup_steps`` / ``lr_decay_steps`` count
  OUTER train steps; the discriminator takes ``d_step_per_g_step``
  optimizer steps per outer step, so its schedule is stretched by that
  factor and both nets decay on the same wall-clock.
  """
  sched = config.get("lr_schedule", "constant")
  if sched == "constant":
    return base
  # Validate on the raw config values BEFORE stretching by
  # opt_steps_per_train_step, so the error quotes the numbers the user
  # actually configured (not e.g. 2x them for the discriminator).
  raw_warmup = int(config.get("lr_warmup_steps", 0))
  raw_decay = int(config.get("lr_decay_steps", 0))
  if raw_decay <= 0:
    raise ValueError(
        "lr_schedule != 'constant' requires lr_decay_steps > 0 "
        "(num_train_steps may be epoch-derived and unknown statically)")
  if raw_warmup >= raw_decay:
    raise ValueError(f"lr_warmup_steps ({raw_warmup}) must be < "
                     f"lr_decay_steps ({raw_decay})")
  warmup = raw_warmup * opt_steps_per_train_step
  decay = raw_decay * opt_steps_per_train_step
  if sched == "cosine":
    return optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=base, warmup_steps=warmup,
        decay_steps=decay, end_value=0.0)
  if sched == "linear":
    return optax.join_schedules(
        [optax.linear_schedule(0.0, base, max(warmup, 1)),
         optax.linear_schedule(base, 0.0, decay - warmup)],
        [warmup])
  raise ValueError(f"Unknown lr_schedule: {sched!r}")


def learning_rates(config: ml_collections.ConfigDict):
  """The configured (G, D) learning rates.

  Floats for the constant default; optax schedule callables otherwise.
  The D schedule counts OPTIMIZER steps: evaluate it at
  ``outer_step * d_step_per_g_step`` (train.py logs both per step so a
  decaying schedule is visible in ``metrics.jsonl``).
  """
  return (_learning_rate(config, config.g_lr),
          _learning_rate(config, config.d_lr,
                         int(config.get("d_step_per_g_step", 1))))


def create_optimizers(
    config: ml_collections.ConfigDict
) -> Tuple[optax.GradientTransformation, optax.GradientTransformation]:
  """Dual Adam with the reference's asymmetric learning rates.

  lr G 1e-4 / D 4e-4, betas (0.5, 0.999) (reference configs/coco_xmc.py:37-40,
  train_utils.py:181-186).  With ``config.lr_schedule`` set, the constant
  rates become scheduled peaks (see `_learning_rate`); the optimizer
  state then carries a schedule step count, so the knob must be chosen
  before training starts (checkpoint structure differs).
  """
  g_tx = optax.adam(_learning_rate(config, config.g_lr),
                    b1=config.beta1, b2=config.beta2)
  d_tx = optax.adam(
      _learning_rate(config, config.d_lr,
                     int(config.get("d_step_per_g_step", 1))),
      b1=config.beta1, b2=config.beta2)
  return g_tx, d_tx


def create_train_state(
    config: ml_collections.ConfigDict,
    rng: jax.Array,
    init_batch: Dict[str, jnp.ndarray],
) -> Tuple[functools.partial, functools.partial, TrainState]:
  """Initializes models and optimizers from a template batch.

  Parity with reference train_utils.py:133-193: G is initialized from
  ``(batch, z)``, D from ``(concat(image, image), batch)``, EMA starts as a
  copy of the generator parameters.

  Returns:
    ``(generator_factory, discriminator_factory, state)`` where the
    factories take ``train=...``.
  """
  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  generator, discriminator = get_architecture(config, dtype)

  d_rng, g_rng, z_rng = jax.random.split(rng, 3)
  g_tx, d_tx = create_optimizers(config)

  # One jitted program builds the whole state: running the hundreds of
  # per-layer initializers eagerly costs a device dispatch each (minutes on
  # a remote-attached TPU); under jit it is a single compile + execute.
  init = functools.partial(_build_state, generator, discriminator, g_tx,
                           d_tx, config)
  state = jax.jit(init)(init_batch, g_rng, d_rng, z_rng)
  log_parameter_overview(state.g_params, "generator")
  log_parameter_overview(state.d_params, "discriminator")
  return generator, discriminator, state


def _build_state(generator, discriminator, g_tx, d_tx, config,
                 init_batch, g_rng, d_rng, z_rng) -> TrainState:
  """Traceable state construction shared by `create_train_state` (jitted)
  and `abstract_train_state` (eval_shape)."""
  from xmcgan_image_generation_tpu.ops.images import image_to_float

  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  batch_size = init_batch["image"].shape[0]
  z = jax.random.normal(z_rng, (batch_size, config.z_dim), dtype)
  g_variables = dict(generator(train=False).init(g_rng, (init_batch, z)))
  g_params = g_variables.pop("params")
  real = image_to_float(init_batch["image"])
  all_images = jnp.concatenate([real, real], axis=0)
  d_variables = dict(
      discriminator(train=False).init(d_rng, (all_images, init_batch)))
  d_params = d_variables.pop("params")
  return TrainState(
      step=jnp.zeros((), jnp.int32),
      g_params=g_params,
      d_params=d_params,
      g_opt_state=g_tx.init(g_params),
      d_opt_state=d_tx.init(d_params),
      generator_state=g_variables,
      discriminator_state=d_variables,
      # A *copy*, not an alias: the train step donates the whole state
      # and XLA rejects one buffer appearing under two donated leaves.
      ema_params=jax.tree_util.tree_map(jnp.copy, g_params),
  )


def abstract_train_state(
    config: ml_collections.ConfigDict,
    init_batch: Dict[str, Any],
) -> Tuple[functools.partial, functools.partial, TrainState]:
  """`create_train_state` without running anything: the returned state is
  a pytree of `jax.ShapeDtypeStruct`s (via `jax.eval_shape`).

  For AOT lowering/compilation of the train step at flagship shapes
  (tests/test_multichip_aot.py) where a real init would be wasteful.
  ``init_batch`` may hold arrays or `ShapeDtypeStruct`s.
  """
  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  generator, discriminator = get_architecture(config, dtype)
  g_tx, d_tx = create_optimizers(config)
  rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
  state = jax.eval_shape(
      functools.partial(_build_state, generator, discriminator, g_tx, d_tx,
                        config),
      init_batch, rng, rng, rng)
  return generator, discriminator, state


def log_parameter_overview(params: Any, name: str) -> None:
  """Logs per-module and total parameter counts.

  The clu.parameter_overview equivalent (reference train_utils.py:177-180).
  """
  import logging

  log = logging.getLogger("xmcgan_tpu")
  flat = jax.tree_util.tree_flatten_with_path(params)[0]
  total = 0
  for path, leaf in flat:
    size = int(leaf.size)
    total += size
    log.debug("%s/%s: %s = %d", name,
              "/".join(str(getattr(p, "key", p)) for p in path),
              tuple(leaf.shape), size)
  log.info("%s parameters: %s total", name, f"{total:,}")
