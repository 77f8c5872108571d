"""The jitted outer training step: n-critic loop over a super-batch.

Parity with reference xmcgan/train_utils.py:69-130: the input pipeline
delivers a super-batch of ``d_step_per_g_step * batch_size`` examples; the
step splits it, runs ``d_step_per_g_step - 1`` discriminator-only updates,
then one joint G+D update.  The whole loop is unrolled inside a single
`jax.jit` over the mesh — one compiled SPMD program per outer step, no
per-substep dispatch.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import ml_collections

from xmcgan_image_generation_tpu.engine import xmc_gan
from xmcgan_image_generation_tpu.engine.state import TrainState

Array = jnp.ndarray
Batch = Dict[str, Array]


def split_batch(batch: Batch, splits: int, axis: int = 0) -> List[Batch]:
  """Splits every array in the batch into ``splits`` equal sub-batches.

  Parity with `split_input_dict` (reference train_utils.py:69-88).  Under
  GSPMD each sub-batch stays sharded over the data axis.
  """
  split_tree = jax.tree_util.tree_map(
      lambda x: jnp.split(x, splits, axis=axis), batch)
  return [
      {k: split_tree[k][i] for k in batch} for i in range(splits)
  ]


def stack_microbatches(batch: Batch, k: int) -> Batch:
  """``[B, ...]`` -> ``[k, B//k, ...]`` microbatch stacking for `lax.scan`.

  Used by gradient accumulation (``config.grad_accum_steps``): each update
  scans over ``k`` microbatches, so live activation memory is one
  microbatch's instead of the full batch's.  Microbatch ``i`` holds rows
  ``[i*B//k, (i+1)*B//k)`` — the same partition `split_batch` would give.

  Under GSPMD the incoming batch is sharded on dim 0; the stacked layout
  is pinned to ``P(None, "data", ...)`` so each microbatch stays sharded
  over the data axis (no-op without an ambient mesh, or when the
  microbatch doesn't divide it).

  The contiguous-row partition costs a cross-device redistribution of
  the batch bytes each step (a shard-local partition wouldn't), but it
  is load-bearing, not arbitrary: microbatch composition is semantics
  here — the contrastive losses pool their negatives within a
  microbatch (as the reference pools within a device batch,
  libml/losses.py), so the partition must be the documented, seed-stable
  `split_batch` one, not whatever layout happens to be resident.  The
  redistribution is priced by `tools/grad_accum_census.py` (AOT census
  at flagship shapes) and bounded on silicon by the measured -0.7%
  same-global-batch overhead (BENCH_NOTES "gradient accumulation on
  silicon").
  """
  if k <= 1:
    return batch

  def f(x: Array) -> Array:
    if x.shape[0] % k:
      raise ValueError(
          f"batch dim {x.shape[0]} not divisible by grad_accum_steps={k}")
    return _constrain_microbatch_rows(
        x.reshape((k, x.shape[0] // k) + x.shape[1:]))

  return jax.tree_util.tree_map(f, batch)


def _constrain_microbatch_rows(x: Array) -> Array:
  """Pins dim 1 (the per-microbatch example axis) to the data mesh axis."""
  from xmcgan_image_generation_tpu.parallel import context as mesh_context
  from xmcgan_image_generation_tpu.parallel import mesh as mesh_lib

  mesh = mesh_context.get_ambient_mesh()
  if mesh is None:
    return x
  data = int(mesh.shape.get(mesh_lib.DATA_AXIS, 1))
  if data <= 1 or x.shape[1] % data:
    return x
  spec = jax.sharding.PartitionSpec(
      None, mesh_lib.DATA_AXIS, *([None] * (x.ndim - 2)))
  return jax.lax.with_sharding_constraint(
      x, jax.sharding.NamedSharding(mesh, spec))


def train_step(
    rng: jax.Array,
    state: TrainState,
    batch: Batch,
    *,
    gan_model: Any = xmc_gan,
    generator: functools.partial,
    discriminator: functools.partial,
    config: ml_collections.ConfigDict,
    additional_data: Dict[str, Any],
) -> Tuple[TrainState, Dict[str, Array]]:
  """One outer step: (n-1) D updates + 1 joint G+D update.

  Parity with reference train_utils.py:91-130.
  """
  n = config.d_step_per_g_step
  rngs = jax.random.split(rng, n)
  sub_batches = split_batch(batch, n)
  for i in range(n - 1):
    state = gan_model.train_d(rngs[i], state, sub_batches[i], generator,
                              discriminator, config)
  state, metrics = gan_model.train_g_d(rngs[-1], state, sub_batches[-1],
                                       generator, discriminator, config,
                                       additional_data)
  return state, metrics
