"""Bridge for checkpoints produced by the reference implementation.

Our model parameter trees are *structurally identical* to the reference's
(same module class names, creation order, and shapes — verified bit-exact
for both Generator and Discriminator forwards in
tests/test_reference_bridge.py), so reference weights load directly:

* ``g_params`` / ``d_params`` / ``ema_params`` / mutable state
  collections: verbatim.
* ``flax.optim.Adam`` slots (``grad_ema`` / ``grad_sq_ema`` per param,
  reference train_utils.py:181-186) map onto optax's
  ``ScaleByAdamState.mu / .nu``.
* The fused-spatial-modulation generator layout (our default) is reached
  from the reference layout by splitting each LocalConditionalBatchNorm
  1x1 kernel into its region-context and global-vector parts (exact).

The on-disk format is the msgpack blob `clu.checkpoint` writes with
`flax.serialization` (reference utils/task_manager.py:50-67).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from xmcgan_image_generation_tpu.engine.state import TrainState

REGION_DIM = 768  # BERT feature width of the region-context map.


def load_reference_msgpack(path: str) -> Dict[str, Any]:
  """Reads a reference flax-serialized checkpoint into nested dicts.

  Routed through the fileio seam so reference checkpoints can live on
  gs:// exactly where the reference's own task manager keeps them
  (reference utils/task_manager.py:50-67 reads them via tf.io.gfile).
  """
  import flax.serialization

  from xmcgan_image_generation_tpu.utils import fileio

  return flax.serialization.msgpack_restore(fileio.read_bytes(path))


def _adam_slots(param_states: Dict[str, Any], slot: str):
  """flax.optim per-param state dicts -> one optax-style tree."""
  if isinstance(param_states, dict):
    if set(param_states) >= {"grad_ema", "grad_sq_ema"}:
      return jnp.asarray(param_states[slot])
    return {k: _adam_slots(v, slot) for k, v in param_states.items()}
  raise TypeError(f"Unexpected param_states leaf: {type(param_states)}")


def _fill_adam_state(template_opt_state, step: int, param_states):
  """Rebuilds an optax.adam state tuple from flax.optim slots."""
  mu = _adam_slots(param_states, "grad_ema")
  nu = _adam_slots(param_states, "grad_sq_ema")

  def fill(node):
    if hasattr(node, "mu") and hasattr(node, "nu"):
      return node._replace(
          count=jnp.asarray(step, jnp.int32),
          mu=jax.tree_util.tree_map(jnp.asarray, mu),
          nu=jax.tree_util.tree_map(jnp.asarray, nu))
    return node

  return tuple(fill(part) for part in template_opt_state)


def split_modulation_kernels(naive_params: Dict[str, Any],
                             region_dim: int = REGION_DIM
                             ) -> Dict[str, Any]:
  """Reference-layout generator params -> fused-modulation layout.

  Splits each LocalConditionalBatchNorm 1x1 conv kernel
  ``[1, 1, region_dim + global_dim, C]`` into the fused pair
  (ctx conv ``[1, 1, region_dim, C]``, global dense
  ``[global_dim, C]`` + bias) and renames the spatial blocks.  Exact
  (see ops/normalization.FusedSpatialModulation).
  """
  flat = _flatten(naive_params)
  mapped: Dict[str, np.ndarray] = {}
  for path, value in flat.items():
    p = path.replace("GenSpatialBlock_", "GenSpatialBlockFused_")
    if "LocalConditionalBatchNorm" in p:
      base, tail = p.split("LocalConditionalBatchNorm")
      idx, rest = tail.split("/", 1)
      mod = f"{base}FusedSpatialModulation{idx}"
      names = {"Conv_0": ("gamma_ctx", "gamma_global"),
               "Conv_1": ("beta_ctx", "beta_global")}
      handled = False
      for conv, (ctx, glob) in names.items():
        if rest.startswith(conv + "/"):
          leaf = rest.rsplit("/", 1)[-1]
          if leaf == "kernel":
            mapped[f"{mod}/{ctx}/kernel"] = value[:, :, :region_dim, :]
            mapped[f"{mod}/{glob}/kernel"] = value[0, 0, region_dim:, :]
          elif leaf == "bias":
            mapped[f"{mod}/{glob}/bias"] = value
          handled = True
      if not handled:
        mapped[f"{mod}/{rest}"] = value
    else:
      mapped[p] = value
  return _unflatten(mapped)


def rename_state_for_fused(state_tree: Dict[str, Any]) -> Dict[str, Any]:
  """Mutable-collection paths of the naive layout -> fused layout."""
  flat = _flatten(state_tree)
  return _unflatten({
      k.replace("GenSpatialBlock_", "GenSpatialBlockFused_").replace(
          "LocalConditionalBatchNorm", "FusedSpatialModulation"): v
      for k, v in flat.items()
  })


def convert_reference_train_state(
    raw: Dict[str, Any],
    template: TrainState,
    fused_spatial_cond: bool = True,
) -> TrainState:
  """Reference TrainState dict -> our TrainState.

  ``raw`` is the msgpack structure of the reference's checkpointed unit
  (reference train_utils.py:42-51): step, g_optimizer / d_optimizer
  (flax.optim {state: {step, param_states}, target}), generator_state,
  discriminator_state, ema_params.
  """
  step = int(raw["step"])
  g_params = raw["g_optimizer"]["target"]
  d_params = raw["d_optimizer"]["target"]
  ema_params = raw["ema_params"]
  generator_state = raw.get("generator_state") or {}
  discriminator_state = raw.get("discriminator_state") or {}

  g_opt = _fill_adam_state(
      template.g_opt_state, raw["g_optimizer"]["state"]["step"],
      raw["g_optimizer"]["state"]["param_states"])
  d_opt = _fill_adam_state(
      template.d_opt_state, raw["d_optimizer"]["state"]["step"],
      raw["d_optimizer"]["state"]["param_states"])

  if fused_spatial_cond:
    g_params = split_modulation_kernels(g_params)
    ema_params = split_modulation_kernels(ema_params)
    generator_state = {k: rename_state_for_fused(v)
                       for k, v in generator_state.items()}
    # Optimizer slots follow the same parameter-tree transform.
    g_opt = tuple(
        part._replace(mu=split_modulation_kernels(part.mu),
                      nu=split_modulation_kernels(part.nu))
        if hasattr(part, "mu") else part for part in g_opt)

  as_arrays = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
  return template.replace(
      step=jnp.asarray(step, jnp.int32),
      g_params=as_arrays(g_params),
      d_params=as_arrays(d_params),
      g_opt_state=g_opt,
      d_opt_state=d_opt,
      generator_state=as_arrays(generator_state),
      discriminator_state=as_arrays(discriminator_state),
      ema_params=as_arrays(ema_params),
  )


def _flatten(tree, prefix=""):
  out = {}
  for k, v in tree.items():
    path = f"{prefix}/{k}" if prefix else k
    if isinstance(v, dict):
      out.update(_flatten(v, path))
    else:
      out[path] = v
  return out


def _unflatten(flat):
  out: Dict[str, Any] = {}
  for path, v in flat.items():
    node = out
    parts = path.split("/")
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = v
  return out
