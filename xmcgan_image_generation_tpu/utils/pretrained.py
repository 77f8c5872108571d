"""Frozen feature-extractor registry (ResNet-50 tower).

Capability parity with reference xmcgan/utils/pretrained_model_utils.py:
a frozen ResNet-50 whose 1000-d head drives the pretrained image-image
contrastive loss (reference xmc_gan.py:85-90).  Weights load from the same
``.npy`` dict format (``{"params": ..., "batch_stats": ...}``); with no
checkpoint the tower is deterministically random-initialized — exactly the
mode the reference's own tests exercise
(reference utils/pretrained_model_utils_test.py:28-36).
"""

from __future__ import annotations

import functools
import re
from typing import Any, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from xmcgan_image_generation_tpu.models import resnet_v1

RESNET_IMG_SIZE = 224


@flax.struct.dataclass
class FrozenTowerState:
  params: Any
  batch_stats: Any


def _flatten_reference_stages(tree: Any) -> Any:
  """Adapts the reference's ``stage{i}/block{j}/...`` param nesting.

  The reference ResNet wraps blocks in a ``ResNetStage`` submodule
  (reference utils/resnet_v1.py:89-107), so its ``resnet_pretrained.npy``
  nests as ``stage1 -> block1 -> conv1``.  Our tower names blocks directly
  (``stage1_block1/conv1`` — models/resnet_v1.py:109).  Both layouts load:
  nested stage dicts are flattened here; already-flat trees pass through.
  """
  if not isinstance(tree, dict):
    tree = dict(tree)
  out = {}
  for key, value in tree.items():
    if (re.fullmatch(r"stage\d+", key)
        and hasattr(value, "items")
        and value
        and all(re.fullmatch(r"block\d+", b) for b in value)):
      for block, sub in value.items():
        out[f"{key}_{block}"] = sub
    else:
      out[key] = value
  return out


def _check_tree_compat(loaded: Any, template: Any, what: str) -> None:
  """Raises with the offending paths if the checkpoint doesn't fit."""
  l_flat = {"/".join(str(k.key) for k in p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(loaded)[0]}
  t_flat = {"/".join(str(k.key) for k in p): v.shape
            for p, v in jax.tree_util.tree_flatten_with_path(template)[0]}
  missing = sorted(set(t_flat) - set(l_flat))
  extra = sorted(set(l_flat) - set(t_flat))
  bad_shape = sorted(k for k in set(l_flat) & set(t_flat)
                     if tuple(l_flat[k]) != tuple(t_flat[k]))
  if missing or extra or bad_shape:
    raise ValueError(
        f"Pretrained {what} does not match the model: "
        f"missing={missing[:5]} extra={extra[:5]} "
        f"shape-mismatch={bad_shape[:5]}")


def get_pretrained_model(
    model_name: str = "resnet50",
    checkpoint_path: Optional[str] = None,
    dtype: Any = jnp.bfloat16,
) -> Tuple[nn.Module, FrozenTowerState]:
  """Builds the frozen tower and loads (or randomly inits) its weights.

  Args:
    model_name: Only ``"resnet50"`` is registered (parity with reference
      utils/pretrained_model_utils.py:79-80).
    checkpoint_path: Optional path to a ``.npy`` pickle dict with keys
      ``params`` / ``batch_stats``.  ``None`` or ``""`` => random init.

  Returns:
    ``(module, state)``.
  """
  if model_name != "resnet50":
    raise ValueError(f"Model {model_name!r} not supported.")
  # bf16 compute by default: the tower is frozen inference inside the
  # train step (MXU-friendly); the contrastive loss casts its 1000-d
  # outputs back to f32.
  model = resnet_v1.ResNet50(num_classes=1000, dtype=dtype)
  # Jitted init: one program instead of one device dispatch per layer.
  variables = jax.jit(functools.partial(model.init, train=False))(
      jax.random.PRNGKey(42),
      jnp.ones((1, RESNET_IMG_SIZE, RESNET_IMG_SIZE, 3)))
  params = variables["params"]
  batch_stats = variables["batch_stats"]
  if checkpoint_path:
    with open(checkpoint_path, "rb") as f:
      data = np.load(f, allow_pickle=True).item()
    loaded_params = _flatten_reference_stages(data["params"])
    loaded_stats = _flatten_reference_stages(data["batch_stats"])
    _check_tree_compat(loaded_params, params, "params")
    _check_tree_compat(loaded_stats, batch_stats, "batch_stats")
    params = jax.tree_util.tree_map(jnp.asarray, loaded_params)
    batch_stats = jax.tree_util.tree_map(jnp.asarray, loaded_stats)
  return model, FrozenTowerState(params=params, batch_stats=batch_stats)


def get_pretrained_embs(
    state: FrozenTowerState, model: nn.Module,
    images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Runs frozen inference: ``(7x7x2048 features, 1000-d logits)``.

  Resizes to 224x224 bilinear when needed and stops gradients through the
  tower's weights (the tower is frozen; gradients still flow to the input
  images, which is what the contrastive-on-pretrained loss needs).
  """
  if images.ndim != 4 or images.shape[-1] != 3:
    raise ValueError("images should be of shape (N, H, W, 3).")
  if images.shape[1] != RESNET_IMG_SIZE or images.shape[2] != RESNET_IMG_SIZE:
    images = jax.image.resize(
        images,
        (images.shape[0], RESNET_IMG_SIZE, RESNET_IMG_SIZE, images.shape[-1]),
        "bilinear")
  variables = {"params": state.params, "batch_stats": state.batch_stats}
  pool, out = model.apply(variables, images, train=False, mutable=False)
  return pool, out
