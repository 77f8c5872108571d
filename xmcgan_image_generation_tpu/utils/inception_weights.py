"""InceptionV3 weight loading (converted-``.npz`` or deterministic init).

The reference converts Keras InceptionV3 variables to a Flax pytree at
*runtime* with a regex bridge (reference utils/inception_utils.py:28-94,
128-149).  Here conversion is an *offline* step
(`tools/convert_keras_inception.py`) producing an ``.npz`` keyed by
flattened flax paths; at runtime we only load arrays — no Keras/TF in the
serving path.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

log = logging.getLogger("xmcgan_tpu")

INCEPTION_SIZE = 299


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
  """Pytree -> {'a/b/c': array} with '/'-joined paths."""
  out = {}
  for key, value in tree.items():
    path = f"{prefix}/{key}" if prefix else key
    if isinstance(value, dict):
      out.update(flatten_tree(value, path))
    else:
      out[path] = np.asarray(value)
  return out


def unflatten_tree(flat: Dict[str, np.ndarray]) -> Dict[str, Any]:
  out: Dict[str, Any] = {}
  for path, value in flat.items():
    parts = path.split("/")
    node = out
    for p in parts[:-1]:
      node = node.setdefault(p, {})
    node[parts[-1]] = jnp.asarray(value)
  return out


def load_or_init(model: nn.Module,
                 ckpt_path: Optional[str] = None) -> Dict[str, Any]:
  """Returns model variables: loaded from ``.npz`` or random-initialized.

  Random init is deterministic (seed 0) so FID values are comparable
  across runs of the same codebase even without pretrained weights.
  """
  variables = jax.jit(
      lambda rng: model.init(
          rng, jnp.ones((1, INCEPTION_SIZE, INCEPTION_SIZE, 3)),
          train=False))(jax.random.PRNGKey(0))
  if not ckpt_path:
    log.warning(
        "No InceptionV3 checkpoint provided: using random weights. FID/IS "
        "track relative progress only and are NOT comparable to published "
        "numbers.")
    return variables
  flat_template = flatten_tree(
      flax.core.unfreeze(variables) if hasattr(variables, "unfreeze")
      else dict(variables))
  loaded = dict(np.load(ckpt_path))
  missing = sorted(set(flat_template) - set(loaded))
  extra = sorted(set(loaded) - set(flat_template))
  if missing or extra:
    raise ValueError(
        f"Inception checkpoint mismatch: missing={missing[:5]}... "
        f"extra={extra[:5]}...")
  for key, value in loaded.items():
    if tuple(value.shape) != tuple(flat_template[key].shape):
      raise ValueError(
          f"Shape mismatch for {key}: checkpoint {value.shape} vs model "
          f"{flat_template[key].shape}")
  log.info("Loaded InceptionV3 weights from %s (%d arrays)", ckpt_path,
           len(loaded))
  return unflatten_tree(loaded)
