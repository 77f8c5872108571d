"""Device mesh + sharding service.

The reference parallelizes with `jax.pmap(..., axis_name="batch")` and
explicit `lax.pmean` grad averaging (reference xmcgan/train_utils.py:379-388,
xmcgan/xmc_gan.py:170-171).  Here the whole train step is a single jitted
SPMD program over a named `jax.sharding.Mesh`:

* batches are sharded on the ``data`` axis (`P("data")` on dim 0),
* parameters/optimizer state are replicated (`P()`),
* XLA inserts the gradient all-reduce and the contrastive-negative
  all-gathers over ICI automatically.

A second ``model`` axis is laid out (default size 1) so tensor-parallel
shardings can be introduced without re-plumbing callers.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import numpy as np

DATA_AXIS = "data"
MODEL_AXIS = "model"


def create_mesh(
    data: int = -1,
    model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
  """Creates a ``(data, model)`` mesh over the available devices.

  Args:
    data: Size of the data axis. ``-1`` consumes all remaining devices.
    model: Size of the model axis (kept at 1 for pure data parallelism).
    devices: Optional explicit device list (defaults to ``jax.devices()``).

  Returns:
    A `jax.sharding.Mesh` with axes ``("data", "model")``.
  """
  explicit_devices = devices is not None
  if devices is None:
    devices = jax.devices()
  n = len(devices)
  if data == -1:
    if n % model:
      raise ValueError(f"{n} devices not divisible by model={model}")
    data = n // model
  if data * model != n:
    raise ValueError(f"mesh {data}x{model} != {n} devices")
  if not explicit_devices:
    # Topology-aware ordering: lay the axes along the physical ICI torus
    # so neighboring mesh coordinates are neighboring chips.
    try:
      from jax.experimental import mesh_utils

      dev_array = mesh_utils.create_device_mesh((data, model),
                                                devices=devices)
      return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))
    except Exception:  # noqa: BLE001 - fall back to list order.
      pass
  dev_array = np.asarray(devices).reshape(data, model)
  return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
  """Fully-replicated sharding (parameters, optimizer state, EMA)."""
  return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Leading-dim ``data``-sharded layout for batch arrays."""
  return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(batch: Any, mesh: Mesh) -> Any:
  """Places a host batch onto the mesh, sharded on the leading dim.

  The equivalent of the host->device transfer the reference performs
  implicitly at pmap dispatch (reference xmcgan/train_utils.py:421-424),
  but explicit: one `jax.device_put` per leaf with a `NamedSharding`, so
  the subsequent jitted step sees its inputs already resident and laid out.
  """
  sharding = batch_sharding(mesh)
  return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), batch)


def to_host(tree: Any) -> Any:
  """Global device arrays -> host numpy, multi-host safe.

  Data-sharded outputs are not fully addressable from one process; gather
  them across processes first (single-process: a plain device_get).
  """
  import numpy as _np

  if jax.process_count() == 1:
    return jax.tree_util.tree_map(_np.asarray, tree)
  from jax.experimental import multihost_utils

  return multihost_utils.process_allgather(tree, tiled=True)


@dataclasses.dataclass(frozen=True)
class MeshRules:
  """Bundles the shardings a training job needs.

  Attributes:
    mesh: The device mesh.
    batch: Sharding for input batches (data-sharded dim 0).
    replicated: Sharding for model/optimizer state.
  """

  mesh: Mesh
  batch: NamedSharding
  replicated: NamedSharding

  @classmethod
  def create(cls, data: int = -1, model: int = 1,
             devices: Optional[Sequence[jax.Device]] = None) -> "MeshRules":
    mesh = create_mesh(data, model, devices=devices)
    # Register the mesh so ops with explicit shard_map dispatch (the
    # sharded Pallas kernels) can pick it up at trace time.
    from xmcgan_image_generation_tpu.parallel import context

    context.set_ambient_mesh(mesh)
    return cls(
        mesh=mesh,
        batch=batch_sharding(mesh),
        replicated=replicated_sharding(mesh),
    )

  @property
  def data_axis_size(self) -> int:
    return self.mesh.shape[DATA_AXIS]
