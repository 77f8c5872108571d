"""Ambient mesh context.

Flax modules have no clean channel for passing the device mesh down to op
implementations (the reference's equivalent problem — device groups — was
solved by reading ``jax.device_count()`` globally inside the net,
reference nets/xmc_net.py:192-201).  Here the training driver registers
the mesh it runs under and ops that want an explicit `shard_map` dispatch
(the sharded Pallas kernels) read it at *trace* time.

The context is process-global: one training job runs under one mesh.  The
setter is called by `MeshRules.create` so every entry point (train loop,
bench, dryrun, tests) gets it for free; `ambient_mesh` is a scoped
override for tests.
"""

from __future__ import annotations

import contextlib
from typing import Optional

from jax.sharding import Mesh

from xmcgan_image_generation_tpu.parallel import mesh as mesh_lib

_ambient: Optional[Mesh] = None


def set_ambient_mesh(mesh: Optional[Mesh]) -> None:
  global _ambient
  _ambient = mesh


def get_ambient_mesh() -> Optional[Mesh]:
  return _ambient


def ambient_data_axis_size() -> int:
  """Size of the ``data`` axis of the ambient mesh (1 if unset)."""
  if _ambient is None:
    return 1
  return int(_ambient.shape.get(mesh_lib.DATA_AXIS, 1))


@contextlib.contextmanager
def ambient_mesh(mesh: Optional[Mesh]):
  """Scoped ambient-mesh override (tests / nested tooling)."""
  global _ambient
  prev = _ambient
  _ambient = mesh
  try:
    yield mesh
  finally:
    _ambient = prev
