"""Orbax checkpointing of TrainState + grain data-iterator state.

The TPU-native replacement for `clu.checkpoint.MultihostCheckpoint`
(reference xmcgan/train_utils.py:372-375): Orbax handles the multi-host
coordination and atomicity itself (no per-host ``{dir}-{host}`` directories
to reconcile, unlike reference utils/task_manager.py:28-48), and the data
iterator state is a small grain dict rather than a serialized tf.data
iterator.  ``max_to_keep=5`` and save cadence match the reference defaults.
"""

from __future__ import annotations

from typing import Any, Optional

import grain.python as pg
import orbax.checkpoint as ocp

from xmcgan_image_generation_tpu.utils import fileio

STATE_ITEM = "state"
DATA_ITEM = "data_iter"


class CheckpointManager:
  """Thin wrapper bundling model-state + data-iterator checkpointing."""

  def __init__(self, directory: str, *, max_to_keep: int = 5,
               with_data_iter: bool = True):
    # Orbax speaks gs:// natively; only local paths need absolutizing.
    self.directory = fileio.abspath(directory)
    self._with_data = with_data_iter
    item_names = [STATE_ITEM] + ([DATA_ITEM] if with_data_iter else [])
    item_handlers = {STATE_ITEM: ocp.StandardCheckpointHandler()}
    if with_data_iter:
      item_handlers[DATA_ITEM] = pg.PyGrainCheckpointHandler()
    self._mngr = ocp.CheckpointManager(
        self.directory,
        options=ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep, create=True),
        item_names=item_names,
        item_handlers=item_handlers,
    )

  def save(self, step: int, state: Any,
           data_iter: Optional[pg.PyGrainDatasetIterator] = None) -> None:
    items = {STATE_ITEM: ocp.args.StandardSave(state)}
    if self._with_data and data_iter is not None:
      items[DATA_ITEM] = pg.PyGrainCheckpointSave(data_iter)
    self._mngr.save(step, args=ocp.args.Composite(**items))

  def restore(
      self, step: int, state_template: Any,
      data_iter: Optional[pg.PyGrainDatasetIterator] = None,
      *, sharding: Any = None) -> Any:
    """Restores state (and, in place, the data iterator) at ``step``.

    With ``sharding`` set, arrays are restored directly into that
    `jax.sharding` (each process reads its shards from the shared
    checkpoint) — required multi-host, where a restore onto local devices
    followed by a re-placement would need cross-host transfers the
    backend may not support.
    """
    if sharding is not None:
      import jax

      state_template = jax.tree_util.tree_map(
          lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                         sharding=sharding),
          state_template)
    items = {STATE_ITEM: ocp.args.StandardRestore(state_template)}
    if self._with_data and data_iter is not None:
      items[DATA_ITEM] = pg.PyGrainCheckpointRestore(data_iter)
    restored = self._mngr.restore(step, args=ocp.args.Composite(**items))
    return restored[STATE_ITEM]

  def restore_or_initialize(
      self, state: Any,
      data_iter: Optional[pg.PyGrainDatasetIterator] = None,
      *, sharding: Any = None) -> Any:
    """Restores the latest checkpoint if one exists, else returns ``state``.

    Parity with `restore_or_initialize` (reference train_utils.py:375).
    """
    step = self.latest_step()
    if step is None:
      return state
    return self.restore(step, state, data_iter, sharding=sharding)

  def latest_step(self) -> Optional[int]:
    return self._mngr.latest_step()

  def all_steps(self):
    return sorted(self._mngr.all_steps())

  def wait_until_finished(self) -> None:
    self._mngr.wait_until_finished()

  def close(self) -> None:
    self._mngr.close()


def checkpoints_dir(workdir: str) -> str:
  """The reference layout: ``{workdir}/checkpoints``
  (train_utils.py:370)."""
  return fileio.join(workdir, "checkpoints")
