"""Deterministic, checkpointable input pipeline (grain).

Capability parity with reference xmcgan/libml/input_pipeline.py:27-108,
redesigned TPU-first:

* grain's index-based sampler replaces tf.data + clu.deterministic_data:
  global shuffle is a seeded permutation per epoch, per-host sharding is
  `ShardByJaxProcess`, and the iterator state is a small dict (saved with
  Orbax via `PyGrainCheckpointHandler`) instead of a serialized tf.data
  iterator (the reference's resume mechanism, train_utils.py:372-375).
* The train loader emits *super-batches* of
  ``d_step_per_g_step * batch_size / process_count`` examples per host
  (reference libml/input_pipeline.py:46-47); `host_batch_to_global`
  assembles the global sharded array on the mesh.
* Per-example randomness comes from grain's per-record RNG, so any record
  is reproducible independently of worker count or batch order.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import grain.python as pg
import jax
import ml_collections
import numpy as np

from xmcgan_image_generation_tpu.data import preprocessing
from xmcgan_image_generation_tpu.data import sources

Batch = Dict[str, np.ndarray]


@dataclasses.dataclass(frozen=True)
class PreprocessTransform(pg.RandomMapTransform):
  """grain wrapper around `preprocessing.preprocess_example`."""

  image_size: int
  z_dim: int
  sentence_num: int = 5
  return_text: bool = False
  return_filename: bool = False
  augment_method: str = "shift"
  image_uint8: bool = True

  def random_map(self, features, rng: np.random.Generator):
    return preprocessing.preprocess_example(
        features,
        rng,
        image_size=self.image_size,
        z_dim=self.z_dim,
        sentence_num=self.sentence_num,
        return_text=self.return_text,
        return_filename=self.return_filename,
        augment_method=self.augment_method,
        image_uint8=self.image_uint8,
    )


def template_batch(config: ml_collections.ConfigDict,
                   batch_size: Optional[int] = None) -> Batch:
  """Zero-filled batch with the loader's exact shapes/dtypes.

  Used for model-initialization shape inference so no data batch has to be
  consumed (the real-pool FID statistics must see exactly the first
  ``eval_num`` loader images — reference eval_metrics.py:70-88).
  """
  from xmcgan_image_generation_tpu.data import constants

  n = batch_size or config.eval_batch_size
  s = config.image_size
  text_len = (constants.LN_MAX_TEXT_LENGTH
              if config.dataset == "localized_narratives"
              else constants.COCO_MAX_TEXT_LENGTH)
  d = constants.PRETRAINED_BERT_DIM
  img_dtype = (np.uint8 if config.get("image_uint8", True)
               else np.float32)
  return {
      "image": np.zeros((n, s, s, 3), img_dtype),
      "image_aug": np.zeros((n, s, s, 3), img_dtype),
      "embedding": np.zeros((n, text_len, d), np.float32),
      "max_len": np.ones((n, 1), np.float32),
      "sentence_embedding": np.zeros((n, d), np.float32),
      "z": np.zeros((n, config.z_dim), np.float32),
  }


def _build_source(config: ml_collections.ConfigDict, split: str):
  if config.data_source == "synthetic":
    n = 64 if split == "train" else 32
    return sources.SyntheticXMCSource(num_examples=n, seed=config.seed)
  if config.data_source == "tfrecord":
    if config.dataset != "mscoco":
      raise ValueError(f"Unsupported dataset {config.dataset!r}")
    pattern = sources.coco_file_pattern(
        config.data_dir, config.coco_version, split)
    # Defer PNG decode to the preprocess transform: with the uint8 path
    # it decodes and resizes in one PIL pass, never expanding to float
    # at source resolution.
    return sources.COCORecordSource(pattern, decode_image=False)
  raise ValueError(f"Unknown data_source {config.data_source!r}")


def _make_loader(
    config: ml_collections.ConfigDict,
    split: str,
    *,
    seed: int,
    host_batch_size: int,
    shuffle: bool,
    num_epochs: Optional[int],
    return_text: bool,
) -> Tuple[pg.DataLoader, int]:
  source = _build_source(config, split)
  sampler = pg.IndexSampler(
      num_records=len(source),
      shard_options=pg.ShardByJaxProcess(drop_remainder=True),
      shuffle=shuffle,
      num_epochs=num_epochs,
      seed=seed,
  )
  transform = PreprocessTransform(
      image_size=config.image_size,
      z_dim=config.z_dim,
      return_text=return_text,
      return_filename=config.return_filename,
      augment_method=config.get("augment_method", "shift"),
      image_uint8=config.get("image_uint8", True),
  )
  loader = pg.DataLoader(
      data_source=source,
      sampler=sampler,
      operations=[transform, pg.Batch(host_batch_size, drop_remainder=True)],
      worker_count=config.get("grain_worker_count", 0),
  )
  return loader, len(source)


def create_datasets(
    config: ml_collections.ConfigDict,
    seed: int,
) -> Tuple[pg.DataLoader, pg.DataLoader, int]:
  """Builds (train_loader, eval_loader, num_train_examples).

  The train loader yields super-batches for the n-critic step; the eval
  loader yields plain eval batches and repeats indefinitely.  Both are
  per-host; batch arrays have leading dim ``host_batch``.
  """
  process_count = jax.process_count()
  if config.batch_size % (process_count or 1):
    raise ValueError(
        f"Global batch size {config.batch_size} must be divisible by "
        f"process count {process_count}.")
  if config.eval_batch_size % (process_count or 1):
    raise ValueError(
        f"Eval batch size {config.eval_batch_size} must be divisible by "
        f"process count {process_count}.")
  train_host_batch = (
      config.batch_size // process_count * config.d_step_per_g_step)
  eval_host_batch = config.eval_batch_size // process_count

  train_loader, num_train = _make_loader(
      config, "train",
      seed=seed,
      host_batch_size=train_host_batch,
      shuffle=config.train_shuffle,
      # The step loop bounds training; the sampler just must not run dry.
      num_epochs=None,
      return_text=False,
  )
  eval_loader, _ = _make_loader(
      config, "val",
      seed=seed + 1,
      host_batch_size=eval_host_batch,
      shuffle=False,
      num_epochs=None,
      return_text=config.return_text,
  )
  return train_loader, eval_loader, num_train


class DevicePrefetchIterator:
  """Device-prefetching wrapper around a grain iterator, exact-resume safe.

  Keeps ``size`` global batches resident on the mesh ahead of consumption,
  overlapping host decode/augment and host->device transfer with the
  running step (the role tf.data prefetch plays in the reference).

  Checkpointing: `get_state()` returns the grain state snapshotted
  *before* the oldest still-buffered batch was produced, so a restore
  replays exactly the batches the training loop never consumed — no
  skipped data despite the lookahead.  Duck-types the grain iterator
  interface, so `utils.checkpoint.CheckpointManager` persists it like the
  raw iterator.
  """

  def __init__(self, iterator, mesh, size: int = 2):
    import collections

    self._it = iterator
    self._mesh = mesh
    self._size = max(1, size)
    self._buf = collections.deque()
    self._exhausted = False

  def _fill(self) -> None:
    while not self._exhausted and len(self._buf) < self._size:
      state = self._it.get_state()
      try:
        batch = next(self._it)
      except StopIteration:
        self._exhausted = True
        return
      self._buf.append((state, host_batch_to_global(batch, self._mesh)))

  def __iter__(self):
    return self

  def __next__(self):
    self._fill()
    if not self._buf:
      raise StopIteration
    _, batch = self._buf.popleft()
    self._fill()  # Kick off the next transfer before returning.
    return batch

  def get_state(self):
    if self._buf:
      return self._buf[0][0]
    return self._it.get_state()

  def set_state(self, state) -> None:
    self._buf.clear()
    self._exhausted = False
    self._it.set_state(state)


def host_batch_to_global(batch: Batch, mesh) -> Any:
  """Assembles per-host arrays into a global array sharded on ``data``.

  The GSPMD replacement for the implicit transfer at pmap dispatch
  (reference train_utils.py:421-424): each host contributes its local
  shard; the result is one logical array laid out over the mesh.
  """
  from jax.sharding import NamedSharding, PartitionSpec as P

  sharding = NamedSharding(mesh, P("data"))

  def place(x):
    x = np.asarray(x)
    if x.dtype.kind not in "fiub":
      return x  # Caption text / filenames stay host-side.
    return jax.make_array_from_process_local_data(sharding, x)

  return jax.tree_util.tree_map(place, batch)
