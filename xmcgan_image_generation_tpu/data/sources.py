"""Random-access data sources for the grain pipeline.

* `COCORecordSource`: reads the reference-compatible TFRecord shards
  (schema at reference libml/coco_dataset.py:85-97) with random access,
  no TensorFlow.
* `SyntheticXMCSource`: schema-identical deterministic random examples for
  smoke tests and benchmarking (replaces nothing in the reference — it had
  no offline-data-free path at all).
"""

from __future__ import annotations

import bisect
import glob
from typing import Dict

import numpy as np

from xmcgan_image_generation_tpu.data import records
from xmcgan_image_generation_tpu.data.preprocessing import decode_png

# Split sizes for sanity checks (reference libml/coco_dataset.py:169-176).
COCO_NUM_EXAMPLES = {
    "2014": {"train": 82_783, "val": 40_504},
    "2017": {"train": 116_680, "val": 4_958},
    "ln": {"train": 134_272, "val": 8_573},  # Localized Narratives.
}


class DataSource:
  """The random-access source protocol the pipeline consumes.

  The structural equivalent of the reference's `BaseDataset` ABC
  (reference libml/base_dataset.py:26-101): ``__len__`` plus
  ``__getitem__(index) -> raw feature dict`` with keys
  ``image`` (float [0,1] array or PNG bytes), ``caption/embedding
  [sentence_num, L, D]``, ``caption/max_len [sentence_num]`` and
  optionally ``caption/text`` / ``image/filename``.  Any object with this
  shape (and a stable ``__repr__`` — grain fingerprints it in checkpoint
  state) plugs into `pipeline.create_datasets`.
  """

  def __len__(self) -> int:
    raise NotImplementedError

  def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
    raise NotImplementedError


class COCORecordSource:
  """Random-access source over a glob of TFRecord shards.

  Returns the *parsed and decoded* raw feature dict (image decoded to
  float [0, 1]); per-example augmentation/selection happens in the
  preprocessing transform.
  """

  def __init__(self, file_pattern: str, decode_image: bool = True,
               bert_dim: int = 768):
    self._pattern = file_pattern
    self._bert_dim = bert_dim
    self._files = []
    self._cum = np.zeros(1, np.int64)
    # Exclude the reader's own ``.idx`` offset-index sidecars, which the
    # shard glob would otherwise pick up as (garbage) record files.
    paths = sorted(p for p in glob.glob(file_pattern)
                   if not p.endswith(".idx"))
    if not paths:
      raise FileNotFoundError(
          f"No TFRecord shards match {file_pattern!r}")
    self._files = [records.TFRecordFile(p) for p in paths]
    counts = [len(f) for f in self._files]
    self._cum = np.cumsum([0] + counts)
    self._decode_image = decode_image

  def __repr__(self) -> str:
    # Stable across processes: grain fingerprints the source repr in the
    # iterator checkpoint state.
    return (f"COCORecordSource(pattern={self._pattern!r}, "
            f"files={len(self._files)}, records={len(self)})")

  def __len__(self) -> int:
    return int(self._cum[-1])

  def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
    index = int(index)
    shard = bisect.bisect_right(self._cum, index) - 1
    raw = self._files[shard].read(index - int(self._cum[shard]))
    feats = records.parse_example(raw)
    out = {
        "caption/embedding": np.asarray(
            feats["caption/embedding"], np.float32),
        "caption/max_len": np.asarray(feats["caption/max_len"], np.float32),
    }
    n_caps = out["caption/max_len"].shape[0]
    out["caption/embedding"] = out["caption/embedding"].reshape(
        n_caps, -1, self._bert_dim)
    image = feats["image"][0]
    out["image"] = decode_png(image) if self._decode_image else image
    if "caption/text" in feats:
      out["caption/text"] = feats["caption/text"]
    if "image/filename" in feats:
      out["image/filename"] = feats["image/filename"]
    return out


def coco_file_pattern(data_dir: str, coco_version: str, split: str) -> str:
  """Shard glob for a split (reference libml/coco_dataset.py:113-125)."""
  if split not in ("train", "val"):
    raise ValueError(f"Expected split in ['train', 'val'], got {split!r}")
  name = "validation" if split == "val" else split
  # os.path.join tolerates data_dir with or without a trailing slash (the
  # reference concatenates raw, requiring the slash — coco_dataset.py:115).
  import os

  return os.path.join(data_dir, f"*{coco_version}*{name}.tfrecord*")


class SyntheticXMCSource:
  """Deterministic random examples with the COCO record schema.

  Example ``i`` is always the same array set (seeded by ``(seed, i)``), so
  determinism/resume tests behave exactly as with real data.  Images get
  pseudo-variable sizes to exercise the resize path.
  """

  def __init__(self, num_examples: int = 64, seed: int = 0,
               sentence_num: int = 5, text_len: int = 17,
               bert_dim: int = 768, min_size: int = 32, max_size: int = 48):
    self._n = num_examples
    self._seed = seed
    self._sentence_num = sentence_num
    self._text_len = text_len
    self._bert_dim = bert_dim
    self._min_size = min_size
    self._max_size = max_size

  def __repr__(self) -> str:
    # Stable across processes (grain checkpoints fingerprint this repr).
    return f"SyntheticXMCSource(n={self._n}, seed={self._seed})"

  def __len__(self) -> int:
    return self._n

  def __getitem__(self, index: int) -> Dict[str, np.ndarray]:
    rng = np.random.default_rng((self._seed, int(index)))
    h = int(rng.integers(self._min_size, self._max_size + 1))
    w = int(rng.integers(self._min_size, self._max_size + 1))
    return {
        "image": rng.uniform(0, 1, (h, w, 3)).astype(np.float32),
        "caption/embedding": rng.standard_normal(
            (self._sentence_num, self._text_len, self._bert_dim)
        ).astype(np.float32),
        "caption/max_len": rng.integers(
            3, self._text_len + 1, (self._sentence_num,)
        ).astype(np.float32),
        "caption/text": [b"synthetic caption"] * self._sentence_num,
        "image/filename": [b"synthetic.png"],
    }
