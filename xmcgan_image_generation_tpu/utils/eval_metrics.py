"""FID / Inception-Score evaluation engine.

Capability parity with reference xmcgan/utils/eval_metrics.py:29-216:
precompute the real-image Inception statistics once, then for each
checkpoint generate ``eval_num`` images (normal + EMA weights), push them
through InceptionV3, and report FID / IS averaged over ``eval_avg_num``
repeats.

TPU-native differences:
* One jitted GSPMD program per (generate -> inception) step — no pmap, no
  `all_gather` of features to host (reference eval_metrics.py:66-68);
  Gaussian/IS statistics accumulate on device via `utils.fid`.
* Inception weights load from a converted ``.npz`` when
  ``config.inception_ckpt_path`` is set; otherwise the tower is
  deterministically random-initialized (the reference's own test mode for
  pretrained towers), which tracks relative progress but is *not*
  comparable to published FID numbers.
"""

from __future__ import annotations

import functools
import logging
from typing import Dict, Iterator, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np

from xmcgan_image_generation_tpu.engine.sampling import generate_batch
from xmcgan_image_generation_tpu.models.inception_v3 import InceptionV3
from xmcgan_image_generation_tpu.utils import fid as fid_lib
from xmcgan_image_generation_tpu.utils import inception_weights

log = logging.getLogger("xmcgan_tpu")

INCEPTION_SIZE = 299
POOL_DIM = 2048
NUM_CLASSES = 1000


def make_inception_fn(ckpt_path: Optional[str] = None):
  """Builds the jittable ``images -> (pool, probs)`` feature function.

  Images are [0, 1] floats of any spatial size; they are resized to 299^2
  bilinear and renormalized to [-1, 1]
  (reference utils/inception_utils.py:97-125).
  """
  model = InceptionV3()
  variables = inception_weights.load_or_init(model, ckpt_path)

  def features(images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    images = images.astype(jnp.float32)
    if images.shape[1] != INCEPTION_SIZE or images.shape[2] != INCEPTION_SIZE:
      images = jax.image.resize(
          images,
          (images.shape[0], INCEPTION_SIZE, INCEPTION_SIZE,
           images.shape[-1]), "bilinear")
    images = jnp.clip(images * 2.0 - 1.0, -1.0, 1.0)
    pool, logits = model.apply(variables, images, train=False,
                               mutable=False)
    return pool, jax.nn.softmax(logits)

  return features


class EvalMetric:
  """Computes FID + IS for generator checkpoints against a real pool."""

  def __init__(self,
               eval_iter: Iterator[Dict[str, np.ndarray]],
               config: ml_collections.ConfigDict,
               num_splits: int = 1,
               inception_ckpt_path: Optional[str] = None,
               mesh=None):
    self.config = config
    self.eval_iter = eval_iter
    self.eval_num = config.eval_num
    self.eval_batch_size = config.eval_batch_size
    self.avg_num = config.eval_avg_num
    self.num_splits = num_splits
    self.mesh = mesh
    ckpt = inception_ckpt_path or config.get("inception_ckpt_path", "")
    self._inception = jax.jit(make_inception_fn(ckpt or None))
    # The jitted sampler is cached per generator function so repeats (and
    # successive checkpoints) reuse the compiled executable.  The cache
    # value holds a strong reference to the generator fn itself: the key is
    # its id(), which is only stable while the object is alive — callers
    # passing transient partials would otherwise alias after GC.
    self._sample_fns: Dict[int, Tuple[object, object]] = {}
    self._real_mu, self._real_sigma = self._compute_real_statistics()

  def _sample_fn(self, generator_fn):
    key = id(generator_fn)
    if key not in self._sample_fns:
      self._sample_fns[key] = (generator_fn, jax.jit(functools.partial(
          generate_batch, generator=generator_fn, config=self.config)))
    return self._sample_fns[key][1]

  def _to_global(self, batch):
    # Already-placed batches (a DevicePrefetchIterator upstream) pass
    # through; host batches drop non-numeric features (caption text /
    # filenames from return_text mode) and get placed on the mesh.
    import jax as _jax

    batch = {k: v for k, v in batch.items()
             if isinstance(v, _jax.Array)
             or np.asarray(v).dtype.kind in "fiub"}
    if self.mesh is None or all(
        isinstance(v, _jax.Array) for v in batch.values()):
      return batch
    from xmcgan_image_generation_tpu.data.pipeline import (
        host_batch_to_global,
    )
    return host_batch_to_global(batch, self.mesh)

  def _compute_real_statistics(self) -> Tuple[np.ndarray, np.ndarray]:
    """Real-image Inception pool statistics, computed once
    (reference eval_metrics.py:70-88)."""
    log.info("Computing real-image Inception statistics over %d samples",
             self.eval_num)
    stats = fid_lib.StreamingGaussianStats(POOL_DIM)
    seen = 0
    while seen < self.eval_num:
      batch = self._to_global(next(self.eval_iter))
      from xmcgan_image_generation_tpu.ops.images import image_to_float

      pool, _ = self._inception(image_to_float(jnp.asarray(batch["image"])))
      take = min(pool.shape[0], self.eval_num - seen)
      stats.update(pool, take)
      seen += take
    return stats.compute()

  def _generated_statistics(self, generator_fn, state, rng):
    """One pass of eval_num generated images -> (FID stats, IS) for both
    normal and EMA weights (reference eval_metrics.py:126-171)."""
    sample_fn = self._sample_fn(generator_fn)
    pool_stats = {k: fid_lib.StreamingGaussianStats(POOL_DIM)
                  for k in ("normal", "ema")}
    is_stats = {k: fid_lib.StreamingInceptionScore(
        NUM_CLASSES, self.num_splits, self.eval_num)
        for k in ("normal", "ema")}
    seen = 0
    step = 0
    while seen < self.eval_num:
      batch = self._to_global(next(self.eval_iter))
      step_rng = jax.random.fold_in(rng, step)
      out = sample_fn(step_rng, state, batch)
      take = min(out["generated_image"].shape[0], self.eval_num - seen)
      for key, images in (("normal", out["generated_image"]),
                          ("ema", out["ema_generated_image"])):
        pool, probs = self._inception(images)
        pool_stats[key].update(pool, take)
        is_stats[key].update(probs, take)
      seen += take
      step += 1
    return pool_stats, is_stats

  def calculate_inception_fid(self, generator_fn, state,
                              rng) -> Tuple[float, ...]:
    """FID/IS mean +- std over ``eval_avg_num`` repeats, normal and EMA.

    Returns the reference's 8-tuple (eval_metrics.py:173-216):
    (fid, fid_std, is, is_std, ema_fid, ema_fid_std, ema_is, ema_is_std).
    """
    fids = {"normal": [], "ema": []}
    iss = {"normal": [], "ema": []}
    for i in range(self.avg_num):
      avg_rng = jax.random.fold_in(rng, i)
      pool_stats, is_stats = self._generated_statistics(
          generator_fn, state, avg_rng)
      for key in ("normal", "ema"):
        mu, sigma = pool_stats[key].compute()
        fids[key].append(fid_lib.frechet_distance(
            mu, sigma, self._real_mu, self._real_sigma))
        iss[key].append(is_stats[key].compute()[0])
    return (
        float(np.mean(fids["normal"])), float(np.std(fids["normal"])),
        float(np.mean(iss["normal"])), float(np.std(iss["normal"])),
        float(np.mean(fids["ema"])), float(np.std(fids["ema"])),
        float(np.mean(iss["ema"])), float(np.std(iss["ema"])),
    )
