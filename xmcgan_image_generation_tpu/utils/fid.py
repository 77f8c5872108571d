"""FID / Inception-Score math with on-device streaming statistics.

Capability parity with reference xmcgan/utils/tf_inception_utils.py:123-224
(numpy Frechet distance with the singular-product epsilon fallback; split-KL
Inception Score), plus a TPU-native improvement: Gaussian statistics are
accumulated on device as running (sum, outer-product-sum, count) instead of
materializing the full ``eval_num x 2048`` feature matrix on host
(reference eval_metrics.py:83-88 holds 30000x2048 per run).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray


def _rows_from_shards(shards, trailing_shape, count=None) -> np.ndarray:
  """Concatenates the rows owned by this process from addressable shards.

  ``shards`` yield ``(index, data)``-like objects (a `jax.Shard` or any
  stand-in with ``.index`` / ``.data``).  Rows past the first ``count``
  *global* rows are dropped; replicated shards (same global row range on
  several devices) are deduplicated.
  """
  parts = []
  seen_ranges = set()
  for shard in shards:
    index = tuple(shard.index)
    # Row-range dedup below is only sound when shards differ on the
    # leading axis alone; a trailing-dim (e.g. model-axis) shard with the
    # same row range would be silently dropped, corrupting the stats.
    for dim, trailing in enumerate(index[1:]):
      full = (trailing.start in (None, 0)
              and trailing.stop in (None, tuple(trailing_shape)[dim]))
      if not full:
        raise ValueError(
            "feature accumulation expects sharding on the leading "
            f"(example) axis only; got shard index {index!r}")
    sl = index[0] if index else slice(None)
    start = sl.start or 0
    data = np.asarray(shard.data)
    stop = start + data.shape[0]
    if (start, stop) in seen_ranges:
      continue  # Replicated shard: same global rows on another device.
    seen_ranges.add((start, stop))
    if count is not None:
      capped = min(stop, int(count))
      if capped <= start:
        continue
      data = data[:capped - start]
    parts.append(data)
  if not parts:
    return np.zeros((0,) + tuple(trailing_shape), np.float64)
  return np.concatenate(parts)


def local_rows(features, count: Optional[int] = None) -> np.ndarray:
  """This process's rows of a (possibly multi-process global) [n, d] array.

  Restricted to the first ``count`` *global* rows when given.  Replicated
  shards are deduplicated by their global index range.  Multi-host eval
  accumulates statistics from locally-addressable shards only — no
  per-batch cross-process gathers (the merge happens once, in the
  accumulator's ``compute``).
  """
  if isinstance(features, jax.Array) and not features.is_fully_addressable:
    return _rows_from_shards(features.addressable_shards,
                             features.shape[1:], count)
  feats = np.asarray(features)
  if count is not None and int(count) < feats.shape[0]:
    feats = feats[:int(count)]
  return feats


def _allreduce_sum_across_processes(*arrays):
  """Sums host numpy values across JAX processes (single merge collective)."""
  if jax.process_count() == 1:
    return arrays
  from jax.experimental import multihost_utils

  gathered = multihost_utils.process_allgather(
      tuple(np.asarray(a) for a in arrays))
  return tuple(np.sum(g, axis=0) for g in gathered)


class StreamingGaussianStats:
  """Running mean / covariance over feature batches.

  Per-batch features are pulled to host and accumulated in ``np.float64``:
  over 30000x2048 pools the one-pass ``E[XX^T] - mu mu^T`` formula suffers
  visible cancellation in f32 (x64 is disabled on device), and FID
  comparisons care about sub-point resolution.  The host GEMM is one
  ``dim x dim`` product per batch — negligible next to the device work.

  Multi-host: each process accumulates only its addressable shards; the
  cross-process sum happens once in ``compute`` (a [dim] + [dim, dim]
  collective), never per batch.

  ``cov`` matches ``np.cov(x, rowvar=False)`` (ddof=1) at f64 precision.
  """

  def __init__(self, dim: int):
    self._sum = np.zeros((dim,), np.float64)
    self._outer = np.zeros((dim, dim), np.float64)
    self._count = 0

  def update(self, features: Array, count: Optional[int] = None) -> None:
    """Accumulates a ``[n, dim]`` feature batch (optionally only the first
    ``count`` rows — for trimming the final partial batch)."""
    feats = local_rows(features, count).astype(np.float64)
    self._sum += feats.sum(axis=0)
    self._outer += feats.T @ feats
    self._count += feats.shape[0]

  def compute(self) -> Tuple[np.ndarray, np.ndarray]:
    """Returns host-side (mu, sigma), merged across processes."""
    total_sum, total_outer, n = _allreduce_sum_across_processes(
        self._sum, self._outer, np.int64(self._count))
    n = int(n)
    if n < 2:
      raise ValueError(f"Need >= 2 samples, got {n}")
    mu = total_sum / n
    sigma = (total_outer - n * np.outer(mu, mu)) / (n - 1)
    return mu, sigma


def frechet_distance(mu1: np.ndarray, sigma1: np.ndarray,
                     mu2: np.ndarray, sigma2: np.ndarray,
                     eps: float = 1e-6) -> float:
  """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)).

  Parity with reference tf_inception_utils.py:123-184, including the
  epsilon-on-the-diagonal retry for near-singular products.
  """
  from scipy import linalg

  mu1 = np.atleast_1d(mu1)
  mu2 = np.atleast_1d(mu2)
  sigma1 = np.atleast_2d(sigma1)
  sigma2 = np.atleast_2d(sigma2)
  if mu1.shape != mu2.shape or sigma1.shape != sigma2.shape:
    raise ValueError("Statistics shapes do not match")

  diff = mu1 - mu2
  # scipy >= 1.18 drops sqrtm's `disp` argument (and the errest return);
  # non-finite results are detected from the matrix itself either way.
  with np.errstate(all="ignore"):
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
  if isinstance(covmean, tuple):  # older scipy with disp semantics
    covmean = covmean[0]
  if not np.isfinite(covmean).all():
    offset = np.eye(sigma1.shape[0]) * eps
    covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
  if np.iscomplexobj(covmean):
    if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
      raise ValueError(
          f"Imaginary component {np.max(np.abs(covmean.imag))}")
    covmean = covmean.real
  return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2)
               - 2 * np.trace(covmean))


def calculate_fid(pool1: np.ndarray, pool2: np.ndarray) -> float:
  """Direct (non-streaming) FID between two feature matrices.

  Parity with reference tf_inception_utils.py:187-203.
  """
  mu1, mu2 = np.mean(pool1, axis=0), np.mean(pool2, axis=0)
  s1 = np.cov(pool1, rowvar=False)
  s2 = np.cov(pool2, rowvar=False)
  return frechet_distance(mu1, s1, mu2, s2)


class StreamingInceptionScore:
  """Running split-KL Inception Score over probability batches.

  The per-split score only needs ``sum(p log p)`` and ``sum(p)`` — host
  float64 accumulators over each process's local shards (reference
  tf_inception_utils.py:206-224 holds the full logits matrix instead).
  The cross-process merge happens once, in ``compute``.
  """

  def __init__(self, num_classes: int = 1000, num_splits: int = 1,
               total: Optional[int] = None):
    self.num_splits = num_splits
    self.total = total
    self._split_of = (lambda i: 0) if num_splits == 1 else (
        lambda i: min(i * num_splits // max(total, 1), num_splits - 1))
    self._plogp = np.zeros((num_splits,), np.float64)
    self._psum = np.zeros((num_splits, num_classes), np.float64)
    self._counts = np.zeros((num_splits,), np.int64)
    self._seen = 0

  def update(self, probs: Array, count: Optional[int] = None) -> None:
    """Accumulates a ``[n, classes]`` batch of softmax probabilities.

    The whole batch is assigned to the split of its first global row
    (batch sizes are tiny next to the 30000-image pool).
    """
    n = probs.shape[0] if count is None else int(count)
    local = local_rows(probs, n).astype(np.float64)
    split = self._split_of(self._seen)
    self._plogp[split] += np.sum(local * np.log(local + 1e-16))
    self._psum[split] += local.sum(axis=0)
    self._counts[split] += local.shape[0]
    self._seen += n

  def compute(self) -> Tuple[float, float]:
    plogp, psum, counts = _allreduce_sum_across_processes(
        self._plogp, self._psum, self._counts)
    scores = []
    for s in range(self.num_splits):
      n = int(counts[s])
      if not n:
        continue
      mean_p = psum[s] / n
      mean_plogp = float(plogp[s]) / n
      kl = mean_plogp - float(np.sum(mean_p * np.log(mean_p + 1e-16)))
      scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))
