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


class StreamingGaussianStats:
  """Running mean / covariance over feature batches.

  Per-batch features are pulled to host and accumulated in ``np.float64``:
  over 30000x2048 pools the one-pass ``E[XX^T] - mu mu^T`` formula suffers
  visible cancellation in f32 (x64 is disabled on device), and FID
  comparisons care about sub-point resolution.  The host GEMM is one
  ``dim x dim`` product per batch — negligible next to the device work.

  ``cov`` matches ``np.cov(x, rowvar=False)`` (ddof=1) at f64 precision.
  """

  def __init__(self, dim: int):
    self._sum = np.zeros((dim,), np.float64)
    self._outer = np.zeros((dim, dim), np.float64)
    self._count = 0

  def update(self, features: Array, count: Optional[int] = None) -> None:
    """Accumulates a ``[n, dim]`` feature batch (optionally only the first
    ``count`` rows — for trimming the final partial batch)."""
    from xmcgan_image_generation_tpu.parallel.mesh import to_host

    feats = np.asarray(to_host(features), np.float64)
    if count is not None and count < feats.shape[0]:
      feats = feats[:int(count)]
    self._sum += feats.sum(axis=0)
    self._outer += feats.T @ feats
    self._count += feats.shape[0]

  def compute(self) -> Tuple[np.ndarray, np.ndarray]:
    """Returns host-side (mu, sigma)."""
    n = self._count
    if n < 2:
      raise ValueError(f"Need >= 2 samples, got {n}")
    mu = self._sum / n
    sigma = (self._outer - n * np.outer(mu, mu)) / (n - 1)
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
  covmean, _ = linalg.sqrtm(sigma1.dot(sigma2), disp=False)
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

  The per-split score only needs ``sum(p log p)`` and ``sum(p)`` — both
  accumulate on device (reference tf_inception_utils.py:206-224 holds the
  full logits matrix instead).
  """

  def __init__(self, num_classes: int = 1000, num_splits: int = 1,
               total: Optional[int] = None):
    self.num_splits = num_splits
    self.total = total
    self._split_of = (lambda i: 0) if num_splits == 1 else (
        lambda i: min(i * num_splits // max(total, 1), num_splits - 1))
    dt = jnp.float32
    self._plogp = [jnp.zeros((), dt) for _ in range(num_splits)]
    self._psum = [jnp.zeros((num_classes,), dt) for _ in range(num_splits)]
    self._counts = [0] * num_splits
    self._seen = 0

  def update(self, probs: Array, count: Optional[int] = None) -> None:
    """Accumulates a ``[n, classes]`` batch of softmax probabilities."""
    n = probs.shape[0] if count is None else int(count)
    probs = probs[:n].astype(jnp.float32)
    split = self._split_of(self._seen)
    self._plogp[split] = self._plogp[split] + jnp.sum(
        probs * jnp.log(probs + 1e-16))
    self._psum[split] = self._psum[split] + probs.sum(axis=0)
    self._counts[split] += n
    self._seen += n

  def compute(self) -> Tuple[float, float]:
    scores = []
    for s in range(self.num_splits):
      n = self._counts[s]
      if not n:
        continue
      mean_p = np.asarray(self._psum[s], np.float64) / n
      mean_plogp = float(self._plogp[s]) / n
      kl = mean_plogp - float(np.sum(mean_p * np.log(mean_p + 1e-16)))
      scores.append(np.exp(kl))
    return float(np.mean(scores)), float(np.std(scores))
