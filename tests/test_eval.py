"""Eval stack tests: FID/IS math (streaming vs direct), Inception tower,
and the end-to-end continuous-eval service on a trained workdir."""

import csv
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.utils import fid as fid_lib


class _FakeShard:
  """Stand-in for jax.Shard: (index, data)."""

  def __init__(self, start, data):
    self.index = (slice(start, start + data.shape[0]),
                  slice(None))
    self.data = data


class TestLocalRows:
  """The shard-walking core of the multi-host statistics accumulators."""

  def _shards(self, rows, starts):
    return [_FakeShard(s, rows[s:s + 2]) for s in starts]

  def test_concatenates_owned_shards(self):
    rows = np.arange(12, dtype=np.float32).reshape(6, 2)
    got = fid_lib._rows_from_shards(self._shards(rows, [0, 2, 4]), (2,))
    np.testing.assert_array_equal(got, rows)

  def test_replicated_shards_deduplicated(self):
    rows = np.arange(8, dtype=np.float32).reshape(4, 2)
    # The same global range appears twice (replication over a second axis).
    got = fid_lib._rows_from_shards(
        self._shards(rows, [0, 0, 2, 2]), (2,))
    np.testing.assert_array_equal(got, rows)

  def test_count_caps_global_rows(self):
    rows = np.arange(12, dtype=np.float32).reshape(6, 2)
    # This process owns rows [2, 4) and [4, 6); global cap at 5 keeps
    # [2, 4) whole and trims [4, 6) to row 4 only.
    got = fid_lib._rows_from_shards(self._shards(rows, [2, 4]), (2,),
                                    count=5)
    np.testing.assert_array_equal(got, rows[2:5])
    # A shard fully past the cap contributes nothing.
    got = fid_lib._rows_from_shards(self._shards(rows, [4]), (2,), count=3)
    assert got.shape == (0, 2)

  def test_local_rows_fully_addressable_passthrough(self):
    x = jnp.arange(10.0).reshape(5, 2)
    np.testing.assert_array_equal(fid_lib.local_rows(x, count=3),
                                  np.asarray(x)[:3])

  def test_trailing_dim_sharding_rejected(self):
    """Row-range dedup is only sound for leading-axis sharding; a
    column-sharded feature array must fail loudly, not drop shards."""
    rows = np.arange(8, dtype=np.float32).reshape(4, 2)
    shard = _FakeShard(0, rows[:2])
    shard.index = (slice(0, 2), slice(0, 1))  # model-axis column shard
    with pytest.raises(ValueError, match="leading"):
      fid_lib._rows_from_shards([shard], (2,))
    # Explicit full-extent trailing slices stay accepted.
    ok = _FakeShard(0, rows[:2])
    ok.index = (slice(0, 2), slice(0, 2))
    np.testing.assert_array_equal(
        fid_lib._rows_from_shards([ok], (2,)), rows[:2])


class TestStreamingGaussianStats:

  def test_matches_numpy_mean_cov(self):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((100, 16)).astype(np.float32)
    stats = fid_lib.StreamingGaussianStats(16)
    for chunk in np.split(x, 5):
      stats.update(jnp.asarray(chunk))
    mu, sigma = stats.compute()
    np.testing.assert_allclose(mu, x.mean(0), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(sigma, np.cov(x, rowvar=False),
                               rtol=1e-3, atol=1e-4)

  def test_partial_batch_trim(self):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((10, 4)).astype(np.float32)
    stats = fid_lib.StreamingGaussianStats(4)
    stats.update(jnp.asarray(x[:8]))
    stats.update(jnp.asarray(x[8:]), count=1)  # Only row 8.
    mu, _ = stats.compute()
    np.testing.assert_allclose(mu, x[:9].mean(0), rtol=1e-4, atol=1e-5)


class TestFrechetDistance:

  def test_identical_distributions_zero(self):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 8))
    mu, sigma = x.mean(0), np.cov(x, rowvar=False)
    assert abs(fid_lib.frechet_distance(mu, sigma, mu, sigma)) < 1e-6

  def test_mean_shift(self):
    # For equal covariance, FID reduces to ||mu1 - mu2||^2.
    sigma = np.eye(4)
    mu1, mu2 = np.zeros(4), np.full(4, 2.0)
    np.testing.assert_allclose(
        fid_lib.frechet_distance(mu1, sigma, mu2, sigma), 16.0, atol=1e-6)

  def test_streaming_equals_direct(self):
    rng = np.random.default_rng(2)
    a = rng.standard_normal((200, 8)).astype(np.float32)
    b = (rng.standard_normal((200, 8)) * 1.5 + 0.3).astype(np.float32)
    direct = fid_lib.calculate_fid(a, b)
    sa, sb = (fid_lib.StreamingGaussianStats(8) for _ in range(2))
    sa.update(jnp.asarray(a))
    sb.update(jnp.asarray(b))
    streamed = fid_lib.frechet_distance(*sa.compute(), *sb.compute())
    np.testing.assert_allclose(streamed, direct, rtol=1e-3)


class TestInceptionScore:

  def _direct_is(self, pred, num_splits=1):
    # Transcription of the reference split-KL computation
    # (tf_inception_utils.py:206-224).
    scores = []
    for index in range(num_splits):
      chunk = pred[index * (pred.shape[0] // num_splits):(index + 1)
                   * (pred.shape[0] // num_splits), :]
      kl = chunk * (np.log(chunk)
                    - np.log(np.expand_dims(np.mean(chunk, 0), 0)))
      scores.append(np.exp(np.mean(np.sum(kl, 1))))
    return np.mean(scores), np.std(scores)

  def test_streaming_matches_direct(self):
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((60, 10)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    want, _ = self._direct_is(probs)
    s = fid_lib.StreamingInceptionScore(10, 1, 60)
    for chunk in np.split(probs, 3):
      s.update(jnp.asarray(chunk))
    got, _ = s.compute()
    np.testing.assert_allclose(got, want, rtol=1e-4)

  def test_uniform_probs_give_score_one(self):
    probs = np.full((50, 10), 0.1, np.float32)
    s = fid_lib.StreamingInceptionScore(10, 1, 50)
    s.update(jnp.asarray(probs))
    got, _ = s.compute()
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)


class TestInceptionV3:

  @pytest.mark.heavy  # ~100s: compiles the full 299px InceptionV3 graph;
  # the quick tier keeps test_weight_roundtrip and the numeric Keras
  # conversion test (test_inception_conversion.py) as the Inception gates.
  def test_forward_shapes(self):
    from xmcgan_image_generation_tpu.utils.eval_metrics import (
        make_inception_fn,
    )
    fn = jax.jit(make_inception_fn())
    images = jnp.zeros((2, 64, 64, 3))  # Gets resized to 299.
    pool, probs = fn(images)
    assert pool.shape == (2, 2048)
    assert probs.shape == (2, 1000)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), [1.0, 1.0],
                               rtol=1e-4)

  def test_weight_roundtrip(self, tmp_path):
    from xmcgan_image_generation_tpu.models.inception_v3 import InceptionV3
    from xmcgan_image_generation_tpu.utils import inception_weights
    model = InceptionV3()
    variables = inception_weights.load_or_init(model, None)
    flat = inception_weights.flatten_tree(dict(variables))
    path = str(tmp_path / "w.npz")
    np.savez(path, **flat)
    loaded = inception_weights.load_or_init(model, path)
    got = inception_weights.flatten_tree(dict(loaded))
    for k in flat:
      np.testing.assert_array_equal(flat[k], got[k])

  def test_weight_mismatch_rejected(self, tmp_path):
    from xmcgan_image_generation_tpu.models.inception_v3 import InceptionV3
    from xmcgan_image_generation_tpu.utils import inception_weights
    path = str(tmp_path / "bad.npz")
    np.savez(path, **{"params/bogus/kernel": np.zeros((3, 3))})
    with pytest.raises(ValueError, match="mismatch"):
      inception_weights.load_or_init(InceptionV3(), path)


@pytest.mark.slow
class TestEvalService:

  def test_continuous_eval_on_trained_workdir(self, tmp_path):
    """Train 1 step, then run the eval service end-to-end (tiny eval_num)."""
    from xmcgan_image_generation_tpu import evaluate as eval_lib
    from xmcgan_image_generation_tpu import train as train_lib
    from xmcgan_image_generation_tpu.configs import coco_xmc

    config = coco_xmc.get_test_config()
    config.num_train_steps = 1
    config.batch_size = 8
    config.eval_batch_size = 8
    config.eval_num = 8
    config.eval_avg_num = 1
    config.checkpoint_every_steps = 1
    workdir = str(tmp_path / "exp")
    train_lib.train(config, workdir)
    eval_lib.evaluate_continuously(config, workdir, timeout=1)

    scores = os.path.join(workdir, "checkpoints", "scores.csv")
    assert os.path.exists(scores)
    with open(scores) as f:
      rows = list(csv.DictReader(f))
    assert rows and rows[0]["step"] == "1"
    for key in ("eval/fid", "eval/ema_fid", "eval/inception_score"):
      assert np.isfinite(float(rows[0][key])), key
