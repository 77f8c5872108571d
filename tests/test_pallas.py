"""Pallas kernel tests (interpret mode on CPU): values and gradients match
the XLA formulations."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.ops import attention as attn_ops
from xmcgan_image_generation_tpu.ops import contrastive as c_ops
from xmcgan_image_generation_tpu.ops.pallas import ntxent as ntxent_pl
from xmcgan_image_generation_tpu.ops.pallas import word_scores as ws_pl


def make_features(seed=0, batch=8, regions=16, words=5, dim=32):
  key = jax.random.PRNGKey(seed)
  k1, k2, k3 = jax.random.split(key, 3)
  region = jax.random.normal(k1, (batch, regions, dim))
  word = jax.random.normal(k2, (batch, words, dim))
  max_len = jnp.asarray(
      jax.random.randint(k3, (batch,), 2, words + 1), jnp.float32)
  return region, word, max_len


class TestWordScoresKernel:

  def test_forward_matches_xla(self):
    region, word, max_len = make_features()
    mask = attn_ops.padding_mask(max_len, word.shape[1])
    got = ws_pl.word_scores(region, word, mask, 5.0, 5.0, True)

    # XLA reference: scores before the symmetric CE.
    want = ws_pl._scores_xla_chunked(
        c_ops.l2_normalize(region, -1), c_ops.l2_normalize(word, -1),
        mask, 5.0, 5.0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-5)

  def test_word_loss_pallas_path_matches(self):
    region, word, max_len = make_features(seed=1)
    loss_xla, acc_xla, ent_xla = attn_ops.word_loss(region, word, max_len)
    with jax.disable_jit():  # interpret-mode pallas on CPU
      loss_pl, acc_pl, ent_pl = attn_ops.word_loss(
          region, word, max_len, use_pallas=True)
    np.testing.assert_allclose(float(loss_pl), float(loss_xla), rtol=5e-3)
    np.testing.assert_allclose(float(acc_pl), float(acc_xla), atol=1e-6)
    np.testing.assert_allclose(float(ent_pl), float(ent_xla), rtol=5e-3)

  def test_gradients_match_xla(self):
    region, word, max_len = make_features(seed=2, batch=4, regions=8,
                                          words=4, dim=16)
    mask = attn_ops.padding_mask(max_len, word.shape[1])

    def loss_pallas(r, w):
      s = ws_pl.word_scores(r, w, mask, 5.0, 5.0, True)
      return attn_ops._word_loss_from_scores(s * 50.0)[0]

    def loss_xla(r, w):
      return attn_ops.word_loss(r, w, max_len)[0]

    g_pl = jax.grad(loss_pallas, argnums=(0, 1))(region, word)
    g_xla = jax.grad(loss_xla, argnums=(0, 1))(region, word)
    for a, b in zip(g_pl, g_xla):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=5e-3, atol=1e-5)

  @pytest.mark.parametrize("chunk_cap", [16, 2, 1])
  def test_analytic_bwd_kernel_matches_autodiff(self, chunk_cap):
    """_scores_bwd_pallas == vjp of the chunked XLA scores, for an
    arbitrary cotangent and across caption-chunk sizes (16 -> one chunk,
    2/1 -> multi-chunk accumulation paths)."""
    region, word, max_len = make_features(seed=5, batch=6, regions=8,
                                          words=4, dim=16)
    mask = attn_ops.padding_mask(max_len, word.shape[1])
    rn = c_ops.l2_normalize(region, -1)
    wn = c_ops.l2_normalize(word, -1)
    g = jax.random.normal(jax.random.PRNGKey(9), (6, 6))

    # Both the XLA reference and _scores_bwd_pallas take the cotangent of
    # the [caption, image] score matrix.
    _, vjp_fn = jax.vjp(
        lambda r, w: ws_pl._scores_xla_chunked(r, w, mask, 5.0, 5.0),
        rn, wn)
    want_rn, want_wn = vjp_fn(g)

    got_rn, got_wn = ws_pl._scores_bwd_pallas(
        rn, wn, mask, g, 5.0, 5.0, interpret=True, chunk_cap=chunk_cap)
    np.testing.assert_allclose(np.asarray(got_rn), np.asarray(want_rn),
                               rtol=5e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_wn), np.asarray(want_wn),
                               rtol=5e-3, atol=1e-5)


class TestShardedWordScores:

  def test_sharded_matches_unsharded_on_mesh(self):
    """shard_map dispatch over 8 devices == the single-device kernel."""
    from xmcgan_image_generation_tpu.parallel import MeshRules, shard_batch

    rules = MeshRules.create()
    assert rules.data_axis_size == 8
    region, word, max_len = make_features(batch=16, regions=8, words=4,
                                          dim=16)
    mask = attn_ops.padding_mask(max_len, word.shape[1])
    want = ws_pl.word_scores(region, word, mask, 5.0, 5.0, True)

    scores_fn = ws_pl.make_sharded_word_scores(rules.mesh, interpret=True)
    region_s = shard_batch(region, rules.mesh)
    got = jax.jit(scores_fn)(region_s, word, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=1e-5)

  @pytest.mark.heavy
  def test_sharded_gradients(self):
    from xmcgan_image_generation_tpu.parallel import MeshRules

    rules = MeshRules.create()
    region, word, max_len = make_features(seed=3, batch=8, regions=4,
                                          words=3, dim=8)
    mask = attn_ops.padding_mask(max_len, word.shape[1])
    scores_fn = ws_pl.make_sharded_word_scores(rules.mesh, interpret=True)

    def loss_sharded(r, w):
      return attn_ops._word_loss_from_scores(scores_fn(r, w, mask)
                                             * 50.0)[0]

    def loss_ref(r, w):
      return attn_ops.word_loss(r, w, max_len)[0]

    g_s = jax.grad(loss_sharded, argnums=(0, 1))(region, word)
    g_r = jax.grad(loss_ref, argnums=(0, 1))(region, word)
    for a, b in zip(g_s, g_r):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=5e-3, atol=1e-5)


class TestNTXentKernel:

  def test_forward_matches_xla(self):
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (8, 32))
    b = jax.random.normal(jax.random.fold_in(key, 1), (8, 32))
    want = c_ops.nt_xent(a, b)
    got = ntxent_pl.nt_xent_fused(a, b, 0.1, True)
    for g, w in zip(got, want):
      np.testing.assert_allclose(float(g), float(w), rtol=2e-3, atol=1e-5)

  def test_analytic_gradient_matches_autodiff(self):
    key = jax.random.PRNGKey(3)
    a = jax.random.normal(key, (6, 16))
    b = jax.random.normal(jax.random.fold_in(key, 1), (6, 16))

    def loss_xla(a, b):
      return c_ops.nt_xent(a, b)[0]

    def loss_pl(a, b):
      return ntxent_pl.nt_xent_fused(a, b, 0.1, True)[0]

    g_xla = jax.grad(loss_xla, argnums=(0, 1))(a, b)
    g_pl = jax.grad(loss_pl, argnums=(0, 1))(a, b)
    for x, y in zip(g_pl, g_xla):
      np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                 rtol=2e-3, atol=1e-5)

  def test_bf16_inputs(self):
    key = jax.random.PRNGKey(4)
    a = jax.random.normal(key, (4, 16), jnp.bfloat16)
    loss, acc, ent = ntxent_pl.nt_xent_fused(a, a, 0.1, True)
    assert loss.dtype == jnp.float32
    assert float(acc) == 1.0
