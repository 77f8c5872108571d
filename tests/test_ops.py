"""Unit tests for the ops layer: losses, contrastive, attention, pooling,
spectral norm, conditional BN."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.ops import attention as attn_ops
from xmcgan_image_generation_tpu.ops import contrastive as c_ops
from xmcgan_image_generation_tpu.ops import losses
from xmcgan_image_generation_tpu.ops import pooling
from xmcgan_image_generation_tpu.ops.normalization import (
    ConditionalBatchNorm,
    GroupedBatchNorm,
    LocalConditionalBatchNorm,
)
from xmcgan_image_generation_tpu.ops.spectral_norm import (
    SpectralConv,
    SpectralDense,
)


class TestLosses:

  def test_hinge_values(self):
    real = jnp.array([2.0, -0.5])
    fake = jnp.array([0.5, -3.0])
    d_loss, g_loss = losses.hinge(real, fake)
    # relu(1-2)=0, relu(1+0.5)=1.5 ; relu(1+0.5)=1.5, relu(1-3)=0
    np.testing.assert_allclose(d_loss, 0.75 + 0.75, rtol=1e-6)
    np.testing.assert_allclose(g_loss, -np.mean([0.5, -3.0]), rtol=1e-6)

  def test_hinge_matches_separate_fns(self):
    key = jax.random.PRNGKey(0)
    real = jax.random.normal(key, (16,))
    fake = jax.random.normal(jax.random.fold_in(key, 1), (16,))
    d_loss, g_loss = losses.hinge(real, fake)
    np.testing.assert_allclose(d_loss, losses.hinge_d(real, fake), rtol=1e-6)
    np.testing.assert_allclose(g_loss, losses.hinge_g(fake), rtol=1e-6)

  def test_softmax_cross_entropy(self):
    logits = jnp.array([[1.0, 2.0, 3.0]])
    labels = jax.nn.one_hot(jnp.array([2]), 3)
    got = losses.softmax_cross_entropy(labels=labels, logits=logits)
    want = -jax.nn.log_softmax(logits)[0, 2]
    np.testing.assert_allclose(got[0], want, rtol=1e-6)


class TestContrastive:

  def test_perfectly_aligned_pairs_have_high_accuracy(self):
    feats = jax.random.normal(jax.random.PRNGKey(0), (8, 32))
    loss, acc, entropy = c_ops.nt_xent(feats, feats)
    assert float(acc) == 1.0
    # Identical features: logits diag = 1/T = 10, off-diag < 10.
    assert float(loss) < 2.0
    assert float(entropy) > 0.0

  def test_loss_is_symmetric_sum(self):
    key = jax.random.PRNGKey(1)
    a = jax.random.normal(key, (6, 16))
    b = jax.random.normal(jax.random.fold_in(key, 1), (6, 16))
    loss_ab, _, _ = c_ops.nt_xent(a, b)
    loss_ba, _, _ = c_ops.nt_xent(b, a)
    np.testing.assert_allclose(loss_ab, loss_ba, rtol=1e-5)

  def test_computes_in_f32_from_bf16_inputs(self):
    a = jax.random.normal(jax.random.PRNGKey(2), (4, 8), dtype=jnp.bfloat16)
    loss, _, _ = c_ops.nt_xent(a, a)
    assert loss.dtype == jnp.float32

  def test_grouped_negatives_mean_of_group_losses(self):
    key = jax.random.PRNGKey(5)
    a = jax.random.normal(key, (8, 16))
    b = jax.random.normal(jax.random.fold_in(key, 1), (8, 16))
    got = c_ops.nt_xent(a, b, group_size=4)
    want = [c_ops.nt_xent(a[:4], b[:4]), c_ops.nt_xent(a[4:], b[4:])]
    for i in range(3):
      np.testing.assert_allclose(
          float(got[i]), np.mean([float(w[i]) for w in want]), rtol=1e-5)

  def test_grouped_negatives_bad_group_size(self):
    a = jnp.zeros((6, 4))
    with pytest.raises(ValueError, match="divisible"):
      c_ops.nt_xent(a, a, group_size=4)

  def test_manual_two_example_value(self):
    a = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    b = jnp.array([[1.0, 0.0], [0.0, 1.0]])
    loss, acc, _ = c_ops.nt_xent(a, b, temperature=1.0)
    # logits = [[1,0],[0,1]]; CE per row = log(1+e^-1); two directions.
    want = 2 * np.log(1 + np.exp(-1.0))
    np.testing.assert_allclose(loss, want, rtol=1e-5)
    assert float(acc) == 1.0


class TestAttention:

  def test_padding_mask(self):
    mask = attn_ops.padding_mask(jnp.array([2.0, 4.0]), 4)
    np.testing.assert_array_equal(
        mask, np.array([[0, 0, 1, 1], [0, 0, 0, 0]], np.float32))

  def test_attention_for_g_shapes_and_rows_sum_to_one(self):
    key = jax.random.PRNGKey(0)
    region = jax.random.normal(key, (2, 9, 16))
    word = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 16))
    mask = attn_ops.padding_mask(jnp.array([3.0, 5.0]), 5)
    context, attn = attn_ops.attention_for_g(region, word, 15.0, mask)
    assert context.shape == (2, 9, 16)
    assert attn.shape == (2, 9, 5)
    np.testing.assert_allclose(attn.sum(-1), np.ones((2, 9)), rtol=1e-5)
    # Padding words get zero attention.
    np.testing.assert_allclose(attn[0, :, 3:], np.zeros((9, 2)), atol=1e-6)

  def test_attention_context_in_word_span(self):
    # With a single unmasked word the context must equal that word,
    # normalized.
    word = jnp.array([[[3.0, 4.0], [100.0, -100.0]]])  # second word masked
    region = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 2))
    mask = attn_ops.padding_mask(jnp.array([1.0]), 2)
    context, _ = attn_ops.attention_for_g(region, word, 5.0, mask)
    # rtol covers the MXU-style default matmul precision (bf16 inputs with
    # f32 accumulation).
    np.testing.assert_allclose(
        context[0], np.tile([[0.6, 0.8]], (4, 1)), rtol=5e-3)

  def test_word_loss_aligned_beats_shuffled(self):
    key = jax.random.PRNGKey(0)
    word = jax.random.normal(key, (4, 6, 12))
    # Aligned regions literally contain their caption's words.
    region = jnp.tile(word, (1, 2, 1))  # [4, 12, 12]
    max_len = jnp.full((4,), 6.0)
    loss_aligned, acc, _ = attn_ops.word_loss(region, word, max_len)
    shuffled = word[::-1]
    loss_shuffled, _, _ = attn_ops.word_loss(region, shuffled, max_len)
    assert float(loss_aligned) < float(loss_shuffled)
    assert float(acc) == 1.0

  def test_word_loss_finite_with_short_captions(self):
    key = jax.random.PRNGKey(3)
    region = jax.random.normal(key, (3, 8, 10))
    word = jax.random.normal(jax.random.fold_in(key, 1), (3, 7, 10))
    max_len = jnp.array([1.0, 3.0, 7.0])
    loss, acc, entropy = attn_ops.word_loss(region, word, max_len)
    assert np.isfinite(float(loss))
    assert np.isfinite(float(entropy))
    assert 0.0 <= float(acc) <= 1.0

  def test_word_loss_grouped_matches_per_group(self):
    key = jax.random.PRNGKey(4)
    region = jax.random.normal(key, (6, 8, 10))
    word = jax.random.normal(jax.random.fold_in(key, 1), (6, 5, 10))
    max_len = jnp.full((6,), 4.0)
    got = attn_ops.word_loss(region, word, max_len, group_size=3)
    parts = [attn_ops.word_loss(region[i:i + 3], word[i:i + 3],
                                max_len[i:i + 3]) for i in (0, 3)]
    np.testing.assert_allclose(
        float(got[0]), np.mean([float(p[0]) for p in parts]), rtol=1e-4)

  def test_word_loss_matches_reference_vmap_formulation(self):
    """Golden cross-check against a direct transcription of the reference
    per-caption vmap algorithm (reference libml/attention_lib.py:130-191)."""

    def ref_attention(region_feat, word_feat, gamma, mask):
      region_feat = c_ops.l2_normalize(region_feat, -1)
      word_feat = c_ops.l2_normalize(word_feat, -1)
      m = jnp.matmul(region_feat, word_feat.transpose((0, 2, 1))) * gamma
      m = m + mask * (-1e9)
      alpha = jax.nn.softmax(m, axis=-2)
      return jnp.matmul(alpha.transpose((0, 2, 1)), region_feat)

    def ref_word_loss(image_feat, word_feat, max_len, g1=5., g2=5., g3=50.):
      batch_size, region_num, _ = image_feat.shape
      total_len = word_feat.shape[1]

      def per_caption(max_len_i, word_feat_i):
        word_feat_i = jnp.tile(word_feat_i[None, :], [batch_size, 1, 1])
        max_len_i = jnp.tile(max_len_i, region_num)
        mask = (jnp.arange(total_len, dtype=jnp.float32)[None, :]
                >= max_len_i[:, None]).astype(jnp.float32)
        mask = jnp.tile(mask[None, :], (batch_size, 1, 1))
        mask_2 = mask[:, 0, :]
        ctx = ref_attention(image_feat, word_feat_i, g1, mask)
        wn = word_feat_i
        num = jnp.sum(wn * ctx, -1)
        row_sim = num / (jnp.linalg.norm(wn, axis=-1)
                         * jnp.linalg.norm(ctx, axis=-1))
        row_sim = row_sim * g2 + mask_2 * (-1e9)
        row_sim = jax.scipy.special.logsumexp(row_sim, -1, keepdims=True)
        return row_sim / g2

      sims = jax.vmap(per_caption)(max_len, word_feat)
      sims = jnp.squeeze(sims * g3)
      return sims.transpose()  # [image, caption]

    key = jax.random.PRNGKey(7)
    region = jax.random.normal(key, (5, 9, 14))
    word = jax.random.normal(jax.random.fold_in(key, 1), (5, 6, 14))
    max_len = jnp.array([2.0, 4.0, 6.0, 3.0, 5.0])

    want_scores = ref_word_loss(region, word, max_len)
    labels = jax.nn.one_hot(jnp.arange(5), 5)
    want_loss = (
        jnp.mean(losses.softmax_cross_entropy(
            labels=labels, logits=want_scores))
        + jnp.mean(losses.softmax_cross_entropy(
            labels=labels, logits=want_scores.T)))

    got_loss, _, _ = attn_ops.word_loss(region, word, max_len)
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-4)


class TestAttentionHelpers:

  def test_cosine_similarity(self):
    x1 = jnp.array([[3.0, 4.0], [1.0, 0.0]])
    x2 = jnp.array([[3.0, 4.0], [0.0, 2.0]])
    got = attn_ops.cosine_similarity(x1, x2)
    np.testing.assert_allclose(got, [1.0, 0.0], atol=1e-6)

  def test_attention_word_context_shapes(self):
    key = jax.random.PRNGKey(0)
    region = jax.random.normal(key, (2, 9, 8))
    word = jax.random.normal(jax.random.fold_in(key, 1), (2, 5, 8))
    ctx = attn_ops.attention(region, word, 5.0)
    assert ctx.shape == (2, 5, 8)  # per-word region context
    ctx2 = attn_ops.attention_for_word(region, word)
    assert ctx2.shape == (2, 9, 8)  # per-region word context


class TestPooling:

  def test_dsample_even_is_plain_mean(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3))
    got = pooling.dsample(x)
    want = x.reshape(2, 4, 2, 4, 2, 3).mean(axis=(2, 4))
    np.testing.assert_allclose(got, want, rtol=1e-5)

  def test_same_padding_excludes_padding_cells(self):
    # 3x3 window, stride 1, SAME on a 3x3 input: corner means use 4 cells.
    x = jnp.arange(9, dtype=jnp.float32).reshape(1, 3, 3, 1)
    got = pooling.tf_avg_pool(x, (3, 3), (1, 1), "SAME")
    want_corner = np.mean([0, 1, 3, 4])
    np.testing.assert_allclose(got[0, 0, 0, 0], want_corner, rtol=1e-6)
    want_center = np.mean(np.arange(9))
    np.testing.assert_allclose(got[0, 1, 1, 0], want_center, rtol=1e-6)

  def test_upsample_nearest(self):
    x = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    got = pooling.upsample(x)
    want = np.array([[0, 0, 1, 1], [0, 0, 1, 1],
                     [2, 2, 3, 3], [2, 2, 3, 3]], np.float32)
    np.testing.assert_array_equal(got[0, :, :, 0], want)

  def test_upsample_matches_jax_image_resize(self):
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 5, 5, 4))
    got = pooling.upsample(x)
    want = jax.image.resize(x, (2, 10, 10, 4), method="nearest")
    np.testing.assert_allclose(got, want, rtol=1e-6)


class TestSpectralNorm:

  def test_dense_output_shape_and_state(self):
    layer = SpectralDense(features=7, train=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5))
    variables = layer.init(jax.random.PRNGKey(1), x)
    assert "spectral_norm_stats" in variables
    y, new_vars = layer.apply(
        variables, x, mutable=["spectral_norm_stats"])
    assert y.shape == (3, 7)
    # Training mode must update u0.
    assert not np.allclose(
        new_vars["spectral_norm_stats"]["u0"],
        variables["spectral_norm_stats"]["u0"])

  def test_eval_mode_does_not_update_state(self):
    layer = SpectralDense(features=7, train=False)
    x = jax.random.normal(jax.random.PRNGKey(0), (3, 5))
    variables = layer.init(jax.random.PRNGKey(1), x)
    _, new_vars = layer.apply(variables, x, mutable=["spectral_norm_stats"])
    np.testing.assert_array_equal(
        new_vars["spectral_norm_stats"]["u0"],
        variables["spectral_norm_stats"]["u0"])

  def test_power_iteration_converges_to_spectral_norm(self):
    """After many applications the effective kernel has sigma_max ~= 1."""
    layer = SpectralDense(features=16, train=True, use_bias=False)
    x = jnp.eye(16)
    variables = layer.init(jax.random.PRNGKey(2), x)
    # Scale the kernel so normalization has something to do.
    params = jax.tree_util.tree_map(lambda p: p * 10.0, variables["params"])
    state = variables["spectral_norm_stats"]
    for _ in range(50):
      y, mut = layer.apply(
          {"params": params, "spectral_norm_stats": state}, x,
          mutable=["spectral_norm_stats"])
      state = mut["spectral_norm_stats"]
    sigma = np.linalg.svd(np.asarray(y), compute_uv=False)[0]
    np.testing.assert_allclose(sigma, 1.0, rtol=1e-3)

  def test_conv_shapes(self):
    layer = SpectralConv(features=8, train=True, kernel_size=(3, 3))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    variables = layer.init(jax.random.PRNGKey(1), x)
    y, _ = layer.apply(variables, x, mutable=["spectral_norm_stats"])
    assert y.shape == (2, 16, 16, 8)

  def test_conv_strided(self):
    layer = SpectralConv(
        features=8, train=False, kernel_size=(3, 3), strides=(2, 2))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    variables = layer.init(jax.random.PRNGKey(1), x)
    y, _ = layer.apply(variables, x, mutable=["spectral_norm_stats"])
    assert y.shape == (2, 8, 8, 8)


class TestConditionalBatchNorm:

  def _norm_fn(self, **kw):
    import functools
    return functools.partial(
        nn.BatchNorm, use_running_average=False, momentum=0.9,
        epsilon=1e-5)(**kw)

  def test_cbn_zero_cond_is_plain_bn(self):
    cbn = ConditionalBatchNorm(norm_fn=self._norm_fn, dense_fn=nn.Dense)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 6))
    emb = jnp.zeros((4, 10))
    variables = cbn.init(jax.random.PRNGKey(1), x, emb)
    y, _ = cbn.apply(variables, x, emb, mutable=["batch_stats"])
    # With zero conditioning and zero-init dense bias, gamma=beta=0 so the
    # output is the normalized x (x*(0+1)+0).
    np.testing.assert_allclose(float(y.mean()), 0.0, atol=1e-5)
    np.testing.assert_allclose(float(y.std()), 1.0, atol=1e-2)

  def test_grouped_bn_matches_per_group_normalization(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4, 3)) * 3 + 1
    bn = GroupedBatchNorm(group_size=4, use_scale=False, use_bias=False)
    variables = bn.init(jax.random.PRNGKey(1), x)
    y, mutated = bn.apply(variables, x, mutable=["batch_stats"])
    # Each group of 4 examples normalized with its own stats.
    for g in range(2):
      block = np.asarray(y[g * 4:(g + 1) * 4])
      np.testing.assert_allclose(block.mean((0, 1, 2)), 0.0, atol=1e-4)
      np.testing.assert_allclose(block.std((0, 1, 2)), 1.0, atol=1e-3)
    # Running stats moved toward the global batch statistics.
    ra_mean = np.asarray(mutated["batch_stats"]["mean"])
    want = 0.9 * 0.0 + 0.1 * np.asarray(x.mean((0, 1, 2)))
    np.testing.assert_allclose(ra_mean, want, rtol=1e-3, atol=1e-5)

  def test_grouped_bn_eval_uses_running_stats(self):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 2, 3))
    bn_t = GroupedBatchNorm(group_size=2, use_scale=False, use_bias=False)
    variables = bn_t.init(jax.random.PRNGKey(1), x)
    bn_e = GroupedBatchNorm(group_size=2, use_running_average=True,
                            use_scale=False, use_bias=False)
    y = bn_e.apply(variables, x)
    # Fresh running stats are (0, 1): eval output equals the input.
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=1e-5)

  def test_grouped_bn_rejects_bad_group(self):
    x = jnp.zeros((6, 2, 2, 3))
    bn = GroupedBatchNorm(group_size=4)
    with pytest.raises(ValueError, match="divisible"):
      bn.init(jax.random.PRNGKey(0), x)

  def test_local_cbn_shapes(self):
    lcbn = LocalConditionalBatchNorm(norm_fn=self._norm_fn, conv_fn=nn.Conv)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 6))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 12))
    variables = lcbn.init(jax.random.PRNGKey(2), x, emb)
    y, _ = lcbn.apply(variables, x, emb, mutable=["batch_stats"])
    assert y.shape == x.shape
