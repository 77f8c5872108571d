"""Model tests: golden parameter counts (verified against an init of the
reference implementation) plus forward-pass shape/range/state checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.configs import coco_xmc
from xmcgan_image_generation_tpu.models import get_architecture
from xmcgan_image_generation_tpu.models import xmc_net

BERT_DIM = 768
TEXT_LEN = 17


def make_batch(config, batch_size=2, dtype=jnp.float32, seed=0):
  key = jax.random.PRNGKey(seed)
  keys = jax.random.split(key, 4)
  s = config.image_size
  return {
      "image": jax.random.uniform(keys[0], (batch_size, s, s, 3), dtype),
      "embedding": jax.random.normal(
          keys[1], (batch_size, TEXT_LEN, BERT_DIM), dtype),
      "sentence_embedding": jax.random.normal(
          keys[2], (batch_size, BERT_DIM), dtype),
      "max_len": jnp.full((batch_size, 1), 9.0, dtype),
  }


def init_g_d(config, batch_size=2, dtype=jnp.float32):
  batch = make_batch(config, batch_size, dtype)
  z = jax.random.normal(jax.random.PRNGKey(9), (batch_size, config.z_dim),
                        dtype)
  gen_fn, disc_fn = get_architecture(config, dtype)
  g_vars = gen_fn(train=False).init(jax.random.PRNGKey(1), (batch, z))
  all_images = jnp.concatenate([batch["image"], batch["image"]])
  d_vars = disc_fn(train=False).init(
      jax.random.PRNGKey(2), (all_images, batch))
  return batch, z, gen_fn, disc_fn, g_vars, d_vars


def count(tree):
  return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


class TestGoldenParameterCounts:
  """Counts match an init of the reference nets (nets/xmc_net.py) exactly,
  for both the tiny test config and the full 128px config."""

  def test_test_config_counts(self):
    config = coco_xmc.get_test_config()
    config.image_size = 128  # Goldens were computed at 128px.
    _, _, _, _, g_vars, d_vars = init_g_d(config)
    assert count(g_vars["params"]) == 2_603_339
    assert count(g_vars["batch_stats"]) == 2_496
    assert count(d_vars["params"]) == 2_650_033
    assert count(d_vars["spectral_norm_stats"]) == 3_025
    # G has no spectral norm by default; D has no batch norm.
    assert "spectral_norm_stats" not in g_vars
    assert "batch_stats" not in d_vars

  @pytest.mark.slow
  def test_full_config_counts(self):
    config = coco_xmc.get_config()
    _, _, _, _, g_vars, d_vars = init_g_d(config)
    assert count(g_vars["params"]) == 78_507_779
    assert count(g_vars["batch_stats"]) == 14_976
    assert count(d_vars["params"]) == 87_911_713
    assert count(d_vars["spectral_norm_stats"]) == 14_305


class TestGeneratorForward:

  def test_output_shape_and_range(self):
    config = coco_xmc.get_test_config()
    batch, z, gen_fn, _, g_vars, _ = init_g_d(config)
    image = gen_fn(train=False).apply(g_vars, (batch, z), mutable=False)
    assert image.shape == (2, config.image_size, config.image_size, 3)
    assert float(image.min()) >= 0.0
    assert float(image.max()) <= 1.0

  def test_train_mode_updates_batch_stats(self):
    config = coco_xmc.get_test_config()
    batch, z, gen_fn, _, g_vars, _ = init_g_d(config)
    _, mutated = gen_fn(train=True).apply(
        g_vars, (batch, z), mutable=["batch_stats", "spectral_norm_stats"])
    before = jax.tree_util.tree_leaves(g_vars["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(b, a) for b, a in zip(before, after))

  def test_conditioning_changes_output(self):
    config = coco_xmc.get_test_config()
    batch, z, gen_fn, _, g_vars, _ = init_g_d(config)
    image1 = gen_fn(train=False).apply(g_vars, (batch, z), mutable=False)
    batch2 = dict(batch)
    batch2["sentence_embedding"] = -batch["sentence_embedding"]
    batch2["embedding"] = -batch["embedding"]
    image2 = gen_fn(train=False).apply(g_vars, (batch2, z), mutable=False)
    assert not np.allclose(image1, image2)

  def test_bfloat16_forward(self):
    config = coco_xmc.get_test_config()
    batch, z, _, _, _, _ = init_g_d(config)
    gen_fn, _ = get_architecture(config, jnp.bfloat16)
    g_vars = gen_fn(train=False).init(jax.random.PRNGKey(1), (batch, z))
    # Params stay f32; compute in bf16.
    leaves = jax.tree_util.tree_leaves(g_vars["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)
    image = gen_fn(train=False).apply(g_vars, (batch, z), mutable=False)
    assert image.dtype == jnp.bfloat16

  def test_grouped_batch_norm(self):
    config = coco_xmc.get_test_config()
    config.batch_norm_group_size = 2
    batch = make_batch(config, batch_size=4)
    z = jax.random.normal(jax.random.PRNGKey(9), (4, config.z_dim))
    gen_fn, _ = get_architecture(config, jnp.float32)
    g_vars = gen_fn(train=True).init(jax.random.PRNGKey(0), (batch, z))
    out, mutated = gen_fn(train=True).apply(
        g_vars, (batch, z), mutable=["batch_stats"])
    assert out.shape == (4, config.image_size, config.image_size, 3)
    # Same params with global BN give a different output (stats differ).
    config2 = coco_xmc.get_test_config()
    config2.batch_norm_group_size = -1
    gen2, _ = get_architecture(config2, jnp.float32)
    g_vars2 = gen2(train=True).init(jax.random.PRNGKey(0), (batch, z))
    out2, _ = gen2(train=True).apply(
        g_vars2, (batch, z), mutable=["batch_stats"])
    assert not np.allclose(np.asarray(out), np.asarray(out2), atol=1e-5)


class TestSelectiveRemat:

  def test_selective_remat_is_numerically_identity(self):
    """remat (blanket or selective-by-resolution) must not change the
    forward values — it only trades recompute for activation memory."""
    config = coco_xmc.get_test_config()
    batch, z, gen_fn, _, g_vars, _ = init_g_d(config)

    plain = gen_fn(train=False).apply(g_vars, (batch, z), mutable=False)
    for min_res in (0, 16):
      cfg = coco_xmc.get_test_config()
      cfg.remat = True
      cfg.remat_min_resolution = min_res
      gen_r, _ = get_architecture(cfg, jnp.float32)
      out = gen_r(train=False).apply(g_vars, (batch, z), mutable=False)
      np.testing.assert_array_equal(np.asarray(out), np.asarray(plain))

  def test_conv_policy_remat_matches_plain_forward_and_grads(self):
    """remat_policy="conv" (save conv/matmul outputs, recompute elementwise
    glue) must change neither the forward values nor the parameter
    gradients — it only redistributes what the backward reads vs recomputes."""
    config = coco_xmc.get_test_config()
    batch, z, gen_fn, _, g_vars, _ = init_g_d(config)

    cfg = coco_xmc.get_test_config()
    cfg.remat = True
    cfg.remat_policy = "conv"
    gen_r, _ = get_architecture(cfg, jnp.float32)

    def loss(module, params):
      def f(p):
        out = module(train=False).apply({**g_vars, "params": p}, (batch, z),
                                        mutable=False)
        return jnp.sum(out ** 2)
      return jax.value_and_grad(f)(params)

    base_val, base_grad = jax.jit(lambda p: loss(gen_fn, p))(g_vars["params"])
    r_val, r_grad = jax.jit(lambda p: loss(gen_r, p))(g_vars["params"])
    np.testing.assert_allclose(np.asarray(r_val), np.asarray(base_val),
                               rtol=1e-6)
    # The recomputed elementwise chains re-associate reductions, so grads
    # carry float accumulation noise scaled by the leaf's magnitude (the
    # near-zero elements of a hundreds-magnitude grad see large *relative*
    # error while every absolute error stays ~1e-4).
    def close(a, b):
      a, b = np.asarray(a), np.asarray(b)
      tol = 1e-4 * (1.0 + np.max(np.abs(a)))
      np.testing.assert_allclose(b, a, rtol=1e-3, atol=tol)

    jax.tree_util.tree_map(close, base_grad, r_grad)

  def test_unknown_remat_policy_rejected(self):
    cfg = coco_xmc.get_test_config()
    cfg.remat = True
    cfg.remat_policy = "everything"
    with pytest.raises(ValueError, match="remat_policy"):
      init_g_d(cfg)

  def test_remat_threshold_param_structure_unchanged(self):
    # Remat wrapping must not disturb the parameter tree (checkpoint
    # compatibility between remat settings).
    config = coco_xmc.get_test_config()
    _, _, _, _, g_vars, d_vars = init_g_d(config)
    cfg = coco_xmc.get_test_config()
    cfg.remat = True
    cfg.remat_min_resolution = 16
    batch, z, _, _, g_vars_r, d_vars_r = init_g_d(cfg)
    assert (jax.tree_util.tree_structure(g_vars)
            == jax.tree_util.tree_structure(g_vars_r))
    assert (jax.tree_util.tree_structure(d_vars)
            == jax.tree_util.tree_structure(d_vars_r))


class TestDiscriminatorForward:

  def test_logit_and_statistics(self):
    config = coco_xmc.get_test_config()
    batch, _, _, disc_fn, _, d_vars = init_g_d(config)
    all_images = jnp.concatenate([batch["image"], 1.0 - batch["image"]])
    (logit, stats), _ = disc_fn(train=True).apply(
        d_vars, (all_images, batch),
        mutable=["batch_stats", "spectral_norm_stats"])
    assert logit.shape == (4, 1)
    expected_keys = {
        f"{side}_{head}_{metric}"
        for side in ("real", "fake")
        for head in ("word", "sentence")
        for metric in ("loss", "acc", "entropy")
    } | {f"image_contrastive_{m}" for m in ("loss", "acc", "entropy")}
    assert set(stats) == expected_keys
    for k, v in stats.items():
      assert np.isfinite(float(v)), k

  def test_contrastive_heads_can_be_disabled(self):
    config = coco_xmc.get_test_config()
    config.word_contrastive = False
    config.sentence_contrastive = False
    config.image_contrastive = False
    batch, _, _, disc_fn, _, _ = init_g_d(coco_xmc.get_test_config())
    _, disc_fn = get_architecture(config, jnp.float32)
    all_images = jnp.concatenate([batch["image"], batch["image"]])
    d_vars = disc_fn(train=False).init(
        jax.random.PRNGKey(0), (all_images, batch))
    (logit, stats), _ = disc_fn(train=False).apply(
        d_vars, (all_images, batch), mutable=["spectral_norm_stats"])
    assert logit.shape == (4, 1)
    assert all(float(v) == 0.0 for v in stats.values())

  def test_spectral_norm_state_updates_in_train(self):
    config = coco_xmc.get_test_config()
    batch, _, _, disc_fn, _, d_vars = init_g_d(config)
    all_images = jnp.concatenate([batch["image"], batch["image"]])
    _, mutated = disc_fn(train=True).apply(
        d_vars, (all_images, batch),
        mutable=["batch_stats", "spectral_norm_stats"])
    before = jax.tree_util.tree_leaves(d_vars["spectral_norm_stats"])
    after = jax.tree_util.tree_leaves(mutated["spectral_norm_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))
