"""Engine tests: dual-cotangent VJP correctness, EMA, n-critic step,
sharded-vs-single-device equivalence."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xmcgan_image_generation_tpu.configs import coco_xmc
from xmcgan_image_generation_tpu.engine import (
    TrainState,
    create_optimizers,
    create_train_state,
)
from xmcgan_image_generation_tpu.engine import xmc_gan
from xmcgan_image_generation_tpu.engine.sampling import generate_batch
from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
from xmcgan_image_generation_tpu.ops import losses
from xmcgan_image_generation_tpu.parallel import MeshRules, shard_batch

BERT_DIM = 768
TEXT_LEN = 17


def tiny_config(**overrides):
  config = coco_xmc.get_test_config()
  config.dtype = "float32"  # Keep test numerics deterministic.
  for k, v in overrides.items():
    setattr(config, k, v)
  return config


def make_batch(config, batch_size, seed=0, with_z=True):
  rng = np.random.default_rng(seed)
  s = config.image_size
  batch = {
      "image": rng.uniform(0, 1, (batch_size, s, s, 3)).astype(np.float32),
      "embedding": rng.standard_normal(
          (batch_size, TEXT_LEN, BERT_DIM)).astype(np.float32),
      "sentence_embedding": rng.standard_normal(
          (batch_size, BERT_DIM)).astype(np.float32),
      "max_len": np.full((batch_size, 1), 9.0, np.float32),
  }
  if with_z:
    batch["z"] = rng.standard_normal(
        (batch_size, config.z_dim)).astype(np.float32)
  return {k: jnp.asarray(v) for k, v in batch.items()}


def setup(config, batch_size=2):
  batch = make_batch(config, batch_size)
  generator, discriminator, state = create_train_state(
      config, jax.random.PRNGKey(0), batch)
  return batch, generator, discriminator, state


class TestDualCotangentVJP:
  """The single-forward two-backward update must produce exactly the
  gradients of d_loss wrt d_params and g_loss wrt g_params."""

  @pytest.mark.heavy
  def test_grads_match_independent_grad_calls(self):
    config = tiny_config()
    batch, generator, discriminator, state = setup(config)
    rng = jax.random.PRNGKey(7)

    # Independent re-derivation of the two losses with plain jax.grad.
    def joint_losses(params_d, params_g):
      g_vars = {"params": params_g, **state.generator_state}
      d_vars = {"params": params_d, **state.discriminator_state}
      fake, _ = generator(train=True).apply(
          g_vars, (batch, batch["z"]), mutable=xmc_gan.MUTABLE)
      all_images = jnp.concatenate([batch["image"], fake])
      (logit, stats), _ = discriminator(train=True).apply(
          d_vars, (all_images, batch), mutable=xmc_gan.MUTABLE)
      logit = logit.astype(jnp.float32)
      real_logit, fake_logit = jnp.split(logit, 2)
      d_loss, g_loss = losses.hinge(real_logit, fake_logit)
      c_d, c_g = xmc_gan.contrastive_totals(stats)
      return d_loss + c_d, g_loss + c_g

    want_d_grad = jax.grad(
        lambda pd: joint_losses(pd, state.g_params)[0])(state.d_params)
    want_g_grad = jax.grad(
        lambda pg: joint_losses(state.d_params, pg)[1])(state.g_params)

    # Expected Adam updates.
    g_tx, d_tx = create_optimizers(config)
    d_up, _ = d_tx.update(want_d_grad, state.d_opt_state, state.d_params)
    want_d_params = optax.apply_updates(state.d_params, d_up)
    g_up, _ = g_tx.update(want_g_grad, state.g_opt_state, state.g_params)
    want_g_params = optax.apply_updates(state.g_params, g_up)

    new_state, metrics = xmc_gan.train_g_d(
        rng, state, batch, generator, discriminator, config, {})

    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        new_state.d_params, want_d_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6),
        new_state.g_params, want_g_params)
    for v in metrics.values():
      assert np.isfinite(float(v))

  @pytest.mark.heavy
  def test_split_backward_equals_dual_cotangent(self):
    """The default split-backward scheme (minimal G-pass/D-pass grads)
    must reproduce the reference-style dual-cotangent update exactly."""
    config = tiny_config()
    batch, generator, discriminator, state = setup(config)
    rng = jax.random.PRNGKey(11)
    s_split, m_split = xmc_gan.train_g_d(
        rng, state, batch, generator, discriminator, config, {})
    config_dual = tiny_config(dual_cotangent_vjp=True)
    s_dual, m_dual = xmc_gan.train_g_d(
        rng, state, batch, generator, discriminator, config_dual, {})
    for attr in ("g_params", "d_params", "ema_params", "generator_state",
                 "discriminator_state"):
      jax.tree_util.tree_map(
          lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                  atol=1e-7),
          getattr(s_split, attr), getattr(s_dual, attr))
    for k in m_split:
      np.testing.assert_allclose(float(m_split[k]), float(m_dual[k]),
                                 rtol=1e-5, atol=1e-7)

  @pytest.mark.heavy
  def test_ema_update(self):
    config = tiny_config(polyak_decay=0.5)
    batch, generator, discriminator, state = setup(config)
    new_state, _ = xmc_gan.train_g_d(
        jax.random.PRNGKey(0), state, batch, generator, discriminator,
        config, {})
    want = jax.tree_util.tree_map(
        lambda ema, p: ema * 0.5 + 0.5 * p,
        state.ema_params, new_state.g_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6),
        new_state.ema_params, want)

  @pytest.mark.heavy  # compiles the full dual-cotangent step (~50s); the
  # formulation is non-default, so all its compile-bound tests are heavy.
  def test_step_increments_only_on_joint_update(self):
    config = tiny_config()
    batch, generator, discriminator, state = setup(config)
    after_d = xmc_gan.train_d(
        jax.random.PRNGKey(0), state, batch, generator, discriminator,
        config)
    assert int(after_d.step) == int(state.step)
    after_gd, _ = xmc_gan.train_g_d(
        jax.random.PRNGKey(0), state, batch, generator, discriminator,
        config, {})
    assert int(after_gd.step) == int(state.step) + 1


class TestTrainD:

  def test_updates_d_only(self):
    config = tiny_config()
    batch, generator, discriminator, state = setup(config)
    # jit: one (persistently cached) compile instead of ~45s of eager
    # op-by-op dispatch on the 1-core CI box; semantics are identical.
    new_state = jax.jit(functools.partial(
        xmc_gan.train_d, generator=generator, discriminator=discriminator,
        config=config))(jax.random.PRNGKey(0), state, batch)
    # G params and EMA untouched.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        new_state.g_params, state.g_params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        new_state.ema_params, state.ema_params)
    # D params changed.
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b),
        new_state.d_params, state.d_params)
    assert any(jax.tree_util.tree_leaves(changed))
    # D spectral norm state advanced; G batch stats untouched.
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(a, b),
        new_state.generator_state, state.generator_state)
    sn_changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, b),
        new_state.discriminator_state["spectral_norm_stats"],
        state.discriminator_state["spectral_norm_stats"])
    assert any(jax.tree_util.tree_leaves(sn_changed))


class TestTrainStep:

  def test_split_batch(self):
    batch = {"a": jnp.arange(8).reshape(8, 1), "b": jnp.arange(16).reshape(8, 2)}
    parts = split_batch(batch, 2)
    assert len(parts) == 2
    np.testing.assert_array_equal(parts[0]["a"], np.arange(4).reshape(4, 1))
    np.testing.assert_array_equal(parts[1]["a"],
                                  np.arange(4, 8).reshape(4, 1))

  def test_n_critic_step(self):
    config = tiny_config(d_step_per_g_step=2)
    super_batch = make_batch(config, 4)  # 2 sub-batches of 2
    init_batch = split_batch(super_batch, 2)[0]
    generator, discriminator, state = create_train_state(
        config, jax.random.PRNGKey(0), init_batch)
    step_fn = jax.jit(functools.partial(
        train_step,
        generator=generator,
        discriminator=discriminator,
        config=config,
        additional_data={},
    ))
    new_state, metrics = step_fn(jax.random.PRNGKey(1), state, super_batch)
    assert int(new_state.step) == 1
    assert set(metrics) == {
        "d_loss", "g_loss", "c_loss_d", "c_loss_g", "c_loss_g_pretrained"}
    for v in metrics.values():
      assert np.isfinite(float(v))

  def test_sharded_matches_unsharded(self):
    """The jitted step must compute identical results whether the batch
    lives on 1 device or is sharded over the 8-device mesh (GSPMD
    semantics are sharding-independent)."""
    config = tiny_config(d_step_per_g_step=1, batch_size=8)
    super_batch = make_batch(config, 8)
    generator, discriminator, state = create_train_state(
        config, jax.random.PRNGKey(0), super_batch)
    step_fn = jax.jit(functools.partial(
        train_step,
        generator=generator,
        discriminator=discriminator,
        config=config,
        additional_data={},
    ))
    state_1dev, m1 = step_fn(jax.random.PRNGKey(1), state, super_batch)

    rules = MeshRules.create()
    assert rules.data_axis_size == 8
    sharded = shard_batch(super_batch, rules.mesh)
    state_8dev, m8 = step_fn(jax.random.PRNGKey(1), state, sharded)
    np.testing.assert_allclose(
        float(m1["g_loss"]), float(m8["g_loss"]), rtol=1e-4)
    np.testing.assert_allclose(
        float(m1["d_loss"]), float(m8["d_loss"]), rtol=1e-4)
    # Post-Adam comparison: the first-step Adam update is ~lr*sign(grad),
    # so cross-sharding reduction-order noise on near-zero grads bounds the
    # achievable param agreement at ~2*lr (lr_g = 1e-4).
    a = jax.tree_util.tree_leaves(state_1dev.g_params)
    b = jax.tree_util.tree_leaves(state_8dev.g_params)
    for x, y in zip(a, b):
      np.testing.assert_allclose(x, y, rtol=0, atol=2.5e-4)


class TestPallasStep:

  def test_pallas_step_sharded_matches_xla(self):
    """`use_pallas=True` as a configuration of the FULL jitted train step
    over the 8-device mesh: the fused word-scores kernel dispatches through
    shard_map (ambient mesh) and must reproduce the XLA path's losses."""
    config = tiny_config(d_step_per_g_step=1, batch_size=8)
    super_batch = make_batch(config, 8)
    generator, discriminator, state = create_train_state(
        config, jax.random.PRNGKey(0), super_batch)

    def run(use_pallas, state):
      cfg = tiny_config(d_step_per_g_step=1, batch_size=8,
                        use_pallas=use_pallas)
      rules = MeshRules.create()  # registers the ambient mesh
      assert rules.data_axis_size == 8
      step_fn = jax.jit(functools.partial(
          train_step,
          generator=generator,
          discriminator=discriminator,
          config=cfg,
          additional_data={},
      ))
      sharded = shard_batch(super_batch, rules.mesh)
      new_state, metrics = step_fn(jax.random.PRNGKey(1), state, sharded)
      return new_state, {k: float(v) for k, v in metrics.items()}

    state_copy = jax.tree_util.tree_map(jnp.copy, state)
    _, m_xla = run(False, state)
    _, m_pl = run(True, state_copy)
    for k in m_xla:
      np.testing.assert_allclose(m_pl[k], m_xla[k], rtol=2e-3, atol=2e-3,
                                 err_msg=k)


class TestAbstractState:
  """abstract_train_state (eval_shape, no device work) must mirror the
  real jitted init exactly — it feeds the flagship AOT partitioning
  audit (tests/test_multichip_aot.py)."""

  def test_matches_real_init(self):
    from xmcgan_image_generation_tpu.engine.state import (
        abstract_train_state,
    )

    config = tiny_config()
    batch = make_batch(config, 2)
    _, _, real = create_train_state(config, jax.random.PRNGKey(0), batch)
    spec = {k: jax.ShapeDtypeStruct(v.shape, v.dtype)
            for k, v in batch.items()}
    _, _, abstract = abstract_train_state(config, spec)

    real_leaves, real_def = jax.tree_util.tree_flatten(real)
    abs_leaves, abs_def = jax.tree_util.tree_flatten(abstract)
    assert real_def == abs_def
    for r, a in zip(real_leaves, abs_leaves):
      assert r.shape == a.shape and r.dtype == a.dtype


class TestSampling:

  def test_generate_batch(self):
    config = tiny_config()
    batch, generator, _, state = setup(config)
    out = jax.jit(functools.partial(
        generate_batch, generator=generator, config=config))(
            jax.random.PRNGKey(0), state, batch)
    assert out["generated_image"].shape == (
        2, config.image_size, config.image_size, 3)
    assert out["ema_generated_image"].shape == out["generated_image"].shape
    # At init EMA == params so outputs match.
    np.testing.assert_allclose(
        out["generated_image"], out["ema_generated_image"], atol=1e-6)


class TestPretrainedContrastive:

  @pytest.mark.slow
  def test_pretrained_path_runs(self):
    config = tiny_config(pretrained_image_contrastive=True)
    batch, generator, discriminator, state = setup(config)
    additional = xmc_gan.create_additional_data(config)
    assert "image_model" in additional
    new_state, metrics = xmc_gan.train_g_d(
        jax.random.PRNGKey(0), state, batch, generator, discriminator,
        config, additional)
    assert float(metrics["c_loss_g_pretrained"]) != 0.0
    assert np.isfinite(float(metrics["c_loss_g_pretrained"]))
