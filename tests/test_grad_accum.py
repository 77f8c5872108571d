"""Gradient accumulation (``config.grad_accum_steps``).

A capacity capability beyond the reference's surface: each G/D update
scans ``k`` microbatches and applies its optimizer ONCE on the averaged
gradients (engine/xmc_gan.py).  These tests pin:

* the microbatch partition matches `split_batch`'s chunks and rejects
  non-divisible batches,
* the stacked layout is re-pinned to the data mesh axis under an ambient
  mesh,
* the scanned gradients/mutable states equal a hand-rolled python-loop
  accumulation (sequential state threading, gradient averaging),
* the outer update applies each optimizer ONCE on the averaged gradients
  and takes ONE EMA step,
* likewise for the critic-only update,
* the full outer train step runs with accumulation enabled.

Tolerance note: grad-level comparisons use a per-leaf atol scaled to the
leaf's gradient magnitude.  The scanned and unrolled programs compile
differently, so components whose true gradient is ~0 carry only
reassociation noise; comparing *post-Adam* params instead would amplify
every such sign flip to a +-lr difference (Adam's first step is
~lr*sign(g) regardless of |g|), which is why the optimizer-wiring check
runs on the scan-produced gradients.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xmcgan_image_generation_tpu.configs import coco_xmc
from xmcgan_image_generation_tpu.engine import create_optimizers, create_train_state
from xmcgan_image_generation_tpu.engine import xmc_gan
from xmcgan_image_generation_tpu.engine.step import (
    split_batch,
    stack_microbatches,
    train_step,
)
from xmcgan_image_generation_tpu.parallel import MeshRules

BERT_DIM = 768
TEXT_LEN = 17


def tiny_config(**overrides):
  config = coco_xmc.get_test_config()
  config.dtype = "float32"
  for k, v in overrides.items():
    setattr(config, k, v)
  return config


def make_batch(config, batch_size, seed=0):
  rng = np.random.default_rng(seed)
  s = config.image_size
  batch = {
      "image": rng.uniform(0, 1, (batch_size, s, s, 3)).astype(np.float32),
      "embedding": rng.standard_normal(
          (batch_size, TEXT_LEN, BERT_DIM)).astype(np.float32),
      "sentence_embedding": rng.standard_normal(
          (batch_size, BERT_DIM)).astype(np.float32),
      "max_len": np.full((batch_size, 1), 9.0, np.float32),
      "z": rng.standard_normal(
          (batch_size, config.z_dim)).astype(np.float32),
  }
  return {k: jnp.asarray(v) for k, v in batch.items()}


def assert_trees_close(a, b, rtol=1e-4, atol=1e-5):
  jax.tree_util.tree_map(
      lambda x, y: np.testing.assert_allclose(
          np.asarray(x, np.float32), np.asarray(y, np.float32),
          rtol=rtol, atol=atol),
      a, b)


def assert_grad_trees_close(a, b, rtol=1e-4, noise=1e-5, floor=1e-6):
  """Per-leaf atol scaled to the leaf's own magnitude, with a noise floor.

  The scanned and unrolled accumulation programs fuse/reassociate f32
  sums differently, so every leaf carries last-ulp deviation (measured
  worst case on this model: ~3e-6 relative — rtol leaves a 30x margin)
  and leaves whose true gradient is ~0 hold ONLY cancellation noise
  (measured ~6e-8 absolute; `floor` sits 15x above it and well below
  the smallest meaningful gradients, ~1e-4).
  """
  def cmp(x, y):
    x = np.asarray(x, np.float32)
    y = np.asarray(y, np.float32)
    atol = noise * float(np.max(np.abs(y))) + floor
    np.testing.assert_allclose(x, y, rtol=rtol, atol=atol)

  jax.tree_util.tree_map(cmp, a, b)


class TestStacking:

  def test_partition_matches_split_batch(self):
    config = tiny_config()
    batch = make_batch(config, 4)
    stacked = stack_microbatches(batch, 2)
    halves = split_batch(batch, 2)
    for i in range(2):
      for k in batch:
        np.testing.assert_array_equal(np.asarray(stacked[k][i]),
                                      np.asarray(halves[i][k]))

  def test_rejects_non_divisible_batch(self):
    config = tiny_config()
    batch = make_batch(config, 3)
    with pytest.raises(ValueError, match="grad_accum_steps"):
      stack_microbatches(batch, 2)

  def test_k1_is_identity(self):
    config = tiny_config()
    batch = make_batch(config, 2)
    assert stack_microbatches(batch, 1) is batch

  def test_microbatch_rows_pinned_to_data_axis(self):
    # 16 examples / k=2 -> microbatches of 8, divisible by the 8-device
    # data axis: the stacked layout must be P(None, "data", ...).
    config = tiny_config()
    rules = MeshRules.create(data=8, model=1)  # registers the ambient mesh
    batch = {"image": jnp.zeros((16, 4, 4, 3))}
    stacked = jax.jit(lambda b: stack_microbatches(b, 2))(batch)
    spec = stacked["image"].sharding.spec
    assert tuple(spec)[:2] == (None, "data"), spec
    del rules


class TestJointAccumulation:
  # Compile-bound (~2 min each on the 1-core box: a lax.scan over the
  # full joint fwd+bwd) — heavy tier; the cheap stacking/schedule tests
  # above/below keep quick-tier coverage of the knob's plumbing.
  pytestmark = pytest.mark.heavy

  def _setup(self, k=2):
    config = tiny_config(grad_accum_steps=k)
    batch = make_batch(config, 4)
    generator, discriminator, state = create_train_state(
        config, jax.random.PRNGKey(0), split_batch(batch, k)[0])
    grads_fn = functools.partial(
        xmc_gan._joint_grads, generator=generator,
        discriminator=discriminator, config=config, additional_data={})
    return config, batch, generator, discriminator, state, grads_fn

  def _scan(self, config, state, batch, rng, grads_fn, k):
    """`_accumulated` wired exactly as `train_g_d` wires it."""

    def fn(mb_rng, states, mb):
      g_state, d_state = states
      g_grad, d_grad, new_g, new_d, mb_losses = grads_fn(
          mb_rng, state.g_params, state.d_params, g_state, d_state, mb)
      return (g_grad, d_grad), (new_g, new_d), mb_losses

    loss_template = {name: jnp.zeros((), jnp.float32)
                     for name in xmc_gan._LOSS_NAMES}
    return xmc_gan._accumulated(
        fn, rng,
        (dict(state.generator_state), dict(state.discriminator_state)),
        (state.g_params, state.d_params), loss_template, batch, k)

  def test_scan_grads_match_manual_loop(self):
    """The scanned accumulation == a hand-rolled python loop: sequential
    mutable-state threading, per-microbatch rngs, averaged grads/losses."""
    config, batch, _, _, state, grads_fn = self._setup(k=2)
    rng = jax.random.PRNGKey(7)

    g_state = dict(state.generator_state)
    d_state = dict(state.discriminator_state)
    g_grads, d_grads, loss_list = [], [], []
    for mb_rng, mb in zip(jax.random.split(rng, 2), split_batch(batch, 2)):
      g_grad, d_grad, g_state, d_state, mb_losses = grads_fn(
          mb_rng, state.g_params, state.d_params, g_state, d_state, mb)
      g_grads.append(g_grad)
      d_grads.append(d_grad)
      loss_list.append(mb_losses)
    mean = lambda trees: jax.tree_util.tree_map(  # noqa: E731
        lambda *xs: sum(xs) / 2, *trees)

    states, grads, losses = self._scan(config, state, batch, rng,
                                       grads_fn, 2)

    assert_grad_trees_close(grads[0], mean(g_grads))
    assert_grad_trees_close(grads[1], mean(d_grads))
    assert_grad_trees_close(states[0], g_state)
    assert_grad_trees_close(states[1], d_state)
    assert_grad_trees_close(losses, mean(loss_list))

  def test_optimizers_applied_once_on_averaged_grads(self):
    """`train_g_d` == one optax update per net on the accumulated grads,
    one EMA step, and the final scanned mutable collections.

    Compared against the scan-produced gradients (not the python loop):
    Adam's first step is ~lr*sign(g) for every component, so the
    loop-vs-scan reassociation noise on ~0 gradients would flip signs and
    make post-optimizer params incomparable.  The scan itself is pinned
    against the loop at gradient level above.
    """
    config, batch, generator, discriminator, state, grads_fn = (
        self._setup(k=2))
    rng = jax.random.PRNGKey(7)

    new_state, metrics = xmc_gan.train_g_d(
        rng, state, batch, generator, discriminator, config, {})

    states, grads, losses = self._scan(config, state, batch, rng,
                                       grads_fn, 2)
    g_grad, d_grad = grads
    g_tx, d_tx = create_optimizers(config)
    d_updates, d_opt = d_tx.update(d_grad, state.d_opt_state,
                                   state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)
    g_updates, g_opt = g_tx.update(g_grad, state.g_opt_state,
                                   state.g_params)
    g_params = optax.apply_updates(state.g_params, g_updates)
    decay = config.polyak_decay
    ema = jax.tree_util.tree_map(
        lambda e, p: e * decay + (1.0 - decay) * p, state.ema_params,
        g_params)

    assert int(new_state.step) == int(state.step) + 1
    assert_trees_close(new_state.g_params, g_params, rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.d_params, d_params, rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.ema_params, ema, rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.g_opt_state, g_opt, rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.d_opt_state, d_opt, rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.generator_state, states[0],
                       rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.discriminator_state, states[1],
                       rtol=1e-6, atol=1e-7)
    assert set(metrics) == set(xmc_gan._LOSS_NAMES)
    for name, v in metrics.items():
      assert bool(jnp.isfinite(v)), name
      np.testing.assert_allclose(np.asarray(v), np.asarray(losses[name]),
                                 rtol=1e-6, atol=1e-7)

  def test_accumulated_update_differs_from_fullbatch(self):
    # Sanity that k=2 is not accidentally running the k=1 program: the
    # microbatch-sized contrastive pools and BN statistics make the
    # updates genuinely different.
    config1 = tiny_config(grad_accum_steps=1)
    config2 = tiny_config(grad_accum_steps=2)
    batch = make_batch(config1, 4)
    generator, discriminator, state = create_train_state(
        config1, jax.random.PRNGKey(0), split_batch(batch, 2)[0])
    rng = jax.random.PRNGKey(7)
    s1, _ = xmc_gan.train_g_d(rng, state, batch, generator, discriminator,
                              config1, {})
    s2, _ = xmc_gan.train_g_d(rng, state, batch, generator, discriminator,
                              config2, {})
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.g_params,
        s2.g_params)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0


class TestCriticAccumulation:
  pytestmark = pytest.mark.heavy

  def test_scan_matches_manual_loop(self):
    config = tiny_config(grad_accum_steps=2)
    batch = make_batch(config, 4)
    generator, discriminator, state = create_train_state(
        config, jax.random.PRNGKey(0), split_batch(batch, 2)[0])
    rng = jax.random.PRNGKey(3)

    new_state = xmc_gan.train_d(rng, state, batch, generator,
                                discriminator, config)

    grads_fn = functools.partial(
        xmc_gan._critic_grads, g_params=state.g_params,
        generator=generator, discriminator=discriminator, config=config)
    # Manual python-loop accumulation, compared at gradient/state level
    # (see module docstring for why not post-Adam).
    d_state = dict(state.discriminator_state)
    d_grads = []
    for mb_rng, mb in zip(jax.random.split(rng, 2), split_batch(batch, 2)):
      d_grad, d_state = grads_fn(mb_rng, state.d_params,
                                 g_state=state.generator_state,
                                 d_state=d_state, batch=mb)
      d_grads.append(d_grad)
    man_grad = jax.tree_util.tree_map(lambda *xs: sum(xs) / 2, *d_grads)

    # The scan wired as `train_d` wires it — grads pinned to the loop,
    # optimizer wiring pinned to the scan grads.
    def fn(mb_rng, states, mb):
      d_grad, new_d = grads_fn(mb_rng, state.d_params,
                               g_state=state.generator_state,
                               d_state=states, batch=mb)
      return d_grad, new_d, {}

    scan_d_state, scan_grad, _ = xmc_gan._accumulated(
        fn, rng, dict(state.discriminator_state), state.d_params, {},
        batch, 2)
    assert_grad_trees_close(scan_grad, man_grad)
    assert_grad_trees_close(scan_d_state, d_state)

    _, d_tx = create_optimizers(config)
    d_updates, d_opt = d_tx.update(scan_grad, state.d_opt_state,
                                   state.d_params)
    d_params = optax.apply_updates(state.d_params, d_updates)
    assert_trees_close(new_state.d_params, d_params, rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.d_opt_state, d_opt, rtol=1e-6, atol=1e-7)
    assert_trees_close(new_state.discriminator_state, scan_d_state,
                       rtol=1e-6, atol=1e-7)
    # G side untouched by a critic step.
    assert_trees_close(new_state.g_params, state.g_params, rtol=0, atol=0)


@pytest.mark.heavy
def test_full_outer_step_runs_accumulated():
  """The jitted outer step (n-critic loop) with accumulation on."""
  config = tiny_config(grad_accum_steps=2, batch_size=4)
  super_batch = make_batch(config, config.batch_size
                           * config.d_step_per_g_step)
  generator, discriminator, state = create_train_state(
      config, jax.random.PRNGKey(0),
      split_batch(super_batch, 2 * config.d_step_per_g_step)[0])
  step = jax.jit(functools.partial(
      train_step, generator=generator, discriminator=discriminator,
      config=config, additional_data={}))
  new_state, metrics = step(jax.random.PRNGKey(1), state, super_batch)
  assert int(new_state.step) == 1
  for name, value in metrics.items():
    assert bool(jnp.isfinite(value)), name
