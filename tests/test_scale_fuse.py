"""Scale-fused convolutions (ops/scale_fuse.py).

The fusions are exact factorizations: upsample->conv3x3 == phase-kernel
conv at low res + depth-to-space; conv3x3->avgpool2 == one 4x4/stride-2
conv.  Reference pipelines: nets/common.py:136-186 (upsample-conv) and
nets/common.py:58-133 (conv-pool).  These tests pin (a) op-level
equality to float rounding, (b) block- and model-level equivalence on
the SAME params (the knob must not change the param tree), and (c)
gradient agreement.
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jax import lax

from xmcgan_image_generation_tpu.ops import scale_fuse
from xmcgan_image_generation_tpu.ops.pooling import dsample, upsample


def _conv3x3(x, w):
  return lax.conv_general_dilated(
      x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestOps:

  @pytest.mark.parametrize("h,ci,co", [(4, 5, 7), (6, 3, 2), (8, 16, 8)])
  def test_upsample_conv_exact(self, h, ci, co):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, h, ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co))
    ref = _conv3x3(upsample(x), w)
    got = scale_fuse.upsample_conv(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

  @pytest.mark.parametrize("h,ci,co", [(4, 5, 7), (6, 3, 2), (8, 16, 8)])
  def test_upsample_conv_dilated_exact(self, h, ci, co):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, h, h, ci))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, ci, co))
    ref = _conv3x3(upsample(x), w)
    got = scale_fuse.upsample_conv_dilated(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

  def test_upsample_conv_dilated_gradients(self):
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 4))
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 4, 6))
    loss = lambda f: lambda x_, w_: jnp.sum(jnp.sin(f(x_, w_)))
    gf = jax.grad(loss(scale_fuse.upsample_conv_dilated), (0, 1))(x, w)
    gr = jax.grad(loss(lambda x_, w_: _conv3x3(upsample(x_), w_)), (0, 1))(
        x, w)
    for a, b in zip(gf, gr):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-4, atol=1e-4)

  def test_hook_up_method_selects_dilated(self):
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 4, 4, 3))
    w = jax.random.normal(jax.random.PRNGKey(7), (3, 3, 3, 5))
    hook = scale_fuse.make_fused_conv_hook("up", "dilated")
    got = hook(x, w, (1, 1), "SAME")
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(scale_fuse.upsample_conv_dilated(x, w)),
        rtol=1e-6, atol=1e-6)
    with pytest.raises(ValueError):
      scale_fuse.make_fused_conv_hook("up", "nearest")

  @pytest.mark.parametrize("h,ci,co", [(4, 5, 7), (6, 3, 2), (8, 16, 8)])
  def test_conv_pool_exact(self, h, ci, co):
    x = jax.random.normal(jax.random.PRNGKey(2), (2, h, h, ci))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, ci, co))
    ref = dsample(_conv3x3(x, w))
    got = scale_fuse.conv_pool(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

  def test_conv_pool_rejects_odd_dims(self):
    x = jnp.zeros((1, 5, 5, 3))
    w = jnp.zeros((3, 3, 3, 4))
    with pytest.raises(ValueError):
      scale_fuse.conv_pool(x, w)

  def test_gradients_match_unfused(self):
    x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 6, 4))
    w = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 4, 6))
    for fused, ref in (
        (scale_fuse.upsample_conv, lambda x_, w_: _conv3x3(upsample(x_), w_)),
        (scale_fuse.conv_pool, lambda x_, w_: dsample(_conv3x3(x_, w_)))):
      gf = jax.grad(lambda x_, w_: jnp.sum(jnp.sin(fused(x_, w_))), (0, 1))(
          x, w)
      gr = jax.grad(lambda x_, w_: jnp.sum(jnp.sin(ref(x_, w_))), (0, 1))(
          x, w)
      for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


class TestBlocks:
  """Same params, fused vs unfused block: outputs must agree."""

  def _factories(self, spectral):
    from xmcgan_image_generation_tpu.models.xmc_net import _layer_factories
    return _layer_factories(spectral, train=False, dtype=jnp.float32)

  @pytest.mark.parametrize("spectral", [False, True])
  def test_disc_block_equivalent(self, spectral):
    from xmcgan_image_generation_tpu.models import blocks
    conv_fn, _ = self._factories(spectral)
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 8, 8, 5))
    base = blocks.DiscBlock(filters=7, downsample=True, conv_fn=conv_fn)
    fused = blocks.DiscBlock(filters=7, downsample=True, conv_fn=conv_fn,
                             scale_fuse=True)
    variables = base.init(jax.random.PRNGKey(0), x)
    v_fused = fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(v_fused)
            == jax.tree_util.tree_structure(variables))
    ref = base.apply(variables, x)
    got = fused.apply(variables, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

  @pytest.mark.parametrize("spectral", [False, True])
  def test_gen_block_dilated_equivalent(self, spectral):
    """up_method="dilated": same params, same outputs as the unfused block."""
    from xmcgan_image_generation_tpu.models import blocks
    from xmcgan_image_generation_tpu.models.xmc_net import _layer_factories
    conv_fn, dense_fn = _layer_factories(
        spectral, train=False, dtype=jnp.float32, up_method="dilated")
    norm_fn = lambda **kw: nn.BatchNorm(  # noqa: E731
        use_running_average=True, momentum=0.9, epsilon=1e-5, **kw)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 6))
    cond = jax.random.normal(jax.random.PRNGKey(8), (2, 10))
    base = blocks.GenBlock(filters=5, conv_fn=conv_fn, dense_fn=dense_fn,
                           norm_fn=norm_fn)
    fused = blocks.GenBlock(filters=5, conv_fn=conv_fn, dense_fn=dense_fn,
                            norm_fn=norm_fn, scale_fuse=True)
    variables = base.init(jax.random.PRNGKey(0), x, cond)
    v_fused = fused.init(jax.random.PRNGKey(0), x, cond)
    assert (jax.tree_util.tree_structure(v_fused)
            == jax.tree_util.tree_structure(variables))
    ref = base.apply(variables, x, cond)
    got = fused.apply(variables, x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

  def test_gen_block_equivalent(self):
    from xmcgan_image_generation_tpu.models import blocks
    conv_fn, dense_fn = self._factories(False)
    norm_fn = lambda **kw: nn.BatchNorm(  # noqa: E731
        use_running_average=True, momentum=0.9, epsilon=1e-5, **kw)
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 4, 4, 6))
    cond = jax.random.normal(jax.random.PRNGKey(8), (2, 10))
    base = blocks.GenBlock(filters=5, conv_fn=conv_fn, dense_fn=dense_fn,
                           norm_fn=norm_fn)
    fused = blocks.GenBlock(filters=5, conv_fn=conv_fn, dense_fn=dense_fn,
                            norm_fn=norm_fn, scale_fuse=True)
    variables = base.init(jax.random.PRNGKey(0), x, cond)
    v_fused = fused.init(jax.random.PRNGKey(0), x, cond)
    assert (jax.tree_util.tree_structure(v_fused)
            == jax.tree_util.tree_structure(variables))
    ref = base.apply(variables, x, cond)
    got = fused.apply(variables, x, cond)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


class TestModel:

  @pytest.mark.heavy
  def test_step_equivalent_to_unfused(self):
    """Full G+D train step: same init, metrics must agree closely."""
    from xmcgan_image_generation_tpu.configs.coco_xmc import get_test_config
    from xmcgan_image_generation_tpu.engine import create_train_state
    from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
    from xmcgan_image_generation_tpu.engine import xmc_gan
    from __graft_entry__ import _example_batch
    import functools

    results = {}
    for fuse in (False, True):
      config = get_test_config()
      config.scale_fused_convs = fuse
      config.dtype = "float32"
      super_batch = _example_batch(
          config, config.batch_size * config.d_step_per_g_step)
      init_batch = split_batch(super_batch, config.d_step_per_g_step)[0]
      generator, discriminator, state = create_train_state(
          config, jax.random.PRNGKey(0), init_batch)
      step = functools.partial(
          train_step, generator=generator, discriminator=discriminator,
          config=config, additional_data=xmc_gan.create_additional_data(
              config))
      new_state, metrics = jax.jit(step)(
          jax.random.PRNGKey(1), state, super_batch)
      results[fuse] = (new_state.g_params, metrics)

    ref_params, ref_metrics = results[False]
    got_params, got_metrics = results[True]
    for k in ref_metrics:
      np.testing.assert_allclose(float(got_metrics[k]),
                                 float(ref_metrics[k]),
                                 rtol=1e-3, atol=1e-3)
    for a, b in zip(jax.tree_util.tree_leaves(got_params),
                    jax.tree_util.tree_leaves(ref_params)):
      np.testing.assert_allclose(np.asarray(a, np.float32),
                                 np.asarray(b, np.float32),
                                 rtol=5e-3, atol=5e-3)
