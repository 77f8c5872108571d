"""MXU-matmul conv gradients (ops/mxu_conv.py).

The conv_backward knob must never change the forward computation, the
param tree, or (up to accumulation-order noise) the gradients — it only
selects which algorithm computes the conv VJP.  Reference conv usage:
xmcgan/libml/layers.py (cuDNN picks the backward algorithm implicitly on
GPU; on TPU we make that choice explicitly, measured per shape).
"""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.ops import mxu_conv


def _rand(key, shape, dtype=jnp.float32):
  return jax.random.normal(jax.random.PRNGKey(key), shape, dtype)


class TestConv2d:

  @pytest.mark.parametrize("algorithm", ["xla", "auto", "tap9", "cat"])
  def test_forward_identical(self, algorithm):
    x = _rand(0, (2, 8, 8, 5))
    w = _rand(1, (3, 3, 5, 7))
    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    out = mxu_conv.conv2d(x, w, algorithm=algorithm)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

  @pytest.mark.parametrize("algorithm", ["tap9", "cat"])
  def test_gradients_match_native(self, algorithm):
    x = _rand(2, (2, 6, 6, 4))
    w = _rand(3, (3, 3, 4, 6))

    def loss(conv):
      def f(x_, w_):
        y = conv(x_, w_)
        return jnp.sum(jnp.sin(y))
      return f

    native = jax.grad(loss(lambda a, b: mxu_conv.conv2d(a, b)), (0, 1))(x, w)
    custom = jax.grad(
        loss(lambda a, b: mxu_conv.conv2d(a, b, algorithm=algorithm)),
        (0, 1))(x, w)
    for n, c in zip(native, custom):
      np.testing.assert_allclose(np.asarray(c), np.asarray(n),
                                 rtol=1e-5, atol=1e-5)

  def test_non_qualifying_shapes_fall_through(self):
    # 1x1 and strided convs always take the native path; grads must work.
    x = _rand(4, (2, 8, 8, 4))
    w1 = _rand(5, (1, 1, 4, 6))
    g = jax.grad(lambda x_: jnp.sum(
        mxu_conv.conv2d(x_, w1, algorithm="tap9")))(x)
    assert g.shape == x.shape
    w3 = _rand(6, (3, 3, 4, 6))
    y = mxu_conv.conv2d(x, w3, strides=(2, 2), algorithm="tap9")
    assert y.shape == (2, 4, 4, 6)

  def test_auto_dispatch_resolves(self):
    # "auto" must resolve to a concrete algorithm without error at both
    # narrow and wide channel counts (measured answer on v5e: native).
    for ci, co in ((4, 6), (256, 256)):
      x = _rand(7, (1, 4, 4, ci))
      w = _rand(8, (3, 3, ci, co))
      g = jax.grad(lambda w_, x_=x: jnp.sum(
          mxu_conv.conv2d(x_, w_, algorithm="auto")))(w)
      assert g.shape == w.shape

  def test_bf16_grads_accumulate_in_f32(self):
    # Matmul-reformulated grads accumulate in f32: on the same quantized
    # bf16 inputs they must track full-f32 math to bf16 output rounding.
    x64 = np.random.RandomState(0).randn(2, 6, 6, 64)
    w64 = np.random.RandomState(1).randn(3, 3, 64, 64) * 0.1
    x, w = jnp.asarray(x64, jnp.bfloat16), jnp.asarray(w64, jnp.bfloat16)
    ref = jax.grad(lambda w_: jnp.sum(
        mxu_conv.conv2d(x.astype(jnp.float32), w_)))(w.astype(jnp.float32))
    got = jax.grad(lambda w_: jnp.sum(
        mxu_conv.conv2d(x, w_, algorithm="tap9").astype(jnp.float32)))(w)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref), rtol=0.01, atol=0.1)


class TestConvHook:
  """nn.Conv with the conv_general_dilated hook (the G-side integration)."""

  def _hooked(self, algorithm, **kw):
    return nn.Conv(
        features=6, kernel_size=(3, 3), padding="SAME",
        conv_general_dilated=mxu_conv.make_conv_general_dilated(algorithm),
        **kw)

  def test_params_and_output_identical_to_nn_conv(self):
    # Same scope name => same init RNG folds => byte-identical params,
    # and the forward is the same lax primitive.
    x = _rand(9, (2, 8, 8, 4))
    plain = nn.Conv(features=6, kernel_size=(3, 3), padding="SAME")
    p_plain = plain.init(jax.random.PRNGKey(0), x)
    hooked = self._hooked("tap9")
    p_hooked = hooked.init(jax.random.PRNGKey(0), x)
    for a, b in zip(jax.tree_util.tree_leaves(p_hooked),
                    jax.tree_util.tree_leaves(p_plain)):
      np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(hooked.apply(p_plain, x)),
        np.asarray(plain.apply(p_plain, x)))

  def test_hook_grads_match_native(self):
    x = _rand(10, (2, 8, 8, 4))
    plain = nn.Conv(features=6, kernel_size=(3, 3), padding="SAME")
    params = plain.init(jax.random.PRNGKey(0), x)
    ref = jax.grad(lambda p: jnp.sum(jnp.sin(plain.apply(p, x))))(params)
    got = jax.grad(lambda p: jnp.sum(jnp.sin(
        self._hooked("tap9").apply(p, x))))(params)
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(ref)):
      np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                 rtol=1e-5, atol=1e-5)

  def test_hook_strided_conv_falls_through(self):
    x = _rand(11, (2, 8, 8, 4))
    hooked = nn.Conv(
        features=6, kernel_size=(3, 3), strides=(2, 2), padding="SAME",
        conv_general_dilated=mxu_conv.make_conv_general_dilated("tap9"))
    params = hooked.init(jax.random.PRNGKey(0), x)
    y = hooked.apply(params, x)
    assert y.shape == (2, 4, 4, 6)


class TestModelIntegration:

  @pytest.mark.heavy
  def test_step_grads_invariant_to_conv_backward(self):
    """The full G+D update must be numerically insensitive to the knob."""
    from xmcgan_image_generation_tpu.configs.coco_xmc import get_test_config
    from xmcgan_image_generation_tpu.engine import create_train_state
    from xmcgan_image_generation_tpu.engine.step import split_batch, train_step
    from xmcgan_image_generation_tpu.engine import xmc_gan
    from __graft_entry__ import _example_batch
    import functools

    results = {}
    for algo in ("xla", "tap9"):
      config = get_test_config()
      config.conv_backward = algo
      # f32: in bf16 the accumulation-order difference between gradient
      # algorithms amplifies through the unrolled D update to ~1% on the
      # step metrics, which would make these tolerances meaningless.
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
      results[algo] = (new_state.g_params, metrics)

    ref_params, ref_metrics = results["xla"]
    got_params, got_metrics = results["tap9"]
    for k in ref_metrics:
      np.testing.assert_allclose(float(got_metrics[k]),
                                 float(ref_metrics[k]),
                                 rtol=1e-4, atol=1e-4)
    flat_ref = jax.tree_util.tree_leaves(ref_params)
    flat_got = jax.tree_util.tree_leaves(got_params)
    for a, b in zip(flat_got, flat_ref):
      np.testing.assert_allclose(np.asarray(a, np.float32),
                                 np.asarray(b, np.float32),
                                 rtol=2e-3, atol=2e-3)
