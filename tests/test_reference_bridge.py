"""Cross-implementation parity: run the *actual reference code* and this
framework on identical weights and compare outputs, then exercise the
checkpoint bridge end to end on a fabricated reference-format checkpoint.

Skipped when the reference tree is not mounted.
"""

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "xmcgan")),
    reason="reference tree not available")

BERT_DIM = 768
TEXT_LEN = 17


@pytest.fixture(scope="module")
def ref_modules():
  sys.path.insert(0, REFERENCE)
  from xmcgan.configs import coco_xmc as ref_cfg
  from xmcgan.nets import xmc_net as ref_net
  return ref_cfg, ref_net


def make_inputs(batch=2, image_size=128, z_dim=8, seed=0):
  rng = np.random.default_rng(seed)
  batch_dict = {
      "sentence_embedding": rng.standard_normal(
          (batch, BERT_DIM)).astype(np.float32),
      "embedding": rng.standard_normal(
          (batch, TEXT_LEN, BERT_DIM)).astype(np.float32),
      "max_len": np.full((batch, 1), 9.0, np.float32),
      "image": rng.uniform(0, 1, (batch, image_size, image_size, 3)
                           ).astype(np.float32),
  }
  z = rng.standard_normal((batch, z_dim)).astype(np.float32)
  return batch_dict, jnp.asarray(z)


class TestForwardParityWithReference:

  def test_generator_bit_exact_on_shared_weights(self, ref_modules):
    ref_cfg, ref_net = ref_modules
    from xmcgan_image_generation_tpu.configs import coco_xmc as my_cfg
    from xmcgan_image_generation_tpu.models import xmc_net as my_net

    rc = ref_cfg.get_test_config()
    mc = my_cfg.get_test_config()
    mc.image_size = 128
    mc.fused_spatial_cond = False
    batch, z = make_inputs(z_dim=rc.z_dim)

    ref_gen = ref_net.Generator(config=rc, train=False, dtype=jnp.float32)
    ref_vars = jax.jit(lambda k: ref_gen.init(k, (batch, z)))(
        jax.random.PRNGKey(0))
    my_gen = my_net.Generator(config=mc, train=False, dtype=jnp.float32)

    # Same variables drive both implementations.
    out_ref = ref_gen.apply(ref_vars, (batch, z), mutable=False)
    out_mine = my_gen.apply(ref_vars, (batch, z), mutable=False)
    np.testing.assert_array_equal(np.asarray(out_ref),
                                  np.asarray(out_mine))

  def test_generator_fused_layout_matches_reference(self, ref_modules):
    ref_cfg, ref_net = ref_modules
    from xmcgan_image_generation_tpu.configs import coco_xmc as my_cfg
    from xmcgan_image_generation_tpu.models import xmc_net as my_net
    from xmcgan_image_generation_tpu.utils import reference_bridge

    rc = ref_cfg.get_test_config()
    mc = my_cfg.get_test_config()
    mc.image_size = 128
    mc.fused_spatial_cond = True
    batch, z = make_inputs(z_dim=rc.z_dim)

    ref_gen = ref_net.Generator(config=rc, train=False, dtype=jnp.float32)
    ref_vars = jax.jit(lambda k: ref_gen.init(k, (batch, z)))(
        jax.random.PRNGKey(0))
    out_ref = ref_gen.apply(ref_vars, (batch, z), mutable=False)

    fused_vars = {
        "params": reference_bridge.split_modulation_kernels(
            dict(ref_vars["params"])),
        "batch_stats": reference_bridge.rename_state_for_fused(
            dict(ref_vars["batch_stats"])),
    }
    my_gen = my_net.Generator(config=mc, train=False, dtype=jnp.float32)
    out_mine = my_gen.apply(fused_vars, (batch, z), mutable=False)
    np.testing.assert_allclose(np.asarray(out_ref), np.asarray(out_mine),
                               rtol=1e-4, atol=1e-5)

  def test_discriminator_parity_on_shared_weights(self, ref_modules):
    ref_cfg, ref_net = ref_modules
    from xmcgan_image_generation_tpu.configs import coco_xmc as my_cfg
    from xmcgan_image_generation_tpu.models import xmc_net as my_net

    rc = ref_cfg.get_test_config()
    mc = my_cfg.get_test_config()
    mc.image_size = 128
    batch, _ = make_inputs(z_dim=rc.z_dim)
    rng = np.random.default_rng(5)
    imgs = jnp.asarray(rng.uniform(0, 1, (4, 128, 128, 3)).astype(
        np.float32))

    ref_disc = ref_net.Discriminator(config=rc, train=False,
                                     dtype=jnp.float32)
    ref_vars = jax.jit(lambda k: ref_disc.init(k, (imgs, batch)))(
        jax.random.PRNGKey(0))
    my_disc = my_net.Discriminator(config=mc, train=False,
                                   dtype=jnp.float32)

    ref_logit, ref_stats = ref_disc.apply(ref_vars, (imgs, batch),
                                          mutable=False)
    my_logit, my_stats = my_disc.apply(ref_vars, (imgs, batch),
                                       mutable=False)
    np.testing.assert_array_equal(np.asarray(ref_logit),
                                  np.asarray(my_logit))
    for key in ref_stats:
      np.testing.assert_allclose(float(ref_stats[key]),
                                 float(my_stats[key]),
                                 rtol=1e-4, atol=1e-5)


class TestCheckpointBridge:

  def test_fabricated_reference_checkpoint_roundtrip(self, ref_modules,
                                                     tmp_path):
    """Serialize a reference-schema TrainState with flax msgpack, load it
    through the bridge, and verify our generator reproduces the
    reference generator's output with the bridged EMA weights."""
    import flax.serialization
    ref_cfg, ref_net = ref_modules
    from xmcgan_image_generation_tpu.configs import coco_xmc as my_cfg
    from xmcgan_image_generation_tpu.engine import create_train_state
    from xmcgan_image_generation_tpu.engine.sampling import generate_batch
    from xmcgan_image_generation_tpu.utils import reference_bridge

    rc = ref_cfg.get_test_config()
    mc = my_cfg.get_test_config()
    mc.image_size = 128
    mc.dtype = "float32"
    batch, z = make_inputs(z_dim=rc.z_dim)

    ref_gen = ref_net.Generator(config=rc, train=False, dtype=jnp.float32)
    g_vars = jax.jit(lambda k: ref_gen.init(k, (batch, z)))(
        jax.random.PRNGKey(0))
    ref_disc = ref_net.Discriminator(config=rc, train=False,
                                     dtype=jnp.float32)
    imgs = jnp.concatenate([batch["image"], batch["image"]])
    d_vars = jax.jit(lambda k: ref_disc.init(k, (imgs, batch)))(
        jax.random.PRNGKey(1))

    def adam_slots(params):
      return jax.tree_util.tree_map(
          lambda p: {"grad_ema": np.zeros_like(p),
                     "grad_sq_ema": np.ones_like(p) * 0.5}, params,
          is_leaf=lambda x: not isinstance(x, dict))

    raw = {
        "step": 123,
        "g_optimizer": {
            "state": {"step": 123,
                      "param_states": adam_slots(dict(g_vars["params"]))},
            "target": dict(g_vars["params"]),
        },
        "d_optimizer": {
            "state": {"step": 246,
                      "param_states": adam_slots(dict(d_vars["params"]))},
            "target": dict(d_vars["params"]),
        },
        "generator_state": {"batch_stats": dict(g_vars["batch_stats"])},
        "discriminator_state": {
            "spectral_norm_stats": dict(d_vars["spectral_norm_stats"])},
        "ema_params": dict(g_vars["params"]),
    }
    path = str(tmp_path / "ckpt-123")
    with open(path, "wb") as f:
      f.write(flax.serialization.msgpack_serialize(raw))

    # Bridge into our TrainState (fused layout).
    loaded = reference_bridge.load_reference_msgpack(path)
    generator, _, template = create_train_state(
        mc, jax.random.PRNGKey(9),
        {k: jnp.asarray(v) for k, v in batch.items()})
    state = reference_bridge.convert_reference_train_state(
        loaded, template, fused_spatial_cond=True)
    assert int(state.step) == 123

    out = generate_batch(
        jax.random.PRNGKey(0), state, {**batch, "z": z},
        generator=generator, config=mc)
    want = ref_gen.apply(g_vars, (batch, z), mutable=False)
    np.testing.assert_allclose(np.asarray(out["ema_generated_image"]),
                               np.asarray(want), rtol=1e-4, atol=1e-5)
    # Optimizer slots landed in optax state.
    mu_leaves = jax.tree_util.tree_leaves(state.g_opt_state[0].mu)
    assert all(float(np.abs(l).max()) == 0.0 for l in mu_leaves)
    nu_leaves = jax.tree_util.tree_leaves(state.g_opt_state[0].nu)
    assert all(float(l.ravel()[0]) == 0.5 for l in nu_leaves)


class TestPretrainedResnetNpyBridge:

  def test_reference_format_npy_loads_and_matches_forward(self, tmp_path):
    """Fabricate a resnet_pretrained.npy with the ACTUAL reference ResNet's
    variable tree (nested stage{i}/block{j} — reference
    utils/resnet_v1.py:89-107), load it through our tower, and assert both
    implementations produce the same features/logits on shared weights."""
    import flax
    sys.path.insert(0, REFERENCE)
    from xmcgan.utils import resnet_v1 as ref_resnet
    from xmcgan_image_generation_tpu.utils import pretrained

    ref_model = ref_resnet.ResNet50(num_classes=1000)
    x_small = jnp.ones((1, 64, 64, 3), jnp.float32)
    ref_vars = jax.jit(
        lambda k: ref_model.init(k, x_small, train=False))(
            jax.random.PRNGKey(3))
    path = str(tmp_path / "resnet_pretrained.npy")
    payload = {
        "params": flax.core.unfreeze(ref_vars["params"]),
        "batch_stats": flax.core.unfreeze(ref_vars["batch_stats"]),
    }
    np.save(path, payload, allow_pickle=True)

    model, state = pretrained.get_pretrained_model(
        "resnet50", path, dtype=jnp.float32)

    rng = np.random.default_rng(5)
    images = jnp.asarray(
        rng.uniform(0, 1, (2, 224, 224, 3)).astype(np.float32))
    pool, out = pretrained.get_pretrained_embs(state, model, images)
    want_pool, want_out = ref_model.apply(
        ref_vars, images, train=False, mutable=False)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(want_pool),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                               rtol=1e-4, atol=1e-4)

  def test_incompatible_npy_raises_clear_error(self, tmp_path):
    from xmcgan_image_generation_tpu.utils import pretrained
    path = str(tmp_path / "bad.npy")
    np.save(path, {"params": {"stage1": {"block1": {"conv1": {
        "kernel": np.zeros((1, 1, 3, 4), np.float32)}}}},
        "batch_stats": {}}, allow_pickle=True)
    with pytest.raises(ValueError, match="does not match the model"):
      pretrained.get_pretrained_model("resnet50", path, dtype=jnp.float32)
