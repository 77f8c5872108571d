"""Serving export: StableHLO artifact round-trips and matches the model.

Covers utils/serving.py — the AOT-exported generator must reproduce the
in-framework inference path exactly, with weights baked in, for both a
static and a symbolic (any-batch) batch dimension.
"""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.configs.coco_xmc import get_test_config
from xmcgan_image_generation_tpu.engine import create_train_state
from xmcgan_image_generation_tpu.utils import serving


@pytest.fixture(scope="module")
def tiny_setup():
  config = get_test_config()
  with config.unlocked():
    # f32 makes the exported module bit-comparable with the direct path;
    # bf16 re-lowering drifts by a few ULPs (covered separately below).
    config.dtype = "float32"
  rng = jax.random.PRNGKey(0)
  s = config.image_size
  init_batch = {
      "image": jnp.zeros((2, s, s, 3), jnp.float32),
      "sentence_embedding": jnp.zeros((2, serving.BERT_DIM), jnp.float32),
      "embedding": jnp.zeros(
          (2, serving.COCO_MAX_TEXT_LENGTH, serving.BERT_DIM), jnp.float32),
      "max_len": jnp.full((2, 1), 17.0, jnp.float32),
      "z": jnp.zeros((2, config.z_dim), jnp.float32),
  }
  generator, _, state = create_train_state(config, rng, init_batch)
  variables = {"params": state.ema_params, **state.generator_state}
  return config, generator, variables


def _inputs(config, batch, seed=1):
  r = jax.random.PRNGKey(seed)
  r1, r2, r3, r4 = jax.random.split(r, 4)
  sent = jax.random.normal(r1, (batch, serving.BERT_DIM), jnp.float32)
  words = jax.random.normal(
      r2, (batch, serving.COCO_MAX_TEXT_LENGTH, serving.BERT_DIM),
      jnp.float32)
  max_len = jax.random.randint(r3, (batch, 1), 3, 18).astype(jnp.float32)
  z = jax.random.normal(r4, (batch, config.z_dim), jnp.float32)
  return sent, words, max_len, z


def test_static_batch_roundtrip(tiny_setup):
  config, generator, variables = tiny_setup
  exported = serving.export_generator(
      generator, variables, config, batch_size=2)
  data = bytes(exported.serialize())
  assert len(data) > 0
  restored = serving.load_exported(data)

  inputs = _inputs(config, 2)
  direct = serving.generator_serving_fn(generator, variables, config)(
      *inputs)
  served = restored.call(*inputs)
  assert served.shape == (2, config.image_size, config.image_size, 3)
  assert served.dtype == jnp.float32
  np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                             atol=1e-6)
  # Images land in the generator's documented [0, 1] output range.
  assert float(jnp.min(served)) >= 0.0 and float(jnp.max(served)) <= 1.0


def test_symbolic_batch_serves_multiple_sizes(tiny_setup):
  config, generator, variables = tiny_setup
  exported = serving.export_generator(
      generator, variables, config, batch_size=None)
  restored = serving.load_exported(bytes(exported.serialize()))

  direct = serving.generator_serving_fn(generator, variables, config)
  for batch in (2, 5):
    inputs = _inputs(config, batch, seed=batch)
    out = restored.call(*inputs)
    assert out.shape == (batch, config.image_size, config.image_size, 3)
    # Symbolic-dim lowering reassociates a handful of ops; near-exact.
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(direct(*inputs)), atol=1e-4)


def test_artifact_metadata(tiny_setup):
  config, _, _ = tiny_setup
  meta = json.loads(serving.artifact_metadata(
      config, weights="ema", step=1234, batch_size=None))
  assert meta["weights"] == "ema"
  assert meta["step"] == 1234
  assert meta["inputs"]["z"] == ["b", config.z_dim]
  assert meta["output"]["image"] == [
      "b", config.image_size, config.image_size, 3]


@pytest.mark.heavy
def test_bfloat16_flagship_dtype_export(tiny_setup):
  """The flagship dtype (bf16) exports and stays within bf16 ULP drift."""
  config, _, _ = tiny_setup
  bf16_config = get_test_config()
  generator, _, state = create_train_state(
      bf16_config, jax.random.PRNGKey(0), {
          "image": jnp.zeros((2, bf16_config.image_size,
                              bf16_config.image_size, 3), jnp.float32),
          "sentence_embedding": jnp.zeros((2, serving.BERT_DIM),
                                          jnp.float32),
          "embedding": jnp.zeros(
              (2, serving.COCO_MAX_TEXT_LENGTH, serving.BERT_DIM),
              jnp.float32),
          "max_len": jnp.full((2, 1), 17.0, jnp.float32),
          "z": jnp.zeros((2, bf16_config.z_dim), jnp.float32),
      })
  variables = {"params": state.ema_params, **state.generator_state}
  exported = serving.export_generator(
      generator, variables, bf16_config, batch_size=2)
  restored = serving.load_exported(bytes(exported.serialize()))
  inputs = _inputs(bf16_config, 2)
  direct = serving.generator_serving_fn(
      generator, variables, bf16_config)(*inputs)
  served = restored.call(*inputs)
  # Re-lowering a bf16 program fuses differently: allow a few bf16 ULPs.
  np.testing.assert_allclose(np.asarray(served), np.asarray(direct),
                             atol=3e-2)

  # bf16 configs embed pre-cast bf16 params: the artifact must be about
  # half the f32-config artifact (same tiny architecture, f32 fixture).
  f32_exported = serving.export_generator(
      generator=tiny_setup[1], variables=tiny_setup[2], config=config,
      batch_size=2)
  bf16_bytes = len(bytes(exported.serialize()))
  f32_bytes = len(bytes(f32_exported.serialize()))
  assert bf16_bytes < 0.62 * f32_bytes, (bf16_bytes, f32_bytes)


def test_weights_are_baked_in(tiny_setup):
  """Different weights must produce a different artifact output."""
  config, generator, variables = tiny_setup
  exported = serving.export_generator(
      generator, variables, config, batch_size=2)
  zeroed = jax.tree_util.tree_map(jnp.zeros_like, variables)
  exported_zero = serving.export_generator(
      generator, zeroed, config, batch_size=2)
  inputs = _inputs(config, 2)
  out = exported.call(*inputs)
  out_zero = exported_zero.call(*inputs)
  assert not np.allclose(np.asarray(out), np.asarray(out_zero))


def test_scale_fused_config_exports_same_images(tiny_setup):
  """An artifact exported under scale_fused_convs reproduces the unfused
  artifact on the same weights (the param tree is shared by design)."""
  config, generator, variables = tiny_setup
  fused_config = get_test_config()
  with fused_config.unlocked():
    fused_config.dtype = "float32"
    fused_config.scale_fused_convs = True
  from xmcgan_image_generation_tpu.models import get_architecture
  fused_generator, _ = get_architecture(fused_config, jnp.float32)

  inputs = _inputs(config, 2)
  base = serving.export_generator(
      generator, variables, config, batch_size=2).call(*inputs)
  fused = serving.export_generator(
      fused_generator, variables, fused_config, batch_size=2).call(*inputs)
  # Exact up to re-association of 2-3 kernel-weight additions.
  np.testing.assert_allclose(np.asarray(fused), np.asarray(base),
                             rtol=2e-5, atol=2e-5)


def test_int8_quantized_export(tiny_setup):
  """Weight-only int8: much smaller artifact, bounded output deviation."""
  config, generator, variables = tiny_setup
  full = serving.export_generator(
      generator, variables, config, batch_size=2)
  quant = serving.export_generator(
      generator, variables, config, batch_size=2, quantize="int8")
  full_bytes = bytes(full.serialize())
  quant_bytes = bytes(quant.serialize())
  # f32 kernels -> int8 + per-channel scales: ~4x on the kernel payload.
  assert len(quant_bytes) < 0.35 * len(full_bytes), (
      len(quant_bytes), len(full_bytes))

  inputs = _inputs(config, 2)
  ref = full.call(*inputs)
  got = serving.load_exported(quant_bytes).call(*inputs)
  assert got.shape == ref.shape
  # Lossy but close: per-channel int8 holds ~0.4% weight error; outputs
  # in [0,1] should deviate by a few percent at most.
  err = float(jnp.mean(jnp.abs(got - ref)))
  assert err < 0.05, f"mean abs deviation {err}"
  assert float(jnp.max(got)) <= 1.0 and float(jnp.min(got)) >= 0.0


def test_quantize_params_int8_roundtrip_error():
  """Quantization math: per-channel scales bound the roundtrip error."""
  rng = jax.random.PRNGKey(3)
  w = jax.random.normal(rng, (3, 3, 16, 32)) * jnp.linspace(
      0.01, 2.0, 32)  # widely varying per-channel magnitudes
  leaves, treedef = serving.quantize_params_int8({"k": w})
  (q, scale), = leaves
  assert q.dtype == jnp.int8 and scale.shape == (1, 1, 1, 32)
  back = jax.tree_util.tree_unflatten(
      treedef, [(q.astype(jnp.float32) * scale)])["k"]
  # Symmetric int8: |err| <= scale/2 per element (0.4% of channel amax).
  per_channel_bound = jnp.abs(w - back) <= scale / 2 + 1e-8
  assert bool(jnp.all(per_channel_bound))
  # Biases/vectors pass through untouched.
  leaves, _ = serving.quantize_params_int8({"b": jnp.ones((7,))})
  assert leaves[0][1] is None


@pytest.mark.heavy
def test_sharded_export_batch_parallel(tiny_setup):
  """A mesh export serves one batch across all 8 devices and matches the
  single-device artifact."""
  config, generator, variables = tiny_setup
  mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(8), ("data",))
  exported = serving.export_generator(
      generator, variables, config, batch_size=8, mesh=mesh)
  restored = serving.load_exported(bytes(exported.serialize()))

  inputs = _inputs(config, 8)
  # Consumer-side placement: rebuild the shardings on the consumer mesh.
  in_sh = restored.in_shardings_jax(mesh)
  placed = tuple(jax.device_put(x, s) for x, s in zip(inputs, in_sh))
  out = restored.call(*placed)
  assert out.shape == (8, config.image_size, config.image_size, 3)
  # The output itself comes back sharded over the batch axis.
  assert len({sh.device.id for sh in out.addressable_shards}) == 8

  single = serving.export_generator(
      generator, variables, config, batch_size=8).call(*inputs)
  np.testing.assert_allclose(np.asarray(out), np.asarray(single),
                             atol=1e-4)


def test_sharded_export_rejects_bad_batch(tiny_setup):
  config, generator, variables = tiny_setup
  mesh = jax.sharding.Mesh(np.array(jax.devices()).reshape(8), ("data",))
  with pytest.raises(ValueError, match="divisible"):
    serving.export_generator(generator, variables, config, batch_size=6,
                             mesh=mesh)
  with pytest.raises(ValueError, match="static batch_size"):
    serving.export_generator(generator, variables, config, batch_size=None,
                             mesh=mesh)


@pytest.mark.heavy
def test_serving_bench_tool(monkeypatch, capsys):
  """tools/serving_bench.py runs and emits its JSON contract."""
  tools_dir = os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
  sys.path.insert(0, tools_dir)
  try:
    import serving_bench
    monkeypatch.setattr(sys, "argv", [
        "serving_bench.py", "--config_module", "coco_xmc:test",
        "--batch_size", "4", "--steps", "2",
    ])
    serving_bench.main()
  finally:
    sys.path.remove(tools_dir)
  out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
  assert out["images_per_sec_jit"] > 0
  assert out["images_per_sec_exported"] > 0


@pytest.mark.heavy
def test_export_cli_from_trained_workdir(tmp_path, monkeypatch):
  """tools/export_serving.py end to end: train 2 steps, export, serve."""
  from xmcgan_image_generation_tpu import train as train_lib

  config = get_test_config()
  config.num_train_steps = 2
  config.batch_size = 8
  config.eval_batch_size = 8
  config.checkpoint_every_steps = 2
  workdir = str(tmp_path / "exp")
  train_lib.train(config, workdir)

  tools_dir = os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
  sys.path.insert(0, tools_dir)
  try:
    import export_serving
    monkeypatch.setattr(sys, "argv", [
        "export_serving.py", "--workdir", workdir,
        "--config_module", "coco_xmc:test", "--weights", "both",
        "--batch_size", "2",
    ])
    export_serving.main()
  finally:
    sys.path.remove(tools_dir)

  out_dir = os.path.join(workdir, "serving")
  arts = sorted(os.listdir(out_dir))
  assert [a for a in arts if a.endswith(".stablehlo")] == [
      "generator_ema_step00000002.stablehlo",
      "generator_normal_step00000002.stablehlo",
  ]
  with open(os.path.join(out_dir,
                         "generator_ema_step00000002.stablehlo"), "rb") as f:
    restored = serving.load_exported(f.read())
  meta = json.load(open(os.path.join(
      out_dir, "generator_ema_step00000002.json")))
  assert meta["step"] == 2 and meta["weights"] == "ema"
  out = restored.call(*_inputs(config, 2))
  assert out.shape == (2, config.image_size, config.image_size, 3)
  assert bool(jnp.all(jnp.isfinite(out)))
