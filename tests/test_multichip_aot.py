"""Flagship-shape AOT partitioning audit on the 8-device virtual mesh.

The executed multi-chip dry run (`__graft_entry__.dryrun_multichip`)
uses the tiny test config; these tests lower and COMPILE the full train
step at the real flagship shapes (128px bf16 gf/df 96, and the 256px
paper config) over an 8-device mesh and assert on the partitioned HLO:

* the gradient all-reduce over the ``data`` axis exists,
* the contrastive word/sentence-loss all-gathers exist,
* no intermediate was silently replicated to a full-batch blow-up —
  specifically nothing ``[B_global, B_global, ...]``-leading and no
  single tensor anywhere near the ``[B, B, R, L]`` pipeline the
  reference materializes per replica (reference
  libml/attention_lib.py:130-191).

These fail if a future change de-shards the contrastive path (e.g. a
stray ``with_sharding_constraint`` or a reshape XLA can't propagate
through), without needing real multi-chip hardware.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xmcgan_image_generation_tpu.configs import coco_xmc, coco_xmc_256
from xmcgan_image_generation_tpu.data.pipeline import template_batch
from xmcgan_image_generation_tpu.engine.state import abstract_train_state
from xmcgan_image_generation_tpu.engine.step import train_step
from xmcgan_image_generation_tpu.parallel import MeshRules
from xmcgan_image_generation_tpu.parallel.introspect import (
    collective_counts,
    max_tensor_bytes,
    tensor_shapes,
)

N_DEV = 8


def _word_loss_blowup(text, config):
  """Returns the [B_global, B_global, ...] word-loss intermediates that a
  de-sharded contrastive path would materialize per device.

  Every tensor of that pipeline (sim/alpha [B,B,R,17], context
  [B,B,17,768], num/den [B,B,17]) has the region count or the word
  length as its third dim, so a tensor is only flagged when dim 2 is one
  of those.  This keeps out (a) conv activations whose H=W happen to
  equal B_global ([B_dev, 64, 64, C] transposed at 128px batch 64) and
  (b) small [B,B,k,768] fusion scratch with k < 17.
  """
  b_global = config.batch_size
  regions = config.cond_size ** 2  # the x_cond snapshot resolution
  return [
      (dtype, dims, nbytes)
      for dtype, dims, nbytes in tensor_shapes(text)
      if len(dims) >= 3 and dims[0] == b_global and dims[1] == b_global
      and dims[2] in (regions, 17)
  ]


def _flagship_config(which):
  if which == "128":
    config = coco_xmc.get_config()
    config.batch_size = 64  # 8 per chip on the 8-device mesh.
  else:
    config = coco_xmc_256.get_config()
    config.batch_size = 16  # the measured single-chip 256px batch.
  # The Pallas kernels don't lower on the CPU AOT backend; the XLA
  # formulation is the GSPMD path whose sharding these tests audit (the
  # sharded Pallas dispatch is covered functionally in test_engine).
  config.use_pallas = False
  # The frozen tower's random init is irrelevant to partitioning and
  # would embed ~100 MB of constants into the lowering.
  config.pretrained_image_contrastive = False
  return config


def _lowered_step(config):
  rules = MeshRules.create(data=N_DEV, model=1,
                           devices=jax.devices()[:N_DEV])
  super_n = config.batch_size * config.d_step_per_g_step
  host_batch = template_batch(config, super_n)
  batch = {
      k: jax.ShapeDtypeStruct(v.shape, v.dtype, sharding=rules.batch)
      for k, v in host_batch.items()
  }
  init_batch = {
      k: jax.ShapeDtypeStruct((config.batch_size,) + v.shape[1:], v.dtype)
      for k, v in host_batch.items()
  }
  _, _, state = abstract_train_state(config, init_batch)
  state = jax.tree_util.tree_map(
      lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                     sharding=rules.replicated),
      state)
  # generator/discriminator must be the real modules: rebuild them the
  # same way abstract_train_state did.
  from xmcgan_image_generation_tpu.models import get_architecture

  dtype = jnp.bfloat16 if config.dtype == "bfloat16" else jnp.float32
  generator, discriminator = get_architecture(config, dtype)
  step_fn = jax.jit(
      functools.partial(train_step, generator=generator,
                        discriminator=discriminator, config=config,
                        additional_data={}),
      donate_argnums=(1,))
  rng = jax.ShapeDtypeStruct((2,), jnp.uint32)
  return step_fn.lower(rng, state, batch)


def _compiled_step_text(config):
  compiled = _lowered_step(config).compile()
  return compiled.as_text(), config


@pytest.fixture(scope="module")
def flagship_128():
  return _compiled_step_text(_flagship_config("128"))


@pytest.fixture(scope="module")
def flagship_256():
  return _compiled_step_text(_flagship_config("256"))


@pytest.fixture(scope="module")
def flagship_128_scale_fused():
  config = _flagship_config("128")
  config.scale_fused_convs = True
  return _compiled_step_text(config)


@pytest.mark.slow
class TestFlagshipAOT:

  def test_128_collectives(self, flagship_128):
    text, _ = flagship_128
    counts = collective_counts(text)
    print("128px collectives:", counts)
    # Gradient sync + EMA etc. ride all-reduce; the contrastive losses
    # gather negatives across the data axis.
    assert counts.get("all-reduce", 0) >= 1
    assert counts.get("all-gather", 0) >= 1

  def test_128_no_full_batch_replication(self, flagship_128):
    text, config = flagship_128
    # The word-loss pipeline must never materialize a per-device
    # [B_global, B_global, R, L]-scale tensor (f32[64,64,256,17] is 71 MB
    # per device and grows as B^2; the reference materializes it on every
    # replica, libml/attention_lib.py:130-191).
    blowups = _word_loss_blowup(text, config)
    assert not blowups, [
        f"{d}{list(dims)} ({n / 1e6:.0f} MB)" for d, dims, n in blowups]

  def test_128_word_loss_chain_is_sharded(self, flagship_128):
    text, config = flagship_128
    # Positive check that _constrain_caption_rows stayed wired: the sim /
    # alpha tensors appear with their caption axis sharded to B/n_dev.
    b, shard = config.batch_size, config.batch_size // N_DEV
    regions = config.cond_size ** 2
    shapes = {dims for _, dims, _ in tensor_shapes(text)}
    assert (shard, b, regions, 17) in shapes, (
        f"sharded word-loss sim [{shard},{b},{regions},17] not found — "
        "did the caption-axis sharding constraint get dropped?")

  def test_128_peak_tensor_sane(self, flagship_128):
    text, _ = flagship_128
    nbytes, desc = max_tensor_bytes(text)
    print(f"128px largest tensor: {desc} = {nbytes / 1e6:.0f} MB")
    # Largest legitimate per-device tensors are early conv activations
    # (~tens of MB at batch 16/device).  1 GB headroom catches the
    # multi-GB contrastive blow-up while tolerating fusion scratch.
    assert nbytes < 1024 * 1024 * 1024, f"{desc} = {nbytes / 1e6:.0f} MB"

  def test_128_scale_fused_partitioning(self, flagship_128_scale_fused):
    """The scale-fused convs (ops/scale_fuse.py) change every G/D conv
    shape; the partitioning invariants must survive the rewrite."""
    text, config = flagship_128_scale_fused
    counts = collective_counts(text)
    print("128px scale-fused collectives:", counts)
    assert counts.get("all-reduce", 0) >= 1
    assert counts.get("all-gather", 0) >= 1
    blowups = _word_loss_blowup(text, config)
    assert not blowups, [
        f"{d}{list(dims)} ({n / 1e6:.0f} MB)" for d, dims, n in blowups]
    nbytes, desc = max_tensor_bytes(text)
    print(f"128px scale-fused largest tensor: {desc} = {nbytes/1e6:.0f} MB")
    assert nbytes < 1024 * 1024 * 1024, f"{desc} = {nbytes / 1e6:.0f} MB"

  def test_256_collectives_and_sizes(self, flagship_256):
    text, config = flagship_256
    counts = collective_counts(text)
    print("256px collectives:", counts)
    assert counts.get("all-reduce", 0) >= 1
    assert counts.get("all-gather", 0) >= 1
    nbytes, desc = max_tensor_bytes(text)
    print(f"256px largest tensor: {desc} = {nbytes / 1e6:.0f} MB")
    assert nbytes < 1024 * 1024 * 1024, f"{desc} = {nbytes / 1e6:.0f} MB"
    blowups = _word_loss_blowup(text, config)
    assert not blowups, [
        f"{d}{list(dims)} ({n / 1e6:.0f} MB)" for d, dims, n in blowups]


@pytest.mark.slow
def test_scale_fused_flop_reduction_is_pinned():
  """Regression-pins the scale-fuse FLOP claim (BENCH_NOTES: -34% at
  128px): cost analysis of the lowered flagship step, fused vs naive.
  Lowering only — no compile — so this stays tracing-bound."""
  def step_flops(fused):
    config = _flagship_config("128")
    config.scale_fused_convs = fused
    return _lowered_step(config).cost_analysis()["flops"]

  naive = step_flops(False)
  fused = step_flops(True)
  assert naive > 1e12  # sanity: the flagship step is tens of TFLOPs
  assert fused <= 0.70 * naive, (
      f"scale-fused step lost its FLOP advantage: {fused:.3e} vs "
      f"naive {naive:.3e}")


class TestIntrospect:
  """Unit tests for the HLO census helpers (fast, no compile)."""

  def test_collective_counts(self):
    text = """
      %ar = f32[8,16]{1,0} all-reduce(%x), replica_groups={}
      %ag.1 = bf16[64,17,768]{2,1,0} all-gather(%y), dimensions={0}
      %ars = f32[8]{0} all-reduce-start(%z)
      %ard = f32[8]{0} all-reduce-done(%ars)
      %nope = f32[2]{0} add(%a, %b)
    """
    counts = collective_counts(text)
    assert counts == {"all-reduce": 2, "all-gather": 1}

  def test_max_tensor_bytes(self):
    text = "%a = bf16[64,64,256,17]{3,2,1,0} broadcast(%x)\n" \
           "%b = f32[8,16]{1,0} add(%c, %d)"
    nbytes, desc = max_tensor_bytes(text)
    assert nbytes == 64 * 64 * 256 * 17 * 2
    assert desc == "bf16[64,64,256,17]"

  def test_tensor_shapes_dedup(self):
    text = "%a = f32[4,4]{1,0} add(%b) %c = f32[4,4]{1,0} add(%d)"
    shapes = tensor_shapes(text)
    assert shapes == [("f32", (4, 4), 64)]
