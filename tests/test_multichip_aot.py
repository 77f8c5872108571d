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

import pytest

from xmcgan_image_generation_tpu.parallel.audit import (
    flagship_config,
    lowered_step,
    word_loss_blowup,
)
from xmcgan_image_generation_tpu.parallel.introspect import (
    collective_bytes,
    collective_counts,
    max_tensor_bytes,
    tensor_shapes,
)

N_DEV = 8

# The audit logic lives in parallel/audit.py so the driver-visible dry run
# (__graft_entry__.dryrun_multichip) records the same census every round.
_word_loss_blowup = word_loss_blowup


def _flagship_config(which):
  return flagship_config(which, n_devices=N_DEV)


def _lowered_step(config):
  return lowered_step(config, n_devices=N_DEV)


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

  def test_collective_bytes(self):
    text = """
      %ar = f32[8,16]{1,0} all-reduce(%x), replica_groups={}
      %ag.1 = bf16[64,17,768]{2,1,0} all-gather(%y), dimensions={0}
      %ars = (f32[8]{0}, f32[4]{0}) all-reduce-start(%z, %w)
      %ard = (f32[8]{0}, f32[4]{0}) all-reduce-done(%ars)
      %nope = f32[2]{0} add(%a, %b)
    """
    nbytes = collective_bytes(text)
    # all-reduce: plain 8*16*4 + tuple start (8+4)*4; -done skipped.
    assert nbytes == {
        "all-reduce": 8 * 16 * 4 + (8 + 4) * 4,
        "all-gather": 64 * 17 * 768 * 2,
    }

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
