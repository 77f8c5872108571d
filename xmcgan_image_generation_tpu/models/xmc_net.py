"""XMC-Net: text-conditional BigGAN-style generator + projection discriminator.

Capability parity with reference xmcgan/nets/xmc_net.py:28-248 — identical
channel schedules, block topology, word-region attention placement, and
in-graph contrastive heads — written TPU-first:

* NHWC layout, bf16 compute / f32 params, all shapes static under jit.
* BatchNorm statistics are computed over the *global* (mesh-wide) batch:
  under GSPMD the batch reduction crosses the ``data`` axis automatically,
  which is the cross-replica BN the reference only offers as the opt-in
  ``batch_norm_group_size`` mode (reference nets/xmc_net.py:192-201).
* The contrastive heads return raw features alongside the losses so the
  engine can optionally fuse them with Pallas kernels.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax.linen as nn
from jax.nn.initializers import glorot_normal
import jax.numpy as jnp
import ml_collections

from xmcgan_image_generation_tpu.ops import attention as attn_ops
from xmcgan_image_generation_tpu.ops import contrastive as contrastive_ops
from xmcgan_image_generation_tpu.ops import mxu_conv
from xmcgan_image_generation_tpu.ops import scale_fuse
from xmcgan_image_generation_tpu.ops import normalization
from xmcgan_image_generation_tpu.ops.normalization import (
    LocalConditionalBatchNorm,
)
from xmcgan_image_generation_tpu.ops.pooling import upsample
from xmcgan_image_generation_tpu.ops.spectral_norm import (
    SpectralConv,
    SpectralDense,
)
from xmcgan_image_generation_tpu.models import blocks

Array = jnp.ndarray

# Channel-multiplier schedules per output resolution.  128/256 match the
# reference exactly (reference nets/xmc_net.py:81-93, 202-205); 32/64 are
# extensions of the same pattern for fast smoke tests and small datasets.
_GEN_CHANNELS = {
    32: [16, 8, 4],
    64: [16, 8, 4, 2],
    128: [16, 8, 4, 2, 1],
    256: [16, 8, 8, 4, 2, 1],
}
_DISC_CHANNELS = {
    32: [2, 4, 8],
    64: [2, 4, 8, 16],
    128: [2, 4, 8, 16, 16],
    256: [2, 4, 8, 8, 16, 16],
}
_DISC_DOWNSAMPLE = {
    32: [False, True, False],
    64: [True, True, True, False],
    128: [True, True, True, True, False],
    256: [True, True, True, True, True, False],
}


def _matmul_saveable(prim, *_, **__) -> bool:
  """Remat policy: save conv/matmul outputs, recompute elementwise chains.

  Saving exactly the MXU-op outputs means the backward never re-runs a
  convolution or contraction; only the cheap VPU glue between them (BN
  normalization, relu, conditional modulation) is recomputed.  That cuts
  the residuals JAX stores for the backward — HBM *bandwidth*, not just
  capacity — which is the measured wall of the fused 128px step
  (BENCH_NOTES.md: 80.5% HBM, 46% MXU).
  """
  return prim.name in ("conv_general_dilated", "dot_general")


def _maybe_remat(config: ml_collections.ConfigDict, block_cls,
                 resolution: int = 0):
  """Optionally rematerialize residual blocks (``config.remat``).

  Trades recompute FLOPs for activation memory — the standard lever for
  256px+ configs and long d_step unrolls on small-HBM parts.

  ``resolution`` is the block's largest feature-map side; with
  ``config.remat_min_resolution > 0`` only blocks at or above that scale
  are rematerialized (selective remat: the large-scale activations
  dominate HBM, the small-scale ones are cheap to keep).

  ``config.remat_policy`` selects what is saved at block boundaries:
  "full" (save nothing — classic remat) or "conv" (save conv/matmul
  outputs, recompute only elementwise glue — a bandwidth lever rather
  than a capacity one).
  """
  policy = config.get("remat_policy", "full")
  if policy not in ("full", "conv"):
    # Validate unconditionally: a typo'd policy must fail even when this
    # particular block ends up not rematted (remat off / below min_res).
    raise ValueError(f"Unknown remat_policy: {policy!r}")
  if not config.get("remat", False):
    return block_cls
  min_res = config.get("remat_min_resolution", 0)
  if min_res and resolution and resolution < min_res:
    return block_cls
  if policy == "conv":
    return nn.remat(block_cls, policy=_matmul_saveable)
  return nn.remat(block_cls)


def _layer_factories(spectral_norm: bool, train: bool, dtype: Any,
                     conv_backward: str = "xla", up_method: str = "phase"):
  """Returns (conv_fn, dense_fn) factories, spectrally normalized or plain.

  ``conv_backward`` selects the conv gradient algorithm (ops/mxu_conv.py);
  ``up_method`` the scale-fused upsample-conv formulation
  (ops/scale_fuse.py).  Neither changes the forward semantics or the
  param tree, so checkpoint and reference-parity surfaces are unaffected.
  """
  if spectral_norm:
    conv_fn = functools.partial(
        SpectralConv, train=train, dtype=dtype,
        conv_backward=conv_backward, up_method=up_method,
        kernel_init=glorot_normal())
    dense_fn = functools.partial(
        SpectralDense, train=train, dtype=dtype, kernel_init=glorot_normal())
  else:
    def conv_fn(features, *, scale_op="none", **kw):
      # Hooks keep the scope name (Conv_N) and param tree identical to
      # plain nn.Conv — only the conv's computation/VJP rule changes.
      if scale_op != "none":
        kw["conv_general_dilated"] = scale_fuse.make_fused_conv_hook(
            scale_op, up_method)
      elif conv_backward != "xla":
        kw["conv_general_dilated"] = mxu_conv.make_conv_general_dilated(
            conv_backward)
      return nn.Conv(features, dtype=dtype, kernel_init=glorot_normal(),
                     **kw)

    dense_fn = functools.partial(
        nn.Dense, dtype=dtype, kernel_init=glorot_normal())
  return conv_fn, dense_fn


def _make_norm_fn(config: ml_collections.ConfigDict, train: bool,
                  dtype: Any):
  """BatchNorm factory: global-batch stats by default, grouped when
  ``batch_norm_group_size > 0`` (reference nets/xmc_net.py:192-201)."""
  group_size = config.batch_norm_group_size
  if group_size and group_size > 0:
    return functools.partial(
        normalization.GroupedBatchNorm,
        group_size=group_size,
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype)
  return functools.partial(
      nn.BatchNorm,
      use_running_average=not train,
      momentum=0.9,
      epsilon=1e-5,
      dtype=dtype)


class Generator(nn.Module):
  """Text-conditional generator.

  Call signature: ``generator.apply(vars, (cond_dict, z))`` where
  ``cond_dict`` carries ``sentence_embedding [B, 768]``,
  ``embedding [B, L, 768]`` (per-word BERT features) and ``max_len [B, 1]``.
  Returns images in ``[0, 1]`` of shape ``[B, image_size, image_size, 3]``.

  Architecture (reference nets/xmc_net.py:145-248): 4x4 seed from z, two
  globally-conditioned GenBlocks to 16x16, word-region attention producing
  a spatial conditioning map, then spatially-conditioned GenSpatialBlocks
  up to the output resolution.
  """

  config: ml_collections.ConfigDict
  train: bool
  dtype: Any = jnp.float32
  activation_fn: Any = nn.relu

  @nn.compact
  def __call__(self, inputs: Tuple[Dict[str, Array], Array]) -> Array:
    config = self.config
    cond_dict, z = inputs
    sentence = cond_dict["sentence_embedding"]
    word_feat = cond_dict["embedding"]
    max_len = cond_dict["max_len"]
    embedding_dim = word_feat.shape[-1]
    total_len = word_feat.shape[1]
    batch_size = z.shape[0]
    gf_dim = config.gf_dim

    conv_fn, dense_fn = _layer_factories(
        config.g_spectral_norm, self.train, self.dtype,
        conv_backward=config.get("conv_backward", "xla"),
        up_method=config.get("upconv_method", "phase"))
    norm_fn = _make_norm_fn(config, self.train, self.dtype)
    channels = _GEN_CHANNELS[config.image_size]
    block_args = dict(
        dense_fn=dense_fn,
        conv_fn=conv_fn,
        activation_fn=self.activation_fn,
        norm_fn=norm_fn,
        dtype=self.dtype,
        scale_fuse=config.get("scale_fused_convs", False))

    # Global conditioning: projected sentence embedding concat noise
    # (reference nets/xmc_net.py:213-214).
    z = z.astype(self.dtype)
    z_dim = z.shape[-1]
    global_cond = dense_fn(z_dim)(sentence.astype(self.dtype))
    global_cond = jnp.concatenate([global_cond, z], axis=-1)

    # 4x4 seed map from the noise alone (reference nets/xmc_net.py:215-216).
    x = dense_fn(gf_dim * 16 * 4 * 4)(z)
    x = x.reshape(-1, 4, 4, gf_dim * 16)

    # Two globally-conditioned blocks: 4x4 -> 16x16.  Explicit names keep
    # the param tree identical whether or not a block is rematerialized
    # (nn.remat would otherwise rename the scope to Checkpoint<Class>_N,
    # breaking checkpoint compatibility across remat settings).
    for i in range(2):
      x = _maybe_remat(config, blocks.GenBlock, 4 * 2 ** (i + 1))(
          gf_dim * channels[i], name=f"GenBlock_{i}",
          **block_args)(x, global_cond)

    # Word-region attention at 16x16 (reference nets/xmc_net.py:220-231).
    region = conv_fn(embedding_dim, kernel_size=(1, 1))(x)
    spatial_size = region.shape[1]
    num_regions = spatial_size * spatial_size
    region = region.reshape(batch_size, num_regions, embedding_dim)
    mask = attn_ops.padding_mask(max_len, total_len)
    region_context, _ = attn_ops.attention_for_g(
        region, word_feat, config.gamma_for_g, mask)
    region_context = region_context.reshape(
        batch_size, spatial_size, spatial_size, embedding_dim)

    # The fused modulation is only an exact identity when the 1x1 modulation
    # kernels are NOT spectrally normalized: splitting the concat kernel in
    # two would spectral-normalize the halves independently, which differs
    # from the reference's jointly-normalized concat kernel.  With
    # g_spectral_norm (non-default) we fall back to the reference layout.
    use_fused = (config.get("fused_spatial_cond", True)
                 and not config.g_spectral_norm)
    if use_fused:
      # Native-resolution modulation: exactly the reference's function
      # (see FusedSpatialModulation) with the conditioning kept at 16x16
      # and the global vector separate — no progressively-upsampled
      # spatial_cond tensors, no full-resolution 1x1 modulation convs.
      region_context = region_context.astype(self.dtype)
      factor = 1
      for i in range(2, len(channels)):
        x = _maybe_remat(config, blocks.GenSpatialBlockFused,
                         4 * 2 ** (i + 1))(
            gf_dim * channels[i], factor=factor,
            name=f"GenSpatialBlockFused_{i - 2}", **block_args)(
            x, region_context, global_cond)
        factor *= 2
      x = normalization.FusedSpatialModulation(
          norm_fn=norm_fn, conv_fn=conv_fn, dense_fn=dense_fn,
          factor=factor)(x, region_context, global_cond)
    else:
      # Reference-layout pipeline (nets/xmc_net.py:233-241): materialized
      # concat conditioning, upsampled per block.
      tiled_global = jnp.broadcast_to(
          global_cond[:, None, None, :],
          (batch_size, spatial_size, spatial_size, global_cond.shape[-1]))
      spatial_cond = jnp.concatenate(
          [region_context.astype(self.dtype), tiled_global], axis=-1)
      for i in range(2, len(channels)):
        spatial_cond_up = upsample(spatial_cond)
        x = _maybe_remat(config, blocks.GenSpatialBlock, 4 * 2 ** (i + 1))(
            gf_dim * channels[i], name=f"GenSpatialBlock_{i - 2}",
            **block_args)(
            x, spatial_cond, spatial_cond_up)
        spatial_cond = spatial_cond_up
      x = LocalConditionalBatchNorm(
          norm_fn=norm_fn, conv_fn=conv_fn)(x, spatial_cond)

    # Output head (reference nets/xmc_net.py:242-247).
    x = self.activation_fn(x)
    x = conv_fn(3, kernel_size=(3, 3))(x)
    x = jnp.tanh(x)
    return (x + 1.0) / 2.0


class Discriminator(nn.Module):
  """Projection discriminator with in-graph cross-modal contrastive heads.

  Call signature: ``discriminator.apply(vars, (images, cond_dict))`` where
  ``images`` is ``concat([real, fake])`` along the batch axis (real first —
  reference nets/xmc_net.py:106-107).  Returns ``(logit, statistic_dict)``
  with the 15 contrastive statistics the reference emits
  (reference nets/xmc_net.py:126-142).
  """

  config: ml_collections.ConfigDict
  train: bool
  dtype: Any = jnp.float32
  activation_fn: Any = nn.relu

  @nn.compact
  def __call__(self, inputs: Tuple[Array, Dict[str, Array]]):
    config = self.config
    x, cond_dict = inputs
    sentence = cond_dict["sentence_embedding"]
    word_feat = cond_dict["embedding"]
    max_len = cond_dict["max_len"]
    df_dim = config.df_dim
    cond_size = config.cond_size

    conv_fn, dense_fn = _layer_factories(
        config.d_spectral_norm, self.train, self.dtype,
        conv_backward=config.get("conv_backward", "xla"))
    channels = _DISC_CHANNELS[config.image_size]
    downsamples = _DISC_DOWNSAMPLE[config.image_size]
    block_args = dict(
        activation_fn=self.activation_fn, conv_fn=conv_fn, dtype=self.dtype,
        scale_fuse=config.get("scale_fused_convs", False))

    x = x.astype(self.dtype)
    # Explicit names: remat must not change the param tree (see Generator).
    x = _maybe_remat(config, blocks.DiscOptimizedBlock, config.image_size)(
        df_dim, name="DiscOptimizedBlock_0", **block_args)(x)
    x_cond = None
    resolution = config.image_size // 2
    for i, (c_ratio, downsample) in enumerate(zip(channels, downsamples)):
      x = _maybe_remat(config, blocks.DiscBlock, resolution)(
          df_dim * c_ratio, downsample=downsample, name=f"DiscBlock_{i}",
          **block_args)(x)
      if downsample:
        resolution //= 2
      if x.shape[1] == cond_size:
        # Snapshot the 16x16 feature map for the word-region loss
        # (reference nets/xmc_net.py:94-95).
        x_cond = x

    x = self.activation_fn(x)
    x_pool = jnp.sum(x, axis=(1, 2))

    # Projection-discriminator logit (reference nets/xmc_net.py:97-104).
    out = dense_fn(1)(x_pool)
    sent_cond = dense_fn(
        df_dim * channels[-1], use_bias=True)(sentence.astype(self.dtype))
    tile_num = x_pool.shape[0] // sent_cond.shape[0]
    out = out + jnp.sum(
        x_pool * jnp.tile(sent_cond, (tile_num, 1)), axis=1, keepdims=True)

    stats = {}
    zero = jnp.zeros((), jnp.float32)
    for side in ("real", "fake"):
      for head in ("word", "sentence"):
        for metric in ("loss", "acc", "entropy"):
          stats[f"{side}_{head}_{metric}"] = zero
    for metric in ("loss", "acc", "entropy"):
      stats[f"image_contrastive_{metric}"] = zero

    use_pallas = bool(config.get("use_pallas", False))
    # Negative-pool scope: -1 = global batch (the paper's behavior, free
    # under GSPMD); >0 = contiguous groups of that many examples (the
    # per-device local pools the reference's pmap induced).
    group = int(config.get("contrastive_group_size", -1))
    real_pool, fake_pool = jnp.split(x_pool, 2)
    if config.sentence_contrastive:
      (stats["fake_sentence_loss"], stats["fake_sentence_acc"],
       stats["fake_sentence_entropy"]) = contrastive_ops.nt_xent(
           fake_pool, sent_cond, use_pallas=use_pallas, group_size=group)
      (stats["real_sentence_loss"], stats["real_sentence_acc"],
       stats["real_sentence_entropy"]) = contrastive_ops.nt_xent(
           real_pool, sent_cond, use_pallas=use_pallas, group_size=group)
    if config.word_contrastive:
      embedding_dim = word_feat.shape[-1]
      region = conv_fn(embedding_dim, kernel_size=(1, 1))(x_cond)
      num_regions = cond_size * cond_size
      region = region.reshape(-1, num_regions, embedding_dim)
      real_region, fake_region = jnp.split(region, 2)
      (stats["fake_word_loss"], stats["fake_word_acc"],
       stats["fake_word_entropy"]) = attn_ops.word_loss(
           fake_region, word_feat, max_len, use_pallas=use_pallas,
           group_size=group)
      (stats["real_word_loss"], stats["real_word_acc"],
       stats["real_word_entropy"]) = attn_ops.word_loss(
           real_region, word_feat, max_len, use_pallas=use_pallas,
           group_size=group)
    if config.image_contrastive:
      (stats["image_contrastive_loss"], stats["image_contrastive_acc"],
       stats["image_contrastive_entropy"]) = contrastive_ops.nt_xent(
           fake_pool, real_pool, use_pallas=use_pallas, group_size=group)
    return out, stats
