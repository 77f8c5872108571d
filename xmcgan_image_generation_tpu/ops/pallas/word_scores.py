"""Fused AttnGAN word-region score-matrix kernel.

Computes the ``[captions, images]`` matching-score matrix at the heart of
`ops.attention.word_loss` in one Pallas kernel.  The XLA formulation
materializes ``[B, B, R, L]`` attention tensors and a ``[B, B, L, D]``
context tensor in HBM (~0.5 GB of traffic per call at the 128px config);
here each grid cell (one image i) keeps everything in VMEM:

  T = rn_i @ wn_all^T            one [R, D] x [D, B*L] MXU matmul
  alpha = softmax_R(gamma1 * T)  masked per caption
  context = alpha^T rn_i         [B, L, D]
  rowsim = cos(wn, context)      [B, L]
  s[:, i] = logsumexp_L(gamma2 * rowsim + mask) / gamma2

The backward pass is a second Pallas kernel (`_scores_bwd_kernel`) with an
analytic VJP: per grid cell it recomputes the forward intermediates for one
(image, caption-chunk) pair in VMEM — the flash-attention recompute pattern
— and applies the derived gradient chain (logsumexp -> softmax weights;
cosine -> radial projection; region-softmax VJP; similarity matmuls),
accumulating ``d_rn`` across caption chunks and ``d_wn`` across images in
grid-resident output blocks.  Nothing [B, B, R, L]-shaped ever touches HBM
in either direction.

Used when ``config.use_pallas`` is set.  Under a multi-device mesh,
`ops.attention.word_loss` dispatches through `make_sharded_word_scores`
(shard_map over the ambient mesh, one image shard per device) instead of
the replicated single-chip path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from xmcgan_image_generation_tpu.ops.contrastive import l2_normalize

NEG_INF = -1e9


def _scores_kernel(rn_ref, wn_flat_ref, mask_row_ref, group_ref, out_ref,
                   *, gamma1, gamma2):
  """One image (grid cell i) against all captions.

  The caption x word axes stay fused as one lane dimension (Mosaic cannot
  split a lane axis), so the per-caption logsumexp is computed as a
  group-indicator matmul over ``exp(row)`` — safe without a running max
  because ``|gamma2 * cosine| <= gamma2`` and masked entries are exactly
  zeroed by ``exp(-1e9)``.
  """
  rn = rn_ref[0]                 # [R, D]
  wn_flat = wn_flat_ref[:]       # [B*L, D]
  mask_row = mask_row_ref[:]     # [1, B*L] (1.0 at padding)
  group = group_ref[:]           # [B*L, B] caption-membership indicator

  # [R, B*L] similarity in one MXU matmul.
  sim = jax.lax.dot_general(
      rn, wn_flat,
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)
  logits = sim * gamma1 + mask_row * NEG_INF
  # Attention over regions (sublane axis) per (caption, word) column.
  logits = logits - jnp.max(logits, axis=0, keepdims=True)
  alpha = jnp.exp(logits)
  alpha = alpha / jnp.sum(alpha, axis=0, keepdims=True)

  # Per-word context from the normalized regions: [B*L, D].
  context = jax.lax.dot_general(
      alpha, rn,
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  # Cosine vs the (unit-norm) words.
  num = jnp.sum(context * wn_flat, axis=-1, keepdims=True)    # [B*L, 1]
  ctx_sq = jnp.sum(context * context, axis=-1, keepdims=True)
  rowsim = num * jax.lax.rsqrt(jnp.maximum(ctx_sq, 1e-12))

  row = rowsim * gamma2 + mask_row.T * NEG_INF
  # Segmented logsumexp via the indicator matmul: [B, 1].
  seg = jax.lax.dot_general(
      group, jnp.exp(row),
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)
  lse = jnp.log(seg)
  i = pl.program_id(0)
  # Row i of the [image, caption] score matrix; the output block is the
  # whole matrix, resident in VMEM across the (sequential) grid.
  out_ref[pl.ds(i, 1), :] = (lse / gamma2).T


def _scores_pallas(rn, wn, mask, gamma1, gamma2, interpret=False):
  """Returns the [image, caption] score matrix s_ij.

  Image count (``rn.shape[0]``) and caption count (``wn.shape[0]``) may
  differ — under sharded dispatch each device holds an image shard but
  all captions.
  """
  num_images, regions, dim = rn.shape
  num_caps, total_len, _ = wn.shape
  flat = num_caps * total_len
  wn_flat = wn.reshape(flat, dim)
  mask_row = mask.reshape(1, flat)
  # group[c*L + w, c'] = 1 iff c == c'.
  group = jnp.repeat(jnp.eye(num_caps, dtype=jnp.float32), total_len,
                     axis=0)
  kernel = functools.partial(
      _scores_kernel, gamma1=float(gamma1), gamma2=float(gamma2))
  return pl.pallas_call(
      kernel,
      grid=(num_images,),
      in_specs=[
          pl.BlockSpec((1, regions, dim), lambda i: (i, 0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((flat, dim), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((1, flat), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((flat, num_caps), lambda i: (0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((num_images, num_caps), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((num_images, num_caps), jnp.float32),
      interpret=interpret,
  )(rn, wn_flat, mask_row, group)


def _bwd_cell_chain(rn, wnc, mrow, group, gvec, gamma1, gamma2):
  """The shared analytic-VJP chain for one (image, caption-chunk) cell.

  Recomputes the forward intermediates in VMEM (flash-attention-style),
  then applies the derived gradient chain.  With
  ``s = logsumexp_w(row)/gamma2`` and cotangent ``g[c, i]``:

    d_rowsim = g * softmax_w(row)                       (logsumexp VJP)
    d_ctx    = d_rowsim*inv*wn - 1[csq>=eps]*d_rowsim*rowsim*inv^2*ctx
    d_sim    = gamma1 * alpha*(d_alpha - sum_R alpha*d_alpha),
               d_alpha = rn d_ctx^T                      (softmax VJP)

  Returns ``(alpha, ctx, inv, d_rowsim, d_ctx, d_sim)`` from which
  ``d_rn = alpha d_ctx + d_sim wn`` and
  ``d_wn = d_rowsim*inv*ctx + d_sim^T rn`` follow.
  """
  sim = jax.lax.dot_general(
      rn, wnc, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)                 # [R, CL]
  logits = sim * gamma1 + mrow * NEG_INF
  logits = logits - jnp.max(logits, axis=0, keepdims=True)
  e = jnp.exp(logits)
  alpha = e / jnp.sum(e, axis=0, keepdims=True)           # [R, CL]
  ctx = jax.lax.dot_general(
      alpha, rn, dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)                 # [CL, D]
  num = jnp.sum(ctx * wnc, axis=-1, keepdims=True)        # [CL, 1]
  csq = jnp.sum(ctx * ctx, axis=-1, keepdims=True)
  inv = jax.lax.rsqrt(jnp.maximum(csq, 1e-12))
  rowsim = num * inv
  row = rowsim * gamma2 + mrow.T * NEG_INF                # [CL, 1]
  er = jnp.exp(row)  # |gamma2*cos| <= gamma2: no running max needed
  seg = jax.lax.dot_general(
      group, er, dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)                 # [CB, 1]
  den = jax.lax.dot_general(
      group, seg, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)                 # [CL, 1]
  beta = er / den                                         # softmax_w(row)
  gw = jax.lax.dot_general(
      group, gvec, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)                 # [CL, 1]
  d_rowsim = gw * beta
  guard = (csq >= 1e-12).astype(jnp.float32)
  d_ctx = ((d_rowsim * inv) * wnc
           - (guard * d_rowsim * rowsim * inv * inv) * ctx)
  d_alpha = jax.lax.dot_general(
      rn, d_ctx, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32)                 # [R, CL]
  t = alpha * d_alpha
  d_sim = gamma1 * (t - alpha * jnp.sum(t, axis=0, keepdims=True))
  return alpha, ctx, inv, d_rowsim, d_ctx, d_sim


def _bwd_drn_kernel(rn_ref, wnc_ref, mask_ref, group_ref, g_ref,
                    drn_ref, *, gamma1, gamma2):
  """d_rn for image ``i``: grid (images, caption_chunks), chunks innermost
  so the output block accumulates across consecutive grid steps."""
  jc = pl.program_id(1)
  rn = rn_ref[0]            # [R, D]
  wnc = wnc_ref[0]          # [CL, D]
  mrow = mask_ref[0]        # [1, CL]
  group = group_ref[:]      # [CL, CB]
  gvec = g_ref[0, 0].T      # [CB, 1]
  alpha, _, _, _, d_ctx, d_sim = _bwd_cell_chain(
      rn, wnc, mrow, group, gvec, gamma1, gamma2)
  d_rn = jax.lax.dot_general(
      alpha, d_ctx, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)                 # [R, D]
  d_rn = d_rn + jax.lax.dot_general(
      d_sim, wnc, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  @pl.when(jc == 0)
  def _():
    drn_ref[0] = jnp.zeros_like(drn_ref[0])

  drn_ref[0] = drn_ref[0] + d_rn


def _bwd_dwn_kernel(rn_ref, wnc_ref, mask_ref, group_ref, g_ref,
                    dwn_ref, *, gamma1, gamma2):
  """d_wn for caption chunk ``jc``: grid (caption_chunks, images), images
  innermost so the output block accumulates across consecutive steps."""
  i = pl.program_id(1)
  rn = rn_ref[0]
  wnc = wnc_ref[0]
  mrow = mask_ref[0]
  group = group_ref[:]
  gvec = g_ref[0, 0].T
  _, ctx, inv, d_rowsim, _, d_sim = _bwd_cell_chain(
      rn, wnc, mrow, group, gvec, gamma1, gamma2)
  d_wn = (d_rowsim * inv) * ctx                           # [CL, D]
  d_wn = d_wn + jax.lax.dot_general(
      d_sim, rn, dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)

  @pl.when(i == 0)
  def _():
    dwn_ref[0] = jnp.zeros_like(dwn_ref[0])

  dwn_ref[0] = dwn_ref[0] + d_wn


def _caption_chunk(num_caps: int, cap: int = 16) -> int:
  """Largest divisor of ``num_caps`` that is <= cap (VMEM sizing)."""
  for c in range(min(cap, num_caps), 0, -1):
    if num_caps % c == 0:
      return c
  return 1


def _scores_bwd_pallas(rn, wn, mask, g, gamma1, gamma2, interpret=False,
                       chunk_cap=16):
  """Analytic (d_rn, d_wn) for `_scores_pallas`.

  ``rn``: [B_img, R, D]; ``wn``: [B_cap, L, D]; ``mask``: [B_cap, L];
  ``g``: [B_cap, B_img] cotangent of the [caption, image] score matrix.

  Two kernels, one per accumulation direction, so each output block is
  revisited on *consecutive* grid steps (the Pallas requirement for
  read-modify-write accumulation): d_rn reduces over caption chunks
  (chunks innermost), d_wn over images (images innermost).  All inputs
  are chunk-leading — every block dimension equals its array dimension,
  so Mosaic's (8, 128) block-divisibility rules are satisfied for ANY
  chunk size (a flat [B*L, D] layout would need B*L*... alignment that
  L=17 can never provide).  The shared chain is recomputed per kernel:
  ~1.8x the single-pass backward FLOPs, all VMEM-resident — still far
  cheaper than the [B, B, R, L] HBM traffic it replaces.
  """
  num_images, regions, dim = rn.shape
  num_caps, total_len, _ = wn.shape
  cb = _caption_chunk(num_caps, chunk_cap)
  cl = cb * total_len
  n_chunks = num_caps // cb
  wn_c = wn.reshape(n_chunks, cl, dim)
  mask_c = mask.reshape(n_chunks, 1, cl)
  # Chunk-local caption indicator (identical for every chunk).
  group = jnp.repeat(jnp.eye(cb, dtype=jnp.float32), total_len, axis=0)
  # g4[i, jc, 0, c] = g[jc*cb + c, i]: per-cell cotangent rows, leading
  # grid axes so the kernel block is exactly the trailing (1, cb) plane.
  g4 = jnp.transpose(g, (1, 0)).reshape(num_images, n_chunks, 1, cb)

  common = dict(gamma1=float(gamma1), gamma2=float(gamma2))
  rn_spec = lambda im: pl.BlockSpec((1, regions, dim), im,
                                    memory_space=pltpu.VMEM)
  wn_spec = lambda im: pl.BlockSpec((1, cl, dim), im,
                                    memory_space=pltpu.VMEM)
  mask_spec = lambda im: pl.BlockSpec((1, 1, cl), im,
                                      memory_space=pltpu.VMEM)
  group_spec = lambda im: pl.BlockSpec((cl, cb), im,
                                       memory_space=pltpu.VMEM)
  g_spec = lambda im: pl.BlockSpec((1, 1, 1, cb), im,
                                   memory_space=pltpu.VMEM)

  d_rn = pl.pallas_call(
      functools.partial(_bwd_drn_kernel, **common),
      grid=(num_images, n_chunks),
      in_specs=[
          rn_spec(lambda i, jc: (i, 0, 0)),
          wn_spec(lambda i, jc: (jc, 0, 0)),
          mask_spec(lambda i, jc: (jc, 0, 0)),
          group_spec(lambda i, jc: (0, 0)),
          g_spec(lambda i, jc: (i, jc, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, regions, dim), lambda i, jc: (i, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((num_images, regions, dim),
                                     jnp.float32),
      interpret=interpret,
  )(rn, wn_c, mask_c, group, g4)

  d_wn_c = pl.pallas_call(
      functools.partial(_bwd_dwn_kernel, **common),
      grid=(n_chunks, num_images),
      in_specs=[
          rn_spec(lambda jc, i: (i, 0, 0)),
          wn_spec(lambda jc, i: (jc, 0, 0)),
          mask_spec(lambda jc, i: (jc, 0, 0)),
          group_spec(lambda jc, i: (0, 0)),
          g_spec(lambda jc, i: (i, jc, 0, 0)),
      ],
      out_specs=pl.BlockSpec((1, cl, dim), lambda jc, i: (jc, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((n_chunks, cl, dim), jnp.float32),
      interpret=interpret,
  )(rn, wn_c, mask_c, group, g4)
  return d_rn, d_wn_c.reshape(num_caps, total_len, dim)


def _scores_xla_chunked(rn, wn, mask, gamma1, gamma2, chunk=8):
  """j-chunked XLA reference (bounded memory); used for the backward."""

  def per_caption_block(args):
    wn_j, mask_j = args  # [C, L, D], [C, L]
    sim = jnp.einsum("ird,cwd->cirw", rn, wn_j,
                     preferred_element_type=jnp.float32)
    logits = sim * gamma1 + mask_j[:, None, None, :] * NEG_INF
    alpha = jax.nn.softmax(logits, axis=2)
    context = jnp.einsum("cirw,ird->ciwd", alpha, rn,
                         preferred_element_type=jnp.float32)
    num = jnp.einsum("ciwd,cwd->ciw", context, wn_j,
                     preferred_element_type=jnp.float32)
    ctx_sq = jnp.sum(jnp.square(context), axis=-1)
    rowsim = num * jax.lax.rsqrt(jnp.maximum(ctx_sq, 1e-12))
    row = rowsim * gamma2 + mask_j[:, None, :] * NEG_INF
    return jax.nn.logsumexp(row, axis=-1) / gamma2  # [C, B_images]

  batch = wn.shape[0]
  if batch % chunk:
    chunk = 1
  wn_blocks = wn.reshape(batch // chunk, chunk, *wn.shape[1:])
  mask_blocks = mask.reshape(batch // chunk, chunk, mask.shape[1])
  rows = jax.lax.map(per_caption_block, (wn_blocks, mask_blocks))
  return rows.reshape(batch, batch)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def word_scores(region_feat, word_feat, mask, gamma1=5.0, gamma2=5.0,
                interpret=None):
  """``[captions, images]`` match scores (before the gamma3 scale).

  ``region_feat``: [B, R, D]; ``word_feat``: [B, L, D]; ``mask``: [B, L]
  with 1.0 at padding words.  Normalization happens inside.
  """
  from xmcgan_image_generation_tpu.ops.pallas import default_interpret

  rn = l2_normalize(region_feat.astype(jnp.float32), axis=-1)
  wn = l2_normalize(word_feat.astype(jnp.float32), axis=-1)
  if interpret is None:
    interpret = default_interpret()
  # The kernel emits [image, caption]; the public contract is
  # [caption, image] (matching the XLA formulation).
  return _scores_pallas(rn, wn, mask.astype(jnp.float32), gamma1, gamma2,
                        interpret=interpret).T


def _word_scores_fwd(region_feat, word_feat, mask, gamma1, gamma2,
                     interpret):
  out = word_scores(region_feat, word_feat, mask, gamma1, gamma2, interpret)
  return out, (region_feat, word_feat, mask)


def _word_scores_bwd(gamma1, gamma2, interpret, residuals, g):
  region_feat, word_feat, mask = residuals
  from xmcgan_image_generation_tpu.ops.pallas import default_interpret

  if interpret is None:
    interpret = default_interpret()
  rn, rn_vjp = jax.vjp(
      lambda x: l2_normalize(x.astype(jnp.float32), axis=-1), region_feat)
  wn, wn_vjp = jax.vjp(
      lambda x: l2_normalize(x.astype(jnp.float32), axis=-1), word_feat)
  d_rn, d_wn = _scores_bwd_pallas(
      rn, wn, mask.astype(jnp.float32), g.astype(jnp.float32),
      gamma1, gamma2, interpret=interpret)
  (d_region,) = rn_vjp(d_rn)
  (d_word,) = wn_vjp(d_wn)
  return d_region, d_word, None


word_scores.defvjp(_word_scores_fwd, _word_scores_bwd)


def make_sharded_word_scores(mesh, data_axis: str = "data",
                             gamma1: float = 5.0, gamma2: float = 5.0,
                             interpret=None):
  """Builds a shard_map-dispatched variant of `word_scores` for a mesh.

  Each device runs the Pallas kernel over its local image shard against
  the all-gathered caption features (captions are tiny: L x D per
  example), producing its rows of the score matrix — the kernel never
  sees non-addressable data, and the [B, B] output stays sharded on the
  image axis until the caller's softmax.  Backward runs the analytic
  kernel the same way: each device computes d_rn for its image shard and
  its partial d_wn, which one psum over the data axis completes.

  Returns a function ``(region_feat, word_feat, mask) -> scores_ji``.
  """
  from jax.sharding import PartitionSpec as P
  from xmcgan_image_generation_tpu.ops.pallas import default_interpret

  if interpret is None:
    interpret = default_interpret()

  def _local(rn_local, wn_full, mask_full):
    return _scores_pallas(rn_local, wn_full, mask_full, gamma1, gamma2,
                          interpret=interpret)

  sharded = jax.shard_map(
      _local,
      mesh=mesh,
      in_specs=(P(data_axis), P(), P()),
      out_specs=P(data_axis),
      # pallas_call outputs carry no varying-mesh-axes metadata.
      check_vma=False,
  )

  @functools.partial(jax.custom_vjp)
  def scores(region_feat, word_feat, mask):
    rn = l2_normalize(region_feat.astype(jnp.float32), axis=-1)
    wn = l2_normalize(word_feat.astype(jnp.float32), axis=-1)
    return sharded(rn, wn, mask.astype(jnp.float32)).T

  def fwd(region_feat, word_feat, mask):
    return scores(region_feat, word_feat, mask), (region_feat, word_feat,
                                                  mask)

  def _local_bwd(g_local, rn_local, wn_full, mask_full):
    # g_local: [B_cap, B_img_local] — this device's columns of g.
    d_rn_local, d_wn_part = _scores_bwd_pallas(
        rn_local, wn_full, mask_full, g_local, gamma1, gamma2,
        interpret=interpret)
    return d_rn_local, jax.lax.psum(d_wn_part, data_axis)

  sharded_bwd = jax.shard_map(
      _local_bwd,
      mesh=mesh,
      in_specs=(P(None, data_axis), P(data_axis), P(), P()),
      out_specs=(P(data_axis), P()),
      check_vma=False,
  )

  def bwd(residuals, g):
    region_feat, word_feat, mask = residuals
    rn, rn_vjp = jax.vjp(
        lambda x: l2_normalize(x.astype(jnp.float32), axis=-1), region_feat)
    wn, wn_vjp = jax.vjp(
        lambda x: l2_normalize(x.astype(jnp.float32), axis=-1), word_feat)
    d_rn, d_wn = sharded_bwd(g.astype(jnp.float32), rn,
                             wn, mask.astype(jnp.float32))
    (d_region,) = rn_vjp(d_rn)
    (d_word,) = wn_vjp(d_wn)
    return d_region, d_word, None

  scores.defvjp(fwd, bwd)
  return scores
