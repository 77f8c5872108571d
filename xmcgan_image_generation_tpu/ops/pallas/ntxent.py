"""Fused NT-Xent (symmetric InfoNCE) Pallas kernel.

One kernel fuses l2-normalization, the [B, B] similarity matmul, both
directional cross entropies, and the accuracy/entropy statistics — a
single HBM round-trip for the features instead of the 6+ intermediate
tensors of the XLA formulation.  Backward is analytic under
`jax.custom_vjp` (the gradient only needs the normalized features and the
two softmax matrices, recomputed from one [B, B] matmul).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _l2n(x):
  sq = jnp.sum(jnp.square(x), axis=-1, keepdims=True)
  return x * jax.lax.rsqrt(jnp.maximum(sq, 1e-12))


def _stats(logits, axis):
  """One direction's (mean CE on diagonal, accuracy, entropy).

  ``axis`` is the softmax axis (1 = rows classify columns, 0 = the
  transpose direction) — parameterizing the reduction instead of
  transposing the matrix keeps Mosaic's layout inference happy.
  """
  batch = logits.shape[0]
  m = jnp.max(logits, axis=axis, keepdims=True)
  e = jnp.exp(logits - m)
  z = jnp.sum(e, axis=axis, keepdims=True)
  logp = logits - m - jnp.log(z)
  diag = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0) == \
      jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
  loss = -jnp.sum(jnp.where(diag, logp, 0.0)) / batch
  # Top-1 accuracy against the diagonal.
  arg_max = jnp.max(logits, axis=axis, keepdims=True)
  diag_val = jnp.sum(jnp.where(diag, logits, 0.0), axis=axis,
                     keepdims=True)
  acc = jnp.sum((diag_val >= arg_max).astype(jnp.float32)) / batch
  prob = e / z
  entropy = -jnp.sum(prob * jnp.log(prob + 1e-8)) / batch
  return loss, acc, entropy


def _ntxent_kernel(a_ref, b_ref, out_ref, *, temperature):
  a = _l2n(a_ref[:].astype(jnp.float32))
  b = _l2n(b_ref[:].astype(jnp.float32))
  logits_ab = jax.lax.dot_general(
      a, b, dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32) / temperature
  loss_ab, acc_ab, ent_ab = _stats(logits_ab, axis=1)
  loss_ba, acc_ba, ent_ba = _stats(logits_ab, axis=0)
  # Scalar results land in SMEM (VMEM cannot take scalar stores).
  out_ref[0] = loss_ab + loss_ba
  out_ref[1] = 0.5 * (acc_ab + acc_ba)
  out_ref[2] = 0.5 * (ent_ab + ent_ba)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def nt_xent_fused(feat_a, feat_b, temperature=0.1, interpret=None):
  """Fused (loss, accuracy, entropy) NT-Xent. Differentiable in loss."""
  from xmcgan_image_generation_tpu.ops.pallas import default_interpret

  if interpret is None:
    interpret = default_interpret()
  kernel = functools.partial(_ntxent_kernel,
                             temperature=float(temperature))
  out = pl.pallas_call(
      kernel,
      in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM)],
      out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
      out_shape=jax.ShapeDtypeStruct((3,), jnp.float32),
      interpret=interpret,
  )(feat_a, feat_b)
  return out[0], out[1], out[2]


def _fwd(feat_a, feat_b, temperature, interpret):
  out = nt_xent_fused(feat_a, feat_b, temperature, interpret)
  return out, (feat_a, feat_b)


def _bwd(temperature, interpret, residuals, grads):
  """Analytic gradient of the symmetric InfoNCE loss.

  For L = CE(rows) + CE(cols) over logits S = a_n b_n^T / T:
    dL/dS = (P_row - I)/B + (P_col^T - I)/B
  then chain through the normalization (project out the radial component).
  """
  feat_a, feat_b = residuals
  g_loss = grads[0]  # Cotangents of acc/entropy are ignored (stats only).
  a = feat_a.astype(jnp.float32)
  b = feat_b.astype(jnp.float32)
  an = _l2n(a)
  bn = _l2n(b)
  batch = a.shape[0]
  logits = an @ bn.T / temperature
  p_row = jax.nn.softmax(logits, axis=-1)
  p_col = jax.nn.softmax(logits.T, axis=-1)
  eye = jnp.eye(batch, dtype=jnp.float32)
  ds = ((p_row - eye) + (p_col - eye).T) / (batch * temperature)
  d_an = ds @ bn
  d_bn = ds.T @ an
  # Through l2 normalization: d_x (x/|x|) = (I - nn^T)/|x|.
  inv_a = jax.lax.rsqrt(jnp.maximum(
      jnp.sum(jnp.square(a), -1, keepdims=True), 1e-12))
  inv_b = jax.lax.rsqrt(jnp.maximum(
      jnp.sum(jnp.square(b), -1, keepdims=True), 1e-12))
  d_a = (d_an - an * jnp.sum(d_an * an, -1, keepdims=True)) * inv_a
  d_b = (d_bn - bn * jnp.sum(d_bn * bn, -1, keepdims=True)) * inv_b
  d_a = (d_a * g_loss).astype(feat_a.dtype)
  d_b = (d_b * g_loss).astype(feat_b.dtype)
  return d_a, d_b


nt_xent_fused.defvjp(_fwd, _bwd)
