"""Scale-fused convolutions: fold resampling into the adjacent conv.

The generator computes ``conv3x3(nearest_upsample_2x(x))`` in every block
(reference nets/common.py:136-186) and the discriminator computes
``avg_pool_2x2(conv3x3(x))`` in every downsampling block (reference
nets/common.py:58-133).  Both factor EXACTLY through the resampling:

* Nearest-2x upsample followed by a SAME 3x3 conv touches at most 2x2
  distinct low-resolution cells per output pixel.  For output phase
  (a, b) in {0,1}^2 the effective kernel is the 2x2 combination
  ``K_ab = R_a w R_b^T`` with row maps R_0 = [[1,0,0],[0,1,1]],
  R_1 = [[1,1,0],[0,0,1]].  One VALID 2x2 conv over the 1-padded input
  producing all four phase kernels, followed by a depth-to-space
  interleave, reproduces the high-resolution conv with 16 low-res taps
  instead of 9 high-res taps: **2.25x fewer FLOPs and 4x less input
  bandwidth**.

* A 2x2/stride-2 average pool of a SAME 3x3 conv is a single
  4x4/stride-2 conv with kernel ``K = (M w M^T) / 4``,
  M = [[1,0,0],[1,1,0],[0,1,1],[0,0,1]] and padding (1,1): 16 taps on a
  quarter of the outputs instead of 9 on all — again 2.25x fewer FLOPs,
  and the full-resolution conv output is never materialized.

XLA performs neither rewrite (they change the HLO conv shapes, which is
beyond fusion), so the framework does them at the op level.  Both are
bit-equal to the unfused pipeline in exact arithmetic; in floating point
they differ only by re-association of 2-3 kernel-weight additions
(tests/test_scale_fuse.py pins the tolerance).  Enabled by
``config.scale_fused_convs``; the parameter tree and checkpoint format
are unchanged (the 3x3 kernel remains the parameter — phase kernels are
derived inside the op).
"""

from __future__ import annotations

from jax import lax
import jax.numpy as jnp

Array = jnp.ndarray


def _row_combos(w: Array, axis: int):
  """Returns the a=0 and a=1 two-tap combinations of a 3-tap kernel axis."""
  w0, w1, w2 = (lax.index_in_dim(w, i, axis, keepdims=True)
                for i in range(3))
  k0 = jnp.concatenate([w0, w1 + w2], axis=axis)
  k1 = jnp.concatenate([w0 + w1, w2], axis=axis)
  return k0, k1


def fuse_up_kernel(w: Array) -> Array:
  """[3,3,ci,co] -> [2,2,ci,4co] phase-stacked upsample-conv kernels.

  Phase order along the output-channel axis: (0,0),(0,1),(1,0),(1,1).
  """
  r0, r1 = _row_combos(w, 0)
  phases = []
  for rk in (r0, r1):
    c0, c1 = _row_combos(rk, 1)
    phases += [c0, c1]
  return jnp.concatenate(phases, axis=-1)


def upsample_conv(x: Array, w: Array, precision=None) -> Array:
  """``conv3x3_SAME(nearest_upsample_2x(x), w)`` without the upsample.

  Args:
    x: ``[B, H, W, Ci]`` input (the LOW-resolution tensor).
    w: ``[3, 3, Ci, Co]`` kernel.

  Returns:
    ``[B, 2H, 2W, Co]``, equal to the unfused pipeline.
  """
  b, h, wd, _ = x.shape
  co = w.shape[-1]
  k = fuse_up_kernel(w)
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  # One VALID 2x2 conv serves both window alignments per dimension:
  # output position p covers padded rows {p-1, p}; phase a at low-res i
  # needs window {i-1+a, i+a}, i.e. position p = i + a.
  out = lax.conv_general_dilated(
      xp, k, window_strides=(1, 1), padding="VALID",
      dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
  s = [out[:, a:a + h, bb:bb + wd, i * co:(i + 1) * co]
       for i, (a, bb) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1)))]
  y = jnp.stack(s, axis=-2).reshape(b, h, wd, 2, 2, co)
  return y.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h, 2 * wd, co)


def upsample_conv_dilated(x: Array, w: Array, precision=None) -> Array:
  """``conv3x3_SAME(nearest_upsample_2x(x), w)`` as ONE base-dilated conv.

  Same function as `upsample_conv` but with no depth-to-space: nearest
  upsample is the base-2-dilated input convolved with ``ones(2,2)``, so
  the composed pipeline is a single conv of the dilated input with the
  4x4 kernel ``K = w * ones(2,2)`` (correlation — exactly
  ``fuse_pool_kernel(w) * 4``), padding 2.  The high-resolution output
  is written directly from the conv, trading the phase formulation's
  materialized transpose (~176 MB x3/step at the 128px scale, the one
  standing waste in the round-4 copy census) for whatever XLA makes of a
  base-dilated conv on the MXU.  Which formulation wins is an empirical
  question per backend — `config.upconv_method` selects, bench A/B
  measures (BENCH_NOTES).

  Args:
    x: ``[B, H, W, Ci]`` input (the LOW-resolution tensor).
    w: ``[3, 3, Ci, Co]`` kernel.

  Returns:
    ``[B, 2H, 2W, Co]``, equal to the unfused pipeline.
  """
  k = _pool_combos(_pool_combos(w, 0), 1)
  return lax.conv_general_dilated(
      x, k, window_strides=(1, 1), padding=((2, 2), (2, 2)),
      lhs_dilation=(2, 2),
      dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


def _pool_combos(w: Array, axis: int) -> Array:
  """3-tap kernel axis -> the 4-tap pooled-conv combination."""
  w0, w1, w2 = (lax.index_in_dim(w, i, axis, keepdims=True)
                for i in range(3))
  return jnp.concatenate([w0, w0 + w1, w1 + w2, w2], axis=axis)


def fuse_pool_kernel(w: Array) -> Array:
  """[3,3,ci,co] -> [4,4,ci,co] kernel of the pool-fused conv."""
  return _pool_combos(_pool_combos(w, 0), 1) * 0.25


def conv_pool(x: Array, w: Array, precision=None) -> Array:
  """``avg_pool_2x2_s2(conv3x3_SAME(x, w))`` as one stride-2 conv.

  Requires even spatial dims (every discriminator scale is a power of
  two), where the TF-SAME pool never pads — see ops/pooling.dsample.

  Args:
    x: ``[B, H, W, Ci]`` input, H and W even.
    w: ``[3, 3, Ci, Co]`` kernel.

  Returns:
    ``[B, H/2, W/2, Co]``, equal to the unfused pipeline.
  """
  if x.shape[1] % 2 or x.shape[2] % 2:
    raise ValueError(f"conv_pool needs even spatial dims, got {x.shape}")
  return lax.conv_general_dilated(
      x, fuse_pool_kernel(w), window_strides=(2, 2),
      padding=((1, 1), (1, 1)),
      dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


def make_fused_conv_hook(scale_op: str, up_method: str = "phase"):
  """``nn.Conv(conv_general_dilated=...)`` hook applying a fused op.

  Keeps the module scope (``Conv_N``) and the 3x3 "kernel" param — only
  the computation changes.  The caller (models/blocks.py) guarantees the
  conv qualifies (3x3, stride 1, SAME, no dilation), so the incoming
  strides/padding describe the *unfused* conv and are intentionally
  replaced by the fused formulation.  ``up_method`` selects the
  upsample-conv formulation: "phase" (2x2 phase kernels +
  depth-to-space) or "dilated" (one base-dilated 4x4 conv).
  """
  if up_method not in ("phase", "dilated"):
    raise ValueError(f"unknown up_method: {up_method}")

  def conv(lhs, rhs, window_strides, padding, lhs_dilation=None,
           rhs_dilation=None, dimension_numbers=None,
           feature_group_count=1, precision=None, **kwargs):
    del window_strides, padding, lhs_dilation, rhs_dilation
    del dimension_numbers, kwargs
    if feature_group_count != 1 or rhs.shape[:2] != (3, 3):
      raise ValueError("fused conv hook requires a plain 3x3 conv")
    if scale_op == "up":
      fn = upsample_conv if up_method == "phase" else upsample_conv_dilated
      return fn(lhs, rhs, precision=precision)
    if scale_op == "pool":
      return conv_pool(lhs, rhs, precision=precision)
    raise ValueError(f"unknown scale_op: {scale_op}")

  return conv
