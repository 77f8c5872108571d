"""2-D convolution with MXU-matmul gradient algorithms (custom VJP).

Why this exists: the flagship train step is backward-bound. Forward conv
phases run at ~63% MXU (mid-stack shapes standalone at 88-99%), but the
backward runs at ~47% (BENCH_NOTES, round 3) — XLA's conv-gradient
emitters, not program structure, own the gap. For the 3x3 / stride-1 /
SAME convs that carry ~95% of the G/D FLOPs, both gradients have exact
plain-matmul forms that tile perfectly onto the MXU:

  grad-weight  dW[t,ci,co] = sum_{b,y,x} Xpad[b,(y,x)+t,ci] * dY[b,y,x,co]
               -> per-tap [BHW, Ci]^T @ [BHW, Co]   (9 taps), or one
                  im2col concat [BHW, 9*Ci]^T @ [BHW, Co]
  grad-input   dX[b,p,ci] = sum_t dYpad[b, p-(t-1), co] * W[t,ci,co]
               -> per-tap [BHW, Co] @ [Co, Ci] with shifted dY slices

The choice of backward algorithm per shape is measured on the real chip
by ``tools/convgrad_bench.py`` — the TPU analogue of cuDNN's backward-
algorithm autotuning that the reference gets implicitly from
torch/TF-on-GPU (reference xmcgan/libml/layers.py conv usage).
The forward is byte-identical to ``lax.conv_general_dilated`` (same
primitive, same flags); only the VJP rule changes, so switching
algorithms never changes a checkpoint or a forward activation.

Exports:
  conv2d(...)  — drop-in for the lax call in SpectralConv; dispatches to
                 the custom-VJP path when the shape qualifies and the
                 requested algorithm isn't "xla".
  make_conv_general_dilated(algorithm)
               — a lax.conv_general_dilated drop-in for
                 ``nn.Conv(conv_general_dilated=...)`` (the G-side
                 non-spectral-norm convs) with the same VJP dispatch.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
from jax import lax
import jax.numpy as jnp

Array = jnp.ndarray

# Backward-algorithm selection, measured per flagship shape on a v5e by
# tools/convgrad_bench.py (see BENCH_NOTES "conv backward" table).
# "auto" applies the measured heuristic; "xla" keeps the native VJP.
Algorithm = str  # "auto" | "xla" | "tap9" | "cat"


def _tap_slices(xp: Array, h: int, w: int):
  """The 9 shifted [B,H,W,C] views of a (1,1)-spatially-padded array."""
  b, _, _, c = xp.shape
  return [lax.slice(xp, (0, dy, dx, 0), (b, dy + h, dx + w, c))
          for dy in range(3) for dx in range(3)]


def _grad_weight_tap9(x: Array, dy: Array) -> Array:
  """dW via 9 per-tap [Ci,BHW]@[BHW,Co] dots; f32 accumulation."""
  b, h, w, ci = x.shape
  co = dy.shape[-1]
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  dyf = dy.reshape(-1, co)
  taps = [lax.dot_general(s.reshape(-1, ci), dyf, (((0,), (0,)), ((), ())),
                          preferred_element_type=jnp.float32)
          for s in _tap_slices(xp, h, w)]
  return jnp.stack(taps).reshape(3, 3, ci, co)


def _grad_weight_cat(x: Array, dy: Array) -> Array:
  """dW via one im2col [BHW,9Ci]^T@[BHW,Co] matmul; f32 accumulation.

  Materializes a 9x copy of ``x`` — only sensible where channels are
  wide relative to spatial extent (the measured low-res/high-channel
  blocks); "auto" never picks it at high resolution.
  """
  b, h, w, ci = x.shape
  co = dy.shape[-1]
  xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
  xcat = jnp.concatenate(_tap_slices(xp, h, w), axis=-1).reshape(-1, 9 * ci)
  out = lax.dot_general(xcat, dy.reshape(-1, co), (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
  return out.reshape(3, 3, ci, co)


def _grad_input_tap9(w: Array, dy: Array) -> Array:
  """dX via 9 per-tap [BHW,Co]@[Co,Ci] dots; f32 accumulation."""
  b, h, wd, co = dy.shape
  ci = w.shape[2]
  dyp = jnp.pad(dy, ((0, 0), (1, 1), (1, 1), (0, 0)))
  slices = _tap_slices(dyp, h, wd)
  acc = jnp.zeros((b * h * wd, ci), jnp.float32)
  for dyy in range(3):
    for dxx in range(3):
      s = slices[(2 - dyy) * 3 + (2 - dxx)].reshape(-1, co)
      acc = acc + lax.dot_general(s, w[dyy, dxx], (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
  return acc.reshape(b, h, wd, ci)


def _plain_conv(x: Array, w: Array, strides, precision) -> Array:
  return lax.conv_general_dilated(
      x, w, window_strides=strides, padding="SAME",
      dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


def _native_grads(x, w, dy, strides, precision, wrt):
  """XLA's own conv VJP for one input — the fallback arm of "auto"."""
  if wrt == "x":
    _, vjp = jax.vjp(lambda x_: _plain_conv(x_, w, strides, precision), x)
  else:
    _, vjp = jax.vjp(lambda w_: _plain_conv(x, w_, strides, precision), w)
  return vjp(dy)[0]


def _pick(algorithm: Algorithm, ci: int, co: int) -> Algorithm:
  """Measured heuristic (tools/convgrad_bench.py on a v5e, round 3).

  The measurement came back decisive: XLA's native conv-gradient
  emitters run at 85-98% MXU at every flagship 3x3 shape once the
  program is pure bf16 (the earlier "backward at 47%" attribution was
  block-level glue, not the emitters), and the matmul reformulations
  never beat them (best case gw_tap9 93-95% vs native 96-98%).  So
  "auto" resolves to the native VJP on current hardware; tap9/cat stay
  available as explicitly-requested algorithms for future parts where
  the trade-off may differ.
  """
  del ci, co
  if algorithm != "auto":
    return algorithm
  return "xla"


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv3x3_custom(x: Array, w: Array, strides, precision,
                    algorithm: Algorithm) -> Array:
  return _plain_conv(x, w, strides, precision)


def _conv3x3_fwd(x, w, strides, precision, algorithm):
  return _plain_conv(x, w, strides, precision), (x, w)


def _conv3x3_bwd(strides, precision, algorithm, res, dy):
  x, w = res
  ci, co = w.shape[2], w.shape[3]
  algo = _pick(algorithm, ci, co)
  if algo == "xla":
    dx = _native_grads(x, w, dy, strides, precision, "x")
    dw = _native_grads(x, w, dy, strides, precision, "w")
  else:
    gw = _grad_weight_cat if algo == "cat" else _grad_weight_tap9
    dw = gw(x, dy).astype(w.dtype)
    dx = _grad_input_tap9(w, dy).astype(x.dtype)
  return dx, dw


_conv3x3_custom.defvjp(_conv3x3_fwd, _conv3x3_bwd)


def conv2d(x: Array, w: Array, *, strides=(1, 1), padding="SAME",
           precision=None, algorithm: Algorithm = "xla") -> Array:
  """``lax.conv_general_dilated`` (NHWC/HWIO) with selectable VJP.

  Byte-identical forward; the custom backward engages only for the
  qualifying 3x3 / stride-1 / SAME shape and ``algorithm != "xla"``.
  """
  strides = tuple(strides)
  qualifies = (algorithm != "xla" and w.ndim == 4
               and w.shape[:2] == (3, 3) and strides == (1, 1)
               and padding == "SAME")
  if qualifies:
    return _conv3x3_custom(x, w, strides, precision, algorithm)
  return lax.conv_general_dilated(
      x, w, window_strides=strides, padding=padding,
      dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)


# The NHWC/HWIO layout nn.Conv produces for 2-D inputs.
_NHWC_SPECS = ((0, 3, 1, 2), (3, 2, 0, 1), (0, 3, 1, 2))


def make_conv_general_dilated(algorithm: Algorithm) -> Callable:
  """A ``lax.conv_general_dilated`` drop-in with a selectable VJP.

  Passed to ``nn.Conv(conv_general_dilated=...)`` so the module scope
  name stays ``Conv_N`` — param names, init RNG folds, and therefore
  checkpoints and the reference bridge are bit-identical to plain
  nn.Conv.  (A lookalike module would autoname its scope differently,
  which changes every param's init stream.)
  """

  def conv(lhs, rhs, window_strides, padding, lhs_dilation=None,
           rhs_dilation=None, dimension_numbers=None,
           feature_group_count=1, precision=None, **kwargs):
    def no_dilation(d):
      return d is None or all(x == 1 for x in d)
    dn_ok = (dimension_numbers is None
             or tuple(dimension_numbers) == _NHWC_SPECS)
    same_pad = (padding == "SAME"
                or (not isinstance(padding, str)
                    and tuple(map(tuple, padding)) == ((1, 1), (1, 1))))
    qualifies = (algorithm != "xla" and not kwargs
                 and rhs.ndim == 4 and rhs.shape[:2] == (3, 3)
                 and tuple(window_strides) == (1, 1) and same_pad
                 and no_dilation(lhs_dilation) and no_dilation(rhs_dilation)
                 and feature_group_count == 1 and dn_ok)
    if qualifies:
      return _conv3x3_custom(lhs, rhs, (1, 1), precision, algorithm)
    return lax.conv_general_dilated(
        lhs, rhs, window_strides, padding,
        lhs_dilation=lhs_dilation, rhs_dilation=rhs_dilation,
        dimension_numbers=dimension_numbers,
        feature_group_count=feature_group_count, precision=precision,
        **kwargs)

  return conv
