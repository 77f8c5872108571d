"""Spectrally-normalized dense and conv layers.

Capability parity with reference xmcgan/libml/layers.py:49-241: one step of
power iteration per forward pass, with the left singular vector ``u0``
persisted in a dedicated ``spectral_norm_stats`` variable collection that is
(a) updated only in training mode, (b) checkpointed with the model, and
(c) identical across data-parallel replicas (under GSPMD the state is
replicated, so this holds by construction).

TPU notes:
* The power-iteration matvecs are two ``[1, n] x [n, m]`` GEMVs per layer —
  noise next to the conv itself, so they stay in plain XLA.
* Params are stored in float32 and the *normalized* kernel is cast to the
  compute dtype (bf16), keeping sigma estimation in f32 where the
  ``eps=1e-10`` additive guard is representable.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import flax.linen as nn
from flax.linen.initializers import normal, zeros
from jax import lax
import jax.numpy as jnp

Array = jnp.ndarray
# TF-compatible additive epsilon (reference libml/layers.py:61-62: "same as
# TF version, but different from Haiku version").
SN_EPS = 1e-10


def _power_iteration_normalize(
    kernel_2d: Array,
    u0: Array,
    eps: float = SN_EPS,
) -> Tuple[Array, Array]:
  """One power-iteration step; returns (kernel / sigma, new_u0).

  ``kernel_2d`` is the weight reshaped to ``[fan_in, features]``; ``u0`` is
  the persisted ``[1, features]`` estimate of the top left-singular vector.
  The iteration matches reference libml/layers.py:93-101: additive-eps
  l2-normalization, stop_gradient on u/v, and ``kernel / (sigma + eps)``.
  """

  def _l2(x):
    return x * lax.rsqrt(jnp.sum(jnp.square(x), keepdims=True) + eps)

  kernel_2d = kernel_2d.astype(jnp.float32)
  u0 = u0.astype(jnp.float32)
  v0 = _l2(jnp.matmul(u0, kernel_2d.T))
  u0 = _l2(jnp.matmul(v0, kernel_2d))
  u0 = lax.stop_gradient(u0)
  v0 = lax.stop_gradient(v0)
  sigma = jnp.matmul(jnp.matmul(v0, kernel_2d), u0.T)[0, 0]
  return kernel_2d / (sigma + eps), u0


class SpectralDense(nn.Module):
  """Dense layer with spectral weight normalization.

  Attributes:
    features: Output feature count.
    train: Whether to update the persisted power-iteration state.
    use_bias: Add a bias term.
    dtype: Compute dtype (params stay float32).
    kernel_init: Kernel initializer.
    bias_init: Bias initializer.
  """

  features: int
  train: bool
  use_bias: bool = True
  dtype: Any = jnp.float32
  precision: Any = None
  kernel_init: Callable = nn.initializers.lecun_normal()
  bias_init: Callable = zeros

  @nn.compact
  def __call__(self, inputs: Array) -> Array:
    kernel = self.param("kernel", self.kernel_init,
                        (inputs.shape[-1], self.features))
    u0_var = self.variable(
        "spectral_norm_stats", "u0",
        lambda s: normal()(self.make_rng("params"), s), (1, self.features))
    kernel_bar, new_u0 = _power_iteration_normalize(kernel, u0_var.value)
    if self.train and not self.is_initializing():
      u0_var.value = new_u0
    y = lax.dot_general(
        inputs.astype(self.dtype),
        kernel_bar.astype(self.dtype),
        (((inputs.ndim - 1,), (0,)), ((), ())),
        precision=self.precision)
    if self.use_bias:
      bias = self.param("bias", self.bias_init, (self.features,))
      y = y + bias.astype(self.dtype)
    return y


class SpectralConv(nn.Module):
  """NHWC convolution with spectral weight normalization.

  The kernel is flattened to ``[kh*kw*cin, features]`` for the power
  iteration (reference libml/layers.py:200-220) and reshaped back for the
  conv, which XLA tiles onto the MXU.

  Attributes:
    features: Output channel count.
    train: Whether to update the persisted power-iteration state.
    kernel_size: Spatial kernel shape, e.g. ``(3, 3)``.
    strides: Spatial strides (defaults to 1).
    padding: lax conv padding ('SAME'/'VALID'/explicit pairs).
    use_bias: Add a bias term.
    dtype: Compute dtype (params stay float32).
  """

  features: int
  train: bool
  kernel_size: Union[int, Sequence[int]] = (3, 3)
  strides: Optional[Sequence[int]] = None
  padding: Any = "SAME"
  use_bias: bool = True
  dtype: Any = jnp.float32
  precision: Any = None
  conv_backward: str = "xla"
  scale_op: str = "none"
  up_method: str = "phase"
  kernel_init: Callable = nn.initializers.lecun_normal()
  bias_init: Callable = zeros

  @nn.compact
  def __call__(self, inputs: Array) -> Array:
    from xmcgan_image_generation_tpu.ops import mxu_conv
    from xmcgan_image_generation_tpu.ops import scale_fuse

    kernel_size = ((self.kernel_size,) if isinstance(self.kernel_size, int)
                   else tuple(self.kernel_size))
    in_features = inputs.shape[-1]
    kernel_shape = kernel_size + (in_features, self.features)
    kernel = self.param("kernel", self.kernel_init, kernel_shape)
    u0_var = self.variable(
        "spectral_norm_stats", "u0",
        lambda s: normal()(self.make_rng("params"), s), (1, self.features))
    kernel_bar, new_u0 = _power_iteration_normalize(
        kernel.reshape(-1, self.features), u0_var.value)
    if self.train and not self.is_initializing():
      u0_var.value = new_u0
    kernel_bar = kernel_bar.reshape(kernel_shape).astype(self.dtype)

    strides = self.strides or (1,) * len(kernel_size)
    if self.scale_op != "none":
      # Scale-fused path (ops/scale_fuse.py): the adjacent upsample/pool
      # is folded into this conv.  Spectral normalization composes
      # exactly: the fused kernels are linear in kernel_bar, so fusing
      # the normalized kernel equals resampling the normalized conv.
      if kernel_size != (3, 3) or tuple(strides) != (1, 1):
        raise ValueError(
            f"scale_op={self.scale_op} requires a 3x3/stride-1 conv")
      if self.scale_op == "up":
        fused = (scale_fuse.upsample_conv if self.up_method == "phase"
                 else scale_fuse.upsample_conv_dilated)
      else:
        fused = scale_fuse.conv_pool
      y = fused(inputs.astype(self.dtype), kernel_bar,
                precision=self.precision)
    else:
      # Forward is byte-identical to lax.conv_general_dilated for every
      # conv_backward setting; the knob only selects the gradient
      # algorithm (ops/mxu_conv.py — MXU-matmul conv gradients for
      # qualifying shapes).
      y = mxu_conv.conv2d(
          inputs.astype(self.dtype),
          kernel_bar,
          strides=strides,
          padding=self.padding,
          precision=self.precision,
          algorithm=self.conv_backward)
    if self.use_bias:
      bias = self.param("bias", self.bias_init, (self.features,))
      y = y + bias.astype(self.dtype)
    return y
