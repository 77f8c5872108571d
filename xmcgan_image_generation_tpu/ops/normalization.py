"""Conditional batch normalization (global and spatially-local variants).

Capability parity with reference xmcgan/libml/layers.py:244-273.

Cross-replica semantics: the reference computes BatchNorm statistics over
the *per-device* batch by default, with an opt-in grouped cross-replica mode
(reference nets/xmc_net.py:192-201, utils/device_utils.py:18-26).  Under
GSPMD the batch is one logical array sharded over the ``data`` axis, so the
natural (and BigGAN-standard) behaviour is statistics over the *global*
batch — XLA inserts the cross-device reduction over ICI.  This framework
defaults to global-batch statistics; ``batch_norm_group_size`` is accepted
for config parity and validated in the model (see models/xmc_net.py).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

Array = jnp.ndarray


class ConditionalBatchNorm(nn.Module):
  """BatchNorm modulated by per-sample (gamma, beta) from a dense embedding.

  ``x`` is normalized without learned scale/bias, then modulated as
  ``x * (gamma + 1) + beta`` where gamma/beta are linear in the conditioning
  vector (reference libml/layers.py:244-258).

  Attributes:
    norm_fn: Partially-applied `nn.BatchNorm` factory.
    dense_fn: Dense layer factory (spectral-norm or plain).
  """

  norm_fn: Any
  dense_fn: Any

  @nn.compact
  def __call__(self, x: Array, emb: Array) -> Array:
    filters = x.shape[-1]
    gamma = self.dense_fn(filters)(emb).reshape(-1, 1, 1, filters)
    beta = self.dense_fn(filters)(emb).reshape(-1, 1, 1, filters)
    x = self.norm_fn(use_bias=False, use_scale=False)(x)
    return x * (gamma + 1.0) + beta


class LocalConditionalBatchNorm(nn.Module):
  """BatchNorm with *spatial* modulation (attentional self-modulation).

  gamma/beta are 1x1 convs of a spatial conditioning map — each pixel gets
  its own affine modulation (reference libml/layers.py:261-273).

  Attributes:
    norm_fn: Partially-applied `nn.BatchNorm` factory.
    conv_fn: Conv layer factory (spectral-norm or plain).
  """

  norm_fn: Any
  conv_fn: Any

  @nn.compact
  def __call__(self, x: Array, emb: Array) -> Array:
    filters = x.shape[-1]
    gamma = self.conv_fn(filters, kernel_size=(1, 1))(emb)
    beta = self.conv_fn(filters, kernel_size=(1, 1))(emb)
    x = self.norm_fn(use_bias=False, use_scale=False)(x)
    return x * (gamma + 1.0) + beta
