"""GAN loss primitives.

Capability parity with reference xmcgan/libml/losses.py:19-51.  All losses
are computed in float32 regardless of the network compute dtype; on TPU the
model body runs in bfloat16 on the MXU and the handful of scalar loss ops
here are free, so there is no reason to accept bf16 loss noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def hinge_g(fake_logit: jnp.ndarray) -> jnp.ndarray:
  """Generator hinge loss: maximize D(fake)."""
  return -jnp.mean(fake_logit.astype(jnp.float32))


def hinge_d(real_logit: jnp.ndarray, fake_logit: jnp.ndarray) -> jnp.ndarray:
  """Discriminator hinge loss (reference libml/losses.py:23-27)."""
  real_logit = real_logit.astype(jnp.float32)
  fake_logit = fake_logit.astype(jnp.float32)
  real_loss = jnp.mean(jax.nn.relu(1.0 - real_logit))
  fake_loss = jnp.mean(jax.nn.relu(1.0 + fake_logit))
  return real_loss + fake_loss


def hinge(real_logit: jnp.ndarray,
          fake_logit: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
  """Joint hinge loss, returns ``(d_loss, g_loss)``.

  Matches reference libml/losses.py:30-35 (note the reference averages
  ``relu(1-r) + relu(1+f)`` jointly, which equals the sum of the two means
  when real/fake halves have equal size — they always do here).
  """
  return hinge_d(real_logit, fake_logit), hinge_g(fake_logit)


def softmax_cross_entropy(*, labels: jnp.ndarray,
                          logits: jnp.ndarray) -> jnp.ndarray:
  """Dense-label softmax cross entropy, per row.

  ``labels`` is a one-hot (or soft) distribution over the last axis.
  Equivalent to `tf.nn.softmax_cross_entropy_with_logits`
  (reference libml/losses.py:47-51).
  """
  logp = jax.nn.log_softmax(logits.astype(jnp.float32))
  return -jnp.sum(labels * logp, axis=-1)
