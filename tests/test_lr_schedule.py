"""Optional learning-rate schedules (``config.lr_schedule``).

The reference trains at constant LRs only (reference
train_utils.py:181-186); the ``lr_schedule`` knob layers standard
production schedules (warmup+cosine / warmup+linear) on top, with the
discriminator's schedule stretched by ``d_step_per_g_step`` so G and D
decay on the same wall-clock.  Cheap tests — schedules only, no model
compilation.
"""

import numpy as np
import optax
import pytest

from xmcgan_image_generation_tpu.configs import coco_xmc
from xmcgan_image_generation_tpu.engine.state import (
    _learning_rate,
    create_optimizers,
)


def config_with(**overrides):
  config = coco_xmc.get_test_config()
  for k, v in overrides.items():
    setattr(config, k, v)
  return config


def test_constant_is_default_and_plain_float():
  config = config_with()
  assert _learning_rate(config, 3e-4) == 3e-4


def test_cosine_warmup_peak_and_decay():
  config = config_with(lr_schedule="cosine", lr_warmup_steps=10,
                       lr_decay_steps=100)
  sched = _learning_rate(config, 1e-4)
  assert callable(sched)
  np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
  np.testing.assert_allclose(float(sched(10)), 1e-4, rtol=1e-6)
  np.testing.assert_allclose(float(sched(5)), 0.5e-4, rtol=1e-6)  # linear ramp
  np.testing.assert_allclose(float(sched(100)), 0.0, atol=1e-10)
  # Cosine midpoint of the decay span: half the peak.
  np.testing.assert_allclose(float(sched(55)), 0.5e-4, rtol=1e-5)


def test_linear_warmup_and_decay():
  config = config_with(lr_schedule="linear", lr_warmup_steps=10,
                       lr_decay_steps=110)
  sched = _learning_rate(config, 2e-4)
  np.testing.assert_allclose(float(sched(0)), 0.0, atol=1e-12)
  np.testing.assert_allclose(float(sched(10)), 2e-4, rtol=1e-6)
  np.testing.assert_allclose(float(sched(60)), 1e-4, rtol=1e-6)  # midpoint
  np.testing.assert_allclose(float(sched(110)), 0.0, atol=1e-10)


def test_discriminator_schedule_stretched_by_critic_steps():
  # d_step_per_g_step optimizer steps per outer step: after S outer steps
  # the D optimizer has counted S*d_step_per_g_step, and its stretched
  # schedule must be at the same fraction as G's at S.
  config = config_with(lr_schedule="linear", lr_warmup_steps=10,
                       lr_decay_steps=100, d_step_per_g_step=2)
  g_sched = _learning_rate(config, config.g_lr)
  d_sched = _learning_rate(config, config.d_lr, 2)
  for outer_step in (0, 10, 37, 50, 100):
    g_frac = float(g_sched(outer_step)) / config.g_lr
    d_frac = float(d_sched(outer_step * 2)) / config.d_lr
    np.testing.assert_allclose(d_frac, g_frac, rtol=1e-5, atol=1e-7)


def test_schedule_changes_optimizer_state_structure():
  # Scheduled optimizers carry a step count; constant ones are scale-only.
  params = {"w": np.zeros((2,), np.float32)}
  const_g, _ = create_optimizers(config_with())
  sched_g, _ = create_optimizers(
      config_with(lr_schedule="cosine", lr_warmup_steps=1,
                  lr_decay_steps=10))
  # Both initialize fine; the scheduled one must actually scale by the
  # schedule: after the warmup step the update magnitude is non-zero.
  state = sched_g.init(params)
  grads = {"w": np.ones((2,), np.float32)}
  updates, state = sched_g.update(grads, state, params)
  # step 0 -> lr 0 -> zero update under warmup.
  np.testing.assert_allclose(np.asarray(updates["w"]), 0.0, atol=1e-12)
  updates, state = sched_g.update(grads, state, params)
  assert float(np.abs(np.asarray(updates["w"])).max()) > 0.0
  del const_g


def test_nonconstant_requires_decay_steps():
  config = config_with(lr_schedule="cosine")
  with pytest.raises(ValueError, match="lr_decay_steps"):
    _learning_rate(config, 1e-4)


def test_warmup_must_precede_decay_end():
  config = config_with(lr_schedule="cosine", lr_warmup_steps=100,
                       lr_decay_steps=100)
  with pytest.raises(ValueError, match="lr_warmup_steps"):
    _learning_rate(config, 1e-4)


def test_validation_error_quotes_raw_config_values():
  # The D schedule is stretched by d_step_per_g_step; the error must
  # still quote the numbers the user configured, not the stretched ones.
  config = config_with(lr_schedule="cosine", lr_warmup_steps=100,
                       lr_decay_steps=100, d_step_per_g_step=2)
  with pytest.raises(ValueError, match=r"lr_warmup_steps \(100\).*\(100\)"):
    _learning_rate(config, 1e-4, 2)


def test_unknown_schedule_rejected():
  config = config_with(lr_schedule="exponential", lr_decay_steps=10)
  with pytest.raises(ValueError, match="lr_schedule"):
    _learning_rate(config, 1e-4)
