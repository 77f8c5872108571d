"""Pallas TPU kernels for the fused contrastive / attention hot ops."""

import jax


def default_interpret() -> bool:
  """Pallas compiles only on TPU here; elsewhere run the interpreter
  (keeps CPU tests and the multi-device CPU mesh working)."""
  return jax.default_backend() != "tpu"
