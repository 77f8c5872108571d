"""Test configuration: force an 8-device virtual CPU platform.

Multi-chip TPU hardware is not available in CI, so all mesh/sharding tests
run against 8 fake CPU devices (the strategy SURVEY.md section 4 calls for).

Note: the environment's sitecustomize may force ``jax_platforms`` to a TPU
plugin at interpreter start, so plain env vars are not enough — we override
the jax config directly before any backend is initialized.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


def pytest_configure(config):
  config.addinivalue_line("markers", "slow: long-running test")
