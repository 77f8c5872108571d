"""The driver contract: __graft_entry__ must work in a fresh interpreter.

Round-1 regression: ``dryrun_multichip`` built its mesh from ``jax.devices()``
without provisioning the virtual 8-CPU platform, so the driver (which runs it
outside pytest, without conftest.py's platform overrides) got the single axon
TPU device and failed with ``mesh 8x1 != 1 devices``.  These tests invoke the
entry points the exact way the driver does: a clean subprocess with no
JAX/XLA environment pre-cooked by our conftest.
"""

import os
import pathlib
import subprocess
import sys

import pytest

# These subprocesses duplicate exactly what the build driver itself runs
# every round (compile-heavy: the dryrun alone is ~2 min on this box), so
# they live in the heavy tier — the quick tier gates code the driver does
# NOT independently exercise.
pytestmark = pytest.mark.heavy

REPO = pathlib.Path(__file__).resolve().parent.parent


def _clean_env():
  env = dict(os.environ)
  # Drop everything conftest.py set up so the subprocess sees what the
  # driver's shell would: sitecustomize (axon plugin) and nothing else.
  env.pop("XLA_FLAGS", None)
  env.pop("JAX_PLATFORMS", None)
  # Keep runs fast across repeats; env var form reaches the subprocess.
  env["JAX_COMPILATION_CACHE_DIR"] = "/tmp/jax_test_cache"
  return env


def test_dryrun_multichip_like_the_driver():
  proc = subprocess.run(
      [sys.executable, "-c",
       "import __graft_entry__; __graft_entry__.dryrun_multichip(8)"],
      cwd=REPO, env=_clean_env(), capture_output=True, text=True,
      timeout=560)
  assert proc.returncode == 0, proc.stderr[-4000:]
  assert "dryrun_multichip(8) OK" in proc.stdout


def test_entry_compile_check_like_the_driver():
  code = (
      "import jax, __graft_entry__\n"
      "jax.config.update('jax_platforms', 'cpu')\n"
      "fn, args = __graft_entry__.entry()\n"
      "out = jax.jit(fn).lower(*args).compile()\n"
      "print('entry-compile OK')\n")
  proc = subprocess.run(
      [sys.executable, "-c", code],
      cwd=REPO, env=_clean_env(), capture_output=True, text=True,
      timeout=560)
  assert proc.returncode == 0, proc.stderr[-4000:]
  assert "entry-compile OK" in proc.stdout
