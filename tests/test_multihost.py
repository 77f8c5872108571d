"""True multi-controller test: two JAX processes (2 local CPU devices
each) run the full training loop against one workdir, with gloo CPU
collectives, per-process grain shards, and a multi-host Orbax checkpoint.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
workdir = sys.argv[4]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import logging
logging.basicConfig(level=logging.INFO)
from xmcgan_image_generation_tpu import train as train_lib
from xmcgan_image_generation_tpu.configs import coco_xmc
config = coco_xmc.get_test_config()
config.num_train_steps = 2
config.batch_size = 8
config.eval_batch_size = 8
config.checkpoint_every_steps = 2
train_lib.train(config, workdir)
print(f"[proc {pid}] done", flush=True)
"""


EVAL_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
workdir = sys.argv[4]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import logging
logging.basicConfig(level=logging.INFO)
from xmcgan_image_generation_tpu import evaluate as eval_lib
from xmcgan_image_generation_tpu.configs import coco_xmc
config = coco_xmc.get_test_config()
config.batch_size = 8
config.eval_batch_size = 8
config.eval_num = 8
config.eval_avg_num = 1
eval_lib.evaluate_continuously(config, workdir, timeout=600)
print(f"[eval proc {pid}] done", flush=True)
"""


SYNC_WORKER = r"""
import os, sys, time
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
ckpt_dir = sys.argv[4]; mode = sys.argv[5]
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import logging
logging.basicConfig(level=logging.INFO)
from xmcgan_image_generation_tpu.evaluate import _synchronized_steps
from xmcgan_image_generation_tpu.utils.task_manager import TaskManager

tm = TaskManager(ckpt_dir)
if mode == "protocol":
  # Coordinator polls an initially-empty dir (heartbeats flow); a
  # committed checkpoint appears ~4s in, then TRAIN_DONE.
  if pid == 0:
    def add_later():
      time.sleep(4)
      step_dir = os.path.join(ckpt_dir, "5")
      os.makedirs(step_dir, exist_ok=True)
      open(os.path.join(step_dir, "_CHECKPOINT_METADATA"), "w").close()
      tm.mark_training_done()
    import threading
    threading.Thread(target=add_later, daemon=True).start()
  steps = list(_synchronized_steps(tm, timeout=60, heartbeat_interval=1.0))
  assert steps == [5], steps
  print(f"[sync proc {pid}] steps={steps}", flush=True)
elif mode == "dead_coordinator":
  # Process 0 dies mid-poll; the worker must fail fast, not hang.
  if pid == 0:
    def die():
      time.sleep(3)
      os._exit(17)
    import threading
    threading.Thread(target=die, daemon=True).start()
  list(_synchronized_steps(tm, timeout=120, heartbeat_interval=1.0,
                           worker_deadline=15.0))
  print(f"[sync proc {pid}] finished", flush=True)
"""


def _free_port():
  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()
  return port


def _worker_env():
  """Env for spawned worker processes: drop the parent's forced
  JAX_PLATFORMS (workers pick CPU themselves) and prepend the repo root
  to PYTHONPATH so workers import the package even without an editable
  install (worker scripts run from a tmp cwd)."""
  env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS",)}
  repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
  env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
  return env


@pytest.mark.slow
class TestMultiHostTraining:

  def test_two_process_train(self, tmp_path):
    workdir = str(tmp_path / "exp")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
      f.write(WORKER)
    port = str(_free_port())
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", port, workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
      assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
      assert f"[proc {pid}] done" in out

    # Process 0 wrote metrics; the checkpoint contains both data shards.
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
      rows = [json.loads(l) for l in f]
    assert any("d_loss" in r for r in rows)
    ckpt_step_dir = os.path.join(workdir, "checkpoints", "2")
    assert os.path.isdir(ckpt_step_dir)
    data_dir = os.path.join(ckpt_step_dir, "data_iter")
    shards = os.listdir(data_dir)
    assert "process_0-of-2.json" in shards
    assert "process_1-of-2.json" in shards
    assert os.path.exists(
        os.path.join(workdir, "checkpoints", "TRAIN_DONE"))


PREEMPT_WORKER = r"""
import os, sys
pid = int(sys.argv[1]); nproc = int(sys.argv[2]); port = sys.argv[3]
workdir = sys.argv[4]
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=2")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                           num_processes=nproc, process_id=pid)
import logging
logging.basicConfig(level=logging.INFO)
from xmcgan_image_generation_tpu import train as train_lib
from xmcgan_image_generation_tpu.configs import coco_xmc
config = coco_xmc.get_test_config()
config.num_train_steps = 100000       # far beyond what we let it run
config.batch_size = 8
config.eval_batch_size = 8
config.log_loss_every_steps = 2
config.eval_every_steps = 100000
config.checkpoint_every_steps = 100000
train_lib.train(config, workdir)
print(f"[proc {pid}] done", flush=True)
"""


@pytest.mark.slow
class TestMultiHostPreemption:

  def test_sigterm_on_one_process_stops_both_at_same_step(self, tmp_path):
    """Preemption gold test: SIGTERM only process 1; the marker protocol
    must bring BOTH processes to the same checkpointed stop step with a
    clean exit and no TRAIN_DONE."""
    import signal as _signal
    import time as _time

    workdir = str(tmp_path / "exp")
    script = str(tmp_path / "preempt_worker.py")
    with open(script, "w") as f:
      f.write(PREEMPT_WORKER)
    port = str(_free_port())
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", port, workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]
    try:
      metrics = os.path.join(workdir, "metrics.jsonl")
      deadline = _time.time() + 900
      while _time.time() < deadline:
        if (os.path.exists(metrics)
            and len(open(metrics).read().strip()) > 0):
          break
        if any(p.poll() is not None for p in procs):
          break
        _time.sleep(1.0)
      assert all(p.poll() is None for p in procs), "a worker died early"
      procs[1].send_signal(_signal.SIGTERM)
      outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    finally:
      for p in procs:
        if p.poll() is None:
          p.kill()
          p.communicate()
    for pid, (p, out) in enumerate(zip(procs, outs)):
      assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
      assert f"[proc {pid}] done" in out
      assert "Preempted: stopped and checkpointed" in out

    ckpt_dir = os.path.join(workdir, "checkpoints")
    steps = sorted(int(d) for d in os.listdir(ckpt_dir) if d.isdigit())
    assert len(steps) == 1, f"expected exactly one preemption save: {steps}"
    # Both processes committed their shard of the SAME step.
    data_dir = os.path.join(ckpt_dir, str(steps[0]), "data_iter")
    shards = os.listdir(data_dir)
    assert "process_0-of-2.json" in shards
    assert "process_1-of-2.json" in shards
    assert not os.path.exists(os.path.join(ckpt_dir, "TRAIN_DONE"))
    assert os.path.exists(os.path.join(workdir, "PREEMPT_STOP"))


@pytest.mark.slow
class TestSynchronizedSteps:
  """The eval service's coordinator/worker broadcast protocol, isolated
  from the heavy model/FID machinery (2 processes, 1 CPU device each)."""

  def _launch(self, tmp_path, mode):
    script = str(tmp_path / "sync_worker.py")
    with open(script, "w") as f:
      f.write(SYNC_WORKER)
    ckpt_dir = str(tmp_path / "ckpts")
    os.makedirs(ckpt_dir, exist_ok=True)
    port = str(_free_port())
    env = _worker_env()
    # 1 device per process: the protocol needs no SPMD compute.
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    return [
        subprocess.Popen(
            [sys.executable, script, str(pid), "2", port, ckpt_dir, mode],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for pid in range(2)
    ]

  def test_heartbeats_bound_collectives(self, tmp_path):
    """A checkpoint landing seconds after service start is synchronized to
    both processes; heartbeats keep every collective short meanwhile."""
    procs = self._launch(tmp_path, "protocol")
    outs = [p.communicate(timeout=180)[0].decode() for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
      assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
      assert f"[sync proc {pid}] steps=[5]" in out

  def test_dead_coordinator_fails_worker_fast(self, tmp_path):
    """If process 0 dies mid-poll the worker must exit with an error
    within its deadline instead of hanging in the broadcast."""
    import time as _time

    procs = self._launch(tmp_path, "dead_coordinator")
    t0 = _time.time()
    outs = []
    for p in procs:
      try:
        outs.append(p.communicate(timeout=120)[0].decode())
      except subprocess.TimeoutExpired:
        p.kill()
        outs.append(p.communicate()[0].decode())
        pytest.fail("worker hung after coordinator death:\n"
                    + outs[-1][-4000:])
    elapsed = _time.time() - t0
    assert procs[0].returncode == 17  # the staged coordinator death
    # The worker failed (any error is fine — our deadline RuntimeError or
    # the backend noticing the dead peer first), and did so promptly.
    assert procs[1].returncode != 0, outs[1][-4000:]
    assert "finished" not in outs[1]
    assert elapsed < 90, f"worker took {elapsed:.0f}s to fail"


@pytest.mark.slow
class TestMultiHostEvalService:

  def test_two_process_eval_service(self, tmp_path):
    """The reference's dual-job flow (train.sh then test.sh): a finished
    training workdir is scored by the continuous-eval service running as
    its own 2-process SPMD job (random-init Inception; values are not
    meaningful, the distributed protocol is what's under test)."""
    import csv

    workdir = str(tmp_path / "exp")
    # Stage 1: produce checkpoints + TRAIN_DONE with a 2-process train job
    # (same world size as the eval job, so the checkpoint layout matches
    # what a production multi-host run would hand the eval service).
    train_script = str(tmp_path / "train_worker.py")
    with open(train_script, "w") as f:
      f.write(WORKER)
    eval_script = str(tmp_path / "eval_worker.py")
    with open(eval_script, "w") as f:
      f.write(EVAL_WORKER)
    env = _worker_env()

    for script, name in ((train_script, "train"), (eval_script, "eval")):
      port = str(_free_port())
      procs = [
          subprocess.Popen(
              [sys.executable, script, str(pid), "2", port, workdir],
              stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
          for pid in range(2)
      ]
      try:
        # First 2-process eval compiles the Inception/FID graphs for the
        # 4-device topology on this 1-core box — generous timeout.
        outs = [p.communicate(timeout=1500)[0].decode() for p in procs]
      finally:
        for p in procs:
          if p.poll() is None:
            p.kill()
      for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"{name} proc {pid} failed:\n{out[-4000:]}"

    # The service scored the checkpoint and appended to scores.csv.
    scores_path = os.path.join(workdir, "checkpoints", "scores.csv")
    assert os.path.exists(scores_path)
    with open(scores_path) as f:
      rows = list(csv.DictReader(f))
    assert rows, "eval service wrote no results"
    assert rows[0]["step"] == "2"
    for col in ("eval/fid", "eval/inception_score", "eval/ema_fid"):
      assert col in rows[0] and rows[0][col] != ""
