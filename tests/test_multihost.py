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


def _free_port():
  s = socket.socket()
  s.bind(("127.0.0.1", 0))
  port = s.getsockname()[1]
  s.close()
  return port


@pytest.mark.slow
class TestMultiHostTraining:

  def test_two_process_train(self, tmp_path):
    workdir = str(tmp_path / "exp")
    script = str(tmp_path / "worker.py")
    with open(script, "w") as f:
      f.write(WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}
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
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS",)}

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
