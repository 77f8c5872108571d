"""End-to-end real-data runbook smoke: fabricated COCO-layout data through
preprocess (BERT embed + TFRecords) -> train -> continuous eval ->
scores.csv, all via tools/run_e2e.py exactly as a real-data run would go.
"""

import csv
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_smoke_runbook(tmp_path):
  workdir = str(tmp_path / "exp")
  proc = subprocess.run(
      [sys.executable, os.path.join(REPO, "tools", "run_e2e.py"),
       "--smoke", f"--workdir={workdir}"],
      capture_output=True, text=True, timeout=1800, cwd=REPO)
  assert proc.returncode == 0, proc.stderr[-4000:] + proc.stdout[-2000:]
  assert "e2e runbook done" in proc.stdout

  # Preprocess wrote reference-schema shards for both splits.
  records_dir = os.path.join(workdir, "records")
  assert glob.glob(os.path.join(records_dir, "coco2014_train.tfrecord-*"))
  assert glob.glob(os.path.join(
      records_dir, "coco2014_validation.tfrecord-*"))

  # Train finished and the eval service scored the checkpoint.
  assert os.path.exists(
      os.path.join(workdir, "checkpoints", "TRAIN_DONE"))
  with open(os.path.join(workdir, "checkpoints", "scores.csv")) as f:
    rows = list(csv.DictReader(f))
  assert rows and rows[0]["step"] == "2"
  assert float(rows[0]["eval/fid"]) >= 0.0
