"""Filesystem-seam tests: the workdir service layer on a cloud-style backend.

The reference runs its task manager, scores.csv, and TRAIN_DONE marker on
GCS via tf.io.gfile (reference utils/task_manager.py:35-87,123-177;
train_utils.py:322).  This framework routes the same services through
`utils/fileio.py` — these tests exercise every seam primitive plus the
full service layer (task manager, preemption guard, metric/TB writers,
serving artifact writes) against fsspec's in-process ``memory://`` backend,
which shares the object-store semantics that matter: no real directories,
no append, atomicity only at whole-object granularity.
"""

import csv
import io
import json
import threading
import uuid

import numpy as np
import pytest

from xmcgan_image_generation_tpu.utils import fileio


@pytest.fixture
def mem_dir():
  """A unique memory:// prefix, wiped after the test (the memory
  filesystem's store is process-global)."""
  base = f"memory://fileio-{uuid.uuid4().hex[:12]}"
  yield base
  try:
    fileio.rmtree(base)
  except FileNotFoundError:
    pass


BACKENDS = ["posix", "memory"]


@pytest.fixture(params=BACKENDS)
def any_dir(request, tmp_path, mem_dir):
  if request.param == "posix":
    return str(tmp_path)
  return mem_dir


class TestSeamPrimitives:

  def test_scheme_split(self):
    assert fileio.split_scheme("gs://b/k/x.txt") == ("gs", "b/k/x.txt")
    assert fileio.split_scheme("/local/path")[0] is None
    assert fileio.is_remote("memory://a") and not fileio.is_remote("rel/p")

  def test_roundtrip(self, any_dir):
    path = fileio.join(any_dir, "sub", "a.txt")
    fileio.makedirs(fileio.dirname(path))
    fileio.atomic_write(path, "hello")
    assert fileio.exists(path)
    assert fileio.read_text(path) == "hello"
    assert fileio.read_bytes(path) == b"hello"
    fileio.atomic_write(path, "rewritten")  # atomic replace
    assert fileio.read_text(path) == "rewritten"
    assert fileio.listdir(fileio.join(any_dir, "sub")) == ["a.txt"]
    assert fileio.isdir(fileio.join(any_dir, "sub"))
    assert not fileio.isdir(path)
    got = fileio.glob(fileio.join(any_dir, "sub", "*.txt"))
    assert got == [path]
    fileio.remove(path)
    assert not fileio.exists(path)
    with pytest.raises(FileNotFoundError):
      fileio.read_text(path)

  def test_append_text(self, any_dir):
    path = fileio.join(any_dir, "log.csv")
    fileio.append_text(path, "a,b\n")
    fileio.append_text(path, "1,2\n")
    assert fileio.read_text(path) == "a,b\n1,2\n"

  def test_create_exclusive_first_writer_wins(self, any_dir):
    path = fileio.join(any_dir, "MARKER")
    assert fileio.create_exclusive(path, "first") is True
    assert fileio.create_exclusive(path, "second") is False
    assert fileio.read_text(path) == "first"
    # After removal the slot opens again.
    fileio.remove(path)
    assert fileio.create_exclusive(path, "third") is True
    assert fileio.read_text(path) == "third"

  def test_create_exclusive_concurrent(self, any_dir):
    """N racing writers: exactly one wins and content is a full message."""
    path = fileio.join(any_dir, "RACE")
    wins = []
    def attempt(i):
      if fileio.create_exclusive(path, f"writer-{i}"):
        wins.append(i)
    threads = [threading.Thread(target=attempt, args=(i,))
               for i in range(8)]
    for t in threads:
      t.start()
    for t in threads:
      t.join()
    assert len(wins) == 1
    assert fileio.read_text(path) == f"writer-{wins[0]}"

  def test_appendable_file(self, any_dir):
    path = fileio.join(any_dir, "metrics.jsonl")
    f = fileio.AppendableFile(path)
    f.write("l1\n")
    f.flush()
    assert fileio.read_text(path) == "l1\n"
    f.write("l2\n")
    f.close()
    # A second handle picks up existing content (job restart).
    f2 = fileio.AppendableFile(path)
    f2.write("l3\n")
    f2.close()
    assert fileio.read_text(path) == "l1\nl2\nl3\n"

  def test_remote_append_mode_rejected(self, mem_dir):
    with pytest.raises(ValueError):
      fileio.open(fileio.join(mem_dir, "x"), "a")

  def test_binary_open(self, any_dir):
    path = fileio.join(any_dir, "blob.bin")
    with fileio.open(path, "wb") as f:
      f.write(b"\x00\x01\x02")
    with fileio.open(path, "rb") as f:
      assert f.read() == b"\x00\x01\x02"


class TestServicesOnObjectStore:
  """The full workdir service layer against the memory:// fake."""

  def test_task_manager(self, mem_dir):
    from xmcgan_image_generation_tpu.utils.task_manager import (
        TaskManagerWithCsvResults,
    )

    ckpt_dir = fileio.join(mem_dir, "checkpoints")
    tm = TaskManagerWithCsvResults(ckpt_dir)
    assert not tm.is_training_done()
    assert tm._list_steps() == []

    # Simulate Orbax-committed step directories (digit dir + marker).
    for step in (100, 200):
      d = fileio.join(ckpt_dir, str(step))
      fileio.makedirs(d)
      fileio.atomic_write(fileio.join(d, "commit_success.txt"), "ok")
    assert tm._list_steps() == [100, 200]

    tm.add_eval_result(100, {"eval/fid": 12.5})
    tm.mark_training_done()
    assert tm.is_training_done()
    # Fresh manager dedupes against the CSV and drains on TRAIN_DONE.
    tm2 = TaskManagerWithCsvResults(ckpt_dir)
    assert tm2._evaluated_steps() == [100]
    assert list(tm2.unevaluated_checkpoints(timeout=5)) == [200]

    with fileio.open(fileio.join(ckpt_dir, "scores.csv")) as f:
      rows = list(csv.DictReader(f))
    assert rows[0]["step"] == "100"
    assert float(rows[0]["eval/fid"]) == 12.5

  def test_preemption_guard(self, mem_dir):
    from xmcgan_image_generation_tpu.utils.preemption import (
        MARKER, PreemptionGuard,
    )

    fileio.makedirs(mem_dir)
    g0 = PreemptionGuard(mem_dir, initial_step=10, process_index=0)
    g1 = PreemptionGuard(mem_dir, initial_step=10, process_index=1)
    # Signal reaches only process 0 at step 12.
    g0.request_stop()
    assert not g0.should_stop(12)  # target = 14
    target = int(fileio.read_text(fileio.join(mem_dir, MARKER)))
    assert target == 14
    # Process 1 (never signaled) reads the shared marker and agrees.
    assert not g1.should_stop(13)
    assert g1.should_stop(14)
    assert g0.should_stop(14)
    g0.cleanup()
    assert not fileio.exists(fileio.join(mem_dir, MARKER))

  def test_preemption_stale_marker_recovery(self, mem_dir):
    from xmcgan_image_generation_tpu.utils.preemption import (
        MARKER, PreemptionGuard,
    )

    fileio.makedirs(mem_dir)
    # A stale marker from a previous incarnation (target 5 < initial 50).
    fileio.atomic_write(fileio.join(mem_dir, MARKER), "5")
    g = PreemptionGuard(mem_dir, initial_step=50, process_index=0)
    g.install()  # process 0 clears the stale marker
    g.uninstall()
    assert not fileio.exists(fileio.join(mem_dir, MARKER))
    g.request_stop()
    assert not g.should_stop(60)
    assert int(fileio.read_text(fileio.join(mem_dir, MARKER))) == 62

  def test_metric_writer(self, mem_dir):
    from xmcgan_image_generation_tpu.utils.metric_writer import MetricWriter

    w = MetricWriter(mem_dir)
    w.write_scalars(1, {"loss": 2.5})
    w.write_scalars(2, {"loss": 2.0})
    w.write_images(2, {"gen": np.random.default_rng(0).uniform(
        0, 1, (4, 8, 8, 3)).astype(np.float32)})
    w.write_hparams({"lr": 1e-4, "arch": "xmc_net"})
    w.flush()
    w.close()

    rows = [json.loads(l) for l in
            fileio.read_text(fileio.join(mem_dir, "metrics.jsonl"))
            .splitlines()]
    assert rows == [{"step": 1, "loss": 2.5}, {"step": 2, "loss": 2.0}]
    assert json.loads(fileio.read_text(
        fileio.join(mem_dir, "hparams.json")))["arch"] == "xmc_net"
    pngs = fileio.glob(fileio.join(mem_dir, "images", "*.png"))
    assert len(pngs) == 1
    from PIL import Image
    img = Image.open(io.BytesIO(fileio.read_bytes(pngs[0])))
    assert img.size == (16, 16)
    # TensorBoard event file landed remotely too (uploaded on close).
    events = fileio.glob(fileio.join(mem_dir, "events.out.tfevents.*"))
    assert len(events) == 1
    assert len(fileio.read_bytes(events[0])) > 0

  def test_tb_events_parse_from_object_store(self, mem_dir):
    """Event files written to the object store must still parse with TF's
    summary iterator (download + parse — the framing survives the remote
    buffered writer)."""
    tf = pytest.importorskip("tensorflow")
    from xmcgan_image_generation_tpu.utils.tb_writer import EventFileWriter

    w = EventFileWriter(mem_dir)
    w.write_scalars(7, {"fid": 11.0})
    w.close()
    data = fileio.read_bytes(w.path)
    local = tf.io.gfile.join  # noqa: F841 (tf import check only)
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
      p = os.path.join(d, "events.out.tfevents.test")
      with open(p, "wb") as f:
        f.write(data)
      events = list(tf.compat.v1.train.summary_iterator(p))
    assert events[0].file_version == "brain.Event:2"
    scalars = {v.tag: (e.step, v.simple_value)
               for e in events for v in e.summary.value}
    assert scalars["fid"] == (7, 11.0)
