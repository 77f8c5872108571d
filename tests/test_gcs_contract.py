"""gcsfs-contract tests: the fileio seam driven through REAL gcsfs.

``memory://`` (tests/test_fileio.py) proves the service layer's call
graph; these tests prove the GCS *semantics* the framework depends on, by
pointing an actual ``gcsfs.GCSFileSystem`` at the in-process fake GCS
JSON-API server (tests/fake_gcs.py):

* the preemption arbiter: ``create_exclusive`` rides gcsfs
  ``pipe_file(mode="create")`` = an ``ifGenerationMatch=0`` upload, and a
  412 from the server surfaces as ``FileExistsError`` — first writer
  wins, loser sees False, content is the winner's;
* ``makedirs`` is a no-op on a bucket (no directories to create);
* polling liveness: gcsfs's default listings cache NEVER expires
  (``cache_timeout=None``) — the seam disables it, so checkpoint pollers
  see objects other hosts create, including after an eventual-listing
  lag window (reference utils/task_manager.py:123-177 polls GCS this
  same way via tf.io.gfile).
"""

import pytest

gcsfs = pytest.importorskip("gcsfs")

from fake_gcs import FakeGCSServer  # noqa: E402
from xmcgan_image_generation_tpu.utils import fileio  # noqa: E402


@pytest.fixture
def gcs():
  """A live fake-GCS endpoint wired into the seam as the ``gs`` scheme."""
  with FakeGCSServer() as server:
    fs = gcsfs.GCSFileSystem(
        token="anon", endpoint_url=server.endpoint,
        use_listings_cache=False, skip_instance_cache=True)
    old = fileio._FS_CACHE.get("gs")
    fileio._FS_CACHE["gs"] = fs
    try:
      yield server
    finally:
      if old is None:
        fileio._FS_CACHE.pop("gs", None)
      else:
        fileio._FS_CACHE["gs"] = old


def _base(server):
  return f"gs://{server.bucket}"


class TestSeamOnGcsfs:

  def test_roundtrip_exists_listdir_glob(self, gcs):
    base = _base(gcs)
    fileio.atomic_write(f"{base}/wd/a.txt", "hello")
    fileio.atomic_write(f"{base}/wd/b.txt", b"world")
    assert fileio.read_text(f"{base}/wd/a.txt") == "hello"
    assert fileio.read_bytes(f"{base}/wd/b.txt") == b"world"
    assert fileio.exists(f"{base}/wd/a.txt")
    assert not fileio.exists(f"{base}/wd/missing.txt")
    assert sorted(fileio.listdir(f"{base}/wd")) == ["a.txt", "b.txt"]
    assert fileio.glob(f"{base}/wd/*.txt") == [
        f"{base}/wd/a.txt", f"{base}/wd/b.txt"]
    assert fileio.isdir(f"{base}/wd")

  def test_open_read_through_gcsfs_file(self, gcs):
    base = _base(gcs)
    payload = b"x" * 10_000 + b"tail"
    fileio.atomic_write(f"{base}/wd/blob.bin", payload)
    with fileio.open(f"{base}/wd/blob.bin", "rb") as f:
      assert f.read() == payload

  def test_makedirs_is_noop(self, gcs):
    base = _base(gcs)
    fileio.makedirs(f"{base}/wd/deep/dir")  # must not raise
    assert gcs.objects() == {}  # and must not create objects

  def test_append_text_read_modify_write(self, gcs):
    base = _base(gcs)
    fileio.append_text(f"{base}/wd/scores.csv", "step,fid\n")
    fileio.append_text(f"{base}/wd/scores.csv", "100,12.5\n")
    assert fileio.read_text(f"{base}/wd/scores.csv") == \
        "step,fid\n100,12.5\n"

  def test_remove(self, gcs):
    base = _base(gcs)
    fileio.atomic_write(f"{base}/wd/x", b"1")
    fileio.remove(f"{base}/wd/x")
    assert not fileio.exists(f"{base}/wd/x")
    with pytest.raises(FileNotFoundError):
      fileio.remove(f"{base}/wd/x")


class TestPreemptionArbiter:
  """create_exclusive == ifGenerationMatch=0 upload; 412 == lost race."""

  def test_first_writer_wins(self, gcs):
    base = _base(gcs)
    marker = f"{base}/wd/PREEMPT_STOP"
    assert fileio.create_exclusive(marker, "step 120 host A") is True
    assert fileio.create_exclusive(marker, "step 125 host B") is False
    # The loser's content never lands: the winner's bytes are intact.
    assert fileio.read_text(marker) == "step 120 host A"

  def test_recreate_after_remove(self, gcs):
    base = _base(gcs)
    marker = f"{base}/wd/PREEMPT_STOP"
    assert fileio.create_exclusive(marker, "a") is True
    fileio.remove(marker)
    assert fileio.create_exclusive(marker, "b") is True
    assert fileio.read_text(marker) == "b"


class TestPollingLiveness:
  """Checkpoint pollers must see objects other hosts create."""

  def test_out_of_band_writes_visible(self, gcs):
    # With gcsfs's default infinite listings cache this FAILS: the first
    # listdir would pin the listing forever.  The seam disables the cache.
    base = _base(gcs)
    fileio.atomic_write(f"{base}/wd/ckpt/1/_CHECKPOINT_METADATA", b"{}")
    assert fileio.listdir(f"{base}/wd/ckpt") == ["1"]
    gcs.put_object("wd/ckpt/2/_CHECKPOINT_METADATA", b"{}")  # another host
    assert sorted(fileio.listdir(f"{base}/wd/ckpt")) == ["1", "2"]
    assert fileio.exists(f"{base}/wd/ckpt/2/_CHECKPOINT_METADATA")

  def test_task_manager_poll_survives_listing_lag(self, gcs):
    from xmcgan_image_generation_tpu.utils.task_manager import TaskManager

    base = _base(gcs)
    ckpt_dir = f"{base}/wd/checkpoints"
    gcs.put_object("wd/checkpoints/1/_CHECKPOINT_METADATA", b"{}")
    # Step 2 exists but is hidden from the next few LIST calls (the
    # eventual-listing quirk); GET-by-name already succeeds.
    gcs.put_object("wd/checkpoints/2/_CHECKPOINT_METADATA", b"{}")
    gcs.set_list_lag("wd/checkpoints/2/_CHECKPOINT_METADATA", 4)

    tm = TaskManager(ckpt_dir)
    got = []
    for step in tm.unevaluated_checkpoints(timeout=30, poll_interval=0.01):
      got.append(step)
      if step == 2:  # both seen: let the poller exit
        tm.mark_training_done()
    assert got == [1, 2]

  def test_train_done_marker_roundtrip(self, gcs):
    from xmcgan_image_generation_tpu.utils.task_manager import TaskManager

    tm = TaskManager(f"{_base(gcs)}/wd/checkpoints")
    assert not tm.is_training_done()
    tm.mark_training_done()
    assert tm.is_training_done()
