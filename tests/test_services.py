"""Service-layer tests: task manager polling/CSV, metric writers, image
grids, checkpoint manager."""

import csv
import json
import os
import threading
import time

import numpy as np
import pytest

from xmcgan_image_generation_tpu.utils import image_utils
from xmcgan_image_generation_tpu.utils.metric_writer import (
    MetricAccumulator,
    MetricWriter,
    ReportProgress,
)
from xmcgan_image_generation_tpu.utils.task_manager import (
    TaskManager,
    TaskManagerWithCsvResults,
)


class TestTaskManager:

  def test_train_done_marker(self, tmp_path):
    tm = TaskManager(str(tmp_path / "ckpts"))
    assert not tm.is_training_done()
    tm.mark_training_done()
    assert tm.is_training_done()

  def test_polling_yields_new_steps_and_exits_on_done(self, tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    tm = TaskManagerWithCsvResults(ckpt_dir)

    # Simulate a training job writing orbax-style step dirs.
    from xmcgan_image_generation_tpu.utils.checkpoint import (
        CheckpointManager,
    )
    mngr = CheckpointManager(ckpt_dir, with_data_iter=False)
    mngr.save(1, {"x": np.zeros(2)})
    mngr.wait_until_finished()

    seen = []
    def poll():
      for step in tm.unevaluated_checkpoints(timeout=30):
        seen.append(step)
        tm.add_eval_result(step, {"eval/fid": 1.0 * step})

    t = threading.Thread(target=poll)
    t.start()
    time.sleep(1)
    mngr.save(2, {"x": np.ones(2)})
    mngr.wait_until_finished()
    time.sleep(6)  # One poll cycle.
    tm.mark_training_done()
    t.join(timeout=30)
    assert not t.is_alive()
    assert seen == [1, 2]
    mngr.close()

    # CSV dedupe: a fresh manager skips evaluated steps.
    tm2 = TaskManagerWithCsvResults(ckpt_dir)
    assert sorted(tm2._evaluated_steps()) == [1, 2]
    remaining = list(tm2.unevaluated_checkpoints(timeout=1))
    assert remaining == []

  def test_eval_every_steps_filter(self, tmp_path):
    ckpt_dir = str(tmp_path / "ckpts")
    from xmcgan_image_generation_tpu.utils.checkpoint import (
        CheckpointManager,
    )
    mngr = CheckpointManager(ckpt_dir, with_data_iter=False)
    for step in (1, 2, 4):
      mngr.save(step, {"x": np.zeros(1)})
    mngr.wait_until_finished()
    mngr.close()
    tm = TaskManagerWithCsvResults(ckpt_dir)
    tm.mark_training_done()
    steps = list(tm.unevaluated_checkpoints(timeout=5, eval_every_steps=2))
    assert steps == [2, 4]

  def test_marker_fallback_and_mixed_listing(self, tmp_path):
    """Unknown commit-marker conventions must not leave the service idle:
    when NO digit dir carries a known marker, all digit dirs are accepted;
    when some do, unmarked dirs are skipped (still being committed)."""
    ckpt_dir = tmp_path / "ckpts"
    for step in (3, 7):
      (ckpt_dir / str(step)).mkdir(parents=True)
      (ckpt_dir / str(step) / "state").mkdir()
    tm = TaskManager(str(ckpt_dir))
    # No known markers anywhere -> fallback accepts both.
    assert tm._list_steps() == [3, 7]
    # GCS-style commit marker is recognized as a marker convention...
    (ckpt_dir / "7" / "commit_success.txt").write_text("ok")
    # ...so the unmarked dir 3 is now treated as still-uncommitted.
    assert tm._list_steps() == [7]
    (ckpt_dir / "3" / "_CHECKPOINT_METADATA").write_text("{}")
    assert tm._list_steps() == [3, 7]

  def test_csv_format(self, tmp_path):
    tm = TaskManagerWithCsvResults(str(tmp_path / "c"))
    tm.add_eval_result(5, {"eval/fid": 12.5, "eval/is": 3.0})
    tm.add_eval_result(10, {"eval/fid": 11.0, "eval/is": 4.0})
    with open(os.path.join(str(tmp_path / "c"), "scores.csv")) as f:
      rows = list(csv.DictReader(f))
    assert rows[0]["step"] == "5"
    assert float(rows[1]["eval/fid"]) == 11.0


class TestMetricWriter:

  def test_scalars_jsonl(self, tmp_path):
    w = MetricWriter(str(tmp_path))
    w.write_scalars(1, {"loss": 2.5})
    w.write_scalars(2, {"loss": 2.0})
    w.flush()
    with open(os.path.join(str(tmp_path), "metrics.jsonl")) as f:
      rows = [json.loads(l) for l in f]
    assert rows == [{"step": 1, "loss": 2.5}, {"step": 2, "loss": 2.0}]

  def test_tensorboard_events_readable_by_tf(self, tmp_path):
    """Our hand-encoded event files must parse with TensorFlow's own
    summary iterator (which also validates the masked-crc framing)."""
    tf = pytest.importorskip("tensorflow")
    import glob

    w = MetricWriter(str(tmp_path))
    w.write_scalars(3, {"loss": 1.5, "acc": 0.25})
    rng = np.random.default_rng(0)
    batch = rng.uniform(0, 1, (4, 8, 8, 3)).astype(np.float32)
    w.write_images(3, {"generated": batch})
    w.close()

    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(tf.compat.v1.train.summary_iterator(files[0]))
    assert events[0].file_version == "brain.Event:2"
    scalars = {v.tag: (e.step, v.simple_value)
               for e in events for v in e.summary.value
               if v.HasField("simple_value")}
    assert scalars["loss"] == (3, 1.5)
    assert scalars["acc"] == (3, 0.25)
    images = [(e.step, v.tag, v.image) for e in events
              for v in e.summary.value if v.HasField("image")]
    assert len(images) == 1
    step, tag, img = images[0]
    assert (step, tag) == (3, "generated")
    # 4 images of 8x8 tile into a 16x16 grid.
    assert (img.height, img.width, img.colorspace) == (16, 16, 3)
    decoded = tf.io.decode_png(img.encoded_image_string).numpy()
    grid = image_utils.make_grid(batch)
    np.testing.assert_array_equal(
        decoded, np.clip(grid * 255.0 + 0.5, 0, 255).astype(np.uint8))

  def test_just_logging_writes_nothing(self, tmp_path):
    w = MetricWriter(str(tmp_path / "x"), just_logging=True)
    w.write_scalars(1, {"a": 1.0})
    w.write_images(1, {"img": np.zeros((2, 4, 4, 3))})
    assert not os.path.exists(str(tmp_path / "x"))

  def test_profile_hook_writes_trace(self, tmp_path):
    from xmcgan_image_generation_tpu.utils.metric_writer import Profile
    import glob
    import jax
    import jax.numpy as jnp

    hook = Profile(str(tmp_path), profile_step=1, num_profile_steps=1)
    for step in range(1, 4):
      jax.jit(lambda x: x * 2)(jnp.ones((4,))).block_until_ready()
      hook(step)
    assert hook._done
    assert glob.glob(str(tmp_path / "plugins" / "profile" / "*")), \
        "no xprof trace written"

  def test_accumulator_running_mean(self):
    acc = MetricAccumulator()
    acc.update({"a": 1.0, "b": 10.0})
    acc.update({"a": 3.0, "b": 20.0})
    out = acc.compute_and_reset()
    assert out == {"a": 2.0, "b": 15.0}
    assert acc.compute_and_reset() == {}

  def test_report_progress_runs(self, caplog):
    rp = ReportProgress(every_steps=2)
    rp(1)
    rp(2)  # Should log without error.

  def test_report_progress_perf_scalars(self, tmp_path):
    """FLOPs/images per step turn into perf/* scalars in the writer."""
    import json as _json

    from xmcgan_image_generation_tpu.utils.metric_writer import MetricWriter

    writer = MetricWriter(str(tmp_path))
    rp = ReportProgress(every_steps=1, writer=writer,
                        flops_per_step=2e12, images_per_step=100,
                        num_devices=2)
    rp(1)   # primes the timer
    rp(2)
    writer.flush()
    with open(tmp_path / "metrics.jsonl") as f:
      rows = [_json.loads(l) for l in f]
    row = rows[-1]
    sps = row["steps_per_sec"]
    assert row["perf/images_per_sec"] == pytest.approx(100 * sps)
    assert row["perf/tflops_per_sec_per_device"] == pytest.approx(
        sps * 2e12 / 2 / 1e12)


class TestImageGrid:

  def test_make_grid_square(self):
    images = np.arange(4 * 2 * 2 * 3, dtype=np.float32).reshape(4, 2, 2, 3)
    grid = image_utils.make_grid(images, 4)
    assert grid.shape == (4, 4, 3)
    np.testing.assert_array_equal(grid[:2, :2], images[0])
    np.testing.assert_array_equal(grid[:2, 2:], images[1])
    np.testing.assert_array_equal(grid[2:, :2], images[2])

  def test_make_grid_pads_non_square(self):
    images = np.ones((3, 2, 2, 1), np.float32)
    grid = image_utils.make_grid(images, 8)
    assert grid.shape == (4, 4, 1)
    assert grid[2:, 2:].sum() == 0  # Padding tile.

  def test_save_image(self, tmp_path):
    from PIL import Image
    path = str(tmp_path / "g.png")
    image_utils.save_image(np.random.rand(4, 8, 8, 3), path)
    img = Image.open(path)
    assert img.size == (16, 16)
