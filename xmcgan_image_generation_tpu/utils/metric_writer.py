"""Metric / image writers and periodic progress reporting.

The TPU-native stand-in for `clu.metric_writers` + `clu.periodic_actions`
(reference xmcgan/train_utils.py:399-412): scalars go to a JSONL file (and
the log); image grids go to PNG files under ``{workdir}/images``.  Only
process 0 writes, the rest log.  `ReportProgress` emits steps/sec.
"""

from __future__ import annotations

import json
import logging
import time
from typing import Dict, Mapping, Optional

import numpy as np

from xmcgan_image_generation_tpu.utils import fileio
from xmcgan_image_generation_tpu.utils import image_utils

log = logging.getLogger("xmcgan_tpu")


class MetricWriter:
  """Writes scalar dicts to ``metrics.jsonl`` and images to PNGs.

  When ``tensorboard`` is set (the default) the same scalars and image
  grids are additionally written as TensorBoard event files (the
  reference's output format, train_utils.py:399-403), so TB dashboards
  pointed at the workdir keep working.
  """

  def __init__(self, workdir: str, just_logging: bool = False,
               tensorboard: bool = True):
    self.workdir = workdir
    self.just_logging = just_logging
    self._tb = None
    if not just_logging:
      fileio.makedirs(workdir, exist_ok=True)
      fileio.makedirs(fileio.join(workdir, "images"), exist_ok=True)
      self._f = fileio.AppendableFile(fileio.join(workdir, "metrics.jsonl"))
      if tensorboard:
        from xmcgan_image_generation_tpu.utils.tb_writer import (
            EventFileWriter,
        )

        self._tb = EventFileWriter(workdir)
    else:
      self._f = None

  def write_scalars(self, step: int, scalars: Mapping[str, float]) -> None:
    scalars = {k: float(v) for k, v in scalars.items()}
    log.info("step %d: %s", step,
             " ".join(f"{k}={v:.4f}" for k, v in scalars.items()))
    if self._f is not None:
      self._f.write(json.dumps({"step": int(step), **scalars}) + "\n")
      self._f.flush()
    if self._tb is not None:
      self._tb.write_scalars(step, scalars)
      self._tb.flush()

  def write_images(self, step: int,
                   images: Mapping[str, np.ndarray],
                   max_images: int = 64) -> None:
    if self._f is None:
      return
    for name, batch in images.items():
      path = fileio.join(self.workdir, "images",
                         f"{name}_{int(step):08d}.png")
      grid = image_utils.make_grid(np.asarray(batch), max_images)
      image_utils.save_image(grid, path)
      if self._tb is not None:
        self._tb.write_image(step, name, grid)
    if self._tb is not None:
      self._tb.flush()

  def write_hparams(self, hparams: Mapping) -> None:
    log.info("hparams: %s", dict(hparams))
    if self._f is not None:
      fileio.atomic_write(
          fileio.join(self.workdir, "hparams.json"),
          json.dumps({k: _jsonable(v) for k, v in dict(hparams).items()},
                     indent=2, default=str))

  def flush(self) -> None:
    if self._f is not None:
      self._f.flush()
    if self._tb is not None:
      self._tb.flush()

  def close(self) -> None:
    if self._f is not None:
      self._f.close()
    if self._tb is not None:
      self._tb.close()


def _jsonable(v):
  if isinstance(v, (bool, int, float, str, type(None))):
    return v
  return str(v)


class MetricAccumulator:
  """Running mean of per-step scalar metrics between writer flushes.

  Replaces the clu metrics Collection merge loop
  (reference train_utils.py:425-428); the in-step values are already
  global-batch means under GSPMD, so a host-side running mean suffices.
  """

  def __init__(self):
    self._sums: Dict[str, object] = {}
    self._count = 0

  def update(self, metrics: Mapping[str, object]) -> None:
    # Values may be live jax scalars: accumulate lazily (tiny async device
    # adds) and only force a host sync at flush time, so the step pipeline
    # is never blocked on metric readback.
    for k, v in metrics.items():
      self._sums[k] = v if k not in self._sums else self._sums[k] + v
    self._count += 1

  def compute_and_reset(self) -> Dict[str, float]:
    if not self._count:
      return {}
    out = {k: float(v) / self._count for k, v in self._sums.items()}
    self._sums, self._count = {}, 0
    return out


class Profile:
  """Captures an xprof device trace for a few steps.

  The clu.periodic_actions.Profile equivalent (reference
  train_utils.py:405-412): call once per step; at ``profile_step`` it
  starts `jax.profiler.start_trace(logdir)` and stops
  ``num_profile_steps`` later.  Traces land under ``{logdir}/plugins``.
  """

  def __init__(self, logdir: str, profile_step: int = 10,
               num_profile_steps: int = 5):
    self.logdir = logdir
    self.profile_step = profile_step
    self.num_profile_steps = num_profile_steps
    self._active = False
    self._done = False

  def __call__(self, step: int) -> None:
    import jax

    if self._done:
      return
    if not self._active and step == self.profile_step:
      jax.profiler.start_trace(self.logdir)
      self._active = True
    elif self._active and step >= self.profile_step + self.num_profile_steps:
      jax.profiler.stop_trace()
      self._active = False
      self._done = True
      log.info("Wrote xprof trace for steps %d-%d to %s",
               self.profile_step, step, self.logdir)


class ReportProgress:
  """Periodic steps/sec reporting (clu.periodic_actions.ReportProgress).

  When ``flops_per_step``/``images_per_step`` are provided (the train loop
  takes them from XLA cost analysis of the lowered step), each report also
  carries production-observability throughput: ``perf/images_per_sec`` and
  ``perf/tflops_per_sec_per_device`` — achieved model FLOP rate per device
  (divide by the part's peak for MFU)."""

  def __init__(self, every_steps: int = 100,
               num_train_steps: Optional[int] = None,
               writer: Optional[MetricWriter] = None,
               flops_per_step: Optional[float] = None,
               images_per_step: Optional[int] = None,
               num_devices: int = 1):
    self.every_steps = max(1, every_steps)
    self.num_train_steps = num_train_steps
    self.writer = writer
    self.flops_per_step = flops_per_step
    self.images_per_step = images_per_step
    self.num_devices = max(1, num_devices)
    self._last_time = time.monotonic()
    self._last_step: Optional[int] = None

  def __call__(self, step: int) -> None:
    if self._last_step is None:
      self._last_step, self._last_time = step, time.monotonic()
      return
    if step % self.every_steps:
      return
    now = time.monotonic()
    sps = (step - self._last_step) / max(now - self._last_time, 1e-9)
    frac = f", {step / self.num_train_steps:.1%}" if self.num_train_steps \
        else ""
    scalars = {"steps_per_sec": sps}
    perf = ""
    if self.images_per_step:
      scalars["perf/images_per_sec"] = sps * self.images_per_step
      perf += f", {scalars['perf/images_per_sec']:.1f} img/s"
    if self.flops_per_step:
      tfps = sps * self.flops_per_step / self.num_devices / 1e12
      scalars["perf/tflops_per_sec_per_device"] = tfps
      perf += f", {tfps:.1f} TFLOP/s/device"
    log.info("progress: step %d (%.3f steps/sec%s%s)", step, sps, perf,
             frac)
    if self.writer is not None:
      self.writer.write_scalars(step, scalars)
    self._last_step, self._last_time = step, now
