"""Experiment services: checkpoint polling for the eval job + CSV results.

Capability parity with reference xmcgan/utils/task_manager.py:28-202:

* `TaskManager.unevaluated_checkpoints`: a generator that polls the train
  job's checkpoint directory (Orbax steps instead of tf.train checkpoint
  names), yields steps not yet evaluated, and terminates on timeout or the
  ``TRAIN_DONE`` marker.
* `TaskManagerWithCsvResults`: dedupes against and appends to
  ``scores.csv`` in the checkpoint directory.
"""

from __future__ import annotations

import csv
import io
import logging
import time
from typing import Dict, Iterable, Iterator, List, Optional, Set

from xmcgan_image_generation_tpu.utils import fileio

log = logging.getLogger("xmcgan_tpu")

TRAIN_DONE_MARKER = "TRAIN_DONE"


class TaskManager:
  """Tracks the status of a training task via its checkpoint directory."""

  def __init__(self, checkpoint_dir: str):
    # All paths ride the fileio seam, so --workdir=gs://... (or the
    # memory:// test fake) works like the reference's tf.io.gfile services
    # (reference utils/task_manager.py:35-87).
    self.checkpoint_dir = fileio.abspath(checkpoint_dir)

  @property
  def workdir(self) -> str:
    return fileio.dirname(self.checkpoint_dir)

  def mark_training_done(self) -> None:
    fileio.makedirs(self.checkpoint_dir, exist_ok=True)
    fileio.atomic_write(
        fileio.join(self.checkpoint_dir, TRAIN_DONE_MARKER),
        time.strftime("%Y-%m-%d %H:%M:%S"))

  def is_training_done(self) -> bool:
    return fileio.exists(fileio.join(self.checkpoint_dir,
                                     TRAIN_DONE_MARKER))

  # Commit markers Orbax writes into a finalized step directory, by
  # version/filesystem convention (local rename-commit metadata vs the
  # GCS-style commit-success file).
  _COMMIT_MARKERS = ("_CHECKPOINT_METADATA", "commit_success.txt")

  def _list_steps(self) -> List[int]:
    """Committed checkpoint steps, by filesystem listing only.

    Deliberately does NOT construct an Orbax manager: in a multiprocess
    JAX runtime that performs distributed barrier syncs, and the polling
    loop runs on process 0 alone (evaluate._synchronized_steps) — an
    asymmetric barrier deadlocks the service.  Orbax commits a step by
    atomically renaming its tmp directory to the bare step number, so a
    digit-named directory with a known commit marker is a committed step.
    If NO digit-named directory carries a known marker, the marker
    convention evidently differs (other Orbax version / filesystem) and we
    fall back to accepting all digit-named directories rather than idling
    forever; mixed listings log each skipped directory.
    """
    if not fileio.isdir(self.checkpoint_dir):
      return []
    marked, unmarked = [], []
    for name in fileio.listdir(self.checkpoint_dir):
      path = fileio.join(self.checkpoint_dir, name)
      if not (name.isdigit() and fileio.isdir(path)):
        continue
      if any(fileio.exists(fileio.join(path, m))
             for m in self._COMMIT_MARKERS):
        marked.append(int(name))
      else:
        unmarked.append(int(name))
    if not marked and unmarked:
      log.warning(
          "No checkpoint directory in %s carries a known commit marker %s; "
          "falling back to accepting all digit-named directories: %s",
          self.checkpoint_dir, self._COMMIT_MARKERS, sorted(unmarked))
      return sorted(unmarked)
    for step in unmarked:
      log.info("Skipping checkpoint dir %s/%d: no commit marker yet",
               self.checkpoint_dir, step)
    return sorted(marked)

  def unevaluated_checkpoints(
      self,
      timeout: int = 3600 * 8,
      num_batched_steps: int = 1,
      eval_every_steps: Optional[int] = None,
      poll_callback=None,
      poll_interval: float = 5.0,
  ) -> Iterator[int]:
    """Yields steps of not-yet-evaluated checkpoints as they appear.

    Polls every ``poll_interval`` seconds (reference
    utils/task_manager.py:99-157); returns when no new checkpoint has
    appeared within ``timeout`` seconds or training is marked done and
    everything is evaluated.  ``poll_callback``, when given, is invoked
    once per idle poll iteration — the hook multi-process services use to
    emit bounded-interval liveness heartbeats while waiting.
    """
    log.info("Looking for checkpoints in %s", self.checkpoint_dir)
    evaluated: Set[int] = set(self._evaluated_steps())
    last_eval = time.time()
    while True:
      unevaluated = [s for s in self._list_steps() if s not in evaluated]
      if eval_every_steps:
        unevaluated = [s for s in unevaluated
                       if s > 0 and s % eval_every_steps == 0]
      for step in unevaluated:
        evaluated.add(step)
        yield step
        last_eval = time.time()
      if self.is_training_done() and not unevaluated:
        log.info("Training is done; exiting checkpoint polling.")
        return
      if time.time() - last_eval > timeout:
        log.info("Timeout (%ds) waiting for new checkpoints; exiting.",
                 timeout)
        return
      if not unevaluated:
        if poll_callback is not None:
          poll_callback()
        time.sleep(poll_interval)

  def _evaluated_steps(self) -> Iterable[int]:
    return []


class TaskManagerWithCsvResults(TaskManager):
  """TaskManager that persists evaluation results in ``scores.csv``."""

  def __init__(self, checkpoint_dir: str,
               score_file: Optional[str] = None):
    super().__init__(checkpoint_dir)
    self._score_file = score_file or fileio.join(checkpoint_dir,
                                                 "scores.csv")

  def _evaluated_steps(self) -> List[int]:
    if not fileio.exists(self._score_file):
      return []
    with fileio.open(self._score_file) as f:
      return [int(row["step"]) for row in csv.DictReader(f)]

  def add_eval_result(self, step: int, result: Dict[str, float],
                      default_value: float = -1.0) -> None:
    result = {k: float(v) for k, v in result.items()}
    exists = fileio.exists(self._score_file)
    fieldnames = ["step"] + sorted(result)
    fileio.makedirs(fileio.dirname(self._score_file), exist_ok=True)
    buf = io.StringIO()
    writer = csv.DictWriter(buf, fieldnames=fieldnames,
                            restval=default_value,
                            extrasaction="ignore")
    if not exists:
      writer.writeheader()
    writer.writerow({"step": int(step), **result})
    fileio.append_text(self._score_file, buf.getvalue())
