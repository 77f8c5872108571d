"""Preemption-safe training: SIGTERM -> agreed stop step -> checkpoint.

TPU pods get preempted (maintenance events, spot reclamation); the host
receives SIGTERM with a grace window.  The reference's only recovery is
restart-from-last-periodic-checkpoint (reference train_utils.py:372-376),
losing up to ``checkpoint_every_steps`` of work.  This module checkpoints
*at the preemption point* instead.

Multi-process correctness is the hard part: an Orbax save is a collective,
so every process must save at the SAME step, but the signal may reach only
some processes, at different loop positions.  Adding a per-step collective
to agree would be wasteful (and brittle on slow backends — see
docs/design.md "Multi-process evaluation").  Instead, agreement rides the
shared workdir filesystem (the same assumption the checkpoint dir, CSV
results, and TRAIN_DONE marker already make):

  1. Any signaled process computes ``target = current_step + margin`` and
     writes it to ``PREEMPT_STOP`` with O_EXCL — first writer wins, so all
     processes read one target.
  2. Every process polls the marker each step (one stat(2); ~microseconds
     against a ~250 ms step) and stops exactly when ``step >= target``.
     SPMD lockstep (the per-step gradient all-reduce) bounds cross-process
     skew to one step, so ``margin=2`` guarantees no process has already
     passed the target when the marker appears.
  3. A marker whose target precedes this run's ``initial_step`` is stale
     (left by the previous preemption) and is removed by process 0.

The stop is graceful: the train loop saves at the agreed step and returns
WITHOUT marking TRAIN_DONE, so the eval service keeps polling and the
restarted job resumes exactly where it stopped (params + data iterator).
"""

from __future__ import annotations

import logging
import signal
import threading
from typing import Optional

from xmcgan_image_generation_tpu.utils import fileio

log = logging.getLogger("xmcgan_tpu")

MARKER = "PREEMPT_STOP"


class PreemptionGuard:
  """Coordinates a graceful, step-aligned stop across SPMD processes.

  Usage::

      guard = PreemptionGuard(workdir, initial_step)
      guard.install()
      try:
        for step in ...:
          ...
          if guard.should_stop(step):
            save_checkpoint(step); break
      finally:
        guard.uninstall()
  """

  def __init__(self, workdir: str, initial_step: int, *, margin: int = 2,
               process_index: int = 0):
    self._path = fileio.join(workdir, MARKER)
    self._initial_step = initial_step
    self._margin = margin
    self._signaled = threading.Event()
    self._old_handler = None
    self._installed = False
    # Cleared by process 0 in install(); other processes treat stale
    # targets as absent (they can't safely race the deletion).
    self._process_index = process_index

  # -- signal plumbing ----------------------------------------------------

  def install(self) -> None:
    """Registers the SIGTERM handler; clears a stale marker (process 0).

    Only the main thread may set signal handlers; elsewhere (e.g. tests
    driving train() from a worker thread) the guard still works via
    :meth:`request_stop` / the marker file.
    """
    if self._process_index == 0:
      stale = self._read_target()
      if stale is not None and stale < self._initial_step:
        try:
          fileio.remove(self._path)
          log.info("Removed stale %s (target %d < initial step %d)",
                   MARKER, stale, self._initial_step)
        except OSError:
          pass
    if threading.current_thread() is threading.main_thread():
      self._old_handler = signal.signal(signal.SIGTERM, self._on_signal)
      self._installed = True

  def uninstall(self) -> None:
    if self._installed:
      signal.signal(signal.SIGTERM, self._old_handler)
      self._installed = False

  def _on_signal(self, signum, frame) -> None:  # noqa: ARG002
    # Async-signal-safe: only set a flag; all I/O happens on the loop.
    self._signaled.set()

  def request_stop(self) -> None:
    """Programmatic preemption (tests, external orchestrators)."""
    self._signaled.set()

  # -- marker protocol ----------------------------------------------------

  def _read_target(self) -> Optional[int]:
    try:
      return int(fileio.read_text(self._path).strip())
    except (OSError, ValueError):
      return None

  def _write_target(self, step: int, _retry: bool = True) -> None:
    target = step + self._margin
    try:
      # Atomic create-if-absent via the fileio seam: O_EXCL temp + link on
      # POSIX, an ifGenerationMatch=0 upload on GCS.  First publisher
      # wins, and a concurrent reader never sees a half-written target.
      won = fileio.create_exclusive(self._path, str(target))
    except OSError as e:
      # A transient fs error must not crash the trainer; the signal flag
      # re-arms so the next step retries the write.
      log.warning("Preemption marker write failed (%s); retrying next "
                  "step", e)
      self._signaled.set()
      return
    if not won:
      # A marker already exists.  If it is a LIVE target a peer won the
      # race — done.  If it is a STALE leftover (install()'s cleanup
      # failed or raced), it would swallow this signal forever: remove
      # it and retry once.
      existing = self._read_target()
      if (_retry and existing is not None
          and existing < self._initial_step):
        try:
          fileio.remove(self._path)
        except OSError:
          pass
        self._write_target(step, _retry=False)
      return
    log.info("Preemption signal at step %d: stop agreed at step %d",
             step, target)

  def cleanup(self) -> None:
    """Removes any marker after a NORMAL completion (process 0 only).

    A signal that landed within ``margin`` of the final step leaves a
    live target behind; without cleanup the next (extending) run would
    phantom-stop on it."""
    if self._process_index != 0:
      return
    try:
      fileio.remove(self._path)
      log.info("Removed %s after normal completion", MARKER)
    except OSError:
      pass

  def should_stop(self, step: int) -> bool:
    """True when this step is the agreed preemption-save point."""
    if self._signaled.is_set():
      self._signaled.clear()
      self._write_target(step)
    target = self._read_target()
    if target is None or target < self._initial_step:
      return False  # No marker, or stale leftover not yet cleaned.
    return step >= target
