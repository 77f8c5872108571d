"""Filesystem seam: POSIX fast path + fsspec backends (gs://, memory://).

The reference runs every workdir service on cloud storage via
``tf.io.gfile`` — checkpoint discovery, ``scores.csv``, the ``TRAIN_DONE``
marker (reference xmcgan/utils/task_manager.py:35,65,82,87,123-177;
train_utils.py:322) — so ``--workdir=gs://...`` works on a TPU pod whose
hosts share no filesystem.  This framework keeps TensorFlow out of the
runtime; cloud workdirs ride **fsspec** (gcsfs for ``gs://``) behind this
seam instead.  Orbax already speaks gs:// natively for the checkpoints
themselves; this module covers everything else in the workdir.

Design rules:

* Scheme-less paths take a plain ``os`` fast path — zero new overhead or
  failure modes for the common local case.
* ``scheme://`` paths resolve to an fsspec filesystem (cached per scheme).
  ``memory://`` is the in-process fake used by the service-layer tests.
* All functions accept and return FULL urlpaths (scheme preserved), so
  callers can treat paths as opaque strings.
* Object-store semantics are first-class, not emulated:
  - :func:`atomic_write` is tmp+rename on POSIX and a single-shot object
    PUT on stores (readers never observe partial content in either case);
  - :func:`create_exclusive` (atomic create-if-absent — the preemption
    marker's first-writer-wins arbiter) is O_EXCL+link on POSIX and a
    generation-0 precondition PUT on GCS (``pipe_file(mode="create")``);
  - :func:`append_text` — object stores cannot append, so remote appends
    are read-modify-atomic-write (the CSV/JSONL files this serves are
    small and appended at human timescales).
"""

from __future__ import annotations

import builtins
import glob as _glob
import logging
import os
import posixpath
import shutil
import threading
from typing import IO, List, Optional, Tuple

log = logging.getLogger("xmcgan_tpu")

_SEP = "://"

# One lock serializes compound read-modify-write operations against
# in-process backends (memory://); real object stores arbitrate server-side.
_LOCAL_LOCK = threading.Lock()


def split_scheme(path: str) -> Tuple[Optional[str], str]:
  """``"gs://b/k" -> ("gs", "b/k")``; plain paths -> ``(None, path)``."""
  if _SEP in path:
    scheme, rest = path.split(_SEP, 1)
    # Windows drive letters / odd colons never reach here (single-char
    # schemes are not urlpaths fsspec accepts).
    if scheme and scheme.isalnum() and len(scheme) > 1:
      return scheme, rest
  return None, path


def is_remote(path: str) -> bool:
  return split_scheme(path)[0] is not None


_FS_CACHE = {}


def _fs(path: str):
  """The fsspec filesystem for ``path``'s scheme (cached).

  Listings caching is disabled: with gcsfs's default
  ``cache_timeout=None`` the directory-listing cache NEVER expires, so
  a polling service (the task manager waiting for new checkpoint steps,
  the evaluator watching for ``TRAIN_DONE``) would read the first
  listing forever and miss every checkpoint written after it.  The seam
  serves small bookkeeping directories at human polling intervals, so
  fresh listings cost nothing; staleness here is a liveness bug
  (tests/test_gcs_contract.py pins this against real gcsfs).
  """
  scheme = split_scheme(path)[0]
  assert scheme is not None, path
  fs = _FS_CACHE.get(scheme)
  if fs is None:
    import fsspec

    fs = fsspec.filesystem(scheme, use_listings_cache=False)
    _FS_CACHE[scheme] = fs
  return fs


def _with_scheme(scheme: str, stripped: str) -> str:
  return f"{scheme}{_SEP}{stripped.lstrip('/') if scheme == 'memory' else stripped}"


# -- path algebra (scheme-aware) --------------------------------------------


def join(base: str, *parts: str) -> str:
  if is_remote(base):
    return posixpath.join(base, *parts)
  return os.path.join(base, *parts)


def dirname(path: str) -> str:
  if is_remote(path):
    return posixpath.dirname(path)
  return os.path.dirname(path)


def basename(path: str) -> str:
  if is_remote(path):
    return posixpath.basename(path.rstrip("/"))
  return os.path.basename(path)


def abspath(path: str) -> str:
  """``os.path.abspath`` for local paths; remote urlpaths are already
  absolute."""
  if is_remote(path):
    return path
  return os.path.abspath(path)


# -- predicates & listing ----------------------------------------------------


def exists(path: str) -> bool:
  if not is_remote(path):
    return os.path.exists(path)
  return _fs(path).exists(path)


def isdir(path: str) -> bool:
  if not is_remote(path):
    return os.path.isdir(path)
  return _fs(path).isdir(path)


def listdir(path: str) -> List[str]:
  """Child NAMES (like ``os.listdir``), directory markers stripped."""
  if not is_remote(path):
    return os.listdir(path)
  fs = _fs(path)
  out = []
  for child in fs.ls(path, detail=False):
    name = posixpath.basename(child.rstrip("/"))
    if name:
      out.append(name)
  return out


def glob(pattern: str) -> List[str]:
  """Glob returning full urlpaths (scheme preserved for remote)."""
  if not is_remote(pattern):
    return sorted(_glob.glob(pattern))
  scheme = split_scheme(pattern)[0]
  return sorted(_with_scheme(scheme, p) for p in _fs(pattern).glob(pattern))


# -- mutation ----------------------------------------------------------------


def makedirs(path: str, exist_ok: bool = True) -> None:
  if not is_remote(path):
    os.makedirs(path, exist_ok=exist_ok)
    return
  # Object stores have no directories; creating one is a no-op (gcsfs
  # makedirs just validates the bucket).  memory:// tracks pseudo-dirs.
  try:
    _fs(path).makedirs(path, exist_ok=exist_ok)
  except FileExistsError:
    if not exist_ok:
      raise


def remove(path: str) -> None:
  if not is_remote(path):
    os.remove(path)
    return
  try:
    _fs(path).rm_file(path)
  except FileNotFoundError:
    raise
  except OSError:
    raise


def rmtree(path: str) -> None:
  if not is_remote(path):
    shutil.rmtree(path)
    return
  _fs(path).rm(path, recursive=True)


def rename(src: str, dst: str) -> None:
  """Replace-on-collision rename.  POSIX renames are atomic; object-store
  "renames" are copy+delete (NOT atomic — use :func:`atomic_write` when
  publish atomicity matters)."""
  if not is_remote(src):
    os.replace(src, dst)
    return
  fs = _fs(src)
  fs.copy(src, dst)
  fs.rm_file(src)


# -- file access --------------------------------------------------------------


def open(path: str, mode: str = "r", **kwargs) -> IO:  # noqa: A001
  """Opens local files via builtin ``open``; remote via fsspec.

  Remote writes buffer locally and upload on close (multi-part above the
  block size) — the same durability contract ``tf.io.gfile`` gives.
  Remote ``"a"`` modes are rejected; use :func:`append_text` (object
  stores cannot append).
  """
  if not is_remote(path):
    return builtins.open(path, mode, **kwargs)
  if "a" in mode:
    raise ValueError(
        f"append mode not supported on object stores ({path!r}); "
        "use fileio.append_text")
  if "x" in mode:
    raise ValueError(
        f"exclusive-create open not supported remotely ({path!r}); "
        "use fileio.create_exclusive")
  return _fs(path).open(path, mode, **kwargs)


def read_bytes(path: str) -> bytes:
  with open(path, "rb") as f:
    return f.read()


def read_text(path: str) -> str:
  with open(path, "r") as f:
    return f.read()


def atomic_write(path: str, data) -> None:
  """Full-content publish: readers see the old content or all of the new,
  never a prefix.

  POSIX: temp file in the target directory + ``os.replace``.  Object
  stores: a single PUT — objects become visible only once fully written.
  """
  if isinstance(data, str):
    data = data.encode("utf-8")
  if not is_remote(path):
    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    with builtins.open(tmp, "wb") as f:
      f.write(data)
    os.replace(tmp, path)
    return
  _fs(path).pipe_file(path, data)


def append_text(path: str, text: str) -> None:
  """Appends to a small text file (CSV rows, JSONL lines).

  POSIX appends natively.  Object stores cannot append, so the remote
  branch is read + concatenate + :func:`atomic_write` — correct and
  simple for the ~KB bookkeeping files this seam serves; not for bulk
  data.
  """
  if not is_remote(path):
    with builtins.open(path, "a") as f:
      f.write(text)
    return
  with _LOCAL_LOCK:
    try:
      existing = read_bytes(path)
    except FileNotFoundError:
      existing = b""
    _fs(path).pipe_file(path, existing + text.encode("utf-8"))


def create_exclusive(path: str, data) -> bool:
  """Atomically creates ``path`` with ``data`` iff it does not exist.

  Returns True when this caller created the file (won the race), False
  when the file already existed.  This is the arbiter the preemption
  protocol needs: exactly one of N racing writers wins, and readers never
  observe partial content.

  POSIX: O_EXCL temp + ``os.link`` (link fails with EEXIST atomically;
  the temp holds the full content before it becomes visible).
  GCS: ``pipe_file(mode="create")`` — an ``ifGenerationMatch=0`` upload,
  atomic server-side.  Other fsspec backends fall back to fsspec's
  generic exists-check+write under a process-local lock (atomic for the
  in-process memory:// fake; best-effort elsewhere, logged once).
  """
  if isinstance(data, str):
    data = data.encode("utf-8")
  if not is_remote(path):
    # Suffix must be unique per pid AND thread: racing threads share the
    # pid, and one thread's cleanup would otherwise delete another's tmp
    # between its open and link (observed as FileNotFoundError on link).
    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
    try:
      os.remove(tmp)  # leftover from a crashed attempt of this pid/thread
    except OSError:
      pass
    fd = os.open(tmp, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
    try:
      with os.fdopen(fd, "wb") as f:
        f.write(data)
      try:
        os.link(tmp, path)
      except FileExistsError:
        return False
      return True
    finally:
      try:
        os.remove(tmp)
      except OSError:
        pass
  fs = _fs(path)
  scheme = split_scheme(path)[0]
  try:
    with _LOCAL_LOCK:
      fs.pipe_file(path, data, mode="create")
    return True
  except FileExistsError:
    return False
  except (ValueError, TypeError, NotImplementedError) as e:
    # Backend without create-mode support: degrade to check-then-write.
    log.warning(
        "%s:// backend lacks atomic create-if-absent (%s); falling back "
        "to exists-check + write", scheme, e)
    with _LOCAL_LOCK:
      if fs.exists(path):
        return False
      fs.pipe_file(path, data)
    return True


class AppendableFile:
  """A persistent append handle (the ``metrics.jsonl`` use case).

  Local: a real ``"a"``-mode file.  Remote: lines buffer in memory and
  each :meth:`flush` publishes the WHOLE file with one atomic PUT (the
  existing remote content is read once at open).  Metrics files are a few
  KB per thousand steps, so the rewrite cost is noise next to a train
  step.
  """

  def __init__(self, path: str):
    self.path = path
    self._remote = is_remote(path)
    if not self._remote:
      self._f = builtins.open(path, "a")
      self._buf = None
    else:
      self._f = None
      try:
        self._buf = [read_text(path)]
      except FileNotFoundError:
        self._buf = []
      self._dirty = False

  def write(self, text: str) -> None:
    if self._f is not None:
      self._f.write(text)
    else:
      self._buf.append(text)
      self._dirty = True

  def flush(self) -> None:
    if self._f is not None:
      self._f.flush()
    elif self._dirty:
      joined = "".join(self._buf)
      self._buf = [joined]
      atomic_write(self.path, joined)
      self._dirty = False

  def close(self) -> None:
    if self._f is not None:
      self._f.close()
    else:
      self.flush()
