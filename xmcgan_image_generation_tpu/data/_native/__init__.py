"""ctypes bindings for the native fast-IO library (with build helper).

`load()` returns the bound library or None; callers keep a pure-Python
fallback.  The shared object is built by ``tools/build_native.sh`` (or
automatically on first import when a C compiler is available).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

log = logging.getLogger("xmcgan_tpu")

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libfastio.so")
_SRC = os.path.join(_DIR, "fastio.c")
_lib = None
_tried = False


def _build() -> bool:
  try:
    subprocess.run(
        ["cc", "-O3", "-shared", "-fPIC", "-o", _SO, _SRC],
        check=True, capture_output=True, timeout=120)
    return True
  except Exception as e:  # noqa: BLE001
    log.debug("native fastio build failed: %s", e)
    return False


def load():
  """Returns the bound library, building it if needed; None on failure."""
  global _lib, _tried
  if _lib is not None or _tried:
    return _lib
  _tried = True
  if not os.path.exists(_SO) and not _build():
    return None
  try:
    lib = ctypes.CDLL(_SO)
    lib.crc32c.restype = ctypes.c_uint32
    lib.crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.masked_crc32c.restype = ctypes.c_uint32
    lib.masked_crc32c.argtypes = [ctypes.c_char_p, ctypes.c_uint64]
    lib.scan_offsets.restype = ctypes.c_int64
    lib.scan_offsets.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
    ]
    _lib = lib
  except OSError as e:
    log.debug("native fastio load failed: %s", e)
    _lib = None
  return _lib


def crc32c(data: bytes):
  """Native crc32c, or None if the library is unavailable."""
  lib = load()
  if lib is None:
    return None
  return int(lib.crc32c(data, len(data)))


def masked_crc(data: bytes):
  lib = load()
  if lib is None:
    return None
  return int(lib.masked_crc32c(data, len(data)))


def scan_offsets(path: str):
  """Native record-offset scan, or None if unavailable."""
  lib = load()
  if lib is None:
    return None
  capacity = max(1024, os.path.getsize(path) // 64 + 16)
  buf = np.empty(capacity, np.int64)
  n = lib.scan_offsets(
      path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
      capacity)
  if n == -2:  # Capacity exceeded (tiny records): retry with worst case.
    capacity = os.path.getsize(path) // 16 + 16
    buf = np.empty(capacity, np.int64)
    n = lib.scan_offsets(
        path.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        capacity)
  if n < 0:
    return None
  return buf[:n].copy()
