"""TFRecord container + tf.train.Example wire-format codec, TF-free.

The reference stores preprocessed examples as TFRecords of
`tf.train.Example` protos (reference preprocess_data.py:76-96, read back at
libml/base_dataset.py:48-73 / libml/coco_dataset.py:85-111).  This module
reads and writes that exact on-disk format with no TensorFlow dependency:

* TFRecord framing: ``{uint64 length, uint32 masked-crc(length),
  bytes data[length], uint32 masked-crc(data)}`` per record.
* A minimal protobuf wire-format codec for the `Example` message tree
  (Features -> map<string, Feature> -> BytesList/FloatList/Int64List).

Random access for the grain loader comes from a sidecar offset index built
on first open (a header-hop scan; cached as ``<file>.idx`` when the
directory is writable).
"""

from __future__ import annotations

import os
import struct
import threading
from typing import Dict, Iterator, List, Tuple, Union

import numpy as np

Feature = Union[List[bytes], np.ndarray]

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli) with the TFRecord masking, table-driven.
# ---------------------------------------------------------------------------

_CRC_TABLE = None


def _crc_table() -> np.ndarray:
  global _CRC_TABLE
  if _CRC_TABLE is None:
    poly = 0x82F63B78
    table = np.zeros(256, np.uint32)
    for i in range(256):
      crc = i
      for _ in range(8):
        crc = (crc >> 1) ^ (poly if crc & 1 else 0)
      table[i] = crc
    _CRC_TABLE = table
  return _CRC_TABLE


def _crc32c_py(data: bytes) -> int:
  """Table-driven pure-python CRC32C (fallback; ~MB/s)."""
  table = _crc_table()
  crc = 0xFFFFFFFF
  for b in data:
    crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
  return crc ^ 0xFFFFFFFF


def crc32c(data: bytes) -> int:
  """CRC32C checksum; native slicing-by-8 when libfastio is available."""
  from xmcgan_image_generation_tpu.data import _native

  value = _native.crc32c(data)
  return _crc32c_py(data) if value is None else value


def masked_crc(data: bytes) -> int:
  crc = crc32c(data)
  return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# Protobuf wire-format primitives.
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, pos: int) -> Tuple[int, int]:
  result = 0
  shift = 0
  while True:
    b = buf[pos]
    pos += 1
    result |= (b & 0x7F) << shift
    if not b & 0x80:
      return result, pos
    shift += 7


def _write_varint(value: int) -> bytes:
  out = bytearray()
  while True:
    bits = value & 0x7F
    value >>= 7
    if value:
      out.append(bits | 0x80)
    else:
      out.append(bits)
      return bytes(out)


def _tag(field: int, wire_type: int) -> bytes:
  return _write_varint((field << 3) | wire_type)


def _length_delimited(field: int, payload: bytes) -> bytes:
  return _tag(field, 2) + _write_varint(len(payload)) + payload


def _iter_fields(buf: bytes) -> Iterator[Tuple[int, int, bytes, int]]:
  """Yields (field_number, wire_type, value_bytes_or_int, end_pos)."""
  pos = 0
  n = len(buf)
  while pos < n:
    key, pos = _read_varint(buf, pos)
    field, wire_type = key >> 3, key & 7
    if wire_type == 0:  # varint
      value, pos = _read_varint(buf, pos)
      yield field, wire_type, value, pos
    elif wire_type == 2:  # length-delimited
      size, pos = _read_varint(buf, pos)
      yield field, wire_type, buf[pos:pos + size], pos + size
      pos += size
    elif wire_type == 5:  # 32-bit
      yield field, wire_type, buf[pos:pos + 4], pos + 4
      pos += 4
    elif wire_type == 1:  # 64-bit
      yield field, wire_type, buf[pos:pos + 8], pos + 8
      pos += 8
    else:
      raise ValueError(f"Unsupported wire type {wire_type}")


# ---------------------------------------------------------------------------
# tf.train.Example encode / decode.
# ---------------------------------------------------------------------------


def _decode_feature(buf: bytes) -> Feature:
  """Decodes a `Feature` message into list[bytes] or a numpy array."""
  for field, wt, value, _ in _iter_fields(buf):
    if field == 1:  # BytesList
      return [v for f, w, v, _ in _iter_fields(value) if f == 1]
    if field == 2:  # FloatList
      floats: List[np.ndarray] = []
      for f, w, v, _ in _iter_fields(value):
        if f != 1:
          continue
        if w == 2:  # packed
          floats.append(np.frombuffer(v, dtype="<f4"))
        elif w == 5:  # unpacked single
          floats.append(np.frombuffer(v, dtype="<f4"))
      return (np.concatenate(floats) if floats
              else np.zeros((0,), np.float32))
    if field == 3:  # Int64List
      ints: List[int] = []
      for f, w, v, _ in _iter_fields(value):
        if f != 1:
          continue
        if w == 2:  # packed varints
          pos = 0
          while pos < len(v):
            x, pos = _read_varint(v, pos)
            ints.append(x)
        elif w == 0:
          ints.append(v)
      # Interpret as signed int64 (two's complement of the varint value).
      arr = np.array(ints, dtype=np.uint64).astype(np.int64)
      return arr
  return []


def parse_example(serialized: bytes) -> Dict[str, Feature]:
  """Parses a serialized `tf.train.Example` into a feature dict."""
  features: Dict[str, Feature] = {}
  for field, _, value, _ in _iter_fields(serialized):
    if field != 1:  # Example.features
      continue
    for f2, _, entry, _ in _iter_fields(value):
      if f2 != 1:  # Features.feature map entry
        continue
      key = None
      feat = None
      for f3, _, v3, _ in _iter_fields(entry):
        if f3 == 1:
          key = v3.decode("utf-8")
        elif f3 == 2:
          feat = _decode_feature(v3)
      if key is not None:
        features[key] = feat if feat is not None else []
  return features


def _encode_feature(value) -> bytes:
  """Encodes bytes/str lists, float arrays, or int arrays as a Feature."""
  if isinstance(value, (bytes, str)):
    value = [value]
  if isinstance(value, (list, tuple)) and value and isinstance(
      value[0], (bytes, str)):
    payload = b"".join(
        _length_delimited(1, v.encode("utf-8") if isinstance(v, str) else v)
        for v in value)
    return _length_delimited(1, payload)  # BytesList
  arr = np.asarray(value)
  if arr.dtype.kind == "f":
    data = arr.astype("<f4").ravel().tobytes()
    payload = _tag(1, 2) + _write_varint(len(data)) + data  # packed floats
    return _length_delimited(2, payload)  # FloatList
  if arr.dtype.kind in ("i", "u"):
    packed = b"".join(
        _write_varint(int(np.uint64(np.int64(x)))) for x in arr.ravel())
    payload = _tag(1, 2) + _write_varint(len(packed)) + packed
    return _length_delimited(3, payload)  # Int64List
  raise TypeError(f"Unsupported feature type: {arr.dtype}")


def build_example(features: Dict[str, Feature]) -> bytes:
  """Serializes a feature dict as a `tf.train.Example`."""
  entries = []
  for key, value in features.items():
    entry = (_length_delimited(1, key.encode("utf-8"))
             + _length_delimited(2, _encode_feature(value)))
    entries.append(_length_delimited(1, entry))
  return _length_delimited(1, b"".join(entries))


# ---------------------------------------------------------------------------
# TFRecord file reader / writer.
# ---------------------------------------------------------------------------

_LEN_STRUCT = struct.Struct("<QI")
_CRC_STRUCT = struct.Struct("<I")


class TFRecordWriter:
  """Writes TFRecord files readable by TF and by `TFRecordFile`."""

  def __init__(self, path: str):
    # Lazy import avoids a data<->utils import cycle; the seam makes
    # remote (gs://) writer targets work, e.g. TensorBoard event files
    # in a cloud workdir (utils/tb_writer.py).
    from xmcgan_image_generation_tpu.utils import fileio

    self._f = fileio.open(path, "wb")

  def write(self, record: bytes) -> None:
    header = struct.pack("<Q", len(record))
    self._f.write(header)
    self._f.write(_CRC_STRUCT.pack(masked_crc(header)))
    self._f.write(record)
    self._f.write(_CRC_STRUCT.pack(masked_crc(record)))

  def flush(self) -> None:
    """Flushes buffered records to disk (durability point for consumers
    that tail the file, e.g. TensorBoard event files)."""
    self._f.flush()

  def close(self) -> None:
    self._f.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


def _scan_offsets(path: str) -> np.ndarray:
  """Builds the record-offset index by hopping over length headers."""
  from xmcgan_image_generation_tpu.data import _native

  native = _native.scan_offsets(path)
  if native is not None:
    return native
  offsets = []
  size = os.path.getsize(path)
  with open(path, "rb") as f:
    pos = 0
    while pos < size:
      f.seek(pos)
      header = f.read(8)
      if len(header) < 8:
        break
      (length,) = struct.unpack("<Q", header)
      end = pos + 8 + 4 + length + 4
      if end > size:
        # Truncated final record: exclude it, matching fastio.c's scanner
        # (which only appends an offset once the full frame fits).
        break
      offsets.append(pos)
      pos = end
  return np.asarray(offsets, np.int64)


class TFRecordFile:
  """Random-access view of one TFRecord file.

  The offset index is built on first open and cached as ``<path>.idx``
  when the directory is writable, so subsequent opens are O(1).
  """

  def __init__(self, path: str, verify_crc: bool = False):
    self.path = path
    self.verify_crc = verify_crc
    idx_path = path + ".idx"
    if os.path.exists(idx_path) and (
        os.path.getmtime(idx_path) >= os.path.getmtime(path)):
      self.offsets = np.fromfile(idx_path, np.int64)
    else:
      self.offsets = _scan_offsets(path)
      try:
        self.offsets.tofile(idx_path)
      except OSError:
        pass  # Read-only directory: keep the index in memory.
    self._file = None
    self._open_lock = threading.Lock()

  def __len__(self) -> int:
    return len(self.offsets)

  def read(self, index: int) -> bytes:
    f = self._file
    if f is None:  # Lazy per-process open (fork-safe for grain).
      # Double-checked under a lock: an unsynchronized open race drops the
      # loser's file object, whose GC closes the fd out from under any
      # thread already pread()ing on it (EBADF).
      with self._open_lock:
        if self._file is None:
          self._file = open(self.path, "rb")
        f = self._file
    # Positioned reads (pread): no shared seek state, so concurrent reads
    # from grain's prefetch threads are safe on the one file handle.
    fd = f.fileno()
    offset = int(self.offsets[index])
    header = os.pread(fd, 8, offset)
    (length,) = struct.unpack("<Q", header)
    frame = os.pread(fd, 4 + length + 4, offset + 8)
    data = frame[4:4 + length]
    if self.verify_crc:
      (crc,) = _CRC_STRUCT.unpack(frame[4 + length:])
      if crc != masked_crc(data):
        raise IOError(f"CRC mismatch in {self.path} record {index}")
    return data

  def __getstate__(self):
    state = self.__dict__.copy()
    state["_file"] = None
    del state["_open_lock"]
    return state

  def __setstate__(self, state):
    self.__dict__.update(state)
    self._open_lock = threading.Lock()
