"""TensorBoard event-file writer, TF-free.

The reference writes training curves through `clu.metric_writers`'s
TensorBoard backend (reference train_utils.py:399-403), so users point
TensorBoard at the workdir.  This framework keeps its JSONL metrics as the
primary record but also emits real ``events.out.tfevents.*`` files so that
tooling keeps working — encoded here by hand (the ``Event``/``Summary``
protos are tiny and stable) on top of the same TFRecord framing
`data.records` already implements, with no TensorFlow dependency.

Wire format:
  * record framing: ``{uint64 len, masked-crc32c(len), bytes, masked-crc32c}``
    (data/records.py:233-254);
  * ``Event`` proto: wall_time=1 (double), step=2 (int64),
    file_version=3 (string), summary=5 (message);
  * ``Summary`` proto: repeated Value=1; ``Summary.Value``: tag=1 (string),
    simple_value=2 (float), image=4 (message);
  * ``Summary.Image``: height=1, width=2, colorspace=3, encoded=4 (bytes).
"""

from __future__ import annotations

import io
import os
import socket
import struct
import time
from typing import Mapping

import numpy as np

from xmcgan_image_generation_tpu.data import records
from xmcgan_image_generation_tpu.utils import fileio


def _varint_field(field: int, value: int) -> bytes:
  return records._tag(field, 0) + records._write_varint(int(value))


def _double_field(field: int, value: float) -> bytes:
  return records._tag(field, 1) + struct.pack("<d", float(value))


def _float_field(field: int, value: float) -> bytes:
  return records._tag(field, 5) + struct.pack("<f", float(value))


def _bytes_field(field: int, payload: bytes) -> bytes:
  return records._length_delimited(field, payload)


def _event(step: int, summary: bytes, wall_time=None) -> bytes:
  return (_double_field(1, wall_time if wall_time is not None else time.time())
          + _varint_field(2, step)
          + _bytes_field(5, summary))


def scalar_summary(scalars: Mapping[str, float]) -> bytes:
  out = b""
  for tag, value in scalars.items():
    value_msg = (_bytes_field(1, tag.encode("utf-8"))
                 + _float_field(2, value))
    out += _bytes_field(1, value_msg)
  return out


def image_summary(tag: str, png: bytes, height: int, width: int,
                  colorspace: int = 3) -> bytes:
  img_msg = (_varint_field(1, height) + _varint_field(2, width)
             + _varint_field(3, colorspace) + _bytes_field(4, png))
  value_msg = _bytes_field(1, tag.encode("utf-8")) + _bytes_field(4, img_msg)
  return _bytes_field(1, value_msg)


def encode_png(image: np.ndarray) -> bytes:
  """[H, W, C] float image in [0, 1] -> PNG bytes."""
  from PIL import Image

  arr = np.clip(np.asarray(image, np.float32) * 255.0 + 0.5,
                0, 255).astype(np.uint8)
  if arr.ndim == 3 and arr.shape[-1] == 1:
    arr = arr[..., 0]
  buf = io.BytesIO()
  Image.fromarray(arr).save(buf, format="PNG")
  return buf.getvalue()


class EventFileWriter:
  """Appends `Event` records to one ``events.out.tfevents.*`` file."""

  def __init__(self, logdir: str):
    fileio.makedirs(logdir, exist_ok=True)
    name = (f"events.out.tfevents.{int(time.time())}."
            f"{socket.gethostname()}.{os.getpid()}")
    self.path = fileio.join(logdir, name)
    self._w = records.TFRecordWriter(self.path)
    # TensorBoard skips files whose first record is not this version stamp.
    self._w.write(_double_field(1, time.time())
                  + _bytes_field(3, b"brain.Event:2"))
    self.flush()

  def write_scalars(self, step: int, scalars: Mapping[str, float]) -> None:
    self._w.write(_event(step, scalar_summary(scalars)))

  def write_image(self, step: int, tag: str, image: np.ndarray) -> None:
    """``image``: [H, W, C] float array in [0, 1]."""
    png = encode_png(image)
    self._w.write(_event(
        step, image_summary(tag, png, image.shape[0], image.shape[1],
                            colorspace=image.shape[-1])))

  def flush(self) -> None:
    self._w.flush()

  def close(self) -> None:
    self._w.close()
