"""TensorBoard-compatible scalar event files, written without TensorFlow.

Restores the reference's training observability contract — per-metric
tf.summary scalar streams TensorBoard can load directly (reference:
models/model_utils.py:549-583) — using a hand-rolled Event proto encoder
on top of the same TFRecord framing io/tfrecord.py already implements.

Wire format:
* file: `events.out.tfevents.<wall_time>.<hostname><suffix>` containing
  TFRecord-framed records (uint64 length + masked-crc32c of the length,
  payload, masked-crc32c of the payload) — identical framing to
  tfrecord.TFRecordWriter, uncompressed.
* record: an `Event` proto — wall_time (field 1, double), step (field 2,
  int64), and either file_version (field 3, the mandatory first
  "brain.Event:2" record) or summary (field 5, a `Summary` with repeated
  `Summary.Value {tag (1, string), simple_value (2, float)}`).
"""

import os
import socket
import struct
import time
from typing import Dict, Optional, Union

from deepconsensus_tpu.io.example_pb import _len_delim, _varint
from deepconsensus_tpu.io.tfrecord import masked_crc


def _field_varint(field: int, value: int) -> bytes:
  return _varint(field << 3) + _varint(value & 0xFFFFFFFFFFFFFFFF)


def _field_double(field: int, value: float) -> bytes:
  return _varint((field << 3) | 1) + struct.pack('<d', value)


def _field_float(field: int, value: float) -> bytes:
  return _varint((field << 3) | 5) + struct.pack('<f', value)


def encode_scalar_event(
    scalars: Dict[str, float], step: int, wall_time: Optional[float] = None
) -> bytes:
  """Encodes one Event proto holding simple_value summaries."""
  values = b''.join(
      _len_delim(
          1,
          _len_delim(1, tag.encode()) + _field_float(2, float(value)),
      )
      for tag, value in scalars.items()
  )
  return (
      _field_double(1, time.time() if wall_time is None else wall_time)
      + _field_varint(2, int(step))
      + _len_delim(5, values)
  )


def encode_file_version_event(wall_time: Optional[float] = None) -> bytes:
  return _field_double(
      1, time.time() if wall_time is None else wall_time
  ) + _len_delim(3, b'brain.Event:2')


class SummaryWriter:
  """Appends scalar events to a TensorBoard event file in `logdir`."""

  def __init__(self, logdir: str, filename_suffix: str = '.v2'):
    os.makedirs(logdir, exist_ok=True)
    fname = (
        f'events.out.tfevents.{int(time.time())}.'
        f'{socket.gethostname()}{filename_suffix}'
    )
    self._path = os.path.join(logdir, fname)
    self._fh = open(self._path, 'wb')
    self._write_record(encode_file_version_event())
    self.flush()

  @property
  def path(self) -> str:
    return self._path

  def _write_record(self, payload: bytes) -> None:
    header = struct.pack('<Q', len(payload))
    self._fh.write(header)
    self._fh.write(struct.pack('<I', masked_crc(header)))
    self._fh.write(payload)
    self._fh.write(struct.pack('<I', masked_crc(payload)))

  def scalars(
      self,
      scalars: Dict[str, Union[float, int]],
      step: int,
      wall_time: Optional[float] = None,
  ) -> None:
    """Writes one event carrying every (tag -> simple_value) pair."""
    numeric = {
        k: float(v)
        for k, v in scalars.items()
        if isinstance(v, (int, float)) and not isinstance(v, bool)
    }
    if not numeric:
      return
    self._write_record(encode_scalar_event(numeric, step, wall_time))

  def scalar(self, tag: str, value: float, step: int) -> None:
    self.scalars({tag: value}, step)

  def flush(self) -> None:
    self._fh.flush()

  def close(self) -> None:
    self._fh.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()
