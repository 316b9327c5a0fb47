"""TFRecord container reader/writer (gzip-compressed), no TF dependency.

Framing per record: u64 length, masked crc32c(length), payload, masked
crc32c(payload). The reference writes gzip TFRecords from its preprocess
driver (reference: preprocess/preprocess.py:183-196) and reads them via
tf.data (models/data_providers.py:346); this module supplies both sides.
"""

import gzip
import struct
from typing import Iterator, Optional

import numpy as np

_MASK_DELTA = 0xA282EAD8


def _make_crc32c_table() -> np.ndarray:
  poly = 0x82F63B78
  table = np.zeros(256, dtype=np.uint32)
  for i in range(256):
    crc = i
    for _ in range(8):
      crc = (crc >> 1) ^ (poly if crc & 1 else 0)
    table[i] = crc
  return table


_CRC_TABLE = _make_crc32c_table()


def crc32c(data: bytes, crc: int = 0) -> int:
  from deepconsensus_tpu import native

  fast = native.crc32c(data, crc)
  if fast is not None:
    return fast
  crc = crc ^ 0xFFFFFFFF
  table = _CRC_TABLE
  for b in data:
    crc = (crc >> 8) ^ int(table[(crc ^ b) & 0xFF])
  return crc ^ 0xFFFFFFFF


def masked_crc(data: bytes) -> int:
  crc = crc32c(data)
  return (((crc >> 15) | (crc << 17)) + _MASK_DELTA) & 0xFFFFFFFF


class TFRecordWriter:
  """Writes TFRecord files; gzip-compressed when the path ends with .gz."""

  def __init__(
      self,
      path: str,
      compressed: Optional[bool] = None,
      compresslevel: int = 4,
  ):
    # Python's gzip default (level 9) is ~10x slower than level 4 for ~2%
    # size difference on example tensors; level 4 keeps the writer off the
    # preprocess critical path.
    if compressed is None:
      compressed = path.endswith('.gz')
    self._fh = (
        gzip.open(path, 'wb', compresslevel=compresslevel)
        if compressed
        else open(path, 'wb')
    )

  def write(self, record: bytes) -> None:
    header = struct.pack('<Q', len(record))
    self._fh.write(header)
    self._fh.write(struct.pack('<I', masked_crc(header)))
    self._fh.write(record)
    self._fh.write(struct.pack('<I', masked_crc(record)))

  def close(self) -> None:
    self._fh.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


class ThreadedTFRecordWriter:
  """TFRecordWriter with framing+gzip on a background thread.

  zlib compression of the f32 example tensors dominates the preprocess
  driver's serial wall time (~45% in profile); it releases the GIL, so a
  single writer thread overlaps it with featurization/encoding on the
  main thread. The bounded queue applies backpressure instead of letting
  encoded examples pile up in memory. Record order is preserved (one
  consumer thread per file).
  """

  _CLOSE = object()

  def __init__(self, path: str, queue_size: int = 256, **kwargs):
    import queue
    import threading

    self._writer = TFRecordWriter(path, **kwargs)
    self._q = queue.Queue(maxsize=queue_size)
    self._err = None
    self._thread = threading.Thread(target=self._run, daemon=True)
    self._thread.start()

  def _run(self):
    while True:
      item = self._q.get()
      if item is self._CLOSE:
        return
      try:
        self._writer.write(item)
      except Exception as e:  # surface on the producer thread
        self._err = e
        return

  def write(self, record: bytes) -> None:
    import queue

    while True:
      if self._err is not None:
        raise self._err
      try:
        self._q.put(record, timeout=1.0)
        return
      except queue.Full:
        continue  # re-check worker health, then retry

  def close(self) -> None:
    import queue

    # Never block forever on a full queue whose consumer died (e.g. the
    # worker hit ENOSPC and exited): enqueue the sentinel only while the
    # worker is alive to drain it, bounded-wait at a time.
    while self._thread.is_alive():
      try:
        self._q.put(self._CLOSE, timeout=1.0)
        break
      except queue.Full:
        continue
    self._thread.join()
    try:
      self._writer.close()
    except Exception:
      if self._err is None:
        raise
      # fall through: the worker's original error is the root cause
    if self._err is not None:
      raise self._err

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


def read_tfrecords(
    path: str, compressed: Optional[bool] = None, verify: bool = False
) -> Iterator[bytes]:
  """Yields raw record payloads from a TFRecord file."""
  if compressed is None:
    compressed = path.endswith('.gz')
  fh = gzip.open(path, 'rb') if compressed else open(path, 'rb')
  try:
    while True:
      header = fh.read(8)
      if len(header) < 8:
        return
      (length,) = struct.unpack('<Q', header)
      (hcrc,) = struct.unpack('<I', fh.read(4))
      payload = fh.read(length)
      (pcrc,) = struct.unpack('<I', fh.read(4))
      if verify:
        if masked_crc(header) != hcrc or masked_crc(payload) != pcrc:
          raise IOError(f'{path}: TFRecord CRC mismatch')
      yield payload
  finally:
    fh.close()
