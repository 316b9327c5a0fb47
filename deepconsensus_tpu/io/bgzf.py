"""BGZF (blocked gzip) reader/writer built on zlib.

The reference delegates all BAM IO to pysam/htslib (C). pysam is not part of
this framework; BAM container decoding is implemented here directly. BGZF is
a series of gzip members, each with a BC extra subfield carrying the
compressed block size (SAM spec v1.6 §4.1).
"""

import os
import struct
import zlib
from typing import BinaryIO, Iterator, Optional, Union

_BGZF_HEADER_LEN = 12
_BGZF_EOF = bytes.fromhex(
    '1f8b08040000000000ff0600424302001b0003000000000000000000'
)


class BgzfError(IOError):
  pass


class BgzfReader:
  """Streaming BGZF decompressor exposing a read()/readinto-style interface."""

  def __init__(self, path_or_file: Union[str, BinaryIO]):
    if isinstance(path_or_file, str):
      self._fh = open(path_or_file, 'rb')
      self._owns_fh = True
    else:
      self._fh = path_or_file
      self._owns_fh = False
    self._buf = b''
    self._buf_pos = 0
    self._eof = False

  def close(self) -> None:
    if self._owns_fh:
      self._fh.close()

  def __enter__(self) -> 'BgzfReader':
    return self

  def __exit__(self, *exc) -> None:
    self.close()

  def _read_block(self) -> Optional[bytes]:
    """Reads and decompresses one BGZF block; None at physical EOF."""
    header = self._fh.read(_BGZF_HEADER_LEN)
    if not header:
      return None
    if len(header) < _BGZF_HEADER_LEN or header[:2] != b'\x1f\x8b':
      raise BgzfError('truncated or non-BGZF gzip member header')
    xlen = struct.unpack('<H', header[10:12])[0]
    extra = self._fh.read(xlen)
    bsize = None
    i = 0
    while i + 4 <= len(extra):
      si1, si2 = extra[i], extra[i + 1]
      slen = struct.unpack('<H', extra[i + 2 : i + 4])[0]
      if si1 == 66 and si2 == 67 and slen == 2:
        bsize = struct.unpack('<H', extra[i + 4 : i + 6])[0] + 1
      i += 4 + slen
    if bsize is None:
      raise BgzfError('gzip member missing BGZF BC subfield')
    # Remainder: compressed data + CRC32 + ISIZE.
    want = bsize - _BGZF_HEADER_LEN - xlen
    if want < 8:
      # A corrupt BSIZE smaller than its own header would make `want`
      # negative — and file.read(negative) slurps the remaining file.
      raise BgzfError(f'corrupt BGZF BSIZE ({bsize}) smaller than header')
    payload = self._fh.read(want)
    if len(payload) < want:
      raise BgzfError('truncated BGZF block payload')
    cdata = payload[:-8]
    isize = struct.unpack('<I', payload[-4:])[0]
    try:
      data = zlib.decompress(cdata, -15)
    except zlib.error as e:
      raise BgzfError(f'corrupt BGZF block: {e}') from e
    if len(data) != isize:
      raise BgzfError('BGZF block ISIZE mismatch')
    return data

  def _fill(self) -> bool:
    """Pulls the next non-empty block into the buffer. False at EOF."""
    if self._eof:
      return False
    while True:
      block = self._read_block()
      if block is None:
        self._eof = True
        return False
      if block:
        leftover = self._buf[self._buf_pos :]
        self._buf = leftover + block if leftover else block
        self._buf_pos = 0
        return True

  def read(self, n: int) -> bytes:
    """Reads exactly n bytes unless EOF intervenes."""
    if len(self._buf) - self._buf_pos < n:
      # Accumulate whole blocks in a list and join ONCE: refilling via
      # leftover+block concatenation is O(n^2) for reads spanning many
      # blocks (e.g. a multi-MB @SQ header at 64 KB per block).
      parts = [self._buf[self._buf_pos :]]
      have = len(parts[0])
      self._buf = b''
      self._buf_pos = 0
      while have < n and not self._eof:
        block = self._read_block()
        if block is None:
          self._eof = True
          break
        if block:
          parts.append(block)
          have += len(block)
      self._buf = b''.join(parts)
    out = self._buf[self._buf_pos : self._buf_pos + n]
    self._buf_pos += len(out)
    if self._buf_pos == len(self._buf):
      self._buf = b''
      self._buf_pos = 0
    return out

  def read_all(self, as_array: bool = False):
    """Reads the remaining decompressed stream (native fast path if built).

    as_array=True returns a numpy uint8 array (zero extra copies through
    the threaded native inflate) when available; otherwise bytes.
    """
    from deepconsensus_tpu import native

    raw = None
    arr = None
    got = 0
    try:
      # Read into a pooled (already-faulted) buffer: fresh pages in this
      # VM fault pathologically slowly, and this read runs every round.
      remaining = os.fstat(self._fh.fileno()).st_size - self._fh.tell()
      if remaining > 0:
        arr = native.take_pooled_buffer(remaining)
        while got < remaining:
          # Loop: raw (unbuffered) streams may short-read; a single
          # readinto must not silently truncate the trailing members.
          n = self._fh.readinto(memoryview(arr)[got:])
          if not n:
            break
          got += n
        raw = arr[:got] if got else b''
    except (OSError, AttributeError, ValueError):
      raw = None
    if raw is None:
      # Bytes consumed before a partial-read failure must not be lost:
      # resuming with a bare read() would drop the prefix and silently
      # corrupt (or confusingly fail) the member stream.
      prefix = bytes(arr[:got]) if arr is not None and got else b''
      raw = prefix + self._fh.read()
    if len(raw):
      head = bytes(self._buf[self._buf_pos :])
      inflated = native.bgzf_decompress_into(raw, head=head)
      if inflated is None:
        # Pure-Python fallback: walk the remaining members.
        chunks = [head]
        self._buf = b''
        self._buf_pos = 0
        import io

        # Parse from a temporary handle; rebinding self._fh would make
        # close() close the BytesIO and leak the real descriptor.
        orig_fh = self._fh
        self._fh = io.BytesIO(
            raw.tobytes() if hasattr(raw, 'tobytes') else raw
        )
        try:
          while True:
            block = self._read_block()
            if block is None:
              break
            chunks.append(block)
        finally:
          self._fh = orig_fh
        self._eof = True
        return b''.join(chunks)
      self._buf = b''
      self._buf_pos = 0
      self._eof = True
      return inflated if as_array else inflated.tobytes()
    head = self._buf[self._buf_pos :]
    self._buf = b''
    self._buf_pos = 0
    self._eof = True
    if as_array:
      import numpy as np

      return np.frombuffer(head, dtype=np.uint8)
    return head


class BgzfWriter:
  """BGZF compressor; one gzip member per <=64KB chunk plus an EOF member."""

  def __init__(
      self, path_or_file: Union[str, BinaryIO], compresslevel: int = 6
  ):
    if isinstance(path_or_file, str):
      self._fh = open(path_or_file, 'wb')
      self._owns_fh = True
    else:
      self._fh = path_or_file
      self._owns_fh = False
    self._level = compresslevel
    self._buf = bytearray()
    self._chunk = 0xFF00  # htslib's uncompressed block payload target.
    self._closed = False

  def write(self, data: bytes) -> None:
    self._buf += data
    while len(self._buf) >= self._chunk:
      self._flush_block(bytes(self._buf[: self._chunk]))
      del self._buf[: self._chunk]

  def _flush_block(self, data: bytes) -> None:
    c = zlib.compressobj(self._level, zlib.DEFLATED, -15)
    cdata = c.compress(data) + c.flush()
    crc = zlib.crc32(data) & 0xFFFFFFFF
    block = (
        b'\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff'
        + struct.pack('<H', 6)
        + b'BC'
        + struct.pack('<H', 2)
        + struct.pack('<H', len(cdata) + 25)
        + cdata
        + struct.pack('<II', crc, len(data))
    )
    self._fh.write(block)

  def flush(self) -> None:
    if self._buf:
      self._flush_block(bytes(self._buf))
      self._buf.clear()

  def close(self, write_eof: bool = True) -> None:
    """Flushes and closes; idempotent (a second close is a no-op).

    write_eof=False skips the 28-byte EOF magic — used when an exception
    aborted the write so htslib-style truncation detection (checking the
    trailing EOF member) correctly flags the file as incomplete.
    """
    if self._closed:
      return
    self._closed = True
    self.flush()
    if write_eof:
      self._fh.write(_BGZF_EOF)
    if self._owns_fh:
      self._fh.close()
    else:
      self._fh.flush()

  def __enter__(self) -> 'BgzfWriter':
    return self

  def __exit__(self, exc_type, *exc) -> None:
    # On an exception inside the with-block, leave the file WITHOUT the
    # EOF magic so downstream readers detect it as truncated rather
    # than stamping a half-written stream as complete.
    self.close(write_eof=exc_type is None)


def read_member_at(fh) -> Optional[tuple]:
  """Parses one BGZF member at the file handle's position.

  Returns (decompressed_bytes, compressed_size) or None at EOF.
  """
  header = fh.read(_BGZF_HEADER_LEN)
  if len(header) < _BGZF_HEADER_LEN:
    return None
  if header[:2] != b'\x1f\x8b':
    raise BgzfError('non-BGZF gzip member header')
  xlen = struct.unpack('<H', header[10:12])[0]
  extra = fh.read(xlen)
  bsize = None
  i = 0
  while i + 4 <= len(extra):
    si1, si2 = extra[i], extra[i + 1]
    slen = struct.unpack('<H', extra[i + 2 : i + 4])[0]
    if si1 == 66 and si2 == 67 and slen == 2:
      bsize = struct.unpack('<H', extra[i + 4 : i + 6])[0] + 1
    i += 4 + slen
  if bsize is None:
    raise BgzfError('gzip member missing BGZF BC subfield')
  want = bsize - _BGZF_HEADER_LEN - xlen
  if want < 8:
    # Mirror _read_block: a corrupt BSIZE must not become read(negative).
    raise BgzfError(f'corrupt BGZF BSIZE ({bsize}) smaller than header')
  payload = fh.read(want)
  if len(payload) < want:
    raise BgzfError('truncated BGZF block payload')
  cdata = payload[:-8]
  try:
    data = zlib.decompress(cdata, -15)
  except zlib.error as e:
    raise BgzfError(f'corrupt BGZF block: {e}') from e
  # Same integrity bar as the sequential reader (_read_block).
  isize = struct.unpack('<I', payload[-4:])[0]
  if len(data) != isize:
    raise BgzfError('BGZF block ISIZE mismatch')
  return data, bsize


def iter_blocks(path: str) -> Iterator[bytes]:
  """Yields decompressed BGZF blocks of a file (testing/benchmark helper)."""
  with BgzfReader(path) as r:
    while True:
      block = r._read_block()  # pylint: disable=protected-access
      if block is None:
        return
      yield block
