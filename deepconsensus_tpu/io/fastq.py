"""FASTQ/FASTA IO helpers (plain or gzip/bgzf-compressed)."""

import gzip
from typing import Iterator, Optional, TextIO, Tuple

import numpy as np


def open_maybe_compressed(path: str, mode: str = 'rt'):
  if path.endswith('.gz'):
    return gzip.open(path, mode)
  return open(path, mode)


def read_fastq(path: str) -> Iterator[Tuple[str, str, str]]:
  """Yields (name, sequence, quality_string); name excludes the '@'."""
  with open_maybe_compressed(path) as f:
    while True:
      header = f.readline()
      if not header:
        return
      seq = f.readline().rstrip('\n')
      plus = f.readline()
      qual = f.readline().rstrip('\n')
      if not qual and not seq:
        return
      assert header.startswith('@') and plus.startswith('+'), (
          f'malformed FASTQ near {header!r}'
      )
      yield header[1:].rstrip('\n'), seq, qual


class FastqWriter:
  """Buffered FASTQ writer."""

  def __init__(self, path: str):
    self._fh: TextIO = open_maybe_compressed(path, 'wt')

  def write_str(self, fastq_string: str) -> None:
    self._fh.write(fastq_string)

  def write(self, name: str, seq: str, qual: str) -> None:
    self._fh.write(f'@{name}\n{seq}\n+\n{qual}\n')

  def close(self) -> None:
    self._fh.close()

  def __enter__(self):
    return self

  def __exit__(self, *exc):
    self.close()


class FastaReader:
  """Random-access FASTA via .fai index (for calibration tooling)."""

  def __init__(self, path: str):
    self.path = path
    self._fh = open(path, 'rb')
    self.index = {}
    with open(path + '.fai') as f:
      for line in f:
        name, length, offset, linebases, linewidth = line.split()[:5]
        self.index[name] = (
            int(length),
            int(offset),
            int(linebases),
            int(linewidth),
        )

  @property
  def references(self):
    return list(self.index)

  def get_length(self, name: str) -> int:
    return self.index[name][0]

  def fetch(self, name: str, start: int = 0, end: Optional[int] = None) -> str:
    length, offset, linebases, linewidth = self.index[name]
    if end is None or end > length:
      end = length
    start = max(0, start)
    if start >= end:
      return ''
    byte_start = offset + start // linebases * linewidth + start % linebases
    byte_end = offset + (end - 1) // linebases * linewidth + (
        (end - 1) % linebases
    ) + 1
    self._fh.seek(byte_start)
    raw = self._fh.read(byte_end - byte_start)
    arr = np.frombuffer(raw, dtype=np.uint8)
    keep = (arr != ord('\n')) & (arr != ord('\r'))
    return arr[keep].tobytes().decode('ascii')

  def close(self):
    self._fh.close()
