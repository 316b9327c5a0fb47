"""BAI index support: random-access region fetch on coordinate-sorted BAMs.

SAM spec v1.6 §5.1.3 (the htslib .bai format): per-reference R-tree bins of
BGZF virtual-offset chunks plus a 16kb linear index. This gives this
framework's BAM layer the `fetch(contig, start, end)` capability the
reference gets from pysam/htslib (used for truth-to-CCS lookups and
whole-genome calibration BAMs too large for in-memory indexing).

Virtual offsets are (compressed_block_offset << 16) | within_block_offset;
`BgzfReader.seek_voffset` positions the stream accordingly.
"""

import struct
from typing import Iterator, List, Optional, Tuple

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import bam, bgzf

_BAI_MAGIC = b'BAI\x01'


def reg2bins(beg: int, end: int) -> List[int]:
  """Bins overlapping [beg, end) (SAM spec v1.6, reg2bins)."""
  end -= 1
  bins = [0]
  for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
    bins.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
  return bins


class BaiIndex:
  """Parsed .bai index: per-reference {bin: [(chunk_beg, chunk_end)]}."""

  def __init__(self, path: str):
    with open(path, 'rb') as f:
      data = f.read()
    if data[:4] != _BAI_MAGIC:
      raise IOError(f'{path}: not a BAI index')
    (n_ref,) = struct.unpack_from('<i', data, 4)
    off = 8
    self.bins: List[dict] = []
    self.linear: List[np.ndarray] = []
    for _ in range(n_ref):
      (n_bin,) = struct.unpack_from('<i', data, off)
      off += 4
      bins = {}
      for _ in range(n_bin):
        bin_id, n_chunk = struct.unpack_from('<Ii', data, off)
        off += 8
        chunks = np.frombuffer(
            data[off : off + 16 * n_chunk], dtype='<u8'
        ).reshape(n_chunk, 2)
        off += 16 * n_chunk
        bins[bin_id] = chunks
      (n_intv,) = struct.unpack_from('<i', data, off)
      off += 4
      ioffsets = np.frombuffer(data[off : off + 8 * n_intv], dtype='<u8')
      off += 8 * n_intv
      self.bins.append(bins)
      self.linear.append(ioffsets)

  def chunks_for_region(
      self, ref_id: int, start: int, end: int
  ) -> List[Tuple[int, int]]:
    """Candidate (voffset_beg, voffset_end) chunks for a 0-based region."""
    if ref_id < 0 or ref_id >= len(self.bins):
      return []
    bins = self.bins[ref_id]
    linear = self.linear[ref_id]
    min_voff = 0
    window = start >> 14
    if window < len(linear):
      min_voff = int(linear[window])
    out = []
    for b in reg2bins(start, end):
      for beg, cend in bins.get(b, ()):
        if cend > min_voff:
          # Clamp the chunk start up to the linear-index floor (htslib
          # does the same): a low-level bin's chunk can span most of the
          # contig, and without the clamp a window query near the end
          # decompresses/parses O(contig) records it then filters out.
          out.append((max(int(beg), min_voff), int(cend)))
    out.sort()
    # Merge adjacent/overlapping chunks to minimize seeks.
    merged: List[Tuple[int, int]] = []
    for beg, cend in out:
      if merged and beg <= merged[-1][1]:
        merged[-1] = (merged[-1][0], max(merged[-1][1], cend))
      else:
        merged.append((beg, cend))
    return merged


class _VOffsetReader:
  """Sequential BGZF reader addressable by virtual offsets."""

  def __init__(self, path: str):
    self._fh = open(path, 'rb')
    self._block = b''
    self._bpos = 0
    self._coffset = 0
    self._next_coffset = 0

  def seek_voffset(self, voffset: int) -> None:
    coffset = voffset >> 16
    self._fh.seek(coffset)
    member = bgzf.read_member_at(self._fh)
    if member is None:
      self._block, self._bpos = b'', 0
      self._coffset = self._next_coffset = coffset
      return
    data, bsize = member
    self._block = data
    self._bpos = voffset & 0xFFFF
    self._coffset = coffset
    self._next_coffset = coffset + bsize

  def voffset(self) -> int:
    return (self._coffset << 16) | self._bpos

  def _advance(self) -> bool:
    while True:
      coffset = self._next_coffset
      self._fh.seek(coffset)
      member = bgzf.read_member_at(self._fh)
      if member is None:
        return False
      data, bsize = member
      self._coffset = coffset
      self._next_coffset = coffset + bsize
      if data:
        self._block = data
        self._bpos = 0
        return True

  def read(self, n: int) -> bytes:
    out = bytearray()
    while n > 0:
      if self._bpos >= len(self._block):
        if not self._advance():
          break
      take = min(n, len(self._block) - self._bpos)
      out += self._block[self._bpos : self._bpos + take]
      self._bpos += take
      n -= take
    return bytes(out)

  def close(self) -> None:
    self._fh.close()


class IndexedBamReader:
  """Region fetch over a coordinate-sorted BAM with a .bai index.

  Equivalent of pysam's AlignmentFile.fetch (reference:
  pre_lib.py:1001-1014, calculate_baseq_calibration.py:403).
  """

  def __init__(self, path: str, index_path: str = None):
    self.path = path
    # Header via the normal reader (streaming; no full inflate).
    with bam.BamReader(path, eager=False) as r:
      self.header = r.header
    self.index = BaiIndex(index_path or path + '.bai')
    # One persistent voffset reader serves every fetch (seek_voffset
    # repositions arbitrarily); per-fetch open/close was thousands of
    # syscalls for interval-strided callers like calculate_baseq.
    self._reader = _VOffsetReader(self.path)

  def close(self) -> None:
    self._reader.close()

  def __enter__(self) -> 'IndexedBamReader':
    return self

  def __exit__(self, *exc) -> None:
    self.close()

  def fetch(
      self, contig: str, start: int = 0, end: Optional[int] = None
  ) -> Iterator[bam.BamRecord]:
    """Yields records overlapping [start, end) on contig, in file order."""
    ref_id = self.header.ref_id(contig)
    if ref_id < 0:
      raise ValueError(f'unknown contig {contig!r}')
    # Clamp to the reference length (BAI addresses < 2^29 anyway); an
    # unclamped huge end makes reg2bins enumerate millions of 16kb bins.
    ref_len = self.header.references[ref_id][1] or (1 << 29)
    end = min(end if end is not None else ref_len, 1 << 29)
    start = max(0, start)
    if start >= end:
      return
    reader = self._reader
    for chunk_beg, chunk_end in self.index.chunks_for_region(
        ref_id, start, end
    ):
      reader.seek_voffset(chunk_beg)
      while reader.voffset() < chunk_end:
        size_bytes = reader.read(4)
        if len(size_bytes) < 4:
          break
        (block_size,) = struct.unpack('<i', size_bytes)
        if block_size < 0:
          raise IOError('truncated BAM record')
        blob = reader.read(block_size)
        if len(blob) < block_size:
          break
        rec = bam.parse_record(blob, self.header)
        if rec.ref_id > ref_id or (
            rec.ref_id == ref_id and rec.pos >= end
        ):
          break  # coordinate sorted: nothing further can overlap
        if rec.ref_id != ref_id:
          continue
        ref_span = int(
            np.sum(
                rec.cigar_lens[
                    np.isin(rec.cigar_ops, constants.REF_ADVANCING_OPS)
                ]
            )
        )
        # htslib's bam_endpos treats a record with no reference-
        # advancing ops (placed-unmapped, fully soft-clipped) as
        # length 1, so pysam.fetch yields it when placed at `start`.
        if rec.pos + max(ref_span, 1) > start:
          yield rec
