"""A functional pysam replacement backed by deepconsensus_tpu.io.bam.

The reference pipeline (`/root/reference/deepconsensus`) does all its BAM IO
through pysam, which does not exist in this environment. This module
implements the slice of the pysam API the reference *inference* path
actually touches (reference pre_lib.py:50-91,966-998,1061-1239 and
quick_inference.py:794-963) on top of this repo's own BGZF/BAM stack, so
the reference code can be EXECUTED end-to-end as an oracle:

* module constants CMATCH..CBACK, `set_verbosity`,
  `qualitystring_to_array`;
* `AlignmentFile(path, check_sq=False, threads=N)` — a sequential reader
  yielding records;
* `AlignedSegment` = io.bam.BamRecord, which already exposes the needed
  surface (qname/pos/seq/cigar(tuples)/is_unmapped/is_reverse/
  reference_name/query_qualities/get_tag/has_tag/set_tag/
  query_alignment_start/end/get_aligned_pairs).

Oracle tooling only: never imported by the shipped package.
"""

import sys
import types

import numpy as np

from deepconsensus_tpu.io import bam as _bam

# BAM cigar op codes, as pysam exports them.
CMATCH = 0
CINS = 1
CDEL = 2
CREF_SKIP = 3
CSOFT_CLIP = 4
CHARD_CLIP = 5
CPAD = 6
CEQUAL = 7
CDIFF = 8
CBACK = 9

class AlignedSegment(_bam.BamRecord):
  """BamRecord with pysam tag-value types.

  pysam returns B-type array tags as plain Python sequences (array.array /
  list), and reference code relies on their list semantics — e.g.
  `if pw_vals:` (pre_lib.py:1111) is ambiguous on an np.ndarray. Convert
  on read; everything else passes through.
  """

  __slots__ = ()

  def get_tag(self, name):
    value = super().get_tag(name)
    if isinstance(value, np.ndarray):
      return value.tolist()
    return value


def set_verbosity(level=0):  # noqa: ARG001 — pysam-compatible no-op
  return 0


def qualitystring_to_array(qual: str) -> np.ndarray:
  return np.frombuffer(qual.encode('ascii'), dtype=np.uint8) - 33


class AlignmentFile:
  """Sequential BAM reader with the pysam AlignmentFile iteration API."""

  def __init__(
      self,
      path,
      mode='rb',
      check_sq=True,  # noqa: ARG002 — accepted for signature compat
      threads=1,  # noqa: ARG002 — decode threading handled natively
      require_index=False,
      header=None,
  ):
    if 'w' in mode:
      raise NotImplementedError(
          'ref_pysam.AlignmentFile is read-only (the oracle writes FASTQ)'
      )
    self._reader = _bam.BamReader(path)
    self.header = self._reader.header
    if require_index:
      # Training-only path (truth_to_ccs fetch); inference never needs it.
      raise NotImplementedError('indexed fetch not supported by the shim')

  def __iter__(self):
    return self

  def __next__(self):
    rec = next(self._reader)
    # Same memory layout (slots-only subclass): retag so get_tag returns
    # pysam-typed values.
    rec.__class__ = AlignedSegment
    return rec

  def close(self):
    pass


def install() -> types.ModuleType:
  """Registers this module as `pysam` (+ libcalignedsegment) in sys.modules."""
  if 'pysam' in sys.modules and sys.modules['pysam'] is not sys.modules[
      __name__
  ]:
    raise RuntimeError(
        'a different pysam stub is already installed; install ref_pysam first'
    )
  mod = sys.modules[__name__]
  lib = types.ModuleType('pysam.libcalignedsegment')
  lib.AlignedSegment = AlignedSegment
  mod.libcalignedsegment = lib
  sys.modules['pysam'] = mod
  sys.modules['pysam.libcalignedsegment'] = lib
  return mod
