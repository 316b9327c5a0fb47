"""Empirical base-quality calibration statistics (CLI `calibrate`).

Behavioral contract: reference
`deepconsensus/quality_calibration/calculate_baseq_calibration.py`:
walk reads aligned to the truth reference, count matches (M) and
mismatches (X) per predicted base quality 0..99, insertions counting as
mismatches, and emit a CSV. The per-base Python CIGAR walk is vectorized
with numpy per cigar segment; region random access uses a one-pass
in-memory index instead of a .bai (adequate at per-shard scale).
"""

import bisect
import concurrent.futures
import csv
import dataclasses
import logging
from typing import Dict, List, Optional, Tuple

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.calibration import calibration as calibration_lib
from deepconsensus_tpu.io import bam, fastq

logger = logging.getLogger(__name__)

MAX_BASEQ = 100

_MATCH_OPS = (constants.CMATCH, constants.CDIFF, constants.CEQUAL)
_INS_OPS = (constants.CSOFT_CLIP, constants.CINS)
_DEL_OPS = (constants.CREF_SKIP, constants.CDEL)

# ACGT detection table for reference bases.
_IS_ACGT = np.zeros(256, dtype=bool)
for _c in 'ACGT':
  _IS_ACGT[ord(_c)] = True


@dataclasses.dataclass
class RegionRecord:
  contig: str
  start: int
  stop: int


def process_region_string(region_string: str, fasta: fastq.FastaReader):
  """Parses 'contig:start-stop' or bare contig names."""
  if ':' in region_string:
    contig, start_stop = region_string.split(':')
    start, stop = start_stop.split('-')
    rec = RegionRecord(contig, int(start), int(stop))
    if rec.start > rec.stop:
      raise ValueError(f'Malformed region string {region_string}')
    return rec
  if region_string not in fasta.index:
    raise ValueError(f'Contig {region_string} not found in fasta')
  return RegionRecord(region_string, 0, fasta.get_length(region_string))


def split_regions_in_intervals(
    regions: List[RegionRecord], region_length: int
) -> List[RegionRecord]:
  out = []
  for region in regions:
    for pos in range(region.start, region.stop, region_length):
      out.append(
          RegionRecord(
              region.contig,
              max(region.start, pos),
              min(region.stop, pos + region_length),
          )
      )
  return out


def reference_span(rec: bam.BamRecord) -> int:
  return sum(
      length for op, length in rec.cigartuples if op in constants.REF_ADVANCING_OPS
  )


class InMemoryBamIndex:
  """Per-contig sorted read lists supporting interval fetch.

  Replaces pysam's .bai-backed fetch (calculate_baseq_calibration.py:403)
  with a single sequential scan; adequate for per-shard BAMs.
  """

  def __init__(self, path: str):
    self.by_contig: Dict[str, List[bam.BamRecord]] = {}
    with bam.BamReader(path) as reader:
      self.references = reader.header.ref_names
      for rec in reader:
        if rec.is_unmapped:
          continue
        name = rec.reference_name
        if name is not None:
          self.by_contig.setdefault(name, []).append(rec)
    self._starts = {}
    self._prefix_max_end = {}
    for contig, recs in self.by_contig.items():
      recs.sort(key=lambda r: r.pos)
      self._starts[contig] = [r.pos for r in recs]
      # Precompute reference spans ONCE and keep a running prefix max of
      # end positions: interval-strided callers issue thousands of
      # fetches, and recomputing spans over recs[:hi] per fetch was
      # O(intervals * reads) (review r5).
      ends = [r.pos + reference_span(r) for r in recs]
      pm = []
      m = 0
      for e in ends:
        m = max(m, e)
        pm.append(m)
      self._prefix_max_end[contig] = (ends, pm)

  def fetch(self, contig: str, start: int, stop: int):
    recs = self.by_contig.get(contig, [])
    starts = self._starts.get(contig, [])
    if not recs:
      return []
    ends, prefix_max = self._prefix_max_end[contig]
    # Candidates: pos < stop (bisect hi) AND end > start. prefix_max is
    # nondecreasing, so the first index whose running-max end exceeds
    # `start` bounds the scan from below.
    hi = bisect.bisect_left(starts, stop)
    lo = bisect.bisect_right(prefix_max, start)
    return [r for i, r in enumerate(recs[lo:hi], lo) if ends[i] > start]


def get_quality_calibration_stats(
    reads,
    ref_sequence: str,
    region_interval: RegionRecord,
    min_mapq: int,
    dc_calibration: calibration_lib.QualityCalibrationValues,
) -> np.ndarray:
  """Counts [M, X] per base quality (vectorized per cigar segment).

  Returns an int64 array of shape (MAX_BASEQ, 2) with columns (M, X).
  (reference: calculate_baseq_calibration.py:303-375)
  """
  counts = np.zeros((MAX_BASEQ, 2), dtype=np.int64)
  ref_bytes = np.frombuffer(ref_sequence.upper().encode('ascii'), np.uint8)

  for read in reads:
    if (
        read.is_unmapped
        or (read.flag & (0x400 | 0x200 | bam.FLAG_SECONDARY))
        or read.is_supplementary
        or read.mapq < min_mapq
    ):
      continue
    quals = np.asarray(read.qual, dtype=np.int64)
    if dc_calibration.enabled:
      quals = calibration_lib.calibrate_quality_scores(
          quals.astype(np.uint8), dc_calibration
      )
      quals = np.round(quals, decimals=0).astype(np.int32)
    seq = np.frombuffer(read.seq.upper().encode('ascii'), np.uint8)

    ref_pos = read.pos
    read_idx = 0
    for op, length in read.cigartuples:
      if ref_pos > region_interval.stop:
        break
      if op in _MATCH_OPS:
        # Window clip in reference coordinates (inclusive stop, matching
        # the reference's <= comparison).
        lo = max(region_interval.start, ref_pos)
        hi = min(region_interval.stop, ref_pos + length - 1)
        if hi >= lo:
          seg = slice(read_idx + (lo - ref_pos), read_idx + (hi - ref_pos) + 1)
          region_idx = np.arange(lo, hi + 1) - region_interval.start
          valid = region_idx < len(ref_bytes)
          rb = ref_bytes[region_idx[valid]]
          sb = seq[seg][valid]
          qb = quals[seg][valid]
          acgt = _IS_ACGT[rb]
          is_match = (rb == sb) & acgt
          is_mismatch = (rb != sb) & acgt
          np.add.at(counts[:, 0], qb[is_match], 1)
          np.add.at(counts[:, 1], qb[is_mismatch], 1)
        read_idx += length
        ref_pos += length
      elif op in _INS_OPS:
        if region_interval.start <= ref_pos <= region_interval.stop:
          np.add.at(counts[:, 1], quals[read_idx : read_idx + length], 1)
        read_idx += length
      elif op in _DEL_OPS:
        ref_pos += length
  return counts


_PREFORK_INDEX = {}  # path -> InMemoryBamIndex, built before the pool


def _open_region_index(bam_path: str):
  """BAI-backed fetch when an index exists (whole-genome scale);
  in-memory scan otherwise (shared from the parent via fork when the
  pool runner pre-built it — each worker re-decoding the whole BAM cost
  O(workers * bam), review r5)."""
  import os

  if bam_path in _PREFORK_INDEX:
    return _PREFORK_INDEX[bam_path]
  if os.path.exists(bam_path + '.bai'):
    from deepconsensus_tpu.io import bai

    return bai.IndexedBamReader(bam_path)
  return InMemoryBamIndex(bam_path)


def calculate_for_intervals(
    args: Tuple,
) -> np.ndarray:
  """Worker: accumulate stats for a list of intervals."""
  bam_path, fasta_path, intervals, min_mapq, dc_calibration_str = args
  index = _open_region_index(bam_path)
  fasta = fastq.FastaReader(fasta_path)
  dc_cal = calibration_lib.parse_calibration_string(dc_calibration_str)
  total = np.zeros((MAX_BASEQ, 2), dtype=np.int64)
  for region in intervals:
    ref_seq = fasta.fetch(region.contig, region.start, region.stop + 5)
    reads = index.fetch(region.contig, region.start, region.stop)
    total += get_quality_calibration_stats(
        reads, ref_seq, region, min_mapq, dc_cal
    )
  return total


def run(
    bam_path: str,
    fasta: str,
    output_csv: str,
    region: Optional[str] = None,
    interval_size: int = 1000,
    cpus: int = 0,
    min_mapq: int = 60,
    dc_calibration: str = 'skip',
) -> np.ndarray:
  """Computes and writes the per-quality match/mismatch CSV."""
  fasta_reader = fastq.FastaReader(fasta)
  with bam.BamReader(bam_path) as r:
    bam_contigs = set(r.header.ref_names)
  common = [c for c in fasta_reader.references if c in bam_contigs]

  regions = []
  if region:
    for part in region.split(','):
      rec = process_region_string(part, fasta_reader)
      if rec.contig not in common:
        raise ValueError(f'Contig {rec.contig} not found in BAM or FASTA.')
      regions.append(rec)
  else:
    for contig in common:
      regions.append(RegionRecord(contig, 0, fasta_reader.get_length(contig)))
  intervals = split_regions_in_intervals(regions, interval_size)

  if cpus and cpus > 1:
    import multiprocessing
    import os as os_lib

    if not os_lib.path.exists(bam_path + '.bai') and (
        multiprocessing.get_start_method(allow_none=True) in (None, 'fork')
    ):
      # Build the in-memory index ONCE pre-fork; workers inherit the
      # pages copy-on-write instead of each decoding the whole BAM.
      _PREFORK_INDEX[bam_path] = InMemoryBamIndex(bam_path)
    shards = [
        (bam_path, fasta, intervals[i::cpus], min_mapq, dc_calibration)
        for i in range(cpus)
    ]
    total = np.zeros((MAX_BASEQ, 2), dtype=np.int64)
    try:
      with concurrent.futures.ProcessPoolExecutor(max_workers=cpus) as pool:
        for part in pool.map(calculate_for_intervals, shards):
          total += part
    finally:
      _PREFORK_INDEX.pop(bam_path, None)
  else:
    total = calculate_for_intervals(
        (bam_path, fasta, intervals, min_mapq, dc_calibration)
    )

  with open(output_csv, 'w', newline='') as f:
    writer = csv.writer(f)
    writer.writerow(['baseq', 'total_match', 'total_mismatch'])
    for q in range(MAX_BASEQ):
      writer.writerow([q, total[q, 0], total[q, 1]])
  logger.info('Processing complete.')
  return total
