"""Streaming ZMW feeder: groups subreads, attaches CCS + truth labels.

Reimplements the reference's SubreadGrouper / create_proc_feeder pipeline
(reference: preprocess/pre_lib.py:50-91,966-1058,1279-1367) on top of this
framework's own BAM reader.
"""

import collections
import logging
from typing import Any, Dict, Iterator, List, Optional, Union

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import bam
from deepconsensus_tpu.preprocess import reads as reads_lib
from deepconsensus_tpu.preprocess.windows import DcConfig

Issue = constants.Issue

logger = logging.getLogger(__name__)


class SubreadGrouper:
  """Iterates a subreads_to_ccs BAM yielding mapped subreads per ZMW.

  (reference: pre_lib.py:50-91; grouping key is the `zm` tag)
  """

  def __init__(self, subreads_to_ccs: str, reader_threads: int = 1):
    # The native reader already threads BGZF inflate and record decode
    # across all cores (io/bam.py batch path); the flag is accepted for
    # reference CLI compatibility (--bam_reader_threads).
    del reader_threads
    self._reader = bam.BamReader(subreads_to_ccs)
    self.header = self._reader.header
    self._pending: List[bam.BamRecord] = []
    self._zmw: Optional[int] = None
    self._done = False
    # Prime with the first record.
    try:
      first = next(self._reader)
      self._zmw = first.get_tag('zm')
      if not first.is_unmapped:
        self._pending.append(first)
    except StopIteration:
      self._done = True

  def __iter__(self) -> Iterator[List[bam.BamRecord]]:
    return self

  def __next__(self) -> List[bam.BamRecord]:
    if self._done:
      if self._pending:
        group, self._pending = self._pending, []
        return group
      raise StopIteration
    while True:
      try:
        rec = next(self._reader)
      except StopIteration:
        self._done = True
        if self._pending:
          group, self._pending = self._pending, []
          return group
        raise
      if rec.is_unmapped:
        continue
      zm = rec.get_tag('zm')
      if zm == self._zmw:
        self._pending.append(rec)
      else:
        group, self._pending = self._pending, [rec]
        self._zmw = zm
        if group:
          return group


def read_truth_bedfile(truth_bed: str) -> Dict[str, Dict[str, Any]]:
  """Reads a truth bed into {ccs_seqname: {contig, begin, end}}.

  (reference: pre_lib.py:1017-1025)
  """
  bed_coords = {}
  with open(truth_bed) as bedfile:
    for line in bedfile:
      if not line.strip():
        continue  # tolerate trailing/blank lines
      contig, begin, end, ccs_seqname = line.strip().split('\t')[:4]
      bed_coords[ccs_seqname] = {
          'contig': contig,
          'begin': int(begin),
          'end': int(end),
      }
  return bed_coords


def read_truth_split(split_fname: str) -> Dict[str, str]:
  """Maps contigs to train/eval/test splits by genome region tables.

  (reference: pre_lib.py:1028-1058)
  """
  split_regions = {}
  lower = split_fname.lower()
  if any(x in lower for x in ['chm13', 'hg00', 'human']):
    genome = 'HUMAN'
  elif 'maize' in lower:
    genome = 'MAIZE'
  else:
    raise ValueError(
        f'{split_fname} does not correspond to any genome with defined '
        'train/eval/test regions (expected chm13/hg00/human/maize in name).'
    )
  for i in constants.TRAIN_REGIONS[genome]:
    split_regions[i] = 'train'
  for i in constants.EVAL_REGIONS[genome]:
    split_regions[i] = 'eval'
  for i in constants.TEST_REGIONS[genome]:
    split_regions[i] = 'test'
  contig_split = {}
  with open(split_fname) as f:
    for line in f:
      if not line.strip():
        continue  # tolerate trailing/blank lines
      contig, chrom = line.split()
      if chrom in split_regions:
        contig_split[contig] = split_regions[chrom]
  return contig_split


def _load_truth_index(truth_to_ccs: str) -> Dict[str, List[bam.BamRecord]]:
  """Truth lookup table; uses the .bai index when present (the reference
  requires one, pre_lib.py:1304), else a one-pass in-memory scan."""
  import os

  bai_path = truth_to_ccs + '.bai'
  if os.path.exists(bai_path):
    from deepconsensus_tpu.io import bai

    reader = bai.IndexedBamReader(truth_to_ccs, bai_path)
    index: Dict[str, List[bam.BamRecord]] = {}
    for name in reader.header.ref_names:
      recs = list(reader.fetch(name))
      if recs:
        index[name] = recs
    return index
  _, index = bam.index_by_reference(truth_to_ccs)
  return index


def fetch_label_alignment(
    ccs_seqname: str,
    truth_index: Dict[str, List[bam.BamRecord]],
    truth_range: Dict[str, Any],
) -> Union[Issue, reads_lib.AlignedRead]:
  """Finds the truth alignment for one CCS read (pre_lib.py:1001-1014)."""
  recs = truth_index.get(ccs_seqname)
  if not recs:
    return Issue.TRUTH_ALIGNMENT_NOT_FOUND
  rec = recs[0]
  if rec.is_supplementary:
    return Issue.SUPP_TRUTH_ALIGNMENT
  return reads_lib.expand_clip_indent(rec, truth_range)


def create_proc_feeder(
    subreads_to_ccs: str,
    ccs_bam: str,
    dc_config: DcConfig,
    ins_trim: int = 0,
    use_ccs_smart_windows: bool = False,
    truth_bed: Optional[str] = None,
    truth_to_ccs: Optional[str] = None,
    truth_split: Optional[str] = None,
    limit: int = 0,
    bam_reader_threads: int = 1,
):
  """Creates the per-ZMW input generator plus a shared counter.

  Yields tuples (reads, ccs_seqname, dc_config, split, window_widths)
  exactly like the reference (pre_lib.py:1279-1367).
  """
  main_counter = collections.Counter()
  subread_grouper = SubreadGrouper(subreads_to_ccs, bam_reader_threads)
  ccs_reader = bam.BamReader(ccs_bam)

  is_training = bool(truth_bed and truth_to_ccs and truth_split)
  if is_training:
    truth_index = _load_truth_index(truth_to_ccs)
    truth_ref_coords = read_truth_bedfile(truth_bed)
    truth_split_dict = read_truth_split(truth_split)

  # Resync buffer: the ccs bam is normally sorted in the same ZMW order
  # as subreads_to_ccs (the reference assumes exactly that and raises on
  # any divergence, pre_lib.py:1320-1326). Owning the BAM layer lets us
  # do better: records scanned past during a lookup are parked here so a
  # later ZMW can still find them, and a genuinely absent record skips
  # just that ZMW (counted) instead of killing the whole shard. The park
  # is capped, and overflowing the cap RAISES: silently evicting would
  # discard records an in-order stream needs next, so one missing record
  # in a large shard would silently drop every downstream ZMW. Raising
  # matches the reference's fail-loud behavior for large divergence
  # while keeping the skip-one-ZMW upgrade for bounded divergence.
  ccs_parked: 'collections.OrderedDict[str, object]' = collections.OrderedDict()
  _PARKED_CAP = 4096

  def find_ccs_record(ccs_seqname):
    if ccs_seqname in ccs_parked:
      return ccs_parked.pop(ccs_seqname)
    for cand in ccs_reader:
      if cand.qname == ccs_seqname:
        return cand
      ccs_parked[cand.qname] = cand
      if len(ccs_parked) > _PARKED_CAP:
        raise IOError(
            f'ccs bam order diverges from subreads_to_ccs by more than '
            f'{_PARKED_CAP} records while looking for {ccs_seqname!r} — '
            'are the two BAMs from the same actc run and sort order?'
        )
    return None

  def proc_feeder():
    for read_set in subread_grouper:
      main_counter['n_zmw_processed'] += 1
      subreads = [
          reads_lib.expand_clip_indent(
              rec, truth_range=None, ins_trim=ins_trim, counter=main_counter
          )
          for rec in read_set
      ]
      ccs_seqname = read_set[0].reference_name
      ccs_bam_read = find_ccs_record(ccs_seqname)
      if ccs_bam_read is None:
        logger.warning(
            'ccs bam does not contain %s; skipping ZMW.', ccs_seqname
        )
        main_counter['n_zmw_missing_ccs_record'] += 1
        continue

      try:
        ccs_read = reads_lib.construct_ccs_read(ccs_bam_read)
      except ValueError as e:
        logger.warning('skipping ZMW %s: %s', ccs_seqname, e)
        main_counter['n_zmw_missing_ccs_quals'] += 1
        continue
      window_widths = None
      if use_ccs_smart_windows:
        window_widths = np.asarray(ccs_bam_read.get_tag('wl'))
      subreads.append(ccs_read)

      if is_training:
        truth_range = truth_ref_coords.get(ccs_seqname, None)
        if not truth_range:
          logger.info('No truth_range defined for %s.', ccs_seqname)
          main_counter['n_zmw_missing_truth_range'] += 1
          continue
        label = fetch_label_alignment(
            ccs_seqname, truth_index, dict(truth_range)
        )
        if label == Issue.TRUTH_ALIGNMENT_NOT_FOUND:
          logger.info('Unable to fetch label alignment for %s.', ccs_seqname)
          main_counter['n_zmw_no_label_alignment'] += 1
          continue
        elif label == Issue.SUPP_TRUTH_ALIGNMENT:
          main_counter['n_zmw_truth_label_supp_alignment'] += 1
          continue
        subreads.append(label)
        split = truth_split_dict.get(label.truth_range['contig'], None)
        if not split:
          logger.info('No split defined for %s.', ccs_seqname)
          main_counter['n_zmw_missing_contig_split'] += 1
          continue
      else:
        split = 'inference'
      main_counter[f'n_zmw_{split}'] += 1
      main_counter['n_zmw_pass'] += 1
      yield (subreads, ccs_seqname, dc_config, split, window_widths)
      if limit and main_counter['n_zmw_pass'] >= limit:
        break

  return proc_feeder, main_counter
