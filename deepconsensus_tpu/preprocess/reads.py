"""Aligned-read data model and CCS-coordinate expansion.

Behavioral contract follows reference `deepconsensus/preprocess/pre_lib.py`:
`Read` (pre_lib.py:110-421), `trim_insertions` (pre_lib.py:1061-1125),
`expand_clip_indent` (pre_lib.py:1128-1239), `construct_ccs_read`
(pre_lib.py:966-998). The implementation is numpy-vectorized end to end; no
per-base Python loops.
"""

import dataclasses
from typing import Any, Counter, Dict, Optional, Union

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import bam
from deepconsensus_tpu.utils import phred

GAP_BYTE = np.uint8(ord(constants.GAP))

# Cigar ops that appear in one expanded (per-position) alignment column.
_PAIR_OPS_QUERY = np.zeros(10, dtype=bool)
for _op in constants.QUERY_ADVANCING_OPS:
  _PAIR_OPS_QUERY[_op] = True
_PAIR_OPS_REF = np.zeros(10, dtype=bool)
for _op in constants.REF_ADVANCING_OPS:
  _PAIR_OPS_REF[_op] = True
_READ_ADVANCING_MASK = np.zeros(10, dtype=bool)
for _op in constants.READ_ADVANCING_OPS:
  _READ_ADVANCING_MASK[_op] = True


@dataclasses.dataclass
class AlignedRead:
  """One sequence aligned into CCS coordinates.

  bases are stored as uint8 ASCII codes (vectorization-friendly, unlike the
  reference's '<U1' object-ish arrays). All per-position arrays share length.
  """

  name: str
  bases: np.ndarray  # uint8 ASCII
  cigar: np.ndarray  # uint8 cigar op per position
  pw: np.ndarray  # uint8
  ip: np.ndarray  # uint8
  sn: np.ndarray  # float, shape (4,) for subreads; empty for labels
  strand: int

  # Aux tags, present on the CCS read only.
  ec: Optional[float] = None
  np_num_passes: Optional[int] = None
  rq: Optional[float] = None
  rg: Optional[str] = None

  ccs_idx: np.ndarray = dataclasses.field(
      default_factory=lambda: np.empty(0, dtype=np.int64)
  )
  base_quality_scores: np.ndarray = dataclasses.field(
      default_factory=lambda: np.empty(0, dtype=np.int64)
  )

  truth_idx: np.ndarray = dataclasses.field(
      default_factory=lambda: np.empty(0, dtype=np.int64)
  )
  truth_range: Union[Dict[str, Any], None] = None

  @property
  def is_label(self) -> bool:
    return self.truth_range is not None

  @property
  def zmw(self) -> int:
    return int(self.name.split('/')[1])

  @property
  def bases_encoded(self) -> np.ndarray:
    """Vocab-id encoding of bases, as float32 (example dtype contract)."""
    return constants.BASE_TO_ID[self.bases].astype(constants.NP_DATA_TYPE)

  @property
  def avg_base_quality_score(self) -> float:
    return phred.avg_phred(self.base_quality_scores)

  def __len__(self) -> int:
    return len(self.bases)

  def __str__(self) -> str:
    return self.bases.tobytes().decode('ascii')

  @property
  def ccs_bounds(self) -> slice:
    """Min/max covered CCS coordinate (inclusive max, reference contract)."""
    covered = self.ccs_idx[self.ccs_idx != -1]
    if covered.size == 0:
      return slice(0, 0)
    return slice(int(covered.min()), int(covered.max()))

  @property
  def label_bounds(self) -> slice:
    covered = self.truth_idx[self.truth_idx != -1]
    if covered.size == 0:
      return slice(0, 0)
    return slice(int(covered.min()), int(covered.max()))

  @property
  def label_coords(self) -> str:
    if self.is_label:
      b = self.label_bounds
      return f'{self.truth_range["contig"]}:{b.start}-{b.stop}'
    return ''

  def slice_cols(self, sl: slice) -> 'AlignedRead':
    """Slices all per-position arrays (reference: Read.__getitem__)."""
    return AlignedRead(
        name=self.name,
        bases=self.bases[sl],
        cigar=self.cigar[sl],
        pw=self.pw[sl],
        ip=self.ip[sl],
        sn=self.sn,
        strand=self.strand,
        ec=self.ec,
        np_num_passes=self.np_num_passes,
        rq=self.rq,
        rg=self.rg,
        ccs_idx=self.ccs_idx[sl],
        base_quality_scores=self.base_quality_scores[sl],
        truth_idx=self.truth_idx[sl],
        truth_range=self.truth_range,
    )

  def ccs_slice(self, start: int, end: int) -> 'AlignedRead':
    """Slices by CCS coordinates; bounds inclusive (reference contract).

    Quirk replicated bit-for-bit from the reference (pre_lib.py:314
    `if locs.any():`): when the ONLY matching column is array index 0,
    `any()` over [0] is falsy and the reference returns an EMPTY read —
    so must we, or generated training examples diverge on such windows
    (review r5 caught `locs.size` silently "fixing" this).
    """
    locs = np.where((self.ccs_idx >= start) & (self.ccs_idx <= end))[0]
    if locs.any():
      sl = slice(int(locs.min()), int(locs.max()) + 1)
    else:
      sl = slice(0, 0)
    return self.slice_cols(sl)

  def pad(self, pad_width: int) -> 'AlignedRead':
    """Right-pads all arrays to pad_width (no-op when already long enough)."""
    n = len(self.bases)
    if n >= pad_width:
      return self
    def rp(arr, value, dtype=None):
      out = np.full(pad_width, value, dtype=dtype or arr.dtype)
      out[: len(arr)] = arr
      return out

    # Like the reference's right_pad (pre_lib.py:336-356), empty
    # base_quality_scores / truth_idx arrays pad out to all -1.
    return AlignedRead(
        name=self.name,
        bases=rp(self.bases, GAP_BYTE),
        cigar=rp(self.cigar, constants.CHARD_CLIP),
        pw=rp(self.pw, 0),
        ip=rp(self.ip, 0),
        sn=self.sn,
        strand=self.strand,
        ec=self.ec,
        np_num_passes=self.np_num_passes,
        rq=self.rq,
        rg=self.rg,
        ccs_idx=rp(self.ccs_idx, -1),
        base_quality_scores=rp(self.base_quality_scores, -1, dtype=np.int64),
        truth_idx=rp(self.truth_idx, -1, dtype=np.int64),
        truth_range=self.truth_range,
    )

  def remove_gaps(self, pad_width: int) -> Optional['AlignedRead']:
    """Drops gap columns then pads; None if the result would overflow."""
    keep = self.bases != GAP_BYTE
    if int(keep.sum()) > pad_width:
      return None
    kept = AlignedRead(
        name=self.name,
        bases=self.bases[keep],
        cigar=self.cigar[keep],
        pw=self.pw[keep],
        ip=self.ip[keep],
        sn=self.sn,
        strand=self.strand,
        ec=self.ec,
        np_num_passes=self.np_num_passes,
        rq=self.rq,
        rg=self.rg,
        ccs_idx=self.ccs_idx[keep],
        base_quality_scores=(
            self.base_quality_scores[keep]
            if self.base_quality_scores.any()
            else np.empty(0, dtype=np.int64)
        ),
        truth_idx=self.truth_idx[keep] if self.truth_idx.size else self.truth_idx,
        truth_range=self.truth_range,
    )
    return kept.pad(pad_width)


def trim_insertions(
    record: bam.BamRecord,
    ins_trim: int,
    counter: Optional[Counter] = None,
) -> bam.BamRecord:
  """Removes insertions longer than ins_trim from a subread alignment.

  Mutates seq/cigartuples and pw/ip tags in query space, with strand-aware
  reversal of the pw/ip masks (reference: pre_lib.py:1061-1125).
  """
  if ins_trim <= 0:
    return record
  ops = record.cigar_ops
  lens = record.cigar_lens
  if ops.size == 0:
    return record

  # Reference consumes query for every op except DEL (pre_lib.py:1103-1105);
  # replicate that literal behavior.
  consumes_query = ops != constants.CDEL
  drop = (ops == constants.CINS) & (lens > ins_trim)

  if counter is not None:
    counter['zmw_trimmed_insertions'] += int(drop.sum())
    counter['zmw_trimmed_insertions_bp'] += int(lens[drop].sum())
    counter['zmw_total_bp'] += int(lens.sum())

  # Query-space keep mask.
  qlens = np.where(consumes_query, lens, 0)
  qstarts = np.concatenate([[0], np.cumsum(qlens)[:-1]])
  total_q = int(qlens.sum())
  if total_q != record.seq_len:
    # Hard-clip / ref-skip cigars: the non-DEL ops would claim more
    # query bases than the sequence has. The reference's list-based
    # code misbehaves here too (out-of-range slice assignments silently
    # grow its mask); such cigars are outside the actc
    # subreads_to_ccs contract, so fail with a diagnosable error rather
    # than a boolean-index shape crash (review r5).
    raise ValueError(
        f'{record.qname}: cigar consumes {total_q} query bases but the '
        f'sequence is {record.seq_len} long — hard-clip/ref-skip cigars '
        'are not supported by insertion trimming'
    )
  mask = np.ones(total_q, dtype=bool)
  for i in np.where(drop)[0]:
    mask[qstarts[i] : qstarts[i] + lens[i]] = False

  record.set_seq_bytes(record.seq_bytes[mask])
  record.set_cigar_arrays(ops[~drop], lens[~drop])

  for tag in ('pw', 'ip'):
    if record.has_tag(tag):
      vals = np.asarray(record.get_tag(tag))
      if vals.size:
        if vals.size != mask.size:
          # The reference fails on this too (boolean index length
          # mismatch); a silent prefix-truncation would misassign
          # kinetics, worst on reverse strands (review r5).
          raise ValueError(
              f'{record.qname}: {tag} tag has {vals.size} values for a '
              f'{mask.size}-base query'
          )
        m = mask[::-1] if record.is_reverse else mask
        record.set_tag(tag, vals[m])
  return record


def expand_clip_indent(
    record: bam.BamRecord,
    truth_range: Union[Dict[str, Any], None] = None,
    ins_trim: int = 0,
    counter: Optional[Counter] = None,
) -> AlignedRead:
  """Expands an alignment into per-CCS-position arrays.

  Deletions become gap columns, soft/hard clips are dropped, the array is
  indented by the alignment start, and pw/ip are reversed on the reverse
  strand (reference: pre_lib.py:1128-1239), all with vectorized numpy.
  """
  if ins_trim > 0:
    record = trim_insertions(record, ins_trim, counter)

  ops = record.cigar_ops
  lens = record.cigar_lens
  in_pair = _PAIR_OPS_QUERY[ops] | _PAIR_OPS_REF[ops]
  pair_ops = np.repeat(ops[in_pair], lens[in_pair])
  aln_len = len(pair_ops)

  consumes_q = _PAIR_OPS_QUERY[pair_ops]
  consumes_r = _PAIR_OPS_REF[pair_ops]
  has_soft_clip = bool((pair_ops == constants.CSOFT_CLIP).any())

  strand = (
      constants.Strand.REVERSE if record.is_reverse else constants.Strand.FORWARD
  )

  if not has_soft_clip and record.pos:
    # Common case: allocate at the indented size once and fill the
    # aligned region in place, instead of concatenating pad blocks later.
    pad = record.pos
    new_seq = np.full(pad + aln_len, GAP_BYTE, dtype=np.uint8)
    new_cigar = np.full(pad + aln_len, constants.CREF_SKIP, dtype=np.uint8)
    new_cigar[pad:] = pair_ops
    new_pw = np.zeros(pad + aln_len, dtype=np.uint8)
    new_ip = np.zeros(pad + aln_len, dtype=np.uint8)
    ccs_idx = np.full(pad + aln_len, -1, dtype=np.int32)
    body = slice(pad, None)
  else:
    pad = 0
    new_seq = np.full(aln_len, GAP_BYTE, dtype=np.uint8)
    new_cigar = pair_ops
    new_pw = np.zeros(aln_len, dtype=np.uint8)
    new_ip = np.zeros(aln_len, dtype=np.uint8)
    ccs_idx = np.full(aln_len, -1, dtype=np.int32)
    body = slice(None)

  ccs_idx[body][consumes_r] = record.pos + np.arange(int(consumes_r.sum()))
  new_seq[body][consumes_q] = record.seq_bytes
  if not truth_range:
    pw_vals = np.asarray(record.get_tag('pw'))
    ip_vals = np.asarray(record.get_tag('ip'))
    if strand == constants.Strand.REVERSE:
      pw_vals = pw_vals[::-1]
      ip_vals = ip_vals[::-1]
    # Bare uint8 cast WRAPS values > 255 (300 -> 44) — deliberately: the
    # reference assigns the raw tag arrays into a uint8 buffer
    # (pre_lib.py:1165-1186 `new_pw = np.repeat(np.uint8(0), ...)`;
    # numpy assignment wraps), so wide 'B,S' kinetics tags wrap there
    # too, BEFORE the PW_MAX clip at model input ever sees them.
    # Bit-parity requires reproducing that wrap, not "fixing" it.
    new_pw[body][consumes_q] = pw_vals.astype(np.uint8)
    new_ip[body][consumes_q] = ip_vals.astype(np.uint8)
    sn = np.asarray(record.get_tag('sn'))
  else:
    sn = np.empty(0, dtype=np.uint8)

  # Remove soft-clipped segments.
  if has_soft_clip:
    read_idx = np.full(aln_len, -1, dtype=np.int64)
    read_idx[consumes_q] = np.arange(int(consumes_q.sum()))
    new_seq[new_cigar == constants.CSOFT_CLIP] = GAP_BYTE
    qstart = int(np.where(read_idx == record.query_alignment_start)[0][0])
    qend = int(np.where(read_idx == record.query_alignment_end - 1)[0][0]) + 1
    if truth_range:
      op0, len0 = record.cigartuples[0]
      if op0 == constants.CSOFT_CLIP:
        truth_range['begin'] += len0
      opn, lenn = record.cigartuples[-1]
      if opn == constants.CSOFT_CLIP:
        truth_range['end'] -= lenn
    new_seq = new_seq[qstart:qend]
    new_pw = new_pw[qstart:qend]
    new_ip = new_ip[qstart:qend]
    new_cigar = new_cigar[qstart:qend]
    ccs_idx = ccs_idx[qstart:qend]

  # Indent by alignment start so array index ~ CCS coordinate (the
  # soft-clip branch still pads by concatenation; it is rare).
  if record.pos and not pad:
    pad = record.pos
    new_seq = np.concatenate([np.full(pad, GAP_BYTE, dtype=np.uint8), new_seq])
    new_cigar = np.concatenate(
        [np.full(pad, constants.CREF_SKIP, dtype=np.uint8), new_cigar]
    )
    new_pw = np.concatenate([np.zeros(pad, dtype=np.uint8), new_pw])
    new_ip = np.concatenate([np.zeros(pad, dtype=np.uint8), new_ip])
    ccs_idx = np.concatenate([np.full(pad, -1, dtype=np.int32), ccs_idx])

  return AlignedRead(
      name=record.qname,
      bases=new_seq,
      cigar=new_cigar,
      pw=new_pw,
      ip=new_ip,
      sn=sn,
      strand=int(strand),
      ccs_idx=ccs_idx,
      truth_range=truth_range,
  )


def construct_ccs_read(ccs_record: bam.BamRecord) -> AlignedRead:
  """Builds the CCS AlignedRead with qualities and aux tags.

  (reference: pre_lib.py:966-998)
  """
  seq = ccs_record.seq_bytes
  n = len(seq)
  tags = ccs_record.tags
  if ccs_record.qual is None:
    # bam.py deliberately models QUAL='*' (all 0xFF) as None; the CCS
    # pipeline requires base qualities (triage, skipped-window adoption),
    # so fail with a diagnosable error instead of a numpy TypeError
    # taking down the shard (review r5). The feeder skips such ZMWs.
    raise ValueError(
        f'CCS record {ccs_record.qname} has no base qualities (QUAL=*)'
    )
  return AlignedRead(
      name=ccs_record.qname,
      bases=seq.copy(),
      cigar=np.full(n, constants.CMATCH, dtype=np.uint8),
      pw=np.zeros(n, dtype=np.uint8),
      ip=np.zeros(n, dtype=np.uint8),
      sn=np.zeros(4, dtype=np.int64),
      strand=int(constants.Strand.UNKNOWN),
      ec=tags.get('ec'),
      np_num_passes=tags.get('np'),
      rq=tags.get('rq'),
      rg=tags.get('RG'),
      ccs_idx=np.arange(n, dtype=np.int32),
      base_quality_scores=np.asarray(ccs_record.qual, dtype=np.int64),
  )
