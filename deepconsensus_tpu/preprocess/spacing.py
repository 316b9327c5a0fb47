"""Vectorized gap-aware multi-read spacing (the MSA step).

Reimplements the semantics of the reference's per-base Python state machine
`space_out_subreads` (reference: preprocess/pre_lib.py:176-276,1242-1276) in
closed form with numpy. The reference sweeps all reads left-to-right one
output column per iteration; whenever any non-label read's next position is
an insertion, every read without an insertion at its cursor receives a gap.
Labels never pause the sweep: their insertions are emitted inline on the
label's own (longer) axis.

Closed-form reformulation
-------------------------
For a non-label read, position p is either its m-th non-insertion position
(these advance through CCS coordinates in lockstep across reads) or the k-th
insertion of "junction" j (insertions emitted between match columns j-1 and
j). With J[j] = max over reads of the number of insertions at junction j and
S[j] = sum_{j' <= j} J[j']:

    col(match m)          = S[m] + m
    col(ins j, rank k)    = S[j] - J[j] + j + k        (left-aligned block)

A label's gap/emit stream mirrors the global column stream with its own
insertion columns injected, so with LI(p) = number of label insertions
strictly before p:

    label_col(non-ins m)  = S[m] + m + LI(p)
    label_col(ins j, k)   = (S[j] - J[j] + j) + LI(p)

Spaced lengths equal each read's final cursor in the reference simulation:
last emission column + 1, except a label ending in insertions, which then
absorbs the remaining junction block: S[nL] + nL + LI_total.

This turns an O(total_bases) Python loop (the reason the reference needs a
process pool) into ~20 numpy kernels per ZMW.
"""

from typing import List, Tuple

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.preprocess.reads import (
    _READ_ADVANCING_MASK,
    AlignedRead,
    GAP_BYTE,
)


def _insertion_geometry(
    cigar: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int]:
  """Returns (is_ins, m_of_pos, junction_of_ins, rank_of_ins, n_match).

  m_of_pos[p] = number of non-insertion positions strictly before p (for a
  non-insertion position, its match index; for an insertion, its junction).
  """
  is_ins = cigar == constants.CINS
  not_ins = ~is_ins
  m_of_pos = np.cumsum(not_ins) - not_ins  # exclusive prefix count
  n_match = int(not_ins.sum())
  junction_of_ins = m_of_pos[is_ins]
  # Rank within each consecutive insertion run.
  c = np.cumsum(is_ins)
  last_nonins_c = np.maximum.accumulate(np.where(not_ins, c, 0))
  rank = (c - last_nonins_c - 1)[is_ins]
  return is_ins, m_of_pos, junction_of_ins, rank, n_match


def space_out_subreads(reads: List[AlignedRead]) -> List[AlignedRead]:
  """Spaces out reads to make room for insertions in any subset of them.

  Input order convention matches the reference: subreads..., ccs[, label].
  Returns new AlignedRead objects whose bases/pw/ip/ccs_idx (and, for the
  CCS read, base_quality_scores; for labels, cigar/truth_idx) are spaced and
  right-padded to a common length.
  """
  geoms = [_insertion_geometry(r.cigar) for r in reads]

  # Junction insertion maxima over non-label reads.
  max_match = max(
      (g[4] for g, r in zip(geoms, reads) if not r.is_label), default=0
  )
  max_match = max(
      max_match, max((g[4] for g in geoms), default=0)
  )  # extend axis for long labels
  J = np.zeros(max_match + 1, dtype=np.int64)
  for r, (is_ins, _, junc, _, n_match) in zip(reads, geoms):
    if r.is_label or not is_ins.any():
      continue
    counts = np.bincount(junc, minlength=max_match + 1)
    np.maximum(J, counts, out=J)
  S = np.cumsum(J)

  cols: List[np.ndarray] = []
  finals: List[int] = []
  for r, (is_ins, m_of_pos, junc, rank, n_match) in zip(reads, geoms):
    L = len(r.cigar)
    if L == 0:
      cols.append(np.empty(0, dtype=np.int64))
      finals.append(0)
      continue
    col = np.empty(L, dtype=np.int64)
    not_ins = ~is_ins
    m = m_of_pos[not_ins]
    col[not_ins] = S[m] + m
    if is_ins.any():
      if r.is_label:
        # Label insertions are all consumed at the start of the junction's
        # first global iteration; their columns advance only through the
        # label-insertion offset LI(p) added below.
        col[is_ins] = S[junc] - J[junc] + junc
      else:
        col[is_ins] = S[junc] - J[junc] + junc + rank
    if r.is_label:
      li = np.cumsum(is_ins) - is_ins  # label insertions strictly before p
      col = col + li
      if is_ins[-1]:
        # Label ends in insertions at junction n_match: the cursor then
        # walks out the rest of that junction block before finishing.
        li_total = int(is_ins.sum())
        finals.append(int(S[n_match] + n_match + li_total))
      else:
        finals.append(int(col[-1]) + 1)
    else:
      finals.append(int(col[-1]) + 1)
    cols.append(col)

  max_len = max(finals, default=0)

  spaced: List[AlignedRead] = []
  for r, col in zip(reads, cols):
    bases = np.full(max_len, GAP_BYTE, dtype=np.uint8)
    pw = np.zeros(max_len, dtype=np.uint8)
    ip = np.zeros(max_len, dtype=np.uint8)
    ccs_idx = np.full(max_len, -1, dtype=np.int64)
    bases[col] = r.bases
    pw[col] = r.pw
    ip[col] = r.ip
    ccs_idx[col] = r.ccs_idx

    cigar = r.cigar
    truth_idx = r.truth_idx
    if r.is_label:
      # Labels carry a spaced cigar and per-column truth coordinates
      # (reference: pre_lib.py:228-239).
      cigar = np.full(max_len, constants.CHARD_CLIP, dtype=np.uint8)
      cigar[col] = r.cigar
      truth_idx = np.full(max_len, -1, dtype=np.int64)
      advancing = _READ_ADVANCING_MASK[cigar]
      coords = np.arange(r.truth_range['begin'], r.truth_range['end'])
      if int(advancing.sum()) != len(coords):
        raise ValueError(
            f'label {r.name}: {int(advancing.sum())} read-advancing columns '
            f'vs truth range of {len(coords)}'
        )
      truth_idx[advancing] = coords

    bq = r.base_quality_scores
    if bq.any():
      spaced_bq = np.full(max_len, -1, dtype=np.int64)
      spaced_bq[col] = bq
      bq = spaced_bq

    spaced.append(
        AlignedRead(
            name=r.name,
            bases=bases,
            cigar=cigar,
            pw=pw,
            ip=ip,
            sn=r.sn,
            strand=r.strand,
            ec=r.ec,
            np_num_passes=r.np_num_passes,
            rq=r.rq,
            rg=r.rg,
            ccs_idx=ccs_idx,
            base_quality_scores=bq,
            truth_idx=truth_idx,
            truth_range=r.truth_range,
        )
    )
  return spaced
