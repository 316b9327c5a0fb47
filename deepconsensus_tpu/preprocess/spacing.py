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


def spaced_columns(
    reads: List[AlignedRead],
) -> Tuple[List[np.ndarray], List[int], int]:
  """Spaced output-column assignment per read position.

  The geometry core of space_out_subreads, computed in one pass over the
  concatenation of all reads' cigars (segment-aware prefix sums instead of
  a per-read Python loop). Returns (cols, finals, max_len): cols[i][p] is
  the spaced column of read i's position p, finals[i] the read's final
  cursor (== its spaced length in the reference simulation), max_len the
  common spaced width.
  """
  n = len(reads)
  lens = np.array([len(r.cigar) for r in reads], dtype=np.int32)
  offs = np.zeros(n + 1, dtype=np.int32)
  np.cumsum(lens, out=offs[1:])
  total = int(offs[-1])
  if total == 0:
    return [np.empty(0, np.int64)] * n, [0] * n, 0
  cig = np.concatenate([r.cigar for r in reads])
  lab = np.array([r.is_label for r in reads], dtype=bool)

  if not lab.any():
    # Native single-pass geometry (bit-equal; labels keep the numpy path).
    from deepconsensus_tpu import native

    res = native.spaced_columns(cig, offs.astype(np.int64))
    if res is not None:
      col, finals_arr = res
      cols = [col[offs[i] : offs[i + 1]] for i in range(n)]
      finals = [int(f) for f in finals_arr]
      return cols, finals, max(finals, default=0)

  rid = np.repeat(np.arange(n, dtype=np.int32), lens)

  is_ins = cig == constants.CINS
  not_ins = ~is_ins
  # Exclusive per-read count of non-insertion positions (match index of a
  # non-insertion / junction of an insertion).
  cum0 = np.zeros(total + 1, dtype=np.int32)
  np.cumsum(not_ins, out=cum0[1:])
  m_of_pos = cum0[:-1] - cum0[offs[:-1]][rid]  # exclusive within read
  n_match = cum0[offs[1:]] - cum0[offs[:-1]]
  max_match = int(n_match.max()) if n else 0
  nj = max_match + 1

  pos_ins = np.nonzero(is_ins)[0].astype(np.int32)
  n_ins = len(pos_ins)
  col = np.empty(total, dtype=np.int32)
  if n_ins == 0:
    # No insertions anywhere: every column is its match index.
    col[:] = m_of_pos
    J = S = None
  else:
    j = m_of_pos[pos_ins]  # junction of each insertion
    # Insertions at the same (read, junction) are one consecutive cigar
    # run, so per-junction counts and in-run ranks both come from run
    # boundaries over the insertion-only arrays — no full-length scans.
    ii = np.arange(n_ins, dtype=np.int32)
    start = np.empty(n_ins, dtype=bool)
    start[0] = True
    np.not_equal(np.diff(pos_ins), 1, out=start[1:])
    start[1:] |= rid[pos_ins[1:]] != rid[pos_ins[:-1]]
    run_starts = ii[start]
    run_lens = np.diff(np.append(run_starts, np.int32(n_ins)))
    rank = ii - np.repeat(run_starts, run_lens)

    # J[j]: max insertions at junction j over non-label reads; S its
    # prefix sums.
    J = np.zeros(nj, dtype=np.int32)
    run_j = j[run_starts]
    if lab.any():
      keep = ~lab[rid[pos_ins[run_starts]]]
      np.maximum.at(J, run_j[keep], run_lens[keep])
    else:
      np.maximum.at(J, run_j, run_lens)
    S = np.cumsum(J, dtype=np.int32)

    # col(match m) = S[m] + m; col(ins j, k) = S[j] - J[j] + j + k.
    col_match = S + np.arange(nj, dtype=np.int32)  # lookup tables
    col_ins0 = col_match - J
    col[:] = col_match[m_of_pos]  # ins positions overwritten below
    # Label insertions are all consumed at the start of the junction's
    # first global iteration; their columns advance only through the
    # label-insertion offset LI(p) added below.
    if lab.any():
      rank = np.where(lab[rid[pos_ins]], 0, rank)
    col[pos_ins] = col_ins0[j] + rank

  cols: List[np.ndarray] = []
  finals: List[int] = []
  for i, r in enumerate(reads):
    lo, hi = int(offs[i]), int(offs[i + 1])
    if hi == lo:
      cols.append(np.empty(0, dtype=np.int64))
      finals.append(0)
      continue
    ci = col[lo:hi]
    ins_i = is_ins[lo:hi]
    if r.is_label:
      li = np.cumsum(ins_i) - ins_i  # label insertions strictly before p
      ci = ci + li
      if ins_i[-1]:
        # Label ends in insertions at junction n_match: the cursor then
        # walks out the rest of that junction block before finishing.
        finals.append(int(S[n_match[i]] + n_match[i] + int(ins_i.sum())))
      else:
        finals.append(int(ci[-1]) + 1)
    else:
      finals.append(int(ci[-1]) + 1)
    cols.append(ci)

  return cols, finals, max(finals, default=0)


def space_out_subreads(reads: List[AlignedRead]) -> List[AlignedRead]:
  """Spaces out reads to make room for insertions in any subset of them.

  Input order convention matches the reference: subreads..., ccs[, label].
  Returns new AlignedRead objects whose bases/pw/ip/ccs_idx (and, for the
  CCS read, base_quality_scores; for labels, cigar/truth_idx) are spaced and
  right-padded to a common length.
  """
  cols, _, max_len = spaced_columns(reads)

  spaced: List[AlignedRead] = []
  for r, col in zip(reads, cols):
    bases = np.full(max_len, GAP_BYTE, dtype=np.uint8)
    pw = np.zeros(max_len, dtype=np.uint8)
    ip = np.zeros(max_len, dtype=np.uint8)
    ccs_idx = np.full(max_len, -1, dtype=np.int32)
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
