"""Property tests for the vectorized spacing against a literal simulator.

The simulator below re-implements the reference's per-base state machine
semantics (reference: preprocess/pre_lib.py:176-276,1242-1276) directly from
its control flow, and the vectorized closed form must agree with it on
randomized alignments.
"""

import numpy as np
import pytest

from deepconsensus_tpu import constants
from deepconsensus_tpu.preprocess import spacing
from deepconsensus_tpu.preprocess.reads import AlignedRead, GAP_BYTE


class _SimRead:
  """Literal transcription of the reference spacing state machine."""

  def __init__(self, cigar, is_label):
    self.cigar = np.asarray(cigar)
    self.is_label = is_label
    self.is_ins = self.cigar == constants.CINS
    self.n = len(cigar)
    self.cols = np.zeros(self.n, dtype=np.int64)
    self.i = 0
    self.cursor = 0
    self.done = self.n == 0

  def out_of_bounds(self):
    return self.i >= self.n

  def next_is_insertion(self):
    if self.is_label:
      while not self.out_of_bounds() and self.is_ins[self.i]:
        self.cols[self.i] = self.cursor
        self.i += 1
        self.cursor += 1
      return False
    return self.is_ins[self.i]

  def move(self):
    self.cols[self.i] = self.cursor
    self.i += 1
    self.cursor += 1

  def add_gap(self):
    self.cursor += 1


def simulate(cigars, label_flags):
  reads = [_SimRead(c, l) for c, l in zip(cigars, label_flags)]
  while not all(r.done for r in reads):
    any_ins = False
    for r in reads:
      if r.done:
        continue
      if r.next_is_insertion():
        any_ins = True
        break
    for r in reads:
      if r.done:
        continue
      if any_ins and not r.next_is_insertion():
        r.add_gap()
      else:
        if not r.out_of_bounds():
          r.move()
        if r.out_of_bounds():
          r.done = True
  max_len = max(r.cursor for r in reads)
  return [r.cols for r in reads], max_len


def _random_cigar(rng, n_matches, p_ins=0.25, max_run=3):
  """Builds an expanded cigar with n_matches non-INS positions."""
  out = []
  for _ in range(n_matches):
    while rng.random() < p_ins:
      out.extend([constants.CINS] * rng.integers(1, max_run + 1))
    out.append(
        int(rng.choice([constants.CMATCH, constants.CDEL, constants.CREF_SKIP]))
    )
  # Occasionally trailing insertions.
  if rng.random() < 0.3:
    out.extend([constants.CINS] * rng.integers(1, max_run + 1))
  return np.array(out, dtype=np.uint8)


def _make_read(cigar, is_label, truth_contig='tig1'):
  n = len(cigar)
  consumes_q = np.isin(cigar, list(constants.QUERY_ADVANCING_OPS))
  bases = np.where(consumes_q, ord('A'), ord(' ')).astype(np.uint8)
  n_advancing = int(
      np.isin(cigar, list(constants.READ_ADVANCING_OPS)).sum()
  )
  truth_range = (
      {'contig': truth_contig, 'begin': 100, 'end': 100 + n_advancing}
      if is_label
      else None
  )
  return AlignedRead(
      name='m/1/x',
      bases=bases,
      cigar=cigar.copy(),
      pw=np.arange(n, dtype=np.uint8),
      ip=np.arange(n, dtype=np.uint8)[::-1].copy(),
      sn=np.zeros(4),
      strand=1,
      ccs_idx=np.arange(n, dtype=np.int64),
      truth_range=truth_range,
  )


@pytest.mark.parametrize('seed', range(30))
def test_vectorized_matches_simulator(seed):
  rng = np.random.default_rng(seed)
  n_reads = int(rng.integers(2, 8))
  with_label = bool(rng.random() < 0.5)
  cigars = [
      _random_cigar(rng, int(rng.integers(1, 40))) for _ in range(n_reads)
  ]
  label_flags = [False] * n_reads
  if with_label:
    label_flags[-1] = True
  sim_cols, sim_max = simulate(cigars, label_flags)

  reads = [
      _make_read(c, l) for c, l in zip(cigars, label_flags)
  ]
  # The truth-range length must equal the spaced advancing columns; build
  # labels with consistent ranges (done inside _make_read).
  spaced = spacing.space_out_subreads(reads)

  assert len(spaced[0].bases) == sim_max, (
      f'max_len mismatch: vectorized {len(spaced[0].bases)} vs sim {sim_max}'
  )
  for k, (r_in, r_out, cols) in enumerate(zip(reads, spaced, sim_cols)):
    expect_bases = np.full(sim_max, GAP_BYTE, dtype=np.uint8)
    expect_bases[cols] = r_in.bases
    assert np.array_equal(r_out.bases, expect_bases), f'read {k} bases differ'
    expect_pw = np.zeros(sim_max, dtype=np.uint8)
    expect_pw[cols] = r_in.pw
    assert np.array_equal(r_out.pw, expect_pw), f'read {k} pw differ'
    expect_ccs = np.full(sim_max, -1, dtype=np.int64)
    expect_ccs[cols] = r_in.ccs_idx
    assert np.array_equal(r_out.ccs_idx, expect_ccs), f'read {k} ccs_idx'


def test_no_insertions_identity():
  cigars = [
      np.full(10, constants.CMATCH, dtype=np.uint8),
      np.full(7, constants.CMATCH, dtype=np.uint8),
  ]
  reads = [_make_read(c, False) for c in cigars]
  spaced = spacing.space_out_subreads(reads)
  assert len(spaced[0].bases) == 10
  assert np.array_equal(spaced[0].ccs_idx, np.arange(10))
  assert np.array_equal(spaced[1].ccs_idx[:7], np.arange(7))
  assert (spaced[1].ccs_idx[7:] == -1).all()
