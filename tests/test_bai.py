"""BAI index tests: random-access fetch vs brute-force scan on the bundled
indexed BAMs (truth_to_ccs.bam.bai, prediction_assessment .bai)."""

import numpy as np
import pytest

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import bai, bam
from tests.conftest import HUMAN_1M, TESTDATA

ASSESS = f'{TESTDATA}/prediction_assessment/CHM13_chr20_0_200000_dc.to_truth.bam'


def _span(rec):
  return int(
      np.sum(
          rec.cigar_lens[np.isin(rec.cigar_ops, constants.REF_ADVANCING_OPS)]
      )
  )


@pytest.mark.parametrize(
    'start,end',
    [(0, 50000), (50000, 120000), (150000, 200000), (199000, 200000),
     (0, 200000)],
)
def test_region_fetch_matches_bruteforce(start, end):
  reader = bai.IndexedBamReader(ASSESS)
  _, all_recs = bam.read_all(ASSESS)
  got = sorted(r.qname for r in reader.fetch('chr20', start, end))
  want = sorted(
      r.qname
      for r in all_recs
      if not r.is_unmapped
      and r.reference_name == 'chr20'
      and r.pos < end
      and r.pos + _span(r) > start
  )
  assert got == want and got


def test_per_reference_fetch_truth_bam():
  path = f'{HUMAN_1M}/truth_to_ccs.bam'
  reader = bai.IndexedBamReader(path)
  _, all_recs = bam.read_all(path)
  for name in reader.header.ref_names:
    got = [r.qname for r in reader.fetch(name)]
    want = [
        r.qname
        for r in all_recs
        if not r.is_unmapped and r.reference_name == name
    ]
    assert got == want


def test_unknown_contig_raises():
  reader = bai.IndexedBamReader(ASSESS)
  with pytest.raises(ValueError, match='unknown contig'):
    list(reader.fetch('chrXX'))


def test_empty_region_returns_nothing():
  reader = bai.IndexedBamReader(ASSESS)
  # chr1 has no reads in this assessment BAM.
  assert list(reader.fetch('chr1', 0, 1000)) == []


def test_reg2bins_covers_bin_zero_and_leaves():
  bins = bai.reg2bins(0, 1 << 29)
  assert 0 in bins and 1 in bins and 4681 in bins
