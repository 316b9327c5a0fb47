"""filter_reads golden tests + calibrate CLI on bundled assessment data.

(reference: quality_calibration/filter_reads_test.py,
calculate_baseq_calibration_test.py)
"""

import gzip
import os

import numpy as np
import pytest

from deepconsensus_tpu.calibration import calculate_baseq, calibration, filter_reads
from deepconsensus_tpu.io import fastq
from tests.conftest import TESTDATA

FILTER_DIR = f'{TESTDATA}/filter_fastq'
ASSESS_DIR = f'{TESTDATA}/prediction_assessment'


@pytest.mark.parametrize('q', [0, 10, 20, 30, 40, 50])
def test_filter_fastq_matches_reference_goldens(q, tmp_path):
  inp = f'{FILTER_DIR}/m64062_190806_063919_q0_chr20_100reads.fq.gz'
  golden = f'{FILTER_DIR}/m64062_190806_063919_q0_chr20_100reads.q{q}.fq.gz'
  out = str(tmp_path / f'out.q{q}.fastq')
  filter_reads.filter_bam_or_fastq_by_quality(inp, out, q)
  with gzip.open(golden, 'rt') as f:
    want = f.read()
  with open(out) as f:
    got = f.read()
  assert got == want


def test_filter_bam_matches_reference_golden(tmp_path):
  inp = f'{FILTER_DIR}/m64062_190806_063919-chr20.dc.small.bam'
  golden = f'{FILTER_DIR}/m64062_190806_063919-chr20.dc.small.q30.fq.gz'
  out = str(tmp_path / 'out.q30.fastq')
  filter_reads.filter_bam_or_fastq_by_quality(inp, out, 30)
  with gzip.open(golden, 'rt') as f:
    want = f.read()
  with open(out) as f:
    got = f.read()
  assert got == want


def test_parse_calibration_string():
  v = calibration.parse_calibration_string('0,1.197654,-0.99781')
  assert v.enabled and v.threshold == 0
  scores = np.array([10.0, 30.0])
  out = calibration.calibrate_quality_scores(scores, v)
  np.testing.assert_allclose(out, scores * 1.197654 - 0.99781)
  skip = calibration.parse_calibration_string('skip')
  assert not skip.enabled
  with pytest.raises(ValueError):
    calibration.parse_calibration_string('1,2')


def test_threshold_calibration_only_above():
  v = calibration.parse_calibration_string('20,2.0,1.0')
  out = calibration.calibrate_quality_scores(np.array([10.0, 30.0]), v)
  np.testing.assert_allclose(out, [10.0, 61.0])


def test_calculate_baseq_on_assessment_data(tmp_path):
  out_csv = str(tmp_path / 'calib.csv')
  total = calculate_baseq.run(
      bam_path=f'{ASSESS_DIR}/CHM13_chr20_0_200000_dc.to_truth.bam',
      fasta=f'{ASSESS_DIR}/CHM13_chr20_0_200000.fa',
      output_csv=out_csv,
      interval_size=100000,
      min_mapq=0,
  )
  assert os.path.exists(out_csv)
  assert total.sum() > 0
  # Sanity: high-quality bases should be overwhelmingly matches (this
  # assessment BAM bins qualities up to Q50).
  hi = total[40:].sum(axis=0)
  assert hi[0] > hi[1] * 10
  with open(out_csv) as f:
    lines = f.read().splitlines()
  assert lines[0] == 'baseq,total_match,total_mismatch'
  assert len(lines) == 1 + calculate_baseq.MAX_BASEQ


def test_calculate_baseq_parallel_matches_serial(tmp_path):
  kwargs = dict(
      bam_path=f'{ASSESS_DIR}/CHM13_chr20_0_200000_dc.to_truth.bam',
      fasta=f'{ASSESS_DIR}/CHM13_chr20_0_200000.fa',
      interval_size=50000,
      min_mapq=0,
  )
  a = calculate_baseq.run(output_csv=str(tmp_path / 'a.csv'), **kwargs)
  b = calculate_baseq.run(output_csv=str(tmp_path / 'b.csv'), cpus=3, **kwargs)
  np.testing.assert_array_equal(a, b)
