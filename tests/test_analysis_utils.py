"""Analysis helpers tests (reference: model_inference_transforms_test.py)."""

import numpy as np
import pytest

from deepconsensus_tpu.utils import analysis


@pytest.mark.parametrize(
    's1,s2,want',
    [
        ('CAT', 'BAT', 1),
        ('CAT', 'BATS', 2),
        ('CAT', 'CAT', 0),
        ('', 'ACGT', 4),
        ('C AT', 'CAT', 0),  # gaps stripped first
        ('kitten', 'sitting', 3),
    ],
)
def test_edit_distance(s1, s2, want):
  assert analysis.edit_distance(s1, s2) == want


@pytest.mark.parametrize(
    'seq,want',
    [
        ('AAATTC', 0.5),
        ('ACGT', 0.0),
        ('AAAA', 1.0),
        ('', 0.0),
        ('AA ATT C', 0.0),  # gaps removed -> runs of 3 only
    ],
)
def test_homopolymer_content(seq, want):
  if seq == 'AA ATT C':
    # After gap removal: 'AAATTC' -> 0.5
    assert analysis.homopolymer_content(seq) == 0.5
  else:
    assert analysis.homopolymer_content(seq) == want


def test_convert_and_pretty_print():
  rows = np.zeros((85, 100, 1), np.float32)
  rows[0, :4, 0] = [1, 2, 3, 4]  # one subread: ATCG...
  rows[80, :4, 0] = [1, 2, 3, 4]  # ccs row
  label = np.zeros(100, np.float32)
  label[:4] = [1, 2, 3, 4]
  subreads, label_str, pred_str = analysis.convert_to_bases(
      rows, label, label, max_passes=20
  )
  assert len(subreads) == 1
  assert subreads[0].startswith('ATCG')
  assert label_str.startswith('ATCG')
  assert not analysis.check_has_errors(label_str, pred_str)
  text = analysis.pretty_print_window(rows, 20, label, label)
  assert 'subread 0' in text and 'ccs' in text and 'label' in text
