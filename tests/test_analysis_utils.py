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


def test_pretty_print_aux_rows():
  rows = np.zeros((85, 100, 1), np.float32)
  rows[0, :4, 0] = [1, 2, 3, 4]  # bases for subread 0
  rows[20, :4, 0] = [7, 8, 9, 10]  # pw for subread 0
  rows[40, :4, 0] = [11, 12, 13, 14]  # ip for subread 0
  rows[60, :4, 0] = 2  # strand for subread 0
  rows[80, :4, 0] = [1, 2, 3, 4]  # ccs row
  text = analysis.pretty_print_window(rows, 20, print_aux=True)
  assert 'PW:' in text and 'IP:' in text and 'Strand:' in text
  assert '   7   8   9  10' in text
  assert '  11  12  13  14' in text
  assert '   2   2   2   2' in text


def test_highlight_errors():
  out = analysis.highlight_errors('ACGT', 'ACTTA')
  # match, match, substitution, match, overhang, reset
  assert out == (
      analysis.WRITE_GREEN_BACKGROUND + 'A'
      + analysis.WRITE_GREEN_BACKGROUND + 'C'
      + analysis.WRITE_RED_BACKGROUND + 'T'
      + analysis.WRITE_GREEN_BACKGROUND + 'T'
      + analysis.WRITE_YELLOW_BACKGROUND + 'A'
      + analysis.WRITE_NORMAL
  )


def test_get_prediction():
  def apply_fn(rows):
    b, length = rows.shape[0], rows.shape[2]
    probs = np.full((b, length, 5), 0.1, np.float32)
    probs[..., 2] = 0.6
    return probs

  rows = np.zeros((3, 85, 7, 1), np.float32)
  probs, pred = analysis.get_prediction(apply_fn, rows)
  assert probs.shape == (3, 7, 5)
  assert (pred == 2).all()


def test_get_results_df(tmp_path):
  # Reference layout: .../exp{N}/wu{M}/inference.csv, first 2 rows read,
  # experiment_and_work_unit = last two dirs (colab_utils.py:124-159).
  for exp in (1, 2):
    d = tmp_path / f'exp{exp}' / 'wu0'
    d.mkdir(parents=True)
    (d / 'inference.csv').write_text(
        'dataset,accuracy,per_example_accuracy,loss\n'
        f'eval,0.91234567,0.8{exp},1.5\n'
        'extra,0.5,0.5,9.9\n'
        'ignored,0.1,0.1,0.1\n'
    )
  pattern = str(tmp_path) + '/exp{}/*/inference.csv'
  df = analysis.get_results_df([1, 2], pattern, decimals=5)
  assert len(df) == 4  # 2 experiments x first 2 rows each
  assert list(df.columns)[:2] == ['experiment_and_work_unit', 'dataset_type']
  assert list(df.columns)[-1] == 'dataset'
  assert set(df['experiment_and_work_unit']) == {'exp1/wu0', 'exp2/wu0'}
  assert (df['dataset_type'] == 'eval').all()
  assert df['accuracy'].iloc[0] == 0.91235  # rounded to 5 decimals
  compact = analysis.get_results_df_compact(df)
  assert list(compact.columns) == [
      'dataset_type',
      'experiment_and_work_unit',
      'accuracy',
      'per_example_accuracy',
  ]
