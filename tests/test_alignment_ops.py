"""Alignment loss/metric tests, ported from the reference's hand-computed
parameterized cases (reference: models/losses_and_metrics_test.py:283-607)."""

import numpy as np
import pytest

from deepconsensus_tpu import constants
from deepconsensus_tpu.ops import alignment


def seq_to_array(seq):
  return [constants.SEQ_VOCAB.index(c) for c in seq]


def convert_seqs(sequences):
  y_true, y_pred = sequences
  y_true = np.array([seq_to_array(s) for s in y_true], dtype=np.float32)
  ids = np.array([seq_to_array(s) for s in y_pred])
  y_pred_scores = np.eye(constants.SEQ_VOCAB_SIZE, dtype=np.float32)[ids]
  return y_true, y_pred_scores


LOSS_CASES = [
    # (true, pred, del_cost, loss_reg, width, expected)
    ((['TTAGGC', 'AGCTGG'], ['TTAGGC', 'AGCTGG']), 1.0, None, None, 0.0),
    (
        (['TTAGGC    ', 'AGCTGG    '], ['TTAGGC    ', 'AGCTGG    ']),
        1.0, None, None, 0.0,
    ),
    (
        (['TTAGGCAT', 'AGCTGG  '], ['TTAGGCAT  ', 'AGCTGG    ']),
        1.0, None, None, 0.0,
    ),
    ((['TTAGGC', 'AGCTGG'], ['T TA G G C', 'AGC    TGG']), 1.0, None, None, 0.0),
    (
        (['TTAGGC    ', 'AGCTGG    '], ['TTA G GC  ', 'AGC    TGG']),
        1.0, None, None, 0.0,
    ),
    ((['TTAGGC', 'AGCTGG'], ['TTAGG ', 'GCTGG ']), 1.0, None, None, 1.0),
    ((['TTAGGC', 'AGCTGG'], ['TAGGC ', 'AGCGG ']), 2.0, None, None, 2.0),
    ((['TTAGGC', 'AGCTGG'], ['TTAG  ', 'GCGG  ']), 1.0, None, None, 2.0),
    ((['TTAGGC', 'AGCTGG'], ['ATAGGC', 'TGCTGG']), 1.0, None, None, 16.118),
    ((['TTAGGC', 'AGCTGG'], ['AAAGGC', 'TGCTGC']), 1.0, None, None, 32.236),
    (
        (
            ['TTAGGC', 'ATCGAC', 'AGCTGG'],
            ['TTAGGCA', 'ATCCGAC', 'CAGCTGG'],
        ),
        1.0, None, None, 16.118,
    ),
    ((['ATCG ', 'ATCG '], ['TCG  ', 'TCG  ']), 1.0, None, None, 1.0),
    ((['ATCG ', 'ATCG '], ['TCG  ', 'TCG  ']), 1e9, None, None, 64.472),
    # Banded cases.
    ((['TTAGGC', 'AGCTGG'], ['TTAGGC', 'AGCTGG']), 1.0, None, 2, 0.0),
    ((['TTAGGC', 'AGCTGG'], ['TTAGG ', 'GCTGG ']), 1.0, None, 2, 1.0),
    (
        (['TTAGGC    ', 'AGCTGG    '], ['TTAGGC    ', 'AGCTGG    ']),
        1.0, None, 1, 0.0,
    ),
    (
        (['TTAGGC   ', 'AGCTG   G'], ['T TAG G C', 'AGC   TGG']),
        1.0, None, 8, 0.0,
    ),
    (
        (['TTAGGC    ', 'AGCTGG    '], ['TTA G GC  ', 'AGC    TGG']),
        1.0, None, 8, 0.0,
    ),
    ((['TTAGGC', 'AGCTGG'], ['AAAGGC', 'TGCTGC']), 1.0, None, 4, 32.236),
    ((['TTA', 'GGC'], ['A  ', 'C  ']), 1.0, None, 2, 2.0),
    ((['TTA', 'GGC'], ['A  ', 'C  ']), 1.0, None, 1, 18.118),
]


@pytest.mark.parametrize('case', LOSS_CASES)
def test_alignment_loss(case):
  sequences, del_cost, loss_reg, width, expected = case
  y_true, y_pred_scores = convert_seqs(sequences)
  loss = alignment.alignment_loss(
      y_true, y_pred_scores, del_cost=del_cost, loss_reg=loss_reg, width=width
  )
  # Reference reduces with mean (keras Reduction.AUTO).
  assert abs(float(np.mean(np.asarray(loss))) - expected) < 1e-2, (
      f'{sequences}: got {np.mean(np.asarray(loss))}, want {expected}'
  )


METRIC_CASES = [
    ((['TTAGGC', 'AGCTGG'], ['TTAGGC', 'AGCTGG']), (1.0, 1.0)),
    ((['TTAGGC', 'AGCTGG'], ['AAAGGC', 'TGCTGC']), (0.667, 0.667)),
    ((['TTAGGC', 'AGCTGG'], ['T TA G G C', 'AGC    TGG']), (1.0, 1.0)),
    ((['TTAGGC', 'AGCTGG'], ['TTAGG ', 'GCTGG ']), (0.833, 0.833)),
    (
        (
            ['TTAGGC', 'ATCGAC', 'AGCTGG'],
            ['TTAGGCA', 'ATCCGAC', 'CAGCTGG'],
        ),
        (0.857, 0.857, 0.857),
    ),
    ((['ATCG ', 'ATCG '], ['TCG  ', 'TCG  ']), (0.75, 0.75)),
    ((['ATCG ', 'ATCG '], ['     ', '     ']), (0.0, 0.0)),
    ((['     ', '     '], ['ATCG ', 'ATCG ']), (0.0, 0.0)),
    ((['A    ', 'T    '], ['     ', '     ']), (0.0, 0.0)),
    ((['     ', '     '], ['A    ', 'T    ']), (0.0, 0.0)),
    ((['     ', '     '], ['     ', '     ']), (1.0, 1.0)),
]


@pytest.mark.parametrize('case', METRIC_CASES)
def test_alignment_metric_pid(case):
  sequences, expected_pid = case
  y_true, y_pred_scores = convert_seqs(sequences)
  _, _, metric_values = alignment.alignment_metric(y_true, y_pred_scores)
  pid = np.asarray(metric_values['pid'])
  for i, want in enumerate(expected_pid):
    assert abs(float(pid[i]) - want) < 1e-2, f'{sequences} idx {i}: {pid[i]}'


def test_batch_identity_ccs_pred():
  # Reference case: 3 mismatches in CCS, 6 in DC over multiple examples
  # (losses_and_metrics_test.py:622-630).
  pred = convert_seqs(((['CCCCCC', 'TGCTGG']), ['CCCCCC', 'TGCTGG']))[1]
  ccs = np.array(
      [seq_to_array('CCAGGC'), seq_to_array('TGCTGG')], dtype=np.float32
  )
  label = np.array(
      [seq_to_array('TTAGGC'), seq_to_array('AGCTGG')], dtype=np.float32
  )
  identity_ccs, identity_pred = alignment.batch_identity_ccs_pred(
      ccs, pred, label
  )
  assert abs(float(identity_pred) - 0.5) < 1e-3
  assert abs(float(identity_ccs) - 0.75) < 1e-3


def test_per_example_accuracy_with_gap_shifts():
  # Reference PerExampleAccuracy 'all padding'/'left shift' semantics
  # (losses_and_metrics_test.py:45-79): gap placement does not matter.
  y_true = np.array([seq_to_array('ATCG  ')], dtype=np.float32)
  pred_ids = np.array([seq_to_array('A TCG ')])
  y_pred = np.eye(5, dtype=np.float32)[pred_ids]
  correct, total = alignment.per_example_accuracy(y_true, y_pred)
  assert int(correct) == 1 and int(total) == 1
  pred_ids = np.array([seq_to_array('ATGG  ')])
  y_pred = np.eye(5, dtype=np.float32)[pred_ids]
  correct, total = alignment.per_example_accuracy(y_true, y_pred)
  assert int(correct) == 0


def test_left_shift_sequence():
  y = np.array([[1, 0, 2, 0, 3]])
  out = np.asarray(alignment.left_shift_sequence(y))
  assert out.tolist() == [[1, 2, 3, 0, 0]]


REFERENCE_ORACLE_BANDED = [
    # Values captured from running the reference AlignmentLoss banded path
    # (losses_and_metrics.py:475-547) on these inputs (loss_reg=0.1 soft
    # values included; hard = loss_reg None).
    ((['TTAGGC', 'AGCTGG'], ['TTAGG ', 'GCTGG ']), 2, [0.930686, 1.0000007]),
    ((['TTA', 'GGC'], ['A  ', 'C  ']), 1, [17.938913, 17.938913]),
]


@pytest.mark.parametrize('case', REFERENCE_ORACLE_BANDED)
def test_banded_soft_matches_reference_oracle(case):
  sequences, width, expected = case
  y_true, y_pred_scores = convert_seqs(sequences)
  loss = alignment.alignment_loss(
      y_true, y_pred_scores, del_cost=1.0, loss_reg=0.1, width=width
  )
  np.testing.assert_allclose(np.asarray(loss), expected, rtol=1e-4, atol=1e-4)


def test_distillation_loss_zero_for_identical():
  logits = np.random.RandomState(0).randn(2, 7, 5).astype(np.float32)
  loss = alignment.distillation_loss(logits, logits)
  assert np.allclose(np.asarray(loss), 0.0)
  loss_kl = alignment.distillation_loss(logits, logits, kind='kl_divergence')
  assert np.allclose(np.asarray(loss_kl), 0.0, atol=1e-6)


@pytest.mark.parametrize(
    'class_value,want',
    [(1, (1, 2)), (2, (1, 1)), (0, (1, 1)), (4, (0, 0))],
)
def test_per_class_accuracy(class_value, want):
  y = np.array([[1, 1, 2, 0]], np.float32)
  p = np.eye(5, dtype=np.float32)[np.array([[1, 2, 2, 0]])]
  c, t = alignment.per_class_accuracy(y, p, class_value)
  assert (int(c), int(t)) == want


def test_accuracy_subs_cost_fn():
  y_true, y_pred = convert_seqs((['AT'], ['AC']))
  oh = np.eye(5, dtype=np.float32)[y_true.astype(int)]
  out = np.asarray(alignment.accuracy_subs_cost_fn(oh, y_pred))
  # true A,T vs pred A,C: [[A==A, A==C], [T==A, T==C]]
  assert out[0].tolist() == [[1.0, 0.0], [0.0, 0.0]]


def test_matches_loss_equals_plain_loss():
  y_true, y_pred = convert_seqs((['TTAGGC', 'AGCTGG'], ['TAGGC ', 'AGCGG ']))
  for width in (None, 4):
    want = alignment.alignment_loss(y_true, y_pred, loss_reg=0.1, width=width)
    got, matches = alignment.alignment_loss_with_matches(
        y_true, y_pred, loss_reg=0.1, width=width
    )
    np.testing.assert_allclose(got, want, rtol=1e-6)
    assert matches.shape == (2, 6, 6)


def test_matches_equal_finite_difference_gradient():
  # matches must be d loss / d subs_costs of the soft DP (the reference
  # recovers them with a GradientTape, losses_and_metrics.py:588-594).
  rng = np.random.default_rng(0)
  b, m, n = 2, 5, 7
  subs = rng.uniform(0.5, 4.0, (b, m, n)).astype(np.float64)
  ins = rng.uniform(0.5, 4.0, (b, n)).astype(np.float64)
  seq_lens = np.array([5, 4], np.int32)
  args = (ins, 3.0, seq_lens, 0.1)
  import jax

  with jax.enable_x64(True):
    base = np.asarray(alignment._alignment_forward(subs, *args))
    grad = np.asarray(
        jax.vjp(lambda sc: alignment._alignment_forward(sc, *args), subs)[1](
            np.ones(b)
        )[0]
    )
    eps = 1e-6
    for _ in range(20):
      bi, i, j = rng.integers(b), rng.integers(m), rng.integers(n)
      pert = subs.copy()
      pert[bi, i, j] += eps
      fd = (
          np.asarray(alignment._alignment_forward(pert, *args))[bi] - base[bi]
      ) / eps
      np.testing.assert_allclose(grad[bi, i, j], fd, rtol=1e-3, atol=1e-6)


def test_matches_hard_min_recovers_indicator_path():
  # Identical sequences, hard min: the only optimal path is the diagonal,
  # so matches is exactly the identity indicator over real positions.
  y_true, y_pred = convert_seqs((['TTAG  '], ['TTAG  ']))
  _, matches = alignment.alignment_loss_with_matches(
      y_true, y_pred, loss_reg=None
  )
  got = np.asarray(matches)[0]
  np.testing.assert_allclose(got[:4, :4], np.eye(4), atol=1e-6)
  assert np.all(got[4:] == 0)


def test_matches_rows_are_subprobabilities():
  # Under the Gibbs distribution each true position is substituted at most
  # once, so each row's marginals sum to <= 1 (= 1 when deletion is
  # prohibitively expensive).
  y_true, y_pred = convert_seqs(
      (['TTAGGC', 'AGCTGG'], ['TAGGCA', 'AGCGGT'])
  )
  _, matches = alignment.alignment_loss_with_matches(
      y_true, y_pred, del_cost=1e6, loss_reg=1.0
  )
  row_sums = np.asarray(matches).sum(-1)
  np.testing.assert_allclose(row_sums, np.ones_like(row_sums), atol=1e-4)
