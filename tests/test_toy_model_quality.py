"""Bundled toy model quality on the bundled eval split.

Pins two measured facts about yield_over_ccs on this split:

1. the model's batch-pooled alignment identity over one 65-example eval
   batch clears the 0.997 yield threshold (in f32 CPU eval), and
2. the CCS baseline's pooled identity over the same batch does NOT —
   so at eval batch sizes that pool many examples, YieldOverCCSMetric's
   denominator (count of CCS-cleared batches) is zero and divide_no_nan
   yields 0.0 regardless of model quality
   (reference losses_and_metrics.py:1139-1162).

The committed checkpoint_metrics.tsv instead evaluates per-example
(batch 1, the test config's finalized batch size, full 1239-example
split): there, individual perfect-CCS examples clear the bar, the
denominator is nonzero, and the recorded eval/yield_over_ccs is ~1.23
(reference trajectory 1.27-5.10, docs/train_tpu_model.md:299-315).
"""

import numpy as np
import pytest

from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.models import configs
from deepconsensus_tpu.models import model as model_lib
from deepconsensus_tpu.ops import alignment
from deepconsensus_tpu.train import input_pipeline

import os

TOY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'models_out/toy_model',
)


@pytest.fixture(scope='module')
def eval_batch_and_probs():
  import jax

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  runner, _ = engine.load_model_for_inference(TOY, 64)
  model = model_lib.get_model(params)
  stream = input_pipeline.example_stream(
      params.eval_path, params, 65, shuffle_buffer=0, repeat=False,
      drop_remainder=False,
  )
  rows, labels = next(iter(stream))
  probs = jax.jit(lambda v, r: model.apply(v, r, deterministic=True))(
      runner.variables, rows
  )
  return params, rows, labels, np.asarray(probs)


def _pooled_identity(y_true, y_pred_scores):
  _, _, mv = alignment.alignment_metric(y_true, y_pred_scores)
  match = np.asarray(mv['num_correct_matches'], np.int64).sum()
  alen = np.asarray(mv['alignment_length'], np.int64).sum()
  return match / max(alen, 1)


def test_toy_model_clears_yield_identity_bar(eval_batch_and_probs):
  # The round-4 adopted checkpoint reads 0.99981 (5359/5360) pooled over
  # ~5.4k aligned positions — a ~15-error margin above the 0.997 bar, so
  # ±1-count numeric drift across jax/XLA upgrades cannot flake this.
  # The assertion message carries the raw counts for diagnosability.
  params, rows, labels, probs = eval_batch_and_probs
  _, _, mv = alignment.alignment_metric(np.asarray(labels), probs)
  match = np.asarray(mv['num_correct_matches'], np.int64).sum()
  alen = np.asarray(mv['alignment_length'], np.int64).sum()
  ident = match / max(alen, 1)
  assert ident >= 0.997, (
      f'toy model pooled identity {ident:.6f} < 0.997 '
      f'(correct_matches={match}, alignment_length={alen}; a one-count '
      f'delta from the pinned run means numeric drift, not regression)'
  )


def test_eval_split_ccs_below_yield_bar(eval_batch_and_probs):
  """The denominator of yield_over_ccs is structurally zero on this split."""
  import jax

  params, rows, labels, _ = eval_batch_and_probs
  ccs_slice = configs.get_indices(params.max_passes, params.use_ccs_bq)[4]
  ccs = np.squeeze(np.asarray(rows), -1)[:, ccs_slice[0], :]
  ccs_oh = np.asarray(jax.nn.one_hot(ccs.astype(np.int32), 5))
  ident_ccs = _pooled_identity(np.asarray(labels), ccs_oh)
  assert ident_ccs < 0.997, (
      f'CCS pooled identity {ident_ccs:.6f} unexpectedly clears the bar; '
      'yield_over_ccs could be nonzero on this split after all'
  )
