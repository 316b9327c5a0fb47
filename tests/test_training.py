"""Training-loop tests: smoke e2e (reference: model_train_custom_loop_test.py)
plus input pipeline and multi-device sharding checks."""

import json
import os
import tempfile

import numpy as np
import pytest

import jax

from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.train import input_pipeline, loop


def _small_params(batch_size=4, limit=8, num_epochs=1):
  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.batch_size = batch_size
    params.limit = limit
    params.num_epochs = num_epochs
    params.buffer_size = 10
    # Shrink the model so CPU compile/run stays fast.
    params.num_hidden_layers = 2
    params.filter_size = 128
    params.transformer_input_size = 64
  return params


def test_input_pipeline_shapes():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  stream = input_pipeline.example_stream(
      params.train_path, params, batch_size=4, shuffle_buffer=16, repeat=False
  )
  rows, labels = next(stream)
  assert rows.shape == (4, 85, 100, 1)
  assert labels.shape == (4, 100)
  assert rows.dtype == np.float32
  # PW/IP are clipped.
  assert rows.max() <= 500.0


def test_format_rows_batch_matches_per_example():
  from deepconsensus_tpu.models import data as data_lib

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  rng = np.random.default_rng(0)
  n_rows = 5 * params.max_passes + 5  # raw featurizer row count
  sub = rng.uniform(0, 600, size=(6, n_rows, 100, 1)).astype(np.float32)
  batch = data_lib.format_rows_batch(sub, params)
  for i in range(6):
    np.testing.assert_array_equal(
        batch[i], data_lib.format_rows(sub[i], params)
    )


def test_remove_gaps_batch_matches_per_example():
  from deepconsensus_tpu import constants
  from deepconsensus_tpu.models import data as data_lib

  rng = np.random.default_rng(1)
  labels = rng.integers(0, 5, size=(20, 30)).astype(np.float32)
  labels[rng.uniform(size=labels.shape) < 0.3] = constants.GAP_INT
  batch = data_lib.remove_internal_gaps_and_shift_batch(labels)
  for i in range(20):
    np.testing.assert_array_equal(
        batch[i], data_lib.remove_internal_gaps_and_shift(labels[i])
    )


def _example_multiset(stream):
  import hashlib

  out = []
  for rows, labels in stream:
    for i in range(rows.shape[0]):
      h = hashlib.sha1(rows[i].tobytes())
      if labels is not None:
        h.update(labels[i].tobytes())
      out.append(h.hexdigest())
  return sorted(out)


def test_parallel_stream_same_examples_as_serial():
  """num_workers>0 draws the same example multiset per epoch (different
  order: chunked shuffle vs reservoir) and identical batch shapes."""
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  serial = input_pipeline.example_stream(
      params.train_path, params, batch_size=16, shuffle_buffer=64,
      repeat=False, drop_remainder=False,
  )
  parallel = input_pipeline.example_stream(
      params.train_path, params, batch_size=16, shuffle_buffer=64,
      repeat=False, num_workers=2, chunk_records=50, drop_remainder=False,
  )
  s_batches = list(serial)
  p_batches = list(parallel)
  assert len(s_batches) == len(p_batches)
  assert s_batches[0][0].shape == p_batches[0][0].shape
  assert s_batches[0][1].shape == p_batches[0][1].shape
  assert _example_multiset(iter(s_batches)) == _example_multiset(
      iter(p_batches)
  )


def test_parallel_stream_deterministic():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)

  def first_two(seed):
    stream = input_pipeline.example_stream(
        params.train_path, params, batch_size=8, shuffle_buffer=32,
        repeat=False, num_workers=2, seed=seed, chunk_records=50,
    )
    a = next(stream)
    b = next(stream)
    return a, b

  (a1, al1), (b1, bl1) = first_two(3)
  (a2, al2), (b2, bl2) = first_two(3)
  np.testing.assert_array_equal(a1, a2)
  np.testing.assert_array_equal(b1, b2)
  np.testing.assert_array_equal(al1, al2)
  np.testing.assert_array_equal(bl1, bl2)


def test_train_smoke_end_to_end(tmp_path):
  """Trains 2 steps, writes checkpoint artifacts, metrics are finite.

  Mirrors the reference smoke test (model_train_custom_loop_test.py:43-84).
  """
  params = _small_params(batch_size=4, limit=8)
  out_dir = str(tmp_path / 'train_out')
  metrics = loop.train(out_dir, params, num_devices=1, log_train_steps=1)
  assert np.isfinite(metrics['eval/loss'])
  assert os.path.exists(os.path.join(out_dir, 'params.json'))
  assert os.path.exists(os.path.join(out_dir, 'best_checkpoint.txt'))
  assert os.path.exists(os.path.join(out_dir, 'eval_checkpoint.txt'))
  assert os.path.exists(os.path.join(out_dir, 'checkpoint_metrics.tsv'))
  with open(os.path.join(out_dir, 'scalars.jsonl')) as f:
    scalars = [json.loads(l) for l in f]
  assert any('train/loss' in s for s in scalars)
  assert any('eval/loss' in s for s in scalars)
  # The checkpoint restores into the inference loader.
  best = open(os.path.join(out_dir, 'best_checkpoint.txt')).read().strip()
  assert best.startswith('checkpoint-')
  params2 = configs.read_params_from_json(out_dir)
  configs.finalize_params(params2)
  model = model_lib.get_model(params2)
  variables = model_lib.init_params(model, params2)
  payload = ckpt_lib.load_checkpoint(
      os.path.join(out_dir, best), {'variables': jax.device_get(variables)}
  )
  assert 'variables' in payload


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_train_step_data_parallel_8dev(tmp_path):
  """One sharded train step across the virtual 8-device CPU mesh."""
  params = _small_params(batch_size=8, limit=8)
  out_dir = str(tmp_path / 'dp_out')
  metrics = loop.train(out_dir, params, num_devices=8, log_train_steps=1)
  assert np.isfinite(metrics['eval/loss'])


def test_dp_loss_matches_single_device(tmp_path):
  """The same data/seed gives identical first-step loss on 1 vs 8 devices."""
  if len(jax.devices()) < 8:
    pytest.skip('needs 8 virtual devices')
  results = {}
  for n in (1, 8):
    params = _small_params(batch_size=8, limit=8)
    out_dir = str(tmp_path / f'dp{n}')
    loop.train(out_dir, params, num_devices=n, log_train_steps=1)
    with open(os.path.join(out_dir, 'scalars.jsonl')) as f:
      first = json.loads(f.readline())
    results[n] = first['train/loss']
  np.testing.assert_allclose(results[1], results[8], rtol=1e-4)


def test_fused_flag_ignored_in_training(caplog):
  """The fused encoder is inference-only since round 5 (the Pallas
  backward was deleted — slower than XLA autodiff), but params.json files
  persisted by earlier training runs may still carry the flag: training
  and eval must WARN and proceed on the XLA encoder, not reject."""
  import logging

  params = _small_params(batch_size=4, limit=4)
  with params.unlocked():
    params.use_pallas_fused_encoder = True
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  tx, _ = loop.make_optimizer(params, decay_steps=10)
  with caplog.at_level(logging.WARNING):
    train_step, eval_step = loop.build_train_step(model, tx, params, 4)
  assert train_step is not None and eval_step is not None
  assert any('inference-only' in r.message for r in caplog.records)


@pytest.mark.parametrize('model_name', ['fc', 'transformer'])
def test_train_smoke_other_architectures(model_name, tmp_path):
  """The reference smoke-trains fc+test and transformer+test
  (model_train_custom_loop_test.py:43-84)."""
  params = configs.get_config(f'{model_name}+test')
  with params.unlocked():
    params.batch_size = 4
    params.limit = 8
    params.num_epochs = 1
    if model_name == 'transformer':
      params.num_hidden_layers = 2
      params.filter_size = 64
  out_dir = str(tmp_path / f'{model_name}_out')
  metrics = loop.train(out_dir, params, num_devices=1, log_train_steps=1)
  assert np.isfinite(metrics['eval/loss'])
  assert os.path.exists(os.path.join(out_dir, 'best_checkpoint.txt'))


def test_yield_over_ccs_matches_reference_semantics():
  """MetricAccumulator.yield_over_ccs vs the reference YieldOverCCSMetric
  (losses_and_metrics.py:1114-1167): per-update >= 0.997 threshold counts
  for pred and CCS, result = divide_no_nan(yield_dc, yield_ccs).

  Hand-computed: updates with (identity_pred, identity_ccs) =
  (0.999, 0.998), (0.990, 0.999), (0.997, 0.90), (0.50, 0.997)
  -> yield_dc = 2 (0.999, 0.997 pass), yield_ccs = 3 (0.998, 0.999,
  0.997 pass) -> 2/3. The reference counts exactly these per update_state
  call; divide_no_nan(x, 0) == 0 covers the empty-CCS edge.
  """
  from deepconsensus_tpu.train.loop import MetricAccumulator

  acc = MetricAccumulator(quality_threshold=0.997)
  cases = [(0.999, 0.998), (0.990, 0.999), (0.997, 0.90), (0.50, 0.997)]
  for pred, ccs in cases:
    acc.update({
        'loss': 1.0,
        'correct_examples': 0,
        'total_examples': 1,
        'identity_pred': pred,
        'identity_ccs': ccs,
    })
  res = acc.result('eval')
  assert res['eval/yield_over_ccs'] == pytest.approx(2.0 / 3.0)

  # divide_no_nan: no CCS batch ever passes -> 0.0, not a ZeroDivisionError.
  acc2 = MetricAccumulator(quality_threshold=0.997)
  acc2.update({
      'loss': 0.0, 'correct_examples': 0, 'total_examples': 1,
      'identity_pred': 1.0, 'identity_ccs': 0.5,
  })
  assert acc2.result('eval')['eval/yield_over_ccs'] == 0.0

  # Exact-threshold inclusivity (>=, not >), matching tf.cast(x >= t).
  acc3 = MetricAccumulator(quality_threshold=0.997)
  acc3.update({
      'loss': 0.0, 'correct_examples': 0, 'total_examples': 1,
      'identity_pred': 0.997, 'identity_ccs': 0.997,
  })
  assert acc3.result('eval')['eval/yield_over_ccs'] == 1.0


def test_lr_schedule_continuous_and_global_step_decay():
  """tf-models LinearWarmup contract (review r5): the post-warmup LR is
  the polynomial evaluated at the GLOBAL step — continuous at the
  boundary, reaching end_learning_rate at decay_steps, not at
  decay_steps + warmup_steps (the naive join_schedules composition
  jumped back UP to the initial LR at the boundary)."""
  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.warmup_steps = 50
  configs.finalize_params(params)
  sched = loop.make_learning_rate_schedule(params, decay_steps=100)
  lrs = [float(sched(s)) for s in range(160)]
  # Monotone ramp during warmup.
  assert all(b >= a for a, b in zip(lrs[:50], lrs[1:50]))
  # Continuity at the boundary: no jump bigger than one warmup increment.
  assert abs(lrs[50] - lrs[49]) < lrs[1] * 1.5
  # Decay completes at decay_steps (global), not decay_steps + warmup.
  assert lrs[100] == pytest.approx(params.end_learning_rate, rel=1e-5)
  assert lrs[120] == pytest.approx(params.end_learning_rate, rel=1e-5)
  # Never exceeds the initial LR.
  assert max(lrs) <= params.initial_learning_rate + 1e-9


def test_prefetcher_propagates_producer_errors():
  """A producer exception must surface as ITSELF at the consumer, not as
  a bare StopIteration (review r5: it used to end the epoch silently and
  bypass train_with_retry's transient-error matching)."""

  def gen():
    yield 1
    raise IOError('CONNECTION reset by peer')

  it = input_pipeline.Prefetcher(gen())
  assert next(it) == 1
  with pytest.raises(IOError, match='CONNECTION'):
    next(it)
