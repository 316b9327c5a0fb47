"""Transport-native block featurization vs the feature-dict path.

build_window_block + RaggedBatchBuilder must reproduce, bit-for-bit, the
ragged transport that the legacy chain (iter_windows f32 tiles ->
format_rows -> stack -> pad_batch -> ragged_from_rows) ships to the device,
plus identical triage decisions, skipped-window outputs, counters, and
window ordering — so switching the engine default cannot change FASTQ.
"""

import collections

import numpy as np

from tests.conftest import HUMAN_1M

from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.models import configs, data
from deepconsensus_tpu.preprocess import feeder, windows


def _params():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  return params


class FakeRunner:
  """Records the transport dicts instead of running a model."""

  transport = 'ragged'

  def __init__(self, params):
    self.params = params

  def predict_async(self, rows, pass_limit=None, num_passes=None):
    # The legacy ragged dispatch chain, minus the device.
    assert num_passes is not None
    padded = data.pad_batch(rows, self.batch_size)
    return data.ragged_from_rows(padded, num_passes, self.params), rows.shape[0]

  def predict_ragged_async(self, ragged, n):
    return ragged, n


def _zmw_inputs(limit=None):
  dc_config = windows.DcConfig(20, 100, False)
  proc_feeder, _ = feeder.create_proc_feeder(
      subreads_to_ccs=f'{HUMAN_1M}/subreads_to_ccs.bam',
      ccs_bam=f'{HUMAN_1M}/ccs.bam',
      dc_config=dc_config,
      ins_trim=5,
  )
  inputs = [(reads, zmw, cfg, ww) for reads, zmw, cfg, _, ww in proc_feeder()]
  return inputs[:limit] if limit else inputs


def _run_both(options, params):
  inputs = _zmw_inputs()
  runner = FakeRunner(params)
  runner.batch_size = options.batch_size

  timing = engine.Timing()
  legacy_counter = collections.Counter()
  feats, n_ex, n_sub = engine.featurize_round(
      inputs, 'x', legacy_counter, timing
  )
  legacy = engine.enqueue_round(feats, runner, options, 'x', n_ex, n_sub)

  block_counter = collections.Counter()
  blocks, bn_ex, bn_sub = engine.featurize_round_blocks(
      inputs, 'x', block_counter, timing, engine.clip_maxima(params)
  )
  state = engine.enqueue_round_blocks(
      blocks, runner, options, 'x', bn_ex, bn_sub
  )
  assert (n_ex, n_sub) == (bn_ex, bn_sub)
  assert legacy_counter == block_counter
  return legacy, state


def _assert_states_equal(legacy, state):
  assert len(legacy.handles) == len(state.handles)
  for (lt, ln), (bt, bn) in zip(legacy.handles, state.handles):
    assert ln == bn
    assert set(lt) == set(bt)
    for key in lt:
      np.testing.assert_array_equal(lt[key], bt[key], err_msg=key)
      assert lt[key].dtype == bt[key].dtype, key
  # Per-window metadata (prediction assembly inputs) in identical order.
  for lb, bb in zip(legacy.batches, state.batches):
    for key in ('window_pos', 'name', 'ec', 'np_num_passes', 'rq', 'rg'):
      assert list(lb[key]) == list(bb[key]), key
  # Skipped windows: identical DCModelOutput streams.
  assert legacy.skipped_predictions == state.skipped_predictions


def test_block_transport_bit_identical_default_triage():
  params = _params()
  options = engine.InferenceOptions(
      max_length=100, example_height=85, max_passes=20, batch_size=64
  )
  legacy, state = _run_both(options, params)
  assert state.handles, 'expected model windows'
  _assert_states_equal(legacy, state)


def test_block_transport_bit_identical_no_triage():
  params = _params()
  options = engine.InferenceOptions(
      max_length=100, example_height=85, max_passes=20, batch_size=128,
      skip_windows_above=0,
  )
  legacy, state = _run_both(options, params)
  assert not state.skipped_predictions
  _assert_states_equal(legacy, state)


def test_block_transport_low_skip_threshold():
  # A low threshold forces many skipped windows, exercising the
  # run-splitting path in enqueue_round_blocks.
  params = _params()
  options = engine.InferenceOptions(
      max_length=100, example_height=85, max_passes=20, batch_size=32,
      skip_windows_above=25,
  )
  legacy, state = _run_both(options, params)
  assert state.skipped_predictions
  _assert_states_equal(legacy, state)


def test_avg_phred_rows_matches_scalar():
  from deepconsensus_tpu.utils import phred

  rng = np.random.default_rng(3)
  bq = rng.integers(-1, 94, size=(40, 100)).astype(np.int64)
  bq[0] = -1  # empty row -> 0.0
  bq[1] = 0  # all-zero row -> 0.0 (reference .any() quirk)
  rows = phred.avg_phred_rows(bq)
  for i in range(len(bq)):
    assert rows[i] == phred.avg_phred(bq[i]), i


def test_sharded_ragged_build_matches_single():
  """build(num_shards) = per-shard transports equal to per-shard builds."""
  import jax

  if len(jax.devices()) < 4:
    return
  params = _params()
  options = engine.InferenceOptions(
      max_length=100, example_height=85, max_passes=20, batch_size=64
  )
  inputs = _zmw_inputs()
  blocks, _, _ = engine.featurize_round_blocks(
      inputs, 'x', collections.Counter(), engine.Timing(),
      engine.clip_maxima(params)
  )
  builder = data.RaggedBatchBuilder(params, options.batch_size)
  for b in blocks[:3]:
    if builder.room >= b.n_windows:
      builder.add_segment(b, 0, b.n_windows)
  n = builder.n
  sharded = builder.build(num_shards=4)
  # Every key gains a leading shard axis of size 4.
  for k, v in sharded.items():
    assert v.shape[0] == 4, k

  from deepconsensus_tpu.models import model as model_lib
  from deepconsensus_tpu.parallel import dp_inference

  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  single = engine.ModelRunner(params, jax.device_get(variables), 64)
  multi = dp_inference.ShardedModelRunner(
      params, jax.device_get(variables), 64, num_devices=4
  )
  ids_m, maxp_m = multi.collect(multi.predict_ragged_async(sharded, n))
  ids_s, maxp_s = single.collect(
      single.predict_ragged_async(builder.build(), n)
  )
  np.testing.assert_array_equal(ids_m, ids_s)
  np.testing.assert_array_equal(maxp_m, maxp_s)
