"""Inference-engine unit tests: triage, Q-score math, batching, stitching.

(reference behaviors: quick_inference.py:304-338,377-389,567-594,655-677;
stitch_utils_test.py:67-204)
"""

import numpy as np
import pytest

from deepconsensus_tpu.calibration import calibration as calibration_lib
from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.models import configs
from deepconsensus_tpu.postprocess import stitch


def _options(**kw):
  defaults = dict(max_length=100, example_height=85, max_passes=20)
  defaults.update(kw)
  return engine.InferenceOptions(**defaults)


def _window(name, pos, avg_q=30, overflow=False, width=100):
  rows = np.zeros((85, width, 1), np.float32)
  rows[80, :, 0] = 1.0  # ccs row: all 'A'
  return {
      'subreads': rows,
      'subreads/num_passes': 5,
      'name': name,
      'window_pos': pos,
      'ccs_base_quality_scores': np.full(width, avg_q, dtype=np.int64),
      'overflow': overflow,
      'ec': 1.0,
      'np_num_passes': 5,
      'rq': 0.99,
      'rg': 'rg1',
  }


def test_triage_splits_overflow_and_high_quality():
  opts = _options(skip_windows_above=45)
  zmws = [[
      _window('m/1/ccs', 0, avg_q=30),
      _window('m/1/ccs', 100, avg_q=60),      # above Q45 -> skip
      _window('m/1/ccs', 200, overflow=True, width=130),  # overflow -> skip
  ]]
  for_model, skipped = engine.triage_windows(zmws, opts)
  assert len(for_model) == 1 and for_model[0]['window_pos'] == 0
  assert len(skipped) == 2
  assert all(p.sequence.startswith('A') for p in skipped)
  # Skipped windows adopt CCS qualities.
  assert skipped[0].quality_string[0] == chr(60 + 33)


def test_triage_disabled_skip():
  opts = _options(skip_windows_above=0)
  zmws = [[_window('m/1/ccs', 0, avg_q=93)]]
  for_model, skipped = engine.triage_windows(zmws, opts)
  assert len(for_model) == 1 and not skipped


def test_quality_scores_from_probs_reference_ops():
  opts = _options(max_base_quality=93)
  maxp = np.array([[0.9, 0.999999, 1.0, 0.5]])
  qs = engine.quality_scores_from_probs(maxp, opts)
  assert qs.tolist() == [[10, 60, 93, 3]]  # 1.0 -> inf -> capped at 93


def test_quality_calibration_applied():
  opts = _options(
      dc_calibration_values=calibration_lib.parse_calibration_string(
          '0,1.197654,-0.99781'
      )
  )
  maxp = np.array([[0.9]])
  qs = engine.quality_scores_from_probs(maxp, opts)
  want = round(10 * 1.197654 - 0.99781)
  assert qs[0, 0] == want


def test_stitch_missing_window_aborts():
  outcome = stitch.OutcomeCounter()
  preds = [
      stitch.DCModelOutput(
          molecule_name='m/1/ccs', window_pos=0, sequence='A' * 100,
          quality_string=chr(63) * 100,
      ),
      stitch.DCModelOutput(
          molecule_name='m/1/ccs', window_pos=200, sequence='C' * 100,
          quality_string=chr(63) * 100,
      ),
  ]
  out = stitch.stitch_to_fastq('m/1/ccs', preds, 100, 0, 0, outcome)
  assert out is None and outcome.empty_sequence == 1


def test_stitch_fill_n():
  preds = [
      stitch.DCModelOutput(
          molecule_name='m', window_pos=0, sequence='A' * 100,
          quality_string=chr(63) * 100,
      ),
      stitch.DCModelOutput(
          molecule_name='m', window_pos=200, sequence='C' * 100,
          quality_string=chr(63) * 100,
      ),
  ]
  seq, qual = stitch.get_full_sequence(preds, 100, fill_n=True)
  assert len(seq) == 300 and seq[100:200] == 'N' * 100
  assert qual[100] == chr(33)  # EMPTY_QUAL phred 0


def test_stitch_quality_and_length_filters():
  outcome = stitch.OutcomeCounter()
  lowq = stitch.DCModelOutput(
      molecule_name='m', window_pos=0, sequence='ACGT',
      quality_string=chr(33 + 5) * 4,
  )
  assert stitch.stitch_to_fastq('m', [lowq], 4, 20, 0, outcome) is None
  assert outcome.failed_quality_filter == 1
  short = stitch.DCModelOutput(
      molecule_name='m', window_pos=0, sequence='ACGT',
      quality_string=chr(33 + 40) * 4,
  )
  assert stitch.stitch_to_fastq('m', [short], 4, 20, 100, outcome) is None
  assert outcome.failed_length_filter == 1
  ok = stitch.stitch_to_fastq('m', [short], 4, 20, 0, outcome)
  assert ok == '@m\nACGT\n+\n' + chr(73) * 4 + '\n'
  assert outcome.success == 1


def test_stitch_only_gaps():
  outcome = stitch.OutcomeCounter()
  gaps = stitch.DCModelOutput(
      molecule_name='m', window_pos=0, sequence=' ' * 10,
      quality_string=chr(40) * 10,
  )
  assert stitch.stitch_to_fastq('m', [gaps], 10, 0, 0, outcome) is None
  assert outcome.only_gaps == 1


def test_avg_phred_quality_boundary():
  # A read with all Q10 must pass a Q10 filter (rounding guard,
  # stitch_utils.py:101-109).
  qual = chr(10 + 33) * 50
  assert stitch.is_quality_above_threshold(qual, 10)


def test_batch_feature_dicts_shapes():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  wins = [_window('m/1/ccs', i * 100) for i in range(5)]
  batches = list(engine.data.batch_feature_dicts(wins, params, batch_size=2))
  assert [b['rows'].shape[0] for b in batches] == [2, 2, 1]
  assert batches[0]['rows'].shape[1:] == (85, 100, 1)


def test_async_weight_upload_roundtrip_and_error():
  """AsyncWeightUpload returns the uploaded pytree and re-raises failures
  at get() (round-5: the upload runs on a background thread so BAM ingest
  overlaps it; a failure must not be silent)."""
  import numpy as np

  from deepconsensus_tpu.inference import engine

  tree = {'a': np.arange(6, dtype=np.float32).reshape(2, 3),
          'b': {'c': np.ones((4,), np.float32)}}
  up = engine.AsyncWeightUpload(tree)
  got = up.get()
  np.testing.assert_array_equal(np.asarray(got['a']), tree['a'])
  np.testing.assert_array_equal(np.asarray(got['b']['c']), tree['b']['c'])
  assert up.seconds is not None and up.seconds >= 0.0

  bad = engine.AsyncWeightUpload({'x': object()})  # not device-puttable
  import pytest as _pytest

  with _pytest.raises(RuntimeError, match='weight upload failed'):
    bad.get()


def test_threaded_iter_producer_exits_after_consumer_detach():
  """A consumer that stops early must release the producer thread even
  when the queue is full at the terminal put (advisor r4): the producer
  thread itself must EXIT, not remain blocked in q.put."""
  import threading
  import time as time_lib

  from deepconsensus_tpu.inference import engine

  before = set(threading.enumerate())

  def run_cycle(n_items):
    it = engine.threaded_iter(iter(range(n_items)), maxsize=2)
    assert next(it) == 0
    it.close()  # detach; queue is full (maxsize 2) at this point

  # Exercise both terminal cases: mid-stream detach (producer parked in
  # the item put) and end-of-stream detach (producer parked in the done
  # sentinel put — the exact residual case the advisor flagged).
  run_cycle(1000)
  run_cycle(3)

  deadline = time_lib.time() + 10.0
  while time_lib.time() < deadline:
    leaked = [
        t for t in threading.enumerate()
        if t not in before and t.is_alive()
    ]
    if not leaked:
      break
    time_lib.sleep(0.1)
  assert not leaked, f'producer threads still alive: {leaked}'
