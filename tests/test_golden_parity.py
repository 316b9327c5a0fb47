"""Bit-for-bit parity of the featurizer against the reference goldens.

Runs the full training-mode preprocessing over the bundled human_1m shard
and compares every generated example (tensors, labels, metadata, counters)
with the tfrecords the reference shipped
(`/root/reference/deepconsensus/testdata/human_1m/tf_examples/`).
"""

import json

import numpy as np
import pytest

from deepconsensus_tpu.io import example_pb, tfrecord
from deepconsensus_tpu.preprocess import feeder, windows
from tests.conftest import HUMAN_1M

GOLDEN_SUMMARY = f'{HUMAN_1M}/tf_examples/summary/summary.training.json'


def _run_pipeline():
  dc = windows.DcConfig(max_passes=20, max_length=100, use_ccs_bq=False)
  proc, counter = feeder.create_proc_feeder(
      subreads_to_ccs=f'{HUMAN_1M}/subreads_to_ccs.bam',
      ccs_bam=f'{HUMAN_1M}/ccs.bam',
      dc_config=dc,
      ins_trim=5,
      truth_bed=f'{HUMAN_1M}/truth.bed',
      truth_to_ccs=f'{HUMAN_1M}/truth_to_ccs.bam',
      truth_split=f'{HUMAN_1M}/truth_split.tsv',
  )
  out = {'train': [], 'eval': [], 'test': []}
  for reads, name, cfg, split, ww in proc():
    stack = windows.subreads_to_zmw_stack(reads, name, cfg, ww)
    for wf in stack.iter_windows():
      out[split].append(wf)
    counter.update(stack.counter)
  for split, wfs in out.items():
    counter[f'n_examples_{split}'] = len(wfs)
  counter['n_examples'] = sum(len(v) for v in out.values())
  return out, counter


def _load_golden(split):
  path = f'{HUMAN_1M}/tf_examples/{split}/{split}.tfrecord.gz'
  out = []
  for rec in tfrecord.read_tfrecords(path):
    ex = example_pb.decode_example(rec)
    out.append({
        'sub': np.frombuffer(ex['subreads/encoded'][1][0], np.float32).reshape(
            ex['subreads/shape'][1]
        ),
        'lab': np.frombuffer(ex['label/encoded'][1][0], np.float32),
        'name': ex['name'][1][0].decode(),
        'wp': ex['window_pos'][1][0],
        'npass': ex['subreads/num_passes'][1][0],
        'bq': np.array(ex['ccs_base_quality_scores'][1]),
    })
  return out


@pytest.fixture(scope='module')
def pipeline():
  return _run_pipeline()


def test_counters_match_golden_summary(pipeline):
  _, counter = pipeline
  with open(GOLDEN_SUMMARY) as f:
    golden = json.load(f)
  for key, value in golden.items():
    if isinstance(value, int):
      assert counter.get(key, 0) == value, (
          f'counter {key}: mine={counter.get(key, 0)} golden={value}'
      )


@pytest.mark.parametrize('split', ['train', 'eval', 'test'])
def test_examples_bitwise_identical(pipeline, split):
  mine, _ = pipeline
  golden = _load_golden(split)
  assert len(mine[split]) == len(golden)
  for m, g in zip(mine[split], golden):
    assert m.name == g['name']
    assert m.window_pos == g['wp']
    assert m.num_passes == g['npass']
    assert np.array_equal(m.subreads[:, :, 0], g['sub'][:, :, 0])
    assert np.array_equal(m.label, g['lab'])
    assert np.array_equal(m.ccs_base_quality_scores, g['bq'])


def test_example_bytes_decode_roundtrip(pipeline):
  mine, _ = pipeline
  wf = mine['train'][0]
  buf = wf.to_example_bytes()
  ex = example_pb.decode_example(buf)
  sub = np.frombuffer(ex['subreads/encoded'][1][0], np.float32).reshape(
      ex['subreads/shape'][1]
  )
  assert np.array_equal(sub, wf.subreads)
  assert ex['name'][1][0].decode() == wf.name
