"""Golden parity for the use_ccs_bq=True featurization (86-row examples)."""

import numpy as np
import pytest

from deepconsensus_tpu.io import example_pb, tfrecord
from deepconsensus_tpu.preprocess import feeder, windows
from tests.conftest import HUMAN_1M


@pytest.fixture(scope='module')
def pipeline_bq():
  dc = windows.DcConfig(max_passes=20, max_length=100, use_ccs_bq=True)
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
  return out


@pytest.mark.parametrize('split', ['train', 'eval', 'test'])
def test_bq_examples_bitwise_identical(pipeline_bq, split):
  path = f'{HUMAN_1M}/tf_examples_bq/{split}/{split}.tfrecord.gz'
  golden = []
  for rec in tfrecord.read_tfrecords(path):
    ex = example_pb.decode_example(rec)
    golden.append({
        'sub': np.frombuffer(ex['subreads/encoded'][1][0], np.float32).reshape(
            ex['subreads/shape'][1]
        ),
        'lab': np.frombuffer(ex['label/encoded'][1][0], np.float32),
        'name': ex['name'][1][0].decode(),
        'wp': ex['window_pos'][1][0],
    })
  mine = pipeline_bq[split]
  assert len(mine) == len(golden)
  for m, g in zip(mine, golden):
    assert m.name == g['name'] and m.window_pos == g['wp']
    assert m.subreads.shape == (86, 100, 1)
    assert np.array_equal(m.subreads[:, :, 0], g['sub'][:, :, 0])
    assert np.array_equal(m.label, g['lab'])
