"""TensorBoard event-file writer tests.

The writer is pure Python (io/tb_events.py); these tests decode its output
with TensorFlow's own Event proto + summary iterator to prove TensorBoard
can load it (the reference's observability contract,
model_utils.py:549-583).
"""

import glob
import struct

import numpy as np
import pytest

from deepconsensus_tpu.io import tb_events, tfrecord


def _read_records(path):
  return list(tfrecord.read_tfrecords(path, compressed=False, verify=True))


def test_framing_and_file_version(tmp_path):
  with tb_events.SummaryWriter(str(tmp_path)) as w:
    w.scalar('loss', 1.5, step=3)
    path = w.path
  records = _read_records(path)
  assert len(records) == 2
  assert b'brain.Event:2' in records[0]


def test_tf_decodes_events(tmp_path):
  tf = pytest.importorskip('tensorflow')
  from tensorflow.core.util import event_pb2

  with tb_events.SummaryWriter(str(tmp_path)) as w:
    w.scalars({'loss': 2.25, 'accuracy': 0.5}, step=7, wall_time=123.0)
    w.scalars({'loss': 1.125}, step=14)
    path = w.path

  events = []
  for rec in tf.data.TFRecordDataset(path):
    events.append(event_pb2.Event.FromString(rec.numpy()))
  assert events[0].file_version == 'brain.Event:2'
  e1 = events[1]
  assert e1.step == 7 and e1.wall_time == 123.0
  got = {v.tag: v.simple_value for v in e1.summary.value}
  assert got == {'loss': 2.25, 'accuracy': 0.5}
  assert events[2].step == 14
  assert events[2].summary.value[0].simple_value == 1.125


def test_non_numeric_and_empty_scalars_skipped(tmp_path):
  with tb_events.SummaryWriter(str(tmp_path)) as w:
    w.scalars({'name': 'zmw/1', 'flag': True}, step=1)
    w.scalars({}, step=2)
    path = w.path
  assert len(_read_records(path)) == 1  # only the file_version event


def test_train_loop_writes_loadable_event_files(tmp_path):
  tf = pytest.importorskip('tensorflow')
  from tensorflow.core.util import event_pb2

  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import loop

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_epochs = 1
    params.batch_size = 8
    params.limit = 8
    params.num_hidden_layers = 1
    params.filter_size = 16
    params.transformer_input_size = 16
  configs.finalize_params(params)
  out_dir = str(tmp_path / 'run')
  loop.train(out_dir, params, num_devices=1)

  found = {}
  for sub in ('train', 'eval'):
    files = glob.glob(f'{out_dir}/{sub}/events.out.tfevents.*')
    assert files, f'no event file under {sub}/'
    tags = set()
    for rec in tf.data.TFRecordDataset(files[0]):
      ev = event_pb2.Event.FromString(rec.numpy())
      tags.update(v.tag for v in ev.summary.value)
    found[sub] = tags
  assert 'loss' in found['eval']
  # Train events only appear every log_train_steps; the smoke run may be
  # shorter, but the eval stream must always carry the main metrics.
  assert any('accuracy' in t for t in found['eval'])
