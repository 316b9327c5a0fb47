"""CLI-level e2e tests: preprocess driver, distill, eval, export, run.

(reference: preprocess/preprocess_test.py:63-157,
model_distillation_test.py, model_inference_test.py)
"""

import json
import os

import numpy as np
import pytest

from deepconsensus_tpu import cli
from deepconsensus_tpu.io import fastq, tfrecord
from tests.conftest import HUMAN_1M


def test_preprocess_cli_training_mode(tmp_path):
  out = str(tmp_path / 'tf_examples' / '@split' / 'examples.tfrecord.gz')
  rc = cli.main([
      'preprocess',
      '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
      '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
      '--truth_to_ccs', f'{HUMAN_1M}/truth_to_ccs.bam',
      '--truth_bed', f'{HUMAN_1M}/truth.bed',
      '--truth_split', f'{HUMAN_1M}/truth_split.tsv',
      '--output', out,
  ])
  assert rc == 0
  train_file = out.replace('@split', 'train')
  n_train = sum(1 for _ in tfrecord.read_tfrecords(train_file))
  assert n_train == 1239
  summary = out.replace('examples.tfrecord.gz', 'examples.training.json').replace(
      '@split', 'summary'
  )
  with open(summary) as f:
    s = json.load(f)
  assert s['n_examples_train'] == 1239
  assert s['n_examples_eval'] == 65
  assert s['n_examples_test'] == 203
  assert s['tensor_height'] == '85'


def test_preprocess_cli_parallel_matches_serial(tmp_path):
  outs = {}
  for cpus in (0, 2):
    out = str(tmp_path / f'c{cpus}' / '@split' / 'ex.tfrecord.gz')
    rc = cli.main([
        'preprocess',
        '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
        '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
        '--output', out,
        '--cpus', str(cpus),
    ])
    assert rc == 0
    outs[cpus] = list(
        tfrecord.read_tfrecords(out.replace('@split', 'inference'))
    )
  assert len(outs[0]) == len(outs[2])
  assert outs[0] == outs[2]


def test_export_then_run(tmp_path):
  toy = '/root/repo/models_out/toy_model'
  if not os.path.exists(toy):
    pytest.skip('toy model not built')
  exported = str(tmp_path / 'exported')
  rc = cli.main(['export', '--checkpoint', toy,
                 '--output_directory', exported])
  assert rc == 0
  assert os.path.exists(os.path.join(exported, 'params.json'))
  out_fastq = str(tmp_path / 'out.fastq')
  rc = cli.main([
      'run',
      '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
      '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
      '--checkpoint', exported,
      '--output', out_fastq,
      '--batch_size', '256',
      '--min_quality', '0',
      '--limit', '3',
  ])
  assert rc == 0
  reads = list(fastq.read_fastq(out_fastq))
  assert len(reads) == 3
  for _, seq, qual in reads:
    assert len(seq) == len(qual) > 0


def test_eval_cli(tmp_path):
  toy = '/root/repo/models_out/toy_model'
  if not os.path.exists(toy):
    pytest.skip('toy model not built')
  out_dir = str(tmp_path / 'eval_out')
  rc = cli.main([
      'eval', '--checkpoint', toy, '--out_dir', out_dir,
      '--limit', '8', '--batch_size', '4',
  ])
  assert rc == 0
  with open(os.path.join(out_dir, 'inference.csv')) as f:
    header, values = f.read().splitlines()
  metrics = dict(zip(header.split(','), values.split(',')))
  assert float(metrics['eval/per_example_accuracy']) >= 0.0
  assert np.isfinite(float(metrics['eval/loss']))


def test_eval_sharded_matches_single_device(tmp_path):
  """run_eval on the 8-device virtual mesh must bit-match 1 device (the
  reference's eval binary sharded like the train loop, VERDICT r4 #8)."""
  toy = '/root/repo/models_out/toy_model'
  if not os.path.exists(toy):
    pytest.skip('toy model not built')
  from deepconsensus_tpu.train import evaluate

  m1 = evaluate.run_eval(
      toy, str(tmp_path / 'd1'), limit=32, batch_size=8, num_devices=1
  )
  m8 = evaluate.run_eval(
      toy, str(tmp_path / 'd8'), limit=32, batch_size=8, num_devices=8
  )
  assert set(m1) == set(m8)
  for k in m1:
    assert m1[k] == m8[k], (k, m1[k], m8[k])


def test_distill_smoke(tmp_path):
  toy = '/root/repo/models_out/toy_model'
  if not os.path.exists(toy):
    pytest.skip('toy model not built')
  out_dir = str(tmp_path / 'distill_out')
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import distill

  params = configs.get_config('transformer_learn_values_distill+test')
  with params.unlocked():
    params.batch_size = 4
    params.limit = 8
    params.num_epochs = 1
  metrics = distill.train_distillation(
      out_dir, params, teacher_checkpoint=toy, num_devices=1
  )
  assert np.isfinite(metrics['eval/loss'])
  assert os.path.exists(os.path.join(out_dir, 'best_checkpoint.txt'))


def test_run_cli_bam_output(tmp_path):
  toy = '/root/repo/models_out/toy_model'
  if not os.path.exists(toy):
    pytest.skip('toy model not built')
  out_bam = str(tmp_path / 'out.bam')
  rc = cli.main([
      'run',
      '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
      '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
      '--checkpoint', toy,
      '--output', out_bam,
      '--batch_size', '256',
      '--min_quality', '0',
      '--limit', '2',
  ])
  assert rc == 0
  from deepconsensus_tpu.io import bam

  header, recs = bam.read_all(out_bam)
  assert len(recs) == 2
  for rec in recs:
    assert rec.is_unmapped
    assert rec.get_tag('zm') > 0
    assert rec.get_tag('RG')
    assert len(rec.seq) == len(rec.qual)
