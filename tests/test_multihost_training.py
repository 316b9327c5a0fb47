"""Multi-host (pod-scale) training: 2 processes x 4 virtual CPU devices.

The reference gets multi-host training for free from TPUStrategy
(model_train_custom_loop.py:333-347, docs/train_tpu_model.md:283-292);
the JAX equivalent is jax.distributed.initialize + a global mesh. This
test launches two real OS processes that each run `loop.train` over a
shared out_dir (the exact path `cli train --coordinator --host_id
--num_hosts` takes) and asserts the run is bit-for-bit equivalent to a
single-process 8-device run: same per-step train losses and the same
final checkpoint variables.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, 'tests', 'multihost_worker.py')


def _free_port() -> int:
  s = socket.socket()
  s.bind(('127.0.0.1', 0))
  port = s.getsockname()[1]
  s.close()
  return port


def _worker_env() -> dict:
  env = dict(os.environ)
  env['JAX_PLATFORMS'] = 'cpu'
  env['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
  env['PYTHONPATH'] = REPO + os.pathsep + env.get('PYTHONPATH', '')
  return env


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_two_process_training_matches_single_process(tmp_path):
  port = _free_port()
  mh_dir = str(tmp_path / 'mh')
  env = _worker_env()
  procs = [
      subprocess.Popen(
          [sys.executable, WORKER, str(i), '2', str(port), mh_dir],
          env=env,
          stdout=subprocess.PIPE,
          stderr=subprocess.STDOUT,
          text=True,
      )
      for i in range(2)
  ]
  outs = []
  for p in procs:
    try:
      out, _ = p.communicate(timeout=420)
    except subprocess.TimeoutExpired:
      for q in procs:
        q.kill()
      raise
    outs.append(out)
  for i, (p, out) in enumerate(zip(procs, outs)):
    assert p.returncode == 0, f'host {i} failed:\n{out[-4000:]}'

  # Single-process run over the same 8-device mesh, same config/seed.
  from deepconsensus_tpu.models import checkpoint as ckpt_lib
  from deepconsensus_tpu.models import configs, model as model_lib
  from deepconsensus_tpu.train import loop

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.batch_size = 8
    params.limit = 8
    params.num_epochs = 1
    params.buffer_size = 10
    params.num_hidden_layers = 2
    params.filter_size = 128
    params.transformer_input_size = 64
  sp_dir = str(tmp_path / 'sp')
  loop.train(sp_dir, params, num_devices=8, log_train_steps=1)

  def scalars(out_dir):
    with open(os.path.join(out_dir, 'scalars.jsonl')) as f:
      return [json.loads(l) for l in f]

  mh, sp = scalars(mh_dir), scalars(sp_dir)
  assert len(mh) == len(sp) > 0
  mh_losses = [s['train/loss'] for s in mh if 'train/loss' in s]
  sp_losses = [s['train/loss'] for s in sp if 'train/loss' in s]
  assert len(mh_losses) == len(sp_losses) > 0
  # Same global batches (sliced stream is bit-identical to single-host),
  # same mesh size, same seed: losses must agree to float tolerance.
  np.testing.assert_allclose(mh_losses, sp_losses, rtol=1e-5)

  # Only the coordinator writes markers; orbax writes one checkpoint tree.
  with open(os.path.join(mh_dir, 'best_checkpoint.txt')) as f:
    mh_best = f.read().strip()
  with open(os.path.join(sp_dir, 'best_checkpoint.txt')) as f:
    sp_best = f.read().strip()
  assert mh_best == sp_best

  configs.finalize_params(params)
  model = model_lib.get_model(params)
  rng_vars = jax.device_get(model_lib.init_params(model, params))
  mh_vars = ckpt_lib.load_checkpoint(
      os.path.join(mh_dir, mh_best), {'variables': rng_vars}
  )['variables']
  sp_vars = ckpt_lib.load_checkpoint(
      os.path.join(sp_dir, sp_best), {'variables': rng_vars}
  )['variables']
  flat_mh = jax.tree_util.tree_leaves_with_path(mh_vars)
  flat_sp = {
      jax.tree_util.keystr(k): v
      for k, v in jax.tree_util.tree_leaves_with_path(sp_vars)
  }
  assert len(flat_mh) == len(flat_sp)
  for key, val in flat_mh:
    np.testing.assert_allclose(
        val, flat_sp[jax.tree_util.keystr(key)], rtol=1e-5, atol=1e-6,
        err_msg=f'param {jax.tree_util.keystr(key)} differs',
    )


def test_multihost_stream_slices_reassemble_global_batch():
  """With fewer files than hosts, per-host slices stack back into exactly
  the single-host global batch (the property the 2-process test relies on)."""
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import input_pipeline

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  single = input_pipeline.example_stream(
      params.train_path, params, 8, shuffle_buffer=10, seed=1
  )
  host0 = input_pipeline.multihost_stream(
      params.train_path, params, 8, host_id=0, num_hosts=2,
      shuffle_buffer=10, seed=1,
  )
  host1 = input_pipeline.multihost_stream(
      params.train_path, params, 8, host_id=1, num_hosts=2,
      shuffle_buffer=10, seed=1,
  )
  for _ in range(3):
    rows, labels = next(single)
    r0, l0 = next(host0)
    r1, l1 = next(host1)
    assert r0.shape[0] == r1.shape[0] == 4
    np.testing.assert_array_equal(np.concatenate([r0, r1]), rows)
    np.testing.assert_array_equal(np.concatenate([l0, l1]), labels)


def test_multihost_stream_rejects_indivisible_batch():
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import input_pipeline

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  with pytest.raises(ValueError, match='not divisible'):
    input_pipeline.multihost_stream(
        params.train_path, params, 9, host_id=0, num_hosts=2
    )


def test_multihost_stream_file_sharded_path(tmp_path):
  """With >= num_hosts input files, each host reads a disjoint round-robin
  file shard at the LOCAL batch size (the zero-redundant-IO pod path)."""
  from deepconsensus_tpu.io import tfrecord
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import input_pipeline

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  # Split the bundled train tfrecord into two physical files.
  src = input_pipeline.create_glob_list(params.train_path)
  records = list(tfrecord.read_tfrecords(src[0]))
  assert len(records) >= 8
  half = len(records) // 2
  for i, chunk in enumerate((records[:half], records[half:])):
    with tfrecord.TFRecordWriter(
        str(tmp_path / f'shard{i}.tfrecord.gz')
    ) as w:
      for rec in chunk:
        w.write(rec)
  pattern = str(tmp_path / 'shard*.tfrecord.gz')

  streams = [
      input_pipeline.multihost_stream(
          pattern, params, 8, host_id=h, num_hosts=2, shuffle_buffer=0
      )
      for h in range(2)
  ]
  per_file = [
      input_pipeline.example_stream(
          str(tmp_path / f'shard{h}.tfrecord.gz'), params, 4,
          shuffle_buffer=0,
      )
      for h in range(2)
  ]
  for _ in range(2):
    for got, want in zip(streams, per_file):
      g_rows, g_labels = next(got)
      w_rows, w_labels = next(want)
      assert g_rows.shape[0] == 4  # local batch = global 8 / 2 hosts
      np.testing.assert_array_equal(g_rows, w_rows)
      np.testing.assert_array_equal(g_labels, w_labels)


def test_threaded_tfrecord_writer_roundtrip_and_errors(tmp_path):
  from deepconsensus_tpu.io import tfrecord

  path = str(tmp_path / 'out.tfrecord.gz')
  payloads = [bytes([i]) * (i + 1) for i in range(200)]
  with tfrecord.ThreadedTFRecordWriter(path, queue_size=8) as w:
    for p in payloads:
      w.write(p)
  assert list(tfrecord.read_tfrecords(path, verify=True)) == payloads

  # A worker failure surfaces on the producer thread, not silently.
  w = tfrecord.ThreadedTFRecordWriter(str(tmp_path / 'err.tfrecord.gz'))
  w._writer._fh.close()  # force the background write to fail
  with pytest.raises(Exception):
    for _ in range(1000):
      w.write(b'x')
    w.close()
  # close() after the worker died (possibly with a full queue) must not
  # deadlock on the sentinel put, and must surface the worker's error.
  w2 = tfrecord.ThreadedTFRecordWriter(
      str(tmp_path / 'err2.tfrecord.gz'), queue_size=2
  )
  w2._writer._fh.close()
  with pytest.raises(Exception):
    for _ in range(100):
      w2.write(b'y' * 1000)
  with pytest.raises(Exception):
    w2.close()


def test_multihost_resume_divergence_fails_loudly(tmp_path):
  """Hosts whose out_dirs disagree on resume state (non-shared storage)
  must fail with a clear error instead of silently training with
  different weights per host."""
  import subprocess
  import sys as _sys

  from tests.test_multihost_training import _free_port, _worker_env

  port = _free_port()
  # Host 0 resumes from a completed prior run; host 1 gets a fresh dir.
  dir0 = str(tmp_path / 'host0')
  dir1 = str(tmp_path / 'host1')
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import loop

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.batch_size = 8
    params.limit = 8
    params.num_epochs = 1
    params.buffer_size = 10
    params.num_hidden_layers = 2
    params.filter_size = 128
    params.transformer_input_size = 64
  loop.train(dir0, params, num_devices=1)

  env = _worker_env()
  procs = [
      subprocess.Popen(
          [_sys.executable, WORKER, str(i), '2', str(port), d],
          env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
          text=True,
      )
      for i, d in enumerate((dir0, dir1))
  ]
  outs = [p.communicate(timeout=420)[0] for p in procs]
  assert any(p.returncode != 0 for p in procs), outs
  assert any('hosts disagree on resume state' in o for o in outs), (
      outs[0][-2000:], outs[1][-2000:]
  )


def test_starving_shard_raises_instead_of_hanging(tmp_path):
  """A repeating stream whose source yields fewer examples than one batch
  (e.g. a host file shard smaller than the LOCAL batch) must raise, not
  busy-loop forever — on a pod that silent loop hangs every host in the
  first all-reduce."""
  from deepconsensus_tpu.io import tfrecord
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import input_pipeline

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  src = input_pipeline.create_glob_list(params.train_path)
  records = list(tfrecord.read_tfrecords(src[0]))[:3]
  with tfrecord.TFRecordWriter(str(tmp_path / 'tiny.tfrecord.gz')) as w:
    for rec in records:
      w.write(rec)
  stream = input_pipeline.example_stream(
      str(tmp_path / 'tiny.tfrecord.gz'), params, 8, shuffle_buffer=0
  )
  with pytest.raises(ValueError, match='fewer than batch_size'):
    next(stream)


def test_multihost_stream_empty_glob_raises_eagerly():
  """A mistyped path must raise at construction, not surface as a bare
  StopIteration from the Prefetcher worker thread."""
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import input_pipeline

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  with pytest.raises(FileNotFoundError):
    input_pipeline.multihost_stream(
        '/nonexistent/path/*.tfrecord.gz', params, 8, host_id=0, num_hosts=2
    )
