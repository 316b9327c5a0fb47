"""Multi-chip / multi-host data-parallel inference tests (8 virtual devices).

The FASTQ must be bit-identical under: 1 device vs 8-device sharded
batches, and 1 host vs 2-host partials merged deterministically.
"""

import os

import numpy as np
import pytest

import jax

from deepconsensus_tpu import cli
from deepconsensus_tpu.parallel import dp_inference
from tests.conftest import HUMAN_1M

TOY = '/root/repo/models_out/toy_model'

pytestmark = pytest.mark.skipif(
    not os.path.exists(TOY), reason='toy model not built'
)


def _run(tmp_path, name, extra):
  out = str(tmp_path / f'{name}.fastq')
  rc = cli.main([
      'run',
      '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
      '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
      '--checkpoint', TOY,
      '--output', out,
      '--batch_size', '64',
      '--min_quality', '0',
  ] + extra)
  assert rc == 0
  with open(out) as f:
    return out, f.read()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_sharded_batches_match_single_device(tmp_path):
  _, single = _run(tmp_path, 'single', [])
  _, sharded = _run(tmp_path, 'sharded', ['--num_devices', '8'])
  assert single == sharded
  assert single.count('\n') % 4 == 0 and single


def test_two_host_partials_merge_to_single_host_output(tmp_path):
  _, single = _run(tmp_path, 'single1', [])
  p0, _ = _run(
      tmp_path, 'part0', ['--num_hosts', '2', '--host_id', '0']
  )
  p1, _ = _run(
      tmp_path, 'part1', ['--num_hosts', '2', '--host_id', '1']
  )
  merged = str(tmp_path / 'merged.fastq')
  n = dp_inference.merge_fastq_partials([p0, p1], merged)
  with open(merged) as f:
    merged_text = f.read()
  # Same multiset of reads; order is by host partition (deterministic).
  def reads_of(text):
    lines = text.splitlines()
    return sorted(
        '\n'.join(lines[i : i + 4]) for i in range(0, len(lines), 4)
    )

  assert reads_of(merged_text) == reads_of(single)
  assert n == len(reads_of(single))


def test_limit_counts_global_zmws_across_hosts(tmp_path):
  # --limit 4 with 2 hosts must process ZMW indices {0,1,2,3} in total:
  # host 0 gets indices 0,2 and host 1 gets 1,3 (reference semantics,
  # quick_inference.py:905-911).
  _, ref = _run(tmp_path, 'lim_single', ['--limit', '4'])
  p0, _ = _run(
      tmp_path, 'lim0', ['--limit', '4', '--num_hosts', '2', '--host_id', '0']
  )
  p1, _ = _run(
      tmp_path, 'lim1', ['--limit', '4', '--num_hosts', '2', '--host_id', '1']
  )
  merged = str(tmp_path / 'lim_merged.fastq')
  dp_inference.merge_fastq_partials([p0, p1], merged)
  with open(merged) as f:
    merged_text = f.read()

  def reads_of(text):
    lines = text.splitlines()
    return sorted(
        '\n'.join(lines[i : i + 4]) for i in range(0, len(lines), 4)
    )

  assert reads_of(merged_text) == reads_of(ref)


def test_merge_cli_subcommand(tmp_path):
  p0 = tmp_path / 'a.fastq'
  p1 = tmp_path / 'b.fastq'
  p0.write_text('@r0\nACGT\n+\n!!!!\n')
  p1.write_text('@r1\nGGTT\n+\n####\n')
  out = str(tmp_path / 'merged.fastq')
  rc = cli.main(['merge', str(p0), str(p1), '--output', out])
  assert rc == 0
  assert open(out).read() == '@r0\nACGT\n+\n!!!!\n@r1\nGGTT\n+\n####\n'


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_sharded_runner_nonpow2_device_count(tmp_path):
  # Tier padding must stay divisible by the mesh size for any device count
  # (e.g. 6): previously tier 256 with 6 devices failed the sharded jit.
  from deepconsensus_tpu.inference import engine
  from deepconsensus_tpu.models import data

  assert data.padded_size(200, 1026, multiple=6) == 258
  assert data.padded_size(2000, 1026, multiple=6) == 1026
  runner, params = engine.load_model_for_inference(TOY, 60, num_devices=6)
  assert runner.batch_size % 6 == 0
  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(10, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  ids, maxp = runner.predict(rows)
  assert ids.shape == (10, params.max_length)


def test_lookahead_depth_does_not_change_output(tmp_path):
  _, d1 = _run(tmp_path, 'la1', ['--lookahead', '1'])
  _, d4 = _run(tmp_path, 'la4', ['--lookahead', '4'])
  assert d1 == d4 and d1


@pytest.mark.skipif(len(jax.devices()) < 6, reason='needs 6 virtual devices')
def test_sharded_indivisible_batch_size(tmp_path):
  """--num_devices that doesn't divide --batch_size must round the batch
  up end-to-end (review r5: the engine used to BUILD batches at the raw
  size while the runner rounded its own copy, so a full batch crashed
  data._split_segments with IndexError) and still be byte-identical."""
  _, single = _run(tmp_path, 'single6', [])
  _, sharded = _run(tmp_path, 'sharded6', ['--num_devices', '6'])
  assert single == sharded


def test_merge_fastq_partials_missing_input_is_an_error(tmp_path):
  """A missing partial must raise, not silently drop that host's reads
  (review r5)."""
  p0 = tmp_path / 'p0.fastq'
  p0.write_text('@r1\nACGT\n+\nIIII\n')
  with pytest.raises(FileNotFoundError):
    dp_inference.merge_fastq_partials(
        [str(p0), str(tmp_path / 'missing.fastq')],
        str(tmp_path / 'merged.fastq'),
    )
