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
