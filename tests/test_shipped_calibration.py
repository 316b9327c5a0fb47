"""The toy model ships a fitted dc_calibration that `run` applies by default.

Mirrors the reference's shipped-calibration contract: the released
params.json carries `dc_calibration` (reference testdata/model/params.json,
quality_calibration/calibration_lib.py:77-99) and `run` applies it when the
flag is omitted (quick_inference.py:380-386). The toy value was fitted by
tools/calibrate_toy_model.py (docs/toy_calibration.json records the loop).
"""

import os

import numpy as np
import pytest

from deepconsensus_tpu import cli
from deepconsensus_tpu.calibration import calibration as calibration_lib
from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.io import fastq
from tests.conftest import HUMAN_1M

TOY = '/root/repo/models_out/toy_model'


@pytest.fixture(scope='module')
def shipped():
  import json

  with open(os.path.join(TOY, 'params.json')) as f:
    return json.load(f).get('dc_calibration')


def test_toy_params_ship_threshold0_calibration(shipped):
  assert shipped, 'toy params.json must ship a fitted dc_calibration'
  vals = calibration_lib.parse_calibration_string(shipped)
  assert vals.enabled
  assert vals.threshold == 0.0  # keeps the device-Q chain monotone
  assert vals.w > 0


def _run(tmp_path, name, extra):
  out = str(tmp_path / f'{name}.fastq')
  rc = cli.main([
      'run',
      '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
      '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
      '--checkpoint', TOY,
      '--output', out,
      '--cpus', '0',
      '--min_quality', '0',
      '--limit', '2',
  ] + extra)
  assert rc == 0
  return list(fastq.read_fastq(out))


def test_run_applies_shipped_calibration_by_default(tmp_path, shipped):
  default = _run(tmp_path, 'default', [])
  explicit = _run(tmp_path, 'explicit', ['--dc_calibration', shipped])
  skipped = _run(tmp_path, 'skip', ['--dc_calibration', 'skip'])
  assert [r[2] for r in default] == [r[2] for r in explicit]
  # The fitted transform must actually change qualities vs skip.
  assert [r[2] for r in default] != [r[2] for r in skipped]
  assert [r[1] for r in default] == [r[1] for r in skipped]  # sequences same


def test_device_q_engages_with_shipped_calibration(shipped):
  """threshold-0 positive-slope fit keeps the host chain monotone, so the
  device quantization path must still produce exact bin boundaries."""
  vals = calibration_lib.parse_calibration_string(shipped)
  options = engine.InferenceOptions(
      max_length=100, example_height=85, max_passes=20,
      dc_calibration_values=vals,
  )
  bounds = engine.phred_bin_boundaries(options)
  assert bounds is not None
  # Spot-verify bit-exactness of the device chain on a probe grid.
  probe = np.nextafter(
      np.linspace(0.0, 1.0, 4097, dtype=np.float32), np.float32(1.0)
  ).astype(np.float32)
  host_q = engine.quality_scores_from_probs(probe, options)
  dev_q = np.sum(probe[:, None] >= bounds[None, :], axis=1).astype(np.uint8)
  np.testing.assert_array_equal(host_q.astype(np.uint8), dev_q)
