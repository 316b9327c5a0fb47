"""Native featurize kernels vs the numpy implementations (bit-equality)."""

import collections

import numpy as np
import pytest

from tests.conftest import HUMAN_1M

from deepconsensus_tpu import native
from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.preprocess import feeder, spacing, windows

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason='native library unavailable'
)


def _zmw_inputs():
  dc_config = windows.DcConfig(20, 100, False)
  proc_feeder, _ = feeder.create_proc_feeder(
      subreads_to_ccs=f'{HUMAN_1M}/subreads_to_ccs.bam',
      ccs_bam=f'{HUMAN_1M}/ccs.bam',
      dc_config=dc_config,
      ins_trim=5,
  )
  return [(reads, zmw, cfg, ww) for reads, zmw, cfg, _, ww in proc_feeder()]


def _force_python(monkeypatch):
  monkeypatch.setattr(native, 'spaced_columns', lambda *a, **k: None)
  monkeypatch.setattr(native, 'scatter_windows', lambda *a, **k: False)


def test_spaced_columns_native_equals_numpy(monkeypatch):
  inputs = _zmw_inputs()
  native_out = [spacing.spaced_columns(reads) for reads, *_ in inputs]
  _force_python(monkeypatch)
  python_out = [spacing.spaced_columns(reads) for reads, *_ in inputs]
  for (nc, nf, nm), (pc, pf, pm) in zip(native_out, python_out):
    assert nf == pf and nm == pm
    for a, b in zip(nc, pc):
      np.testing.assert_array_equal(a, b)


def test_window_blocks_native_equals_numpy(monkeypatch):
  inputs = _zmw_inputs()
  clips = (255, 255, 500)
  stats = collections.Counter()
  timing = engine.Timing()
  native_blocks, n_ex, n_sub = engine.featurize_round_blocks(
      inputs, 'n', stats, timing, clips
  )
  _force_python(monkeypatch)
  python_blocks, p_ex, p_sub = engine.featurize_round_blocks(
      inputs, 'p', stats, timing, clips
  )
  assert (n_ex, n_sub) == (p_ex, p_sub)
  for nb, pb in zip(native_blocks, python_blocks):
    for field in ('window_pos', 'bases', 'pw', 'ip', 'ccs', 'bq', 'strand',
                  'sn'):
      np.testing.assert_array_equal(
          getattr(nb, field), getattr(pb, field), err_msg=field
      )
    assert nb.num_passes == pb.num_passes


def test_spacing_random_fuzz_native_vs_numpy(monkeypatch):
  """Synthetic reads (random cigars) through both geometry paths."""
  from deepconsensus_tpu.preprocess.reads import AlignedRead

  rng = np.random.default_rng(5)
  for trial in range(25):
    reads = []
    n_reads = int(rng.integers(1, 8))
    for i in range(n_reads):
      ln = int(rng.integers(1, 60))
      cigar = rng.choice(
          [0, 1, 2], size=ln, p=[0.7, 0.2, 0.1]
      ).astype(np.uint8)
      reads.append(
          AlignedRead(
              name=f'r{i}', bases=np.full(ln, ord('A'), np.uint8),
              cigar=cigar, pw=np.zeros(ln, np.uint8),
              ip=np.zeros(ln, np.uint8), sn=np.zeros(4), strand=1,
          )
      )
    nc, nf, nm = spacing.spaced_columns(reads)
    with pytest.MonkeyPatch.context() as mp:
      mp.setattr(native, 'spaced_columns', lambda *a, **k: None)
      pc, pf, pm = spacing.spaced_columns(reads)
    assert nf == pf and nm == pm, trial
    for a, b in zip(nc, pc):
      np.testing.assert_array_equal(a, b)
