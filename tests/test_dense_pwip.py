"""Gap-elided pw/ip transport: dense non-gap streams scattered on device.

The encoding is only eligible when pw==ip==0 at every gap column (true for
all real featurizer output; the encoder verifies it), must round-trip
bit-exactly, and must leave forward results identical to the spaced path.
"""

import numpy as np

import jax

from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.models import configs, data


def _params():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  return params


def _invariant_rows(params, b=12, seed=0):
  """Random rows where pw/ip are zero exactly at gap columns of bases."""
  rng = np.random.default_rng(seed)
  rows = rng.integers(
      0, 100, size=(b, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  (base_idx, pw_idx, ip_idx, *_unused) = configs.get_indices(
      params.max_passes, params.use_ccs_bq
  )
  mp = params.max_passes
  bases = rng.integers(0, 5, size=(b, mp, params.max_length, 1))
  rows[:, base_idx[0] : base_idx[0] + mp] = bases
  gap = bases == 0
  for idx in (pw_idx, ip_idx):
    # HiFi-like skewed values (escape rate well under the dense tier);
    # occasional large outliers exercise the escape stream.
    vals = rng.poisson(6.0, size=(b, mp, params.max_length, 1)).astype(
        np.float64
    )
    vals[rng.random(vals.shape) < 0.01] = 200.0
    vals = np.clip(vals, 0, 255)
    vals[gap] = 0.0
    rows[:, idx[0] : idx[0] + mp] = vals
  num_passes = rng.integers(1, mp + 1, size=b).tolist()
  return rows, num_passes


def test_dense_encode_numpy_round_trip():
  params = _params()
  rows, num_passes = _invariant_rows(params)
  t = data.ragged_from_rows(rows, num_passes, params)
  assert 'pwd_codes' in t, sorted(t)  # dense eligible on invariant data
  L = int(params.max_length)
  # Rebuild the spaced flat arrays from a fallback-forced encode.
  t_spaced = dict(t)
  for k in ('pwd_codes', 'pwd_esc', 'ipd_codes', 'ipd_esc'):
    t_spaced.pop(k)
  pw = data.dense_pwip_decode(t['flat_bases'], t['pwd_codes'], t['pwd_esc'], L)
  ip = data.dense_pwip_decode(t['flat_bases'], t['ipd_codes'], t['ipd_esc'], L)
  mask = data.unpack_base3(t['flat_bases'], L) != 0
  assert pw[~mask].sum() == 0 and ip[~mask].sum() == 0
  # Cross-check against the spaced plain encoding of the same rows.
  t2 = _spaced_transport(rows, num_passes, params)
  np.testing.assert_array_equal(pw, t2['flat_pw'])
  np.testing.assert_array_equal(ip, t2['flat_ip'])


def _spaced_transport(rows, num_passes, params, monkeypatch=None):
  """ragged_from_rows with the dense encoding disabled (plain uint8 pw/ip)."""
  import unittest.mock as mock

  with mock.patch.object(data, 'dense_pwip_encode', lambda *a, **k: None):
    with mock.patch.object(
        data, 'nibble_escape_encode', lambda *a, **k: None
    ):
      return data.ragged_from_rows(rows, num_passes, params)


def test_invariant_violation_falls_back():
  params = _params()
  rng = np.random.default_rng(3)
  rows = rng.integers(
      1, 100, size=(6, params.total_rows, params.max_length, 1)
  ).astype(np.float32)  # pw/ip nonzero everywhere incl. gap columns
  num_passes = [3] * 6
  t = data.ragged_from_rows(rows, num_passes, params)
  assert 'pwd_codes' not in t


def test_device_decode_matches_numpy():
  params = _params()
  rows, num_passes = _invariant_rows(params, seed=5)
  t = data.ragged_from_rows(rows, num_passes, params)
  assert 'pwd_codes' in t
  L = int(params.max_length)
  base_ids = data.unpack_base3(t['flat_bases'], L)
  jitted = jax.jit(
      lambda b, c, e: engine.decode_dense_pwip(b, c, e)
  )
  for codes, esc in (
      (t['pwd_codes'], t['pwd_esc']),
      (t['ipd_codes'], t['ipd_esc']),
  ):
    dev = np.asarray(jitted(base_ids, codes, esc))
    ref = data.dense_pwip_decode(t['flat_bases'], codes, esc, L)
    np.testing.assert_array_equal(dev, ref)


def test_forward_identical_dense_vs_spaced():
  from deepconsensus_tpu.models import model as model_lib

  params = _params()
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  runner = engine.ModelRunner(params, variables, 16)
  rows, num_passes = _invariant_rows(params, b=16, seed=7)
  padded = data.pad_batch(rows, 16)
  t_dense = data.ragged_from_rows(padded, num_passes, params)
  assert 'pwd_codes' in t_dense
  t_spaced = _spaced_transport(padded, num_passes, params)
  assert 'flat_pw' in t_spaced
  out_d = runner.collect(runner.predict_ragged_async(t_dense, 16))
  out_s = runner.collect(runner.predict_ragged_async(t_spaced, 16))
  np.testing.assert_array_equal(out_d[0], out_s[0])
  np.testing.assert_array_equal(out_d[1], out_s[1])
