"""Ragged minimum-byte transport: encoding round trip + forward parity.

The ragged transport (models/data.ragged_from_rows + the device-side
gather/unpack in engine.ModelRunner) must be bit-identical to the dense
rows path. Round-trip is checked in numpy; forward parity on real golden
examples through the full runner.
"""

import glob

import numpy as np
import pytest

from tests.conftest import HUMAN_1M

from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.io import example_pb, tfrecord
from deepconsensus_tpu.models import configs, data


def _params():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  return params


def _golden_batch(params, n=48):
  path = sorted(glob.glob(
      f'{HUMAN_1M}/tf_examples/train/*.tfrecord*'
  ))[0]
  rows, passes = [], []
  for raw in tfrecord.read_tfrecords(path):
    feats = example_pb.decode_example(raw)
    shape = [int(x) for x in feats['subreads/shape'][1]]
    dense = np.frombuffer(
        feats['subreads/encoded'][1][0], np.float32
    ).reshape(shape)
    rows.append(data.format_rows(dense, params)[None])
    passes.append(int(feats['subreads/num_passes'][1][0]))
    if len(rows) >= n:
      break
  return np.concatenate(rows), passes


def test_pack_nibbles_round_trip():
  rng = np.random.default_rng(0)
  for L in (100, 99, 1):
    x = rng.integers(0, 5, size=(7, L)).astype(np.uint8)
    packed = data.pack_nibbles(x)
    assert packed.shape == (7, (L + 1) // 2)
    lo = packed & 0xF
    hi = packed >> 4
    un = np.stack([lo, hi], axis=-1).reshape(7, -1)[:, :L]
    np.testing.assert_array_equal(un, x)


def test_ragged_round_trip_equals_compact():
  params = _params()
  rows, passes = _golden_batch(params, n=32)
  ragged = data.ragged_from_rows(rows, passes, params)
  compact = data.compact_from_rows(rows, params)  # full max_passes

  idx = data.row_index_from_passes(ragged['passes'], params.max_passes)
  P, L = params.max_passes, params.max_length
  # numpy mirror of the device decode
  flat_base_ids = data.unpack_base12(ragged['flat_bases12'], L)
  np.testing.assert_array_equal(flat_base_ids[idx], compact['bases'])
  dense_keys = {
      p: next(
          (
              (f'{p}_codes{data.dense_key_suffix(w)}',
               f'{p}_esc{data.dense_key_suffix(w)}', w)
              for w in data.DENSE_WIDTHS
              if f'{p}_codes{data.dense_key_suffix(w)}' in ragged
          ),
          None,
      )
      for p in ('pwd', 'ipd')
  }
  if dense_keys['pwd']:  # gap-elided dense encoding (real data)
    ck, ek, w = dense_keys['pwd']
    flat_pw = data.dense_pwip_decode(flat_base_ids, ragged[ck], ragged[ek], w)
    ck, ek, w = dense_keys['ipd']
    flat_ip = data.dense_pwip_decode(flat_base_ids, ragged[ck], ragged[ek], w)
  else:
    flat_pw = data.nibble_escape_decode(
        ragged['pw_codes'], ragged['pw_esc'], L
    )
    flat_ip = data.nibble_escape_decode(
        ragged['ip_codes'], ragged['ip_esc'], L
    )
  np.testing.assert_array_equal(flat_pw[idx], compact['pw'])
  np.testing.assert_array_equal(flat_ip[idx], compact['ip'])
  if 'strand2' in ragged:  # 2-bit packed strand (values < 4)
    strand = data.unpack_crumbs(ragged['strand2'], compact['strand'].shape[-1])
    np.testing.assert_array_equal(strand, compact['strand'])
  else:
    np.testing.assert_array_equal(ragged['strand'], compact['strand'])
  ccs = data.unpack_base12(ragged['ccs12'], L)
  np.testing.assert_array_equal(ccs, compact['ccs'])
  np.testing.assert_array_equal(ragged['sn'], compact['sn'])
  # Byte accounting: the ragged payload must be substantially smaller.
  rb = sum(v.nbytes for v in ragged.values())
  cb = sum(v.nbytes for v in compact.values())
  assert rb < cb


def test_ragged_flat_capacity_tiers():
  assert data.ragged_flat_capacity(1, 256, 20) == 4 * 256 + 1
  assert data.ragged_flat_capacity(4 * 256 + 1, 256, 20) == 4 * 256 + 1
  assert data.ragged_flat_capacity(4 * 256 + 2, 256, 20) == 6 * 256 + 1
  assert data.ragged_flat_capacity(19 * 256, 256, 20) == 20 * 256 + 1
  # max_passes below the tier ladder caps the tiers
  assert data.ragged_flat_capacity(5, 8, 2) == 2 * 8 + 1


@pytest.mark.parametrize('fused', [False, True])
def test_runner_ragged_forward_matches_bucketed(fused):
  params = _params()
  if fused:
    with params.unlocked():
      params.use_pallas_fused_encoder = True
  rows, passes = _golden_batch(params, n=48)

  from deepconsensus_tpu.models import model as model_lib
  import jax

  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  runner = engine.ModelRunner(params, jax.device_get(variables), 64)
  assert runner.transport == 'ragged'

  ids_r, maxp_r = runner.collect(
      runner.predict_async(rows, num_passes=passes)
  )
  ids_b, maxp_b = runner.collect(
      runner.predict_async(rows, pass_limit=None)
  )
  np.testing.assert_array_equal(ids_r, ids_b)
  np.testing.assert_array_equal(maxp_r, maxp_b)


def test_nibble_escape_round_trip():
  rng = np.random.default_rng(7)
  # Realistic skew: mostly small values, some escapes, full uint8 range.
  vals = np.minimum(
      rng.geometric(0.12, size=(300, 100)) - 1, 255
  ).astype(np.uint8)
  vals[0, :10] = [0, 14, 15, 16, 255, 15, 1, 200, 15, 15]
  enc = data.nibble_escape_encode(vals)
  assert enc is not None
  dec = data.nibble_escape_decode(enc['codes'], enc['esc'], 100)
  np.testing.assert_array_equal(dec, vals)
  # Byte win on skewed data.
  assert enc['codes'].nbytes + enc['esc'].nbytes < vals.nbytes


def test_nibble_escape_overflow_falls_back():
  vals = np.full((64, 100), 200, np.uint8)  # 100% escapes > PWIP_ESC_FRAC
  assert data.nibble_escape_encode(vals) is None
  # ragged_from_rows must then ship plain uint8 arrays.
  params = _params()
  rows = np.full(
      (8, params.total_rows, params.max_length, 1), 0, np.float32
  )
  rows[:, params.max_passes : 2 * params.max_passes] = 200.0  # pw rows
  ragged = data.ragged_from_rows(rows, [params.max_passes] * 8, params)
  assert 'flat_pw' in ragged and 'pw_codes' not in ragged


def test_pack_base3_round_trip():
  rng = np.random.default_rng(11)
  for L in (100, 99, 1, 3):
    x = rng.integers(0, 5, size=(7, L)).astype(np.uint8)
    packed = data.pack_base3(x)
    assert packed.shape == (7, -(-L // 3))
    np.testing.assert_array_equal(data.unpack_base3(packed, L), x)


def test_pack_base12_round_trip():
  import jax

  rng = np.random.default_rng(12)
  for L in (100, 99, 101, 1, 10):
    x = rng.integers(0, 5, size=(7, L)).astype(np.uint8)
    packed = data.pack_base12(x)
    assert packed.shape == (7, 3 * (-(-L // 10)))
    np.testing.assert_array_equal(data.unpack_base12(packed, L), x)
    dev = np.asarray(
        jax.jit(lambda p: engine.unpack_base12(p, L))(packed)
    )
    np.testing.assert_array_equal(dev, x)
  # Every id pattern in one exhaustive group pair.
  allv = np.arange(5, dtype=np.uint8)
  x = np.stack(np.meshgrid(allv, allv, indexing='ij'), -1).reshape(-1)
  x = x[: (len(x) // 10) * 10]
  np.testing.assert_array_equal(
      data.unpack_base12(data.pack_base12(x), len(x)), x
  )


def test_pack_crumbs_round_trip():
  import jax

  rng = np.random.default_rng(14)
  for L in (20, 19, 21, 1, 4):
    # 0..3 inclusive: 3 is the 2-bit code boundary the pack guard
    # (strand.max() < 4) explicitly admits.
    x = rng.integers(0, 4, size=(7, L)).astype(np.uint8)
    packed = data.pack_crumbs(x)
    assert packed.shape == (7, -(-L // 4))
    np.testing.assert_array_equal(data.unpack_crumbs(packed, L), x)
    dev = np.asarray(jax.jit(lambda p: engine.unpack_crumbs(p, L))(packed))
    np.testing.assert_array_equal(dev, x)


def test_ragged_strand_packs_only_in_vocab():
  """strand > 3 (synthetic rows) must fall back to the raw strand array."""
  params = _params()
  rng = np.random.default_rng(15)
  B, R, L = 4, params.total_rows, params.max_length
  rows = np.zeros((B, R, L, 1), np.float32)
  strand_idx = configs.get_indices(params.max_passes, params.use_ccs_bq)[3]
  rows[:, strand_idx[0] : strand_idx[0] + params.max_passes] = 7.0
  ragged = data.ragged_from_rows(rows, [2] * B, params)
  assert 'strand' in ragged and 'strand2' not in ragged
  rows[:, strand_idx[0] : strand_idx[0] + params.max_passes] = 2.0
  ragged = data.ragged_from_rows(rows, [2] * B, params)
  assert 'strand2' in ragged and 'strand' not in ragged
