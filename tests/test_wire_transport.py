"""Fused wire-buffer transport: one uint8 array per ragged batch.

The wire path must be bit-identical to the multi-array ragged transport on
every field dtype (uint8 / uint16 / int16 incl. negatives / int32) and
through the full forward, single-device and sharded.
"""

import numpy as np
import pytest

import jax

from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.models import configs, data
from deepconsensus_tpu.parallel import dp_inference


def _params():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  return params


def _random_rows(params, b=12, seed=0):
  rng = np.random.default_rng(seed)
  rows = rng.integers(
      0, 100, size=(b, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  num_passes = rng.integers(1, params.max_passes + 1, size=b).tolist()
  return rows, num_passes


def test_wire_pack_numpy_round_trip():
  params = _params()
  rows, num_passes = _random_rows(params)
  t = data.ragged_from_rows(rows, num_passes, params)
  buf, layout = data.wire_pack(t)
  assert buf.dtype == np.uint8 and buf.ndim == 1
  assert buf.nbytes == sum(v.nbytes for v in t.values())
  back = data.wire_unpack(buf, layout)
  assert set(back) == set(t)
  for k in t:
    assert back[k].dtype == t[k].dtype, k
    np.testing.assert_array_equal(back[k], t[k], err_msg=k)


def test_unpack_wire_device_matches_numpy_all_dtypes():
  rng = np.random.default_rng(1)
  t = {
      'a_u8': rng.integers(0, 256, size=(7, 13)).astype(np.uint8),
      'b_u16': rng.integers(0, 2**16, size=(5, 3)).astype(np.uint16),
      'c_i16': rng.integers(-(2**15), 2**15, size=(4, 6)).astype(np.int16),
      'd_i32': rng.integers(-(2**31), 2**31, size=(9,)).astype(np.int32),
  }
  buf, layout = data.wire_pack(t)
  jitted = jax.jit(lambda b: engine.unpack_wire(b, layout))
  out = jax.device_get(jitted(buf))
  ref = data.wire_unpack(buf, layout)
  for k in t:
    assert out[k].dtype == ref[k].dtype, k
    np.testing.assert_array_equal(out[k], ref[k], err_msg=k)


def test_wire_layout_is_static_and_hashable():
  params = _params()
  rows, num_passes = _random_rows(params, seed=2)
  t = data.ragged_from_rows(rows, num_passes, params)
  _, layout_a = data.wire_pack(t)
  rows2, _ = _random_rows(params, seed=3)
  t2 = data.ragged_from_rows(rows2, num_passes, params)
  _, layout_b = data.wire_pack(t2)
  assert hash(layout_a) is not None
  # Same shape signature -> same layout -> one compiled executable.
  assert layout_a == layout_b


def _init_runner(cls, params, batch):
  from deepconsensus_tpu.models import model as model_lib

  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  return cls(params, variables, batch)


def test_model_runner_wire_matches_multi_array_ragged():
  params = _params()
  runner = _init_runner(engine.ModelRunner, params, 16)
  rows, num_passes = _random_rows(params, b=16, seed=5)
  runner.wire_transport = True
  out_w = runner.collect(runner.predict_async(rows, num_passes=num_passes))
  runner.wire_transport = False
  out_m = runner.collect(runner.predict_async(rows, num_passes=num_passes))
  np.testing.assert_array_equal(out_w[0], out_m[0])
  np.testing.assert_array_equal(out_w[1], out_m[1])


def test_round_fused_upload_matches_per_batch():
  """predict_round_async == per-batch predict_ragged_async, bit for bit."""
  params = _params()
  runner = _init_runner(engine.ModelRunner, params, 16)
  transports = []
  for seed in (21, 22, 23):
    rows, num_passes = _random_rows(params, b=16, seed=seed)
    transports.append(
        (data.ragged_from_rows(rows, num_passes, params), 16)
    )
  fused = runner.predict_round_async(transports)
  for (t, n), handle in zip(transports, fused):
    ids_f, maxp_f = runner.collect(handle)
    ids_b, maxp_b = runner.collect(runner.predict_ragged_async(t, n))
    np.testing.assert_array_equal(ids_f, ids_b)
    np.testing.assert_array_equal(maxp_f, maxp_b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 virtual devices')
def test_sharded_runner_wire_matches_multi_array():
  params = _params()
  runner = _init_runner(dp_inference.ShardedModelRunner, params, 16)
  rows, _ = _random_rows(params, b=16, seed=6)
  # Uniform pass counts keep every shard on the same flat-array tier (the
  # engine's RaggedBatchBuilder enforces a shared tier the same way).
  num_passes = [5] * 16

  n_dev = runner.num_shards
  per = 16 // n_dev
  subs = []
  for s in range(n_dev):
    sub = data.ragged_from_rows(
        rows[s * per : (s + 1) * per],
        num_passes[s * per : (s + 1) * per],
        params,
    )
    subs.append(sub)
  stacked = {k: np.stack([d[k] for d in subs]) for k in subs[0]}

  runner.wire_transport = True
  out_w = runner.collect(runner.predict_ragged_async(stacked, 16))
  runner.wire_transport = False
  out_m = runner.collect(runner.predict_ragged_async(stacked, 16))
  np.testing.assert_array_equal(out_w[0], out_m[0])
  np.testing.assert_array_equal(out_w[1], out_m[1])
