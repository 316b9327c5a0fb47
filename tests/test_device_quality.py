"""Device-side quality quantization: bit-exactness vs the host Q chain.

engine.phred_bin_boundaries turns the host maxp->Q chain
(quality_scores_from_probs: -10*log10(1-p), optional linear calibration,
clip, round — reference quick_inference.py:377-389) into per-bin f32
lower boundaries found by binary search over the float bit space; the
device then computes q(x) = #{k : x >= boundaries[k]}. These tests pin
that the mapping is EXACTLY the host chain for every tested float32 —
including each bin's boundary value and its predecessor float — for both
the 'skip' and the shipped v1.2 calibration, and that non-monotone
(threshold>0) calibrations refuse the fast path.
"""

import numpy as np
import pytest

from deepconsensus_tpu.calibration import calibration as calibration_lib
from deepconsensus_tpu.inference import engine

V12_CALIBRATION = '0,1.197654,-0.99781'


def make_options(calibration: str, max_q: int = 93):
  return engine.InferenceOptions(
      max_length=100,
      example_height=85,
      max_passes=20,
      min_quality=20,
      batch_size=32,
      max_base_quality=max_q,
      dc_calibration_values=calibration_lib.parse_calibration_string(
          calibration
      ),
  )


def device_q_np(x: np.ndarray, boundaries: np.ndarray) -> np.ndarray:
  """numpy reference of the device mapping (sum of boundary crossings)."""
  return np.sum(
      x[..., None] >= boundaries, axis=-1
  ).astype(np.int32)


def prev_float(x: np.float32) -> np.float32:
  return np.nextafter(np.float32(x), np.float32(-1.0), dtype=np.float32)


@pytest.mark.parametrize('calibration', ['skip', V12_CALIBRATION])
def test_boundaries_are_exact_bin_edges(calibration):
  options = make_options(calibration)
  b = engine.phred_bin_boundaries(options)
  assert b is not None and b.shape == (93,) and b.dtype == np.float32
  assert np.all(np.diff(b[np.isfinite(b)]) >= 0)
  for k in range(93):
    if not np.isfinite(b[k]):
      continue
    q_at = int(
        engine.quality_scores_from_probs(np.asarray([b[k]]), options)[0]
    )
    assert q_at > k, (k, b[k], q_at)
    q_before = int(
        engine.quality_scores_from_probs(
            np.asarray([prev_float(b[k])]), options
        )[0]
    )
    assert q_before <= k, (k, b[k], q_before)


@pytest.mark.parametrize('calibration', ['skip', V12_CALIBRATION])
def test_device_chain_matches_host_chain(calibration):
  options = make_options(calibration)
  b = engine.phred_bin_boundaries(options)
  rng = np.random.default_rng(7)
  x = rng.uniform(0.0, 1.0, size=20000).astype(np.float32)
  # Adversarial inputs: every boundary, its neighbors, and the extremes
  # (maxp == 1.0 hits the log10(0) -> +inf -> clip path).
  fin = b[np.isfinite(b)]
  # maxp is a softmax maximum: (0, 1] — values above 1.0 cannot occur
  # (the host chain NaNs there), so adversarial neighbors clip at 1.0.
  x = np.concatenate([
      x, fin, np.nextafter(fin, np.float32(0.0), dtype=np.float32),
      np.minimum(
          np.nextafter(fin, np.float32(2.0), dtype=np.float32),
          np.float32(1.0),
      ),
      np.float32([0.0, 0.2, 1.0]),
  ]).astype(np.float32)
  host = engine.quality_scores_from_probs(x, options)
  np.testing.assert_array_equal(device_q_np(x, b), host)


def test_device_chain_matches_under_jit():
  import jax
  import jax.numpy as jnp

  options = make_options(V12_CALIBRATION)
  b = engine.phred_bin_boundaries(options)
  x = np.concatenate([
      np.random.default_rng(3).uniform(0, 1, 4096).astype(np.float32),
      b[np.isfinite(b)], np.float32([1.0]),
  ]).astype(np.float32)

  @jax.jit
  def dev(x):
    return jnp.sum(x[..., None] >= b, axis=-1).astype(jnp.uint8)

  np.testing.assert_array_equal(
      np.asarray(dev(x)).astype(np.int32),
      engine.quality_scores_from_probs(x, options),
  )


def test_piecewise_calibration_refuses_fast_path():
  # threshold>0 makes the chain step DOWN at the threshold (b < 0), so
  # the monotone boundary method must decline.
  options = make_options('30,1.1,-5.0')
  assert engine.phred_bin_boundaries(options) is None


def test_max_base_quality_caps_bins():
  options = make_options('skip', max_q=40)
  b = engine.phred_bin_boundaries(options)
  assert b.shape == (40,)
  x = np.float32([1.0, 0.9999999, 0.99])
  np.testing.assert_array_equal(
      device_q_np(x, b),
      engine.quality_scores_from_probs(x, options),
  )


def test_runner_device_q_end_to_end_cpu():
  """ModelRunner.enable_device_q produces the same quality ints as the
  host chain on the same forward outputs (tiny random model, CPU)."""
  import jax

  from deepconsensus_tpu.models import configs, model as model_lib

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 1
    params.filter_size = 32
    params.transformer_input_size = 32
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = jax.device_get(model_lib.init_params(model, params))

  options = make_options(V12_CALIBRATION)
  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(4, params.total_rows, params.max_length, 1)
  ).astype(np.float32)

  host_runner = engine.ModelRunner(params, variables, batch_size=4)
  ids_h, maxp = host_runner.predict(rows)
  q_host = engine.quality_scores_from_probs(maxp, options)

  dev_runner = engine.ModelRunner(params, variables, batch_size=4)
  assert dev_runner.enable_device_q(options)
  ids_d, q_dev = dev_runner.predict(rows)
  assert q_dev.dtype == np.uint8
  np.testing.assert_array_equal(ids_d, ids_h)
  np.testing.assert_array_equal(q_dev.astype(np.int32), q_host)


def test_enable_device_q_invalidates_pretraced_executables():
  """An executable traced BEFORE enable_device_q (e.g. a warmup batch)
  must not survive the switch: it would keep returning f32 maxp while
  device_q=True, and the collect path's astype(int32) would collapse
  every quality to 0/1 — silently corrupt FASTQ. Covers both runner
  classes (the sharded one rebuilds its dense sharded jit too)."""
  import jax

  from deepconsensus_tpu.models import configs, model as model_lib
  from deepconsensus_tpu.parallel import dp_inference

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 1
    params.filter_size = 32
    params.transformer_input_size = 32
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = jax.device_get(model_lib.init_params(model, params))
  options = make_options(V12_CALIBRATION)
  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(4, params.total_rows, params.max_length, 1)
  ).astype(np.float32)

  for runner in (
      engine.ModelRunner(params, variables, batch_size=4),
      dp_inference.ShardedModelRunner(
          params, variables, batch_size=4, num_devices=2
      ),
  ):
    _, before = runner.predict(rows)  # traces the maxp-returning graph
    assert before.dtype == np.float32
    assert runner.enable_device_q(options)
    _, after = runner.predict(rows)
    assert after.dtype == np.uint8, type(runner).__name__
    np.testing.assert_array_equal(
        after.astype(np.int32),
        engine.quality_scores_from_probs(before, options),
    )
