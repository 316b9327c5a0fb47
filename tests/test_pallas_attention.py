"""Pallas banded-attention kernel: interpret-mode equivalence tests."""

import numpy as np
import pytest

import jax.numpy as jnp

from deepconsensus_tpu.models import configs, data, model as model_lib
from deepconsensus_tpu.ops import banded_attention as ba
from deepconsensus_tpu.io import example_pb, tfrecord
from tests.conftest import HUMAN_1M


@pytest.mark.parametrize('win', [None, 3, 12])
def test_kernel_matches_xla_reference(win):
  rng = np.random.default_rng(0)
  B, L, N, H = 8, 20, 2, 16
  q = rng.standard_normal((B, L, N, H)).astype(np.float32)
  k = rng.standard_normal((B, L, N, H)).astype(np.float32)
  v = rng.standard_normal((B, L, N, H)).astype(np.float32)
  ref = ba._xla_reference(
      jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), win, H**-0.5
  )
  out = ba.banded_attention(
      jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), win=win, block_b=4,
      interpret=True,
  )
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_ragged_batch_falls_back():
  rng = np.random.default_rng(1)
  q = rng.standard_normal((3, 10, 2, 8)).astype(np.float32)
  out = ba.banded_attention(
      jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), win=2, block_b=4
  )
  ref = ba._xla_reference(
      jnp.asarray(q), jnp.asarray(q), jnp.asarray(q), 2, 8**-0.5
  )
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_model_with_pallas_flag_matches_default():
  """Full model forward, pallas (interpret fallback on CPU) vs default."""
  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 2
    params.filter_size = 64
    params.transformer_input_size = 32
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)

  rows = []
  for rec in tfrecord.read_tfrecords(
      f'{HUMAN_1M}/tf_examples/train/train.tfrecord.gz'
  ):
    ex = example_pb.decode_example(rec)
    sub = np.frombuffer(ex['subreads/encoded'][1][0], np.float32).reshape(
        ex['subreads/shape'][1]
    )
    rows.append(data.format_rows(sub, params))
    if len(rows) == 3:  # ragged (not divisible by block) -> XLA fallback
      break
  rows = np.stack(rows)

  base = model.apply(variables, rows, deterministic=True)

  with params.unlocked():
    params.use_pallas_attention = True
  configs.finalize_params(params)
  model_p = model_lib.get_model(params)
  out = model_p.apply(variables, rows, deterministic=True)
  np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=1e-5)
