"""Fused encoder-layer kernel: interpret-mode equivalence tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import ml_collections

from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.models.model import EncoderStack
from deepconsensus_tpu.ops import fused_encoder as fe


@pytest.fixture(scope='module')
def small_stack():
  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 2
    params.filter_size = 1024  # exercises FFN chunking (2 chunks)
    params.transformer_input_size = 64
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  ptree = jax.device_get(variables)['params']
  lps = fe.extract_layer_params(ptree['encoder_stack'], 2)
  lps = [
      dict(lp, alpha_attn=jnp.float32(0.7), alpha_ffn=jnp.float32(0.3))
      for lp in lps
  ]
  return params, ptree, lps


def test_fused_layer_matches_xla(small_stack):
  _, _, lps = small_stack
  x = np.random.default_rng(0).standard_normal((8, 100, 64)).astype(np.float32)
  ref = jnp.asarray(x)
  for lp in lps:
    ref = fe._xla_layer(
        ref, lp['wq'], lp['wk'], lp['wv'], lp['wo'], lp['alpha_attn'],
        lp['wf1'], lp['bf1'], lp['wf2'], lp['bf2'], lp['alpha_ffn'], 12,
    )
  out = fe.fused_encoder_stack(
      jnp.asarray(x), lps, win=12, block_b=4, interpret=True
  )
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_stack_matches_flax_encoder(small_stack):
  params, ptree, lps = small_stack
  import flax

  tree = flax.core.unfreeze(ptree)
  for n in range(2):
    tree['encoder_stack'][f'attention_wrapper_{n}']['alpha'] = np.float32(0.7)
    tree['encoder_stack'][f'ffn_wrapper_{n}']['alpha'] = np.float32(0.3)
  es = EncoderStack(ml_collections.FrozenConfigDict(params))
  x = np.random.default_rng(1).standard_normal((4, 100, 64)).astype(np.float32)
  flax_out = es.apply(
      {'params': tree['encoder_stack']}, jnp.asarray(x), deterministic=True
  )
  out = fe.fused_encoder_stack(
      jnp.asarray(x), lps, win=12, block_b=4, interpret=True
  )
  # Compare against the pre-LayerNorm output of the last layer.
  np.testing.assert_allclose(
      np.asarray(out), np.asarray(flax_out['ffn_layer_1']), atol=2e-5
  )


def test_fused_full_attention(small_stack):
  _, _, lps = small_stack
  x = np.random.default_rng(2).standard_normal((4, 24, 64)).astype(np.float32)
  ref = fe._xla_layer(
      jnp.asarray(x), **{k: lps[0][k] for k in (
          'wq', 'wk', 'wv', 'wo', 'wf1', 'bf1', 'wf2', 'bf2')},
      alpha_attn=lps[0]['alpha_attn'], alpha_ffn=lps[0]['alpha_ffn'], win=None,
  )
  out = fe.fused_encoder_layer(
      jnp.asarray(x), lps[0]['wq'], lps[0]['wk'], lps[0]['wv'], lps[0]['wo'],
      lps[0]['alpha_attn'], lps[0]['wf1'], lps[0]['bf1'], lps[0]['wf2'],
      lps[0]['bf2'], lps[0]['alpha_ffn'], win=None, block_b=4, interpret=True,
  )
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_interpret_mode_handles_indivisible_batches():
  """B not divisible by block_b must not drop grid rows (was: silent NaNs
  for the remainder examples in interpret mode, which has no XLA
  fallback)."""
  import numpy as np

  from deepconsensus_tpu.ops import fused_encoder as fe

  rng = np.random.default_rng(0)
  B, L, E, N = 6, 16, 32, 2
  H = E // N
  x = rng.normal(size=(B, L, E)).astype(np.float32)
  args = dict(
      wq=rng.normal(size=(E, N, H)).astype(np.float32) * 0.1,
      wk=rng.normal(size=(E, N, H)).astype(np.float32) * 0.1,
      wv=rng.normal(size=(E, N, H)).astype(np.float32) * 0.1,
      wo=rng.normal(size=(N, H, E)).astype(np.float32) * 0.1,
      alpha_attn=np.float32(0.5),
      wf1=rng.normal(size=(E, 2 * E)).astype(np.float32) * 0.1,
      bf1=np.zeros(2 * E, np.float32),
      wf2=rng.normal(size=(2 * E, E)).astype(np.float32) * 0.1,
      bf2=np.zeros(E, np.float32),
      alpha_ffn=np.float32(0.5),
  )
  out = fe.fused_encoder_layer(x, win=4, block_b=4, interpret=True, **args)
  assert np.isfinite(np.asarray(out)).all()
  ref = fe._xla_layer(
      x, args['wq'], args['wk'], args['wv'], args['wo'], args['alpha_attn'],
      args['wf1'], args['bf1'], args['wf2'], args['bf2'], args['alpha_ffn'],
      4,
  )
  np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_win_zero_means_full_attention():
  """attn_win_size=0 is FULL attention in the model/reference (falsy ->
  no band mask); the kernels must agree, not mask to the diagonal."""
  import numpy as np

  from deepconsensus_tpu.ops import banded_attention as ba

  rng = np.random.default_rng(1)
  B, L, N, H = 2, 8, 2, 4
  q = rng.normal(size=(B, L, N, H)).astype(np.float32)
  k = rng.normal(size=(B, L, N, H)).astype(np.float32)
  v = rng.normal(size=(B, L, N, H)).astype(np.float32)
  full_none = ba._xla_reference(q, k, v, None, H**-0.5)
  full_zero = ba._xla_reference(q, k, v, 0, H**-0.5)
  np.testing.assert_array_equal(
      np.asarray(full_none), np.asarray(full_zero)
  )
  kernel_zero = ba.banded_attention(q, k, v, win=0, interpret=True)
  np.testing.assert_allclose(
      np.asarray(kernel_zero), np.asarray(full_none), atol=2e-5
  )


def test_fused_requires_rezero_params():
  import pytest as _pytest

  from deepconsensus_tpu.ops import fused_encoder as fe

  with _pytest.raises(ValueError, match='rezero'):
    fe.extract_layer_params({'attention_0': {}, 'ffn_0': {}}, 1)
