"""Bit-exactness of the fused Mosaic embed+concat kernel (interpret mode).

ops/embed_concat.py must produce the exact concatenated embedding tensor
the plain compact path builds (reference semantics:
models/networks.py:444-514) — every output value is the same table row /
pre-embedded row, so equality is bitwise, across pass bucketing, bq
configs, and batch sizes that don't fill the 256-row gather tile.
"""

import jax
import numpy as np
import pytest

from deepconsensus_tpu.models import configs, model as model_lib


def _args(rng, params, B, P, bq):
  L = params.max_length
  args = dict(
      bases=rng.integers(0, 5, (B, P, L)).astype(np.uint8),
      pw=rng.integers(0, 256, (B, P, L)).astype(np.uint8),
      ip=rng.integers(0, 256, (B, P, L)).astype(np.uint8),
      strand=rng.integers(0, 3, (B, P)).astype(np.uint8),
      ccs=rng.integers(0, 5, (B, L)).astype(np.uint8),
      sn=rng.integers(0, 500, (B, 4)).astype(np.uint16),
  )
  if bq:
    args['ccs_bq'] = rng.integers(-1, 94, (B, L)).astype(np.int32)
  return args


@pytest.mark.parametrize(
    'config,B,P',
    [
        ('test', 4, 20),       # full passes; B*L not a 256 multiple
        ('test', 8, 20),       # 16..19 second-chunk path
        ('test', 8, 7),        # pass-bucketed: single chunk + zero tail
        ('test_bq', 4, 20),    # ccs_bq lane in the concat
        ('test_bq', 8, 16),    # exactly one chunk
    ],
)
def test_embed_kernel_bit_identical(config, B, P):
  params = configs.get_config(f'transformer_learn_values+{config}')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rng = np.random.default_rng(11 + B + P)
  args = _args(rng, params, B, P, bq=params.use_ccs_bq)

  plain = model.apply(
      variables, **args, pre_condense=True, method='compact_outputs'
  )['encoder_input']
  fused = model.apply(
      variables, **args, pre_condense=True, embed_kernel=True,
      embed_interpret=True, method='compact_outputs'
  )['encoder_input']
  assert plain.shape == fused.shape
  np.testing.assert_array_equal(
      jax.device_get(plain), jax.device_get(fused)
  )


def test_embed_kernel_full_forward_logits_identical():
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rng = np.random.default_rng(3)
  args = _args(rng, params, 4, params.max_passes, bq=False)
  plain = model.apply(variables, **args, method='compact_outputs')
  fused = model.apply(
      variables, **args, embed_kernel=True, embed_interpret=True,
      method='compact_outputs',
  )
  np.testing.assert_array_equal(
      jax.device_get(plain['logits']), jax.device_get(fused['logits'])
  )
