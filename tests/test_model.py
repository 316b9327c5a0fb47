"""Model tests: shapes, determinism, dense-vs-compact path equivalence,
checkpoint translator mapping (reference: networks_test.py:60-155)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepconsensus_tpu.models import checkpoint, configs, data, model as model_lib
from deepconsensus_tpu.io import example_pb, tfrecord
from tests.conftest import HUMAN_1M


@pytest.fixture(scope='module')
def small_model():
  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 2
    params.filter_size = 64
    params.transformer_input_size = 32
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  return params, model, variables


def _real_rows(params, n=4):
  rows = []
  path = f'{HUMAN_1M}/tf_examples/train/train.tfrecord.gz'
  for rec in tfrecord.read_tfrecords(path):
    ex = example_pb.decode_example(rec)
    sub = np.frombuffer(ex['subreads/encoded'][1][0], np.float32).reshape(
        ex['subreads/shape'][1]
    )
    rows.append(data.format_rows(sub, params))
    if len(rows) == n:
      break
  return np.stack(rows)


def test_forward_shapes_and_determinism(small_model):
  params, model, variables = small_model
  rows = _real_rows(params)
  out1 = model.apply(variables, rows, deterministic=True)
  out2 = model.apply(variables, rows, deterministic=True)
  assert out1.shape == (4, 100, 5)
  assert bool(jnp.array_equal(out1, out2))
  np.testing.assert_allclose(np.asarray(out1.sum(-1)), 1.0, rtol=1e-5)


def test_compact_path_matches_dense(small_model):
  params, model, variables = small_model
  rows = _real_rows(params)
  dense = model.apply(
      variables, rows, deterministic=True, method='intermediate_outputs'
  )['logits']
  compact = data.compact_from_rows(rows, params)
  out = model.apply(
      variables,
      compact['bases'],
      compact['pw'],
      compact['ip'],
      compact['strand'],
      compact['ccs'],
      compact['sn'],
      None,
      deterministic=True,
      method='compact_outputs',
  )['logits']
  np.testing.assert_array_equal(np.asarray(dense), np.asarray(out))


def test_full_attention_matches_banded_when_window_large(small_model):
  params, _, _ = small_model
  p2 = configs.get_config('transformer_learn_values+test')
  with p2.unlocked():
    p2.num_hidden_layers = 2
    p2.filter_size = 64
    p2.transformer_input_size = 32
    p2.attn_win_size = None  # full attention
  configs.finalize_params(p2)
  model2 = model_lib.get_model(p2)
  v2 = model_lib.init_params(model2, p2)
  rows = _real_rows(p2, n=2)
  out = model2.apply(v2, rows, deterministic=True)
  assert out.shape == (2, 100, 5)


def test_tf_checkpoint_name_map_paths_exist(small_model):
  """Every mapped path exists in the pytree with full-size config."""
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  name_map = checkpoint.tf_name_map(params)
  assert len(name_map) > 60
  tree = jax.device_get(variables)
  for tf_name, path in name_map.items():
    node = tree['params']
    for key in path:
      assert key in node, f'{tf_name} -> missing {key}'
      node = node[key]


def test_fc_model_forward():
  params = configs.get_config('fc+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rows = _real_rows(params, n=2)
  out = model.apply(variables, rows, deterministic=True)
  assert out.shape == (2, 100, 5)
  np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_raw_rows_transformer_forward():
  """Plain 'transformer' model: raw rows, odd hidden padded to 86."""
  params = configs.get_config('transformer+test')
  with params.unlocked():
    params.num_hidden_layers = 2
    params.filter_size = 64
  configs.finalize_params(params)
  assert params.hidden_size == 86  # 85 rows + 1 even-ing pad
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rows = _real_rows(params, n=2)
  out = model.apply(variables, rows, deterministic=True)
  assert out.shape == (2, 100, 5)
  np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-5)


def test_conv_net_resnet50_forward():
  """ConvNet baseline: full ResNet50V2 backbone + reference head
  (reference networks.py:121-170; weights random-init there too)."""
  params = configs.get_config('conv_net+test')
  configs.finalize_params(params)
  assert params.conv_model == 'resnet50'
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rows = _real_rows(params, n=2)
  out1 = model.apply(variables, rows, deterministic=True)
  out2 = model.apply(variables, rows, deterministic=True)
  assert out1.shape == (2, 100, 5)
  np.testing.assert_allclose(np.asarray(out1.sum(-1)), 1.0, rtol=1e-5)
  np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
  # ResNet50V2 depth: stem + 4 stages of (3,4,6,3) bottlenecks.
  backbone = variables['params']['backbone']
  blocks = [k for k in backbone if k.startswith('stage')]
  assert len(blocks) == 16
  assert sum(1 for k in blocks if k.startswith('stage3_')) == 6


def test_conv_net_backbone_depths():
  """conv_model selects ResNet101/152V2 depths; unknown names raise the
  reference's NotImplementedError contract (networks.py:117)."""
  from deepconsensus_tpu.models.model import _RESNET_DEPTHS

  assert _RESNET_DEPTHS['resnet101'] == (3, 4, 23, 3)
  assert _RESNET_DEPTHS['resnet152'] == (3, 8, 36, 3)
  params = configs.get_config('conv_net+test')
  with params.unlocked():
    params.conv_model = 'resnet34'
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  with pytest.raises(NotImplementedError):
    model_lib.init_params(model, params)


def test_conv_net_sn_reaches_head():
  """use_sn concatenates the 4 SN values after pooling: changing SN rows
  must change the output; with use_sn=False it must not."""
  params = configs.get_config('conv_net+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rows = _real_rows(params, n=1)
  sn_lo, sn_hi = configs.get_indices(params.max_passes, params.use_ccs_bq)[6]
  bumped = rows.copy()
  bumped[:, sn_lo:sn_hi] += 7.0
  out_a = np.asarray(model.apply(variables, rows, deterministic=True))
  out_b = np.asarray(model.apply(variables, bumped, deterministic=True))
  assert np.abs(out_a - out_b).max() > 0

  params_nosn = configs.get_config('conv_net+test')
  with params_nosn.unlocked():
    params_nosn.use_sn = False
  configs.finalize_params(params_nosn)
  model2 = model_lib.get_model(params_nosn)
  variables2 = model_lib.init_params(model2, params_nosn)
  out_c = np.asarray(model2.apply(variables2, rows, deterministic=True))
  out_d = np.asarray(model2.apply(variables2, bumped, deterministic=True))
  np.testing.assert_array_equal(out_c, out_d)


def test_embed_matmul_bit_identical():
  """compact_outputs with one-hot MXU lookups == gather lookups."""
  import jax
  import numpy as np

  from deepconsensus_tpu.models import configs, model as model_lib

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)

  rng = np.random.default_rng(2)
  B, P, L = 4, params.max_passes, params.max_length
  args = dict(
      bases=rng.integers(0, 5, (B, P, L)).astype(np.uint8),
      pw=rng.integers(0, 256, (B, P, L)).astype(np.uint8),
      ip=rng.integers(0, 256, (B, P, L)).astype(np.uint8),
      strand=rng.integers(0, 3, (B, P)).astype(np.uint8),
      ccs=rng.integers(0, 5, (B, L)).astype(np.uint8),
      sn=rng.integers(0, 500, (B, 4)).astype(np.uint16),
  )
  plain = model.apply(variables, **args, method='compact_outputs')
  fused = model.apply(
      variables, **args, embed_matmul=True, method='compact_outputs'
  )
  np.testing.assert_array_equal(
      jax.device_get(plain['logits']), jax.device_get(fused['logits'])
  )
