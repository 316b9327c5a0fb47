"""Value-level TF-checkpoint translation test.

The bundled reference checkpoints ship only .index files (no tensor data),
so this test synthesizes a real TF checkpoint whose variables carry the
exact reference object-graph names (verified against the bundled index in
test_model.py) with random values, then checks the translator places every
tensor at the right spot in the JAX pytree.
"""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax

from deepconsensus_tpu.models import checkpoint, configs, model as model_lib


def _build_tf_checkpoint(tmp_path, params, rng):
  """Creates a tf.train.Checkpoint with reference-style variable paths."""
  name_map = checkpoint.tf_name_map(params)
  variables = {}
  root = tf.Module()
  model_mod = tf.Module()
  root.model = model_mod

  # Shapes from the JAX pytree.
  m = model_lib.get_model(params)
  v = model_lib.init_params(m, params)
  tree = jax.device_get(v)

  for tf_name, path in name_map.items():
    node = tree['params']
    for key in path:
      node = node[key]
    value = rng.standard_normal(node.shape).astype(np.float32)
    variables[tf_name] = value
    # Build the attribute chain model/<a>/<b>/... on tf.Modules.
    parts = tf_name[len('model/') :].split('/')
    parts = parts[: parts.index('.ATTRIBUTES')] if '.ATTRIBUTES' in parts else parts
    obj = model_mod
    for part in parts[:-1]:
      if not hasattr(obj, part.replace('-', '_')):
        setattr(obj, part, tf.Module())
      obj = getattr(obj, part)
    setattr(obj, parts[-1], tf.Variable(value))

  ckpt = tf.train.Checkpoint(model=model_mod)
  prefix = str(tmp_path / 'ckpt')
  path = ckpt.save(prefix)
  return path, variables, v


def test_translate_synthesized_checkpoint(tmp_path):
  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 2
    params.filter_size = 32
    params.transformer_input_size = 16
  configs.finalize_params(params)
  rng = np.random.default_rng(7)
  tf_path, tf_values, jax_vars = _build_tf_checkpoint(tmp_path, params, rng)

  translated = checkpoint.load_tf_checkpoint(tf_path, jax_vars, params)
  name_map = checkpoint.tf_name_map(params)
  for tf_name, path in name_map.items():
    node = translated['params']
    for key in path:
      node = node[key]
    np.testing.assert_array_equal(
        np.asarray(node), tf_values[tf_name], err_msg=tf_name
    )


def test_translate_rejects_wrong_shape(tmp_path):
  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 2
    params.filter_size = 32
    params.transformer_input_size = 16
  configs.finalize_params(params)
  rng = np.random.default_rng(8)
  tf_path, _, jax_vars = _build_tf_checkpoint(tmp_path, params, rng)

  # A config with different sizes must fail shape validation.
  p2 = configs.get_config('transformer_learn_values+test')
  with p2.unlocked():
    p2.num_hidden_layers = 2
    p2.filter_size = 64
    p2.transformer_input_size = 16
  configs.finalize_params(p2)
  m2 = model_lib.get_model(p2)
  v2 = model_lib.init_params(m2, p2)
  with pytest.raises(ValueError, match='shape mismatch'):
    checkpoint.load_tf_checkpoint(tf_path, v2, p2)
