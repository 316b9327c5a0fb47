"""Exports a JAX checkpoint into a reference-format tf.train.Checkpoint.

The inverse of models/checkpoint.load_tf_checkpoint: walks the same exact
name map (models/checkpoint.tf_name_map, verified against the reference
checkpoint object graph) and assigns each JAX leaf into the corresponding
variable of a freshly built reference Keras model
(tools/oracle/tf_ref_model.py), then saves `tf.train.Checkpoint(model=m)`
— byte-layout compatible with what the reference pipeline loads
(reference quick_inference.py:517-529, model_utils.py:511-540).

Also synthesizes a DETERMINISTIC use_ccs_bq variant from the non-bq toy
model: shared weights copied, the ccs_bq embedding seeded-random, and the
condenser kernel extended with ZERO rows at the ccs_bq block offset (so
the extra feature contributes nothing and predictions stay confident) —
giving the test_bq golden a stable trained-quality weight set without
committing another 32 MB checkpoint.

Oracle tooling only: never imported by the shipped package.
"""

import os
import sys

import numpy as np

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)


def load_jax_variables(ckpt_dir: str):
  """Loads (variables_tree, finalized_params) from a repo checkpoint dir."""
  import jax

  from deepconsensus_tpu.models import checkpoint as ckpt_lib
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.models import model as model_lib

  params = configs.read_params_from_json(ckpt_dir)
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  latest = ckpt_lib.latest_checkpoint(ckpt_dir)
  if latest is None:
    raise FileNotFoundError(f'no checkpoint under {ckpt_dir}')
  payload = ckpt_lib.load_checkpoint(
      latest, {'variables': jax.device_get(variables)}
  )
  return payload['variables'], params


def make_bq_variables_from_toy(toy_dir: str, seed: int = 3):
  """(variables, params) for the test_bq config, derived from the toy model.

  Every weight shared with the non-bq toy model is copied verbatim; the
  new ccs_bq embedding keeps its seeded random init; the condenser kernel
  gains zero rows at the ccs_bq block so outputs are driven by the
  trained weights (confident argmax — required for cross-framework FASTQ
  byte-stability, see tools/oracle/make_ref_golden.py).
  """
  import flax
  import jax

  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.models import model as model_lib

  toy_tree, toy_params = load_jax_variables(toy_dir)
  params = configs.get_config('transformer_learn_values+test_bq')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = flax.core.unfreeze(
      jax.tree_util.tree_map(
          np.array,
          jax.device_get(
              model_lib.init_params(model, params, jax.random.PRNGKey(seed))
          ),
      )
  )

  toy_flat = flax.traverse_util.flatten_dict(
      flax.core.unfreeze(toy_tree)
  )
  bq_flat = flax.traverse_util.flatten_dict(variables)
  # Zero-extended condenser: insert ccs_bq_hidden_size zero rows at the
  # ccs_bq block offset in the concat layout (bases|pw|ip|strand|ccs|
  # ccs_bq|sn — models/model.py:433-448).
  p = params
  offset = p.max_passes * (
      p.per_base_hidden_size
      + p.pw_hidden_size
      + p.ip_hidden_size
      + p.strand_hidden_size
  ) + p.per_base_hidden_size
  for path, value in toy_flat.items():
    if path not in bq_flat:
      continue
    target = bq_flat[path]
    if tuple(target.shape) == tuple(value.shape):
      bq_flat[path] = np.asarray(value)
    elif path[-2:] == ('condenser', 'kernel'):
      # Small seeded-random rows (not zeros): ccs_bq must actually
      # influence the output so the test_bq golden exercises the bq path
      # end-to-end, while staying small enough that the trained weights
      # keep predictions confident.
      rng = np.random.default_rng(seed)
      ext_rows = rng.normal(
          0.0, 0.01, size=(p.ccs_bq_hidden_size, value.shape[1])
      ).astype(np.asarray(value).dtype)
      extended = np.insert(
          np.asarray(value),
          obj=[offset] * p.ccs_bq_hidden_size,
          values=ext_rows,
          axis=0,
      )
      if tuple(extended.shape) != tuple(target.shape):
        raise ValueError(
            f'condenser extension {extended.shape} != {target.shape}'
        )
      bq_flat[path] = extended.astype(np.asarray(target).dtype)
    else:
      raise ValueError(f'unexpected shape change at {path}')
  return flax.traverse_util.unflatten_dict(bq_flat), params


def _resolve_variable(model, tf_name: str):
  """Walks a checkpoint object-graph path to the Keras variable."""
  obj = model
  for part in tf_name.split('/'):
    if part.isdigit() and isinstance(obj, (list, tuple)):
      obj = obj[int(part)]
    else:
      obj = getattr(obj, part)
  return obj


def export_to_tf(variables, params, config_name: str, out_dir: str) -> str:
  """Assigns JAX weights into the reference model; saves TF ckpt + params."""
  import json

  from deepconsensus_tpu.models import checkpoint as ckpt_lib
  from tools.oracle import tf_ref_model

  ref_model, _ = tf_ref_model.build_reference_model(
      config_name, max_length=params.max_length
  )
  name_map = ckpt_lib.tf_name_map(params)
  tree = variables['params'] if 'params' in variables else variables
  for tf_name, path in name_map.items():
    stripped = tf_name[len('model/') : -len('/.ATTRIBUTES/VARIABLE_VALUE')]
    var = _resolve_variable(ref_model, stripped)
    node = tree
    for key in path:
      node = node[key]
    value = np.asarray(node)
    if tuple(var.shape) != tuple(value.shape):
      raise ValueError(
          f'{stripped}: TF shape {var.shape} vs JAX {value.shape}'
      )
    var.assign(value)
  os.makedirs(out_dir, exist_ok=True)
  prefix = tf_ref_model.save_reference_checkpoint(ref_model, out_dir)
  _, ref_model_configs, _ = tf_ref_model.import_reference_models()
  base = ref_model_configs.get_config(config_name)
  with open(os.path.join(out_dir, 'params.json'), 'w') as f:
    json.dump(dict(base), f, indent=4)
  return prefix
