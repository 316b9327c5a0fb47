"""Checkpoint save/load (orbax) + TF-checkpoint translation.

Native checkpoints are orbax PyTree directories with params.json alongside
(mirroring the reference's params.json-next-to-checkpoint contract,
reference: models/model_utils.py:434-475,511-618). `load_tf_checkpoint`
translates a reference tf.train.Checkpoint (v1.2 release checkpoints) into
this framework's parameter pytree by exact name mapping — verified against
the variable inventory of the bundled
testdata/model/checkpoint-1.index.
"""

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from deepconsensus_tpu.models import configs

_TF_SUFFIX = '/.ATTRIBUTES/VARIABLE_VALUE'


def save_checkpoint(
    directory: str,
    variables: Any,
    params,
    step: Optional[int] = None,
    opt_state: Any = None,
    extra: Optional[Dict[str, Any]] = None,
) -> str:
  """Writes an orbax checkpoint + params.json; returns the checkpoint path."""
  name = f'checkpoint-{step}' if step is not None else 'checkpoint'
  path = os.path.abspath(os.path.join(directory, name))
  payload = {'variables': variables}
  if opt_state is not None:
    payload['opt_state'] = opt_state
  if extra:
    payload['extra'] = extra
  ckptr = ocp.StandardCheckpointer()
  ckptr.save(path, payload, force=True)
  ckptr.wait_until_finished()
  # Multi-host: every process calls save (orbax coordinates its own
  # primary-host writes + barriers); the plain-file params.json write is
  # ours to gate.
  if jax.process_index() == 0:
    configs.save_params_json(params, os.path.join(directory, 'params.json'))
  return path


def load_checkpoint(path: str, template: Any = None) -> Dict[str, Any]:
  """Restores an orbax checkpoint payload ({'variables', 'opt_state'?, ...}).

  A partial template (e.g. {'variables': ...} without opt_state, the
  inference path) restores just those entries.
  """
  ckptr = ocp.StandardCheckpointer()
  full = ckptr.restore(os.path.abspath(path))
  if template is not None:
    # Keep only the entries the caller asked for (e.g. inference loads
    # 'variables' and drops the optimizer state).
    return {k: full[k] for k in template if k in full}
  return full


def latest_checkpoint(directory: str) -> Optional[str]:
  """Finds the highest-step checkpoint-N subdirectory."""
  if not os.path.isdir(directory):
    return None
  best = None
  best_step = -1
  for entry in os.listdir(directory):
    if entry.startswith('checkpoint-'):
      try:
        step = int(entry.split('-')[1])
      except (IndexError, ValueError):
        continue
      if step > best_step:
        best_step = step
        best = os.path.join(directory, entry)
  return best


def tf_name_map(params) -> Dict[str, Tuple[str, ...]]:
  """Maps reference TF checkpoint variable names -> JAX param pytree paths.

  TF names taken from the reference tf.train.Checkpoint object graph (see
  testdata/model/checkpoint-1.index):
    model/<field>/... with encoder layers at
    model/encoder_stack/layers/<n>/<0=attention|1=ffn>/...
  """
  m: Dict[str, Tuple[str, ...]] = {}

  def add(tf_name, *path):
    m['model/' + tf_name + _TF_SUFFIX] = path

  add('bases_embedding_layer/embeddings', 'bases_embedding', 'embedding')
  if params.use_pw:
    add('pw_embedding_layer/embeddings', 'pw_embedding', 'embedding')
  if params.use_ip:
    add('ip_embedding_layer/embeddings', 'ip_embedding', 'embedding')
  if params.use_strand:
    add('strand_embedding_layer/embeddings', 'strand_embedding', 'embedding')
  if params.use_sn:
    add('sn_embedding_layer/embeddings', 'sn_embedding', 'embedding')
  if params.use_ccs_bq:
    add(
        'ccs_base_quality_scores_embedding_layer/embeddings',
        'ccs_bq_embedding',
        'embedding',
    )
  if params.condense_transformer_input:
    add('transformer_input_condenser/kernel', 'condenser', 'kernel')
  add('fc1/kernel', 'logits', 'kernel')
  add('fc1/bias', 'logits', 'bias')
  add(
      'encoder_stack/output_normalization/gamma',
      'encoder_stack', 'output_norm', 'scale',
  )
  add(
      'encoder_stack/output_normalization/beta',
      'encoder_stack', 'output_norm', 'bias',
  )
  for n in range(params.num_hidden_layers):
    base = f'encoder_stack/layers/{n}'
    es = 'encoder_stack'
    if params.rezero:
      add(f'{base}/0/alpha', es, f'attention_wrapper_{n}', 'alpha')
      add(f'{base}/1/alpha', es, f'ffn_wrapper_{n}', 'alpha')
    else:
      add(
          f'{base}/0/layer_norm/gamma',
          es, f'attention_wrapper_{n}', 'LayerNorm_0', 'scale',
      )
      add(
          f'{base}/0/layer_norm/beta',
          es, f'attention_wrapper_{n}', 'LayerNorm_0', 'bias',
      )
      add(
          f'{base}/1/layer_norm/gamma',
          es, f'ffn_wrapper_{n}', 'LayerNorm_0', 'scale',
      )
      add(
          f'{base}/1/layer_norm/beta',
          es, f'ffn_wrapper_{n}', 'LayerNorm_0', 'bias',
      )
    attn = (es, f'attention_{n}')
    add(f'{base}/0/layer/query_dense_layer/kernel', *attn, 'query', 'kernel')
    add(f'{base}/0/layer/key_dense_layer/kernel', *attn, 'key', 'kernel')
    add(f'{base}/0/layer/value_dense_layer/kernel', *attn, 'value', 'kernel')
    add(
        f'{base}/0/layer/output_dense_layer/kernel',
        *attn, 'output_transform', 'kernel',
    )
    ffn = (es, f'ffn_{n}')
    add(
        f'{base}/1/layer/filter_dense_layer/kernel',
        *ffn, 'filter_layer', 'kernel',
    )
    add(f'{base}/1/layer/filter_dense_layer/bias', *ffn, 'filter_layer', 'bias')
    add(
        f'{base}/1/layer/output_dense_layer/kernel',
        *ffn, 'output_layer', 'kernel',
    )
    add(f'{base}/1/layer/output_dense_layer/bias', *ffn, 'output_layer', 'bias')
  return m


def _set_path(tree: Dict[str, Any], path: Tuple[str, ...], value) -> None:
  node = tree
  for key in path[:-1]:
    node = node[key]
  if path[-1] not in node:
    raise KeyError(f'param path {"/".join(path)} not found in model pytree')
  expected = node[path[-1]]
  if tuple(expected.shape) != tuple(value.shape):
    raise ValueError(
        f'shape mismatch at {"/".join(path)}: model {expected.shape} vs '
        f'checkpoint {value.shape}'
    )
  node[path[-1]] = value.astype(np.asarray(expected).dtype)


def _load_via_reader(reader, variables, params):
  """Copies every tf_name_map variable from `reader` into a fresh pytree."""
  name_map = tf_name_map(params)
  flat = jax.tree_util.tree_map(np.asarray, variables)
  tree = jax.device_get(flat)
  tree = jax.tree_util.tree_map(np.array, tree)  # mutable copies
  # Unfreeze into plain dicts.
  import flax

  tree = flax.core.unfreeze(tree)
  missing = []
  for tf_name, path in name_map.items():
    if not reader.has_tensor(tf_name):
      missing.append(tf_name)
      continue
    value = reader.get_tensor(tf_name)
    _set_path(tree['params'], path, value)
  if missing:
    raise ValueError(f'TF checkpoint missing {len(missing)} vars: {missing[:5]}')
  return tree


def load_tf_checkpoint(tf_checkpoint_path: str, variables, params):
  """Translates a reference TF checkpoint into this model's variables.

  Pure Python (io/tf_bundle TensorBundle reader — no TF import); needs a
  checkpoint with data shards (the bundled testdata checkpoint ships only
  the .index).
  """
  from deepconsensus_tpu.io import tf_bundle

  reader = tf_bundle.TensorBundleReader(tf_checkpoint_path)
  return _load_via_reader(reader, variables, params)


def load_saved_model(saved_model_dir: str, variables, params):
  """Translates a reference SavedModel directory into model variables.

  The SavedModel's `variables/variables` TensorBundle stores weights under
  positional keys; io/tf_bundle.SavedModelCheckpointReader re-keys them via
  the SavedObjectGraph so the same tf_name_map drives the copy (reference
  emission: models/convert_to_saved_model.py:67-105; reference ingestion:
  inference/quick_inference.py:512-529).
  """
  from deepconsensus_tpu.io import tf_bundle

  reader = tf_bundle.SavedModelCheckpointReader(saved_model_dir)
  return _load_via_reader(reader, variables, params)


def verify_tf_name_map(tf_checkpoint_path: str, variables, params) -> bool:
  """Structural check: every mapped TF name exists with the right shape.

  Works with index-only checkpoints (no data shards), so it can run against
  the bundled testdata model.
  """
  from deepconsensus_tpu.io import tf_bundle

  tf_vars = dict(
      tf_bundle.TensorBundleReader(tf_checkpoint_path).list_variables()
  )
  name_map = tf_name_map(params)
  tree = jax.device_get(variables)
  ok = True
  for tf_name, path in name_map.items():
    if tf_name not in tf_vars:
      raise KeyError(f'{tf_name} not in TF checkpoint')
    node = tree['params']
    for key in path:
      node = node[key]
    if tuple(tf_vars[tf_name]) != tuple(node.shape):
      raise ValueError(
          f'{tf_name}: TF shape {tf_vars[tf_name]} vs JAX {node.shape}'
      )
  # Completeness: every model variable in the TF checkpoint is mapped.
  unmapped = [
      n
      for n in tf_vars
      if n.startswith('model/')
      and n.endswith(_TF_SUFFIX)
      and '.OPTIMIZER_SLOT' not in n
      and n not in name_map
  ]
  if unmapped:
    raise ValueError(f'unmapped reference variables: {unmapped}')
  return ok
