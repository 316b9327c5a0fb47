"""Model export: training checkpoint -> inference-only serving artifact.

Equivalent of the reference's SavedModel conversion
(`reference: models/convert_to_saved_model.py:67-105`): strips optimizer
state, keeps variables + params.json, producing a self-contained directory
the inference engine (and the `run` CLI) loads directly.
"""

import logging
import os
from typing import Optional

import jax

from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib

logger = logging.getLogger(__name__)


def export_model(checkpoint_path: str, output_directory: str) -> str:
  """Exports a checkpoint (ours or a reference TF checkpoint) for serving."""
  params = configs.read_params_from_json(checkpoint_path)
  configs.finalize_params(params, is_training=False)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)

  from deepconsensus_tpu.io import tf_bundle

  if tf_bundle.is_saved_model_dir(checkpoint_path):
    variables = ckpt_lib.load_saved_model(checkpoint_path, variables, params)
    step = 0
  elif os.path.isdir(checkpoint_path):
    src = ckpt_lib.latest_checkpoint(checkpoint_path) or checkpoint_path
    payload = ckpt_lib.load_checkpoint(
        src, {'variables': jax.device_get(variables)}
    )
    variables = payload['variables']
    step = _step_of(src)
  else:
    variables = ckpt_lib.load_tf_checkpoint(
        checkpoint_path, variables, params
    )
    step = _step_of(checkpoint_path)

  os.makedirs(output_directory, exist_ok=True)
  path = ckpt_lib.save_checkpoint(
      output_directory, jax.device_get(variables), params, step=step
  )
  with open(os.path.join(output_directory, 'best_checkpoint.txt'), 'w') as f:
    f.write(os.path.basename(path))
  logger.info('Exported inference model to %s', path)
  return path


def _step_of(path: str) -> Optional[int]:
  base = os.path.basename(path)
  if '-' in base:
    try:
      return int(base.rsplit('-', 1)[1])
    except ValueError:
      return 0
  return 0
