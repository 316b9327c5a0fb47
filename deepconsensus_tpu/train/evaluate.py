"""Batch evaluation of a checkpoint over eval tfrecords -> inference.csv.

Equivalent of the reference's eval binary
(`reference: models/model_inference.py:79-120`,
`model_utils.run_inference_and_write_results`, model_utils.py:379-421).
"""

import csv
import logging
import os
from typing import Dict, Optional

import jax

from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.parallel import mesh as mesh_lib
from deepconsensus_tpu.train import input_pipeline, loop as loop_lib

logger = logging.getLogger(__name__)


def run_eval(
    checkpoint_path: str,
    out_dir: str,
    eval_path=None,
    limit: int = -1,
    batch_size: Optional[int] = None,
    num_devices: Optional[int] = None,
) -> Dict[str, float]:
  """Evaluates a checkpoint on the eval dataset, writes inference.csv.

  Shards each eval batch over THIS PROCESS's device mesh (batch axis
  split, replicated weights, psum'd metrics inside eval_step) like the
  training loop's eval passes, so checkpoint evaluation scales with chip
  count; num_devices=None uses the most devices that divide batch_size
  (batch semantics are never changed to fit the mesh). Single-process
  only — multi-host jobs evaluate via the training loop, whose input
  stream is host-sharded. Metrics are bit-identical across mesh sizes
  (metric sums are exact integer-valued f32 counts; tested on the
  8-device virtual mesh).
  """
  params = configs.read_params_from_json(checkpoint_path)
  configs.finalize_params(params, is_training=False)
  with params.unlocked():
    if eval_path:
      params.eval_path = eval_path
    if batch_size:
      params.batch_size = batch_size

  if jax.process_count() > 1:
    # The eval stream below is NOT host-sharded (unlike loop.py's
    # multihost_stream), so under jax.distributed every process would
    # feed the same rows into shard_batch's local-slice contract and
    # each example would be counted process_count times.
    raise NotImplementedError(
        'run_eval is single-process; multi-host jobs evaluate through '
        'the training loop\'s sharded eval passes'
    )
  if num_devices is not None and num_devices > len(jax.devices()):
    # make_mesh would silently truncate to the available devices.
    raise ValueError(
        f'requested {num_devices} devices, only {len(jax.devices())} '
        'available'
    )
  if num_devices is None:
    # Default to the LARGEST device count that divides the requested
    # batch — never silently change batch_size: with drop_remainder
    # batching, inflating the batch would drop tail examples and change
    # which examples the metrics cover (e.g. the documented batch-1
    # full-split eval must stay exactly that on an 8-device host).
    n = len(jax.devices())
    while params.batch_size % n:
      n -= 1
    num_devices = n
  mesh = mesh_lib.make_mesh(num_devices)
  n_dev = mesh.devices.size
  if params.batch_size % n_dev:
    raise ValueError(
        f'batch_size {params.batch_size} is not divisible by the '
        f'requested {n_dev} devices'
    )

  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  src = checkpoint_path
  if os.path.isdir(src):
    src = ckpt_lib.latest_checkpoint(src) or src
  payload = ckpt_lib.load_checkpoint(
      src, {'variables': jax.device_get(variables)}
  )
  variables = payload['variables']

  tx, _ = loop_lib.make_optimizer(params, decay_steps=1)
  _, eval_step = loop_lib.build_train_step(
      model, tx, params, params.batch_size
  )
  jit_eval = jax.jit(
      eval_step,
      in_shardings=(
          mesh_lib.replicated(mesh),
          mesh_lib.batch_sharding(mesh),
          mesh_lib.batch_sharding(mesh),
      ),
      out_shardings=mesh_lib.replicated(mesh),
  )
  variables = mesh_lib.shard_params(variables, mesh)

  stream = input_pipeline.example_stream(
      params.eval_path, params, params.batch_size, shuffle_buffer=0,
      repeat=False,
  )
  acc = loop_lib.MetricAccumulator()
  n = 0
  for rows, labels in stream:
    rows = mesh_lib.shard_batch(rows, mesh)
    labels = mesh_lib.shard_batch(labels, mesh)
    acc.update(jax.device_get(jit_eval(variables, rows, labels)))
    n += rows.shape[0]
    if limit > 0 and n >= limit:
      break
  metrics = acc.result('eval')
  metrics['eval/examples'] = n

  os.makedirs(out_dir, exist_ok=True)
  out_csv = os.path.join(out_dir, 'inference.csv')
  with open(out_csv, 'w', newline='') as f:
    writer = csv.writer(f)
    writer.writerow(list(metrics))
    writer.writerow([metrics[k] for k in metrics])
  logger.info('Wrote %s: %s', out_csv, metrics)
  return metrics
