"""Adopt a trained checkpoint as the bundled toy model.

Strips opt_state (variables only, ~32 MB), saves into models_out/toy_model
as checkpoint-<step>, removes the previously bundled checkpoint-N dirs,
re-evaluates on the bundled eval split with the train loop's own jitted
eval step in f32 on CPU, and rewrites checkpoint_metrics.tsv +
best_checkpoint.txt from that measurement.

Usage:
  python tools/adopt_toy_checkpoint.py /tmp/toy_warm2 [step]
"""

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update('jax_platforms', 'cpu')

import numpy as np

from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.train import input_pipeline, loop as loop_lib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOY = os.path.join(REPO, 'models_out/toy_model')


def main():
  src = sys.argv[1]
  latest = ckpt_lib.latest_checkpoint(src)
  assert latest, f'no checkpoint under {src}'
  step = int(latest.rsplit('-', 1)[1])

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  template = jax.device_get(model_lib.init_params(model, params))
  payload = ckpt_lib.load_checkpoint(latest, {'variables': template})
  variables = payload['variables']

  # Honest eval: the train loop's own eval step over the full split.
  _, eval_step = loop_lib.build_train_step(
      model, loop_lib.make_optimizer(params, decay_steps=100)[0], params,
      params.batch_size,
  )
  jit_eval = jax.jit(eval_step)
  acc = loop_lib.MetricAccumulator()
  stream = input_pipeline.example_stream(
      params.eval_path, params, params.batch_size, shuffle_buffer=0,
      repeat=False,
  )
  n_batches = 0
  for rows, labels in stream:
    acc.update(jax.device_get(jit_eval(variables, rows, labels)))
    n_batches += 1
  metrics = acc.result('eval')
  print(f'eval over {n_batches} batch(es): {metrics}')

  # Replace the bundled checkpoint (variables only). Keep the source run's
  # params.json (it records how the checkpoint was actually trained); write
  # basenames like train/loop.py does.
  for entry in os.listdir(TOY):
    if entry.startswith('checkpoint-'):
      shutil.rmtree(os.path.join(TOY, entry))
  name = os.path.basename(
      ckpt_lib.save_checkpoint(TOY, variables, params, step=step)
  )
  src_params = os.path.join(src, 'params.json')
  if os.path.exists(src_params):
    shutil.copy(src_params, os.path.join(TOY, 'params.json'))
  with open(os.path.join(TOY, 'best_checkpoint.txt'), 'w') as f:
    f.write(name)
  tsv = os.path.join(TOY, 'checkpoint_metrics.tsv')
  if os.path.exists(tsv):
    os.remove(tsv)
  loop_lib.write_metrics_row(tsv, name, metrics)
  print(f'adopted {latest} -> {TOY}/{name}')


if __name__ == '__main__':
  main()
