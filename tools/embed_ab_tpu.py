"""Same-process A/B of the embedding implementations on the TPU.

Times the full compact forward and the embed+condense stage for all four
combinations of {bf16x3, legacy-HIGHEST} one-hot matmul x {int-side,
f32-side} layout transpose (DC_EMBED_IMPL / DC_EMBED_TRANSPOSE knobs,
read at trace time), interleaved A/B/A/B so tunnel-phase drift cancels.
Chained fori_loop timing, result fetched (the fetch is what waits on
remote compute). Writes docs/embed_ab_tpu.json.
"""

import json
import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np

from deepconsensus_tpu.models import configs, model as model_lib
from tools.embed_kernel_tpu_check import chained, make_args

ITERS = int(os.environ.get('DC_EK_ITERS', '40'))
B = int(os.environ.get('DC_EK_BATCH', '2048'))


def main():
  print(jax.devices())
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rng = np.random.default_rng(5)
  big = {k: jnp.asarray(v) for k, v in make_args(rng, params, B, 20).items()}

  combos = [
      ('new', {'DC_EMBED_IMPL': '', 'DC_EMBED_TRANSPOSE': ''}),
      ('legacy', {'DC_EMBED_IMPL': 'legacy', 'DC_EMBED_TRANSPOSE': 'post'}),
      ('bf16x3_only', {'DC_EMBED_IMPL': '', 'DC_EMBED_TRANSPOSE': 'post'}),
      ('transpose_only', {'DC_EMBED_IMPL': 'legacy', 'DC_EMBED_TRANSPOSE': ''}),
  ]

  fns = {}
  for name, env in combos:
    for k, v in env.items():
      os.environ[k] = v

    def full(a):
      return model.apply(variables, **a, embed_matmul=True,
                         method='compact_outputs')['logits']

    def stage(a):
      return model.apply(variables, **a, embed_only=True, embed_matmul=True,
                         method='compact_outputs')['encoder_input']

    fns[name] = {'full': chained(full, ITERS), 'stage': chained(stage, ITERS)}
    # jit tracing happens on first call; trace NOW under this env.
    for f in fns[name].values():
      float(f(big))
    print('compiled', name)
  for k in ('DC_EMBED_IMPL', 'DC_EMBED_TRANSPOSE'):
    os.environ.pop(k, None)

  out = {'device': str(jax.devices()[0]), 'iters': ITERS, 'batch': B}
  times = {n: {'full': [], 'stage': []} for n, _ in combos}
  for _ in range(4):  # interleaved rounds
    for name, _ in combos:
      for kind in ('full', 'stage'):
        t0 = time.time()
        float(fns[name][kind](big))
        times[name][kind].append((time.time() - t0) / ITERS)
  for name, t in times.items():
    for kind in ('full', 'stage'):
      ms = round(min(t[kind]) * 1000, 3)
      out[f'{name}_{kind}_ms'] = ms
      out[f'{name}_{kind}_wps'] = round(B / (ms / 1000), 1)
      print(name, kind, ms, 'ms', out[f'{name}_{kind}_wps'], 'w/s')

  with open(os.path.join(_REPO, 'docs', 'embed_ab_tpu.json'), 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
