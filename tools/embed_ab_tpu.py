"""ARCHIVAL: same-process A/B of the round-5 embedding experiments.

This tool produced docs/embed_ab_tpu.json (2026-08-20): the established
one-hot HIGHEST matmul + f32-side transpose beat both experimental
variants (exact bf16x3 table split; int-side ids transpose) by 2-3x, so
the experiments were REMOVED from the model along with the
DC_EMBED_IMPL / DC_EMBED_TRANSPOSE knobs this tool toggles (commit
30a7967). Re-running it today would time the same surviving
implementation four times and record tunnel noise as deltas — it
therefore refuses to run. The methodology (interleaved A/B/A/B chained
fori_loop rounds, scalar fetch to wait on remote compute) remains the
template for future same-process comparisons.
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
  raise SystemExit(
      'embed_ab_tpu.py is archival: the DC_EMBED_IMPL/DC_EMBED_TRANSPOSE '
      'variants it compares were removed after the recorded A/B '
      '(docs/embed_ab_tpu.json) — all four combos would now trace the '
      'same graph. See the module docstring.'
  )
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
