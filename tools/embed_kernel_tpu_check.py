"""On-chip validation + timing of the embedding path.

Runs on the real TPU (single process; run under `timeout`):
  1. asserts bitwise equality of the one-hot-matmul embedding path vs
     the gather path at batch 256 (concat tensor AND final logits),
  2. times embed-stage and full-forward variants at batch 2048 with the
     chained-fori_loop method (CLAUDE.md: per-dispatch timing understates
     device throughput ~2x through the tunnel).

Writes docs/embed_kernel_tpu.json. History: this began as the validation
harness for a Mosaic dynamic-gather embed+concat kernel; that kernel was
removed after the round-5 measurements (Mosaic rejects axis-0 gathers
over >1-vreg tables, and the lane-gather composition was unprofitable —
docs/gather_ubench.json), so the recorded file's `embed_concat_matmul_*`
keys time the surviving XLA path, not a Pallas kernel.
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


def make_args(rng, params, B, P):
  L = params.max_length
  return dict(
      bases=rng.integers(0, 5, (B, P, L)).astype(np.uint8),
      pw=rng.integers(0, 256, (B, P, L)).astype(np.uint8),
      ip=rng.integers(0, 256, (B, P, L)).astype(np.uint8),
      strand=rng.integers(0, 3, (B, P)).astype(np.uint8),
      ccs=rng.integers(0, 5, (B, L)).astype(np.uint8),
      sn=rng.integers(0, 500, (B, 4)).astype(np.uint16),
  )


def chained(fn, iters):
  """One dispatch covering `iters` serially-dependent forwards.

  The carry perturbs an input by carry*0.0 so XLA cannot collapse the
  chain (CLAUDE.md chained-fori_loop method).
  """

  def run(args):
    def body(_, carry):
      a = dict(args)
      a['pw'] = (a['pw'].astype(jnp.float32) + carry * 0.0).astype(jnp.uint8)
      out = fn(a)
      return jnp.mean(out) * jnp.ones((), jnp.float32)

    return jax.lax.fori_loop(0, iters, body, jnp.zeros((), jnp.float32))

  return jax.jit(run)


def main():
  out = {'device': str(jax.devices()[0])}
  print(out)
  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  rng = np.random.default_rng(5)

  # --- exactness at small batch ---
  t0 = time.time()
  args = make_args(rng, params, 256, params.max_passes)
  gather = jax.jit(
      lambda v, a: model.apply(
          v, **a, pre_condense=True, method='compact_outputs',
      )['encoder_input']
  )(variables, args)
  matmul = jax.jit(
      lambda v, a: model.apply(
          v, **a, pre_condense=True, embed_matmul=True,
          method='compact_outputs',
      )['encoder_input']
  )(variables, args)
  gather, matmul = jax.device_get((gather, matmul))
  out['matmul_vs_gather_bitwise'] = bool((gather == matmul).all())
  out['matmul_vs_gather_maxdiff'] = float(np.max(np.abs(gather - matmul)))
  print('matmul vs gather exact:', out['matmul_vs_gather_bitwise'],
        'dt', round(time.time() - t0, 1))

  logits_g = jax.jit(
      lambda v, a: model.apply(v, **a,
                               method='compact_outputs')['logits']
  )(variables, args)
  logits_m = jax.jit(
      lambda v, a: model.apply(v, **a, embed_matmul=True,
                               method='compact_outputs')['logits']
  )(variables, args)
  lp, lf = jax.device_get((logits_g, logits_m))
  out['logits_bitwise_equal'] = bool((lp == lf).all())
  print('logits exact:', out['logits_bitwise_equal'])

  # --- chained timing at batch 2048 ---
  B = int(os.environ.get('DC_EK_BATCH', '2048'))
  iters = int(os.environ.get('DC_EK_ITERS', '20'))
  big = make_args(rng, params, B, params.max_passes)
  big = {k: jnp.asarray(v) for k, v in big.items()}

  def time_variant(name, make_fn):
    fn = chained(make_fn, iters)
    float(fn(big))  # compile+warm (the fetch waits on remote compute)
    best = None
    for _ in range(3):
      t0 = time.time()
      float(fn(big))
      dt = (time.time() - t0) / iters
      best = dt if best is None else min(best, dt)
    out[name + '_ms'] = round(best * 1000, 3)
    out[name + '_windows_per_sec'] = round(B / best, 1)
    print(name, out[name + '_ms'], 'ms ', out[name + '_windows_per_sec'], 'w/s')

  def embed_matmul_fn(a):
    return model.apply(
        variables, **a, pre_condense=True, embed_matmul=True,
        method='compact_outputs')['encoder_input']

  def stage_embed_condense_matmul(a):
    return model.apply(
        variables, **a, embed_only=True, embed_matmul=True,
        method='compact_outputs')['encoder_input']

  def full_matmul(a):
    return model.apply(variables, **a, embed_matmul=True,
                       method='compact_outputs')['logits']

  time_variant('embed_concat_matmul', embed_matmul_fn)
  time_variant('embed_condense_matmul', stage_embed_condense_matmul)
  time_variant('full_forward_matmul', full_matmul)

  path = os.path.join(_REPO, 'docs', 'embed_kernel_tpu.json')
  with open(path, 'w') as f:
    json.dump(out, f, indent=2)
  print('wrote', path)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
