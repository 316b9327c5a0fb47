"""Evidence run: can a Mosaic (Pallas) f32 matmul match XLA's bitwise?

The fused encoder (ops/fused_encoder.py) drifts ~2e-5 in Q characters vs
the XLA parity graph (BASELINE.md). Byte-identical FASTQ requires every
f32 matmul in the kernel to reproduce XLA's bitwise — this isolates the
very first one: y = x @ w at the encoder's own shapes, computed by (a)
jnp.einsum under jit (what the XLA graph runs) and (b) a minimal Pallas
kernel with jax.lax.dot_general (what the fused kernel runs), on
IDENTICAL device inputs, across precision settings.

If every Mosaic precision mode differs from every XLA mode at ULP level,
bit-exactness of the fused encoder is unreachable without Mosaic exposing
XLA's internal accumulation order — recorded in docs/fused_exactness.json
as the basis for keeping the parity graph as the headline config.
"""

import itertools
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

M, K, N = 512, 280, 280  # q_all projection shape at BLOCK_B=4 (4*100=400→512)
PRECISIONS = {
    'default': None,
    'highest': jax.lax.Precision.HIGHEST,
}


def pallas_matmul(x, w, precision):
  def kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        x_ref[:], w_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )

  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
  )(x, w)


def main():
  rng = np.random.default_rng(7)
  x = jnp.asarray(rng.normal(size=(M, K)), jnp.float32)
  w = jnp.asarray(rng.normal(size=(K, N)) * 0.05, jnp.float32)

  results = {'device': str(jax.devices()[0]), 'shape': [M, K, N]}
  outs = {}
  for name, prec in PRECISIONS.items():
    outs[f'xla_{name}'] = np.asarray(
        jax.jit(lambda a, b, p=prec: jnp.einsum(
            'mk,kn->mn', a, b, precision=p))(x, w)
    )
    outs[f'mosaic_{name}'] = np.asarray(
        jax.jit(lambda a, b, p=prec: pallas_matmul(a, b, p))(x, w)
    )

  comps = {}
  for a, b in itertools.combinations(sorted(outs), 2):
    d = outs[a] - outs[b]
    comps[f'{a}_vs_{b}'] = {
        'bitwise_equal': bool((outs[a] == outs[b]).all()),
        'max_abs_diff': float(np.max(np.abs(d))),
        'frac_differing': float(np.mean(outs[a] != outs[b])),
    }
  results['comparisons'] = comps
  path = os.path.join(_REPO, 'docs', 'fused_exactness.json')
  with open(path, 'w') as f:
    json.dump(results, f, indent=2)
  for k, v in comps.items():
    print(k, v)
  print('wrote', path)


if __name__ == '__main__':
  main()
