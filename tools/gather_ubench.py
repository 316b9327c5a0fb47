"""Microbenchmark: Mosaic dynamic_gather lane-LUT throughput on TPU.

Decides the embed-kernel design (VERDICT r5 item 1): axis-0 gathers over
256-row tables are unsupported ("multiple source vregs along gather
dimension"), so a lookup must be composed from axis-1 (lane) gathers
against 128-entry LUT rows + selects. This measures whether that
composition beats the one-hot-MXU cost the XLA path pays.

Kernels measured on (Mrows, 128) int32 idx tiles:
  g1: single axis-1 gather vs a broadcast 128-lane LUT (the primitive)
  g8: full 8-width × 2-half composition + static perm (one 16-pass
      feature chunk of the real embed kernel)
"""

import functools
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS = 256


def k0_kernel(idx_ref, lut_ref, o_ref):
  # Harness baseline: same traffic (idx in, f32 out), no gather.
  o_ref[:] = idx_ref[:].astype(jnp.float32) + lut_ref[0, 0]


def g1_kernel(idx_ref, lut_ref, o_ref):
  lut = jnp.broadcast_to(lut_ref[0:1, :], (ROWS, 128))
  o_ref[:] = jnp.take_along_axis(
      lut, idx_ref[:], axis=1, mode='promise_in_bounds'
  )


def g8_kernel(ids_ref, lut_ref, o_ref):
  # ids (ROWS, 16) passes; lut (16, 128): row 2*w+h = half h of width w.
  idx = pltpu.repeat(ids_ref[:], 8, axis=1)  # (ROWS,128): lane j = w*16+p
  lo = jnp.minimum(idx, 127)
  hi = jnp.maximum(idx - 128, 0)
  is_lo = idx < 128
  j = jax.lax.broadcasted_iota(jnp.int32, (ROWS, 128), 1)
  wclass = j // 16
  acc = jnp.zeros((ROWS, 128), jnp.float32)
  for w in range(8):
    ll = jnp.broadcast_to(lut_ref[2 * w : 2 * w + 1, :], (ROWS, 128))
    lh = jnp.broadcast_to(lut_ref[2 * w + 1 : 2 * w + 2, :], (ROWS, 128))
    gl = jnp.take_along_axis(ll, lo, axis=1, mode='promise_in_bounds')
    gh = jnp.take_along_axis(lh, hi, axis=1, mode='promise_in_bounds')
    g = jnp.where(is_lo, gl, gh)
    acc = jnp.where(wclass == w, g, acc)
  # static lane perm: out[j=p*8+w] = acc[w*16+p]
  perm = jnp.broadcast_to(((j % 8) * 16 + j // 8), (ROWS, 128))
  o_ref[:] = jnp.take_along_axis(acc, perm, axis=1, mode='promise_in_bounds')


def run(name, kernel, inputs, out_shape, iters=200):
  grids = inputs[0].shape[0] // ROWS
  specs = []
  for x in inputs:
    if x.shape[0] == ROWS or x.shape[0] <= 16:
      specs.append(pl.BlockSpec(x.shape, lambda i: (0, 0)))
    else:
      specs.append(
          pl.BlockSpec((ROWS, x.shape[1]), lambda i: (i, 0))
      )
  f = pl.pallas_call(
      kernel,
      grid=(grids,),
      in_specs=specs,
      out_specs=pl.BlockSpec((ROWS, out_shape[1]), lambda i: (i, 0)),
      out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
  )

  def chained(args, iters):
    # Genuine serial dependency: iteration k's output perturbs iteration
    # k+1's indices (this libtpu build folds carry*0.0, so the usual
    # fake-dependency idiom collapses the chain). The extra elementwise
    # add/and is small next to the gathers being measured.
    def body(_, ids):
      out = f(ids, *args[1:])
      w = ids.shape[1]
      return (ids + out[:, :w].astype(jnp.int32)) & (
          127 if w == 128 else 255
      )

    final = jax.lax.fori_loop(0, iters, body, args[0])
    # Return a scalar so the timed fetch (which is what actually waits for
    # remote compute — block_until_ready returns early on tunnel buffers)
    # costs one value of D2H.
    return jnp.sum(final[0, :8])

  cf = jax.jit(functools.partial(chained, iters=iters))
  t0 = time.time()
  float(cf(inputs))  # compile + warm
  print(f'  {name}: compile+warm {time.time() - t0:.2f}s')
  best = None
  for _ in range(3):
    t0 = time.time()
    float(cf(inputs))
    call_s = time.time() - t0
    print(f'  {name}: call {call_s:.4f}s for {iters} iters')
    dt = call_s / iters
    best = dt if best is None else min(best, dt)
  els = out_shape[0] * out_shape[1]
  print(name, round(best * 1e6, 1), 'us;',
        round(els * 4 / best / 1e9, 1), 'GB/s out')
  return {'us': round(best * 1e6, 1), 'gbps_out': round(els * 4 / best / 1e9, 2)}


def main():
  print(jax.devices())
  rng = np.random.default_rng(0)
  M = 256 * 800  # the per-2048-batch row count (B*L)
  out = {}
  idx = jnp.asarray(rng.integers(0, 128, (M, 128)), jnp.int32)
  lut1 = jnp.asarray(rng.normal(size=(1, 128)), jnp.float32)
  out['k0'] = run('k0', k0_kernel, (idx, lut1), (M, 128))
  out['g1'] = run('g1', g1_kernel, (idx, lut1), (M, 128))

  ids = jnp.asarray(rng.integers(0, 256, (M, 16)), jnp.int32)
  lut16 = jnp.asarray(rng.normal(size=(16, 128)), jnp.float32)
  out['g8'] = run('g8', g8_kernel, (ids, lut16), (M, 128))

  path = os.path.join(_REPO, 'docs', 'gather_ubench.json')
  with open(path, 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
