"""Pinpoints which fused-encoder primitive breaks bitwise parity with XLA.

Follow-up to docs/fused_parity_tpu.json (layer 0 diverges even with the
unchunked FFN): compares, on identical device inputs at the encoder's own
shapes, XLA vs Mosaic for each candidate op:

  qkv   — XLA einsum 'bte,enh->btnh' (3D kernel) vs Mosaic 2D dot of the
          pre-reshaped (E, N*H) kernel (what the fused kernel runs)
  qkv2d — the same 2D dot on both sides (sanity: matched in isolation)
  exp   — elementwise jnp.exp
  logitsdot — batched 'bfnh,btnh->bnft'-style contraction vs Mosaic's
          per-head (B, L, H) x (B, L, H) -> (B, L, L) batched dot
  softmax — the full max/exp/sum/div chain

Writes docs/fused_drift_components.json.
"""

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

B, L, E, N, H = 8, 100, 280, 2, 140


def pallas_wrap(fn, out_shape):
  def kernel(*refs):
    o_ref = refs[-1]
    o_ref[:] = fn(*[r[:] for r in refs[:-1]])

  def call(*args):
    return pl.pallas_call(
        kernel, out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32)
    )(*args)

  return jax.jit(call)


def compare(name, xla_val, mosaic_val, out):
  a, b = np.asarray(xla_val), np.asarray(mosaic_val)
  out[name] = {
      'bitwise': bool((a == b).all()),
      'maxdiff': float(np.max(np.abs(a - b))),
      'frac': float(np.mean(a != b)),
  }
  print(name, out[name])


def main():
  rng = np.random.default_rng(3)
  out = {'device': str(jax.devices()[0])}
  x = jnp.asarray(rng.normal(size=(B, L, E)), jnp.float32)
  w3 = jnp.asarray(rng.normal(size=(E, N, H)) * 0.05, jnp.float32)
  w2 = w3.reshape(E, N * H)

  # qkv: model einsum vs fused 2D dot
  xla_q = jax.jit(lambda x, w: jnp.einsum('bte,enh->btnh', x, w))(x, w3)
  mos_q = pallas_wrap(
      lambda xr, wr: jax.lax.dot_general(
          xr.reshape(B * L, E), wr,
          dimension_numbers=(((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32,
      ).reshape(B, L, N * H),
      (B, L, N * H),
  )(x, w2)
  compare('qkv_model_vs_fused', xla_q.reshape(B, L, N * H), mos_q, out)

  # qkv2d: identical 2D formulation both sides
  xla_q2 = jax.jit(
      lambda x, w: jax.lax.dot_general(
          x.reshape(B * L, E), w,
          dimension_numbers=(((1,), (0,)), ((), ())),
          preferred_element_type=jnp.float32,
      ).reshape(B, L, N * H)
  )(x, w2)
  compare('qkv2d_xla_vs_fused', xla_q2, mos_q, out)
  compare('qkv_model_vs_xla2d', xla_q.reshape(B, L, N * H), xla_q2, out)

  # exp
  logits = jnp.asarray(rng.normal(size=(B, L, L)) * 3, jnp.float32)
  xla_exp = jax.jit(jnp.exp)(logits)
  mos_exp = pallas_wrap(jnp.exp, (B, L, L))(logits)
  compare('exp', xla_exp, mos_exp, out)

  # batched logits dot: q (B,L,H) x k (B,L,H) -> (B,L,L)
  q = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
  k = jnp.asarray(rng.normal(size=(B, L, H)), jnp.float32)
  dot_bn = lambda q, k: jax.lax.dot_general(
      q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32,
  )
  xla_l = jax.jit(dot_bn)(q, k)
  mos_l = pallas_wrap(dot_bn, (B, L, L))(q, k)
  compare('logits_batched_dot', xla_l, mos_l, out)

  # model-style einsum logits vs fused per-head dot
  xla_le = jax.jit(
      lambda k4, q4: jnp.einsum('btnh,bfnh->bnft', k4, q4)
  )(k.reshape(B, L, 1, H), q.reshape(B, L, 1, H))
  compare('logits_model_einsum_vs_fused', xla_le[:, 0], mos_l, out)

  # softmax chain
  sm = lambda z: jnp.exp(z - jnp.max(z, -1, keepdims=True)) / jnp.sum(
      jnp.exp(z - jnp.max(z, -1, keepdims=True)), -1, keepdims=True
  )
  xla_sm = jax.jit(lambda z: jax.nn.softmax(z, axis=-1))(logits)
  mos_sm = pallas_wrap(
      lambda z: (lambda m: (lambda e: e / jnp.sum(e, -1, keepdims=True))(
          jnp.exp(z - m)))(jnp.max(z, -1, keepdims=True)),
      (B, L, L),
  )(logits)
  compare('softmax_model_vs_fusedchain', xla_sm, mos_sm, out)

  with open(os.path.join(_REPO, 'docs', 'fused_drift_components.json'), 'w') as f:
    json.dump(out, f, indent=2)
  print(json.dumps(out))


if __name__ == '__main__':
  main()
