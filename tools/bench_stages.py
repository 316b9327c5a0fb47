"""Per-stage on-chip forward timing: where does a batch's device time go?

One process (claims the chip once). Each stage is timed as K serial
iterations inside a single jitted lax.fori_loop — iteration i+1's inputs
are perturbed by (carry * 0.0) so XLA cannot hoist the loop body (float
mul-by-zero is not folded), and the whole K-iteration chain is ONE
dispatch, so the remote tunnel's per-RPC latency amortizes to noise.

Stages:
  embed_raw      one-hot MXU embeddings + concat (pre-condenser)
  embed          + condenser + position encoding (compact_embed)
  enc_unfused    XLA encoder stack + output norm + logits head, from h
  enc_fused      fused Pallas encoder stack + norm + logits, from h
  full_unfused   compact features -> (argmax ids, max prob)
  full_fused     same through the fused encoder

Prints one JSON line: per-stage ms/iter per batch size, plus derived
windows/s for the full paths. Env: DC_STAGES_BATCHES=2048,4096
DC_STAGES_ITERS=8.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepconsensus_tpu.inference import engine

TOY = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    'models_out/toy_model',
)


def synth_compact(params, batch: int):
  """Synthetic compact batch with the featurizer's invariants honored."""
  rng = np.random.default_rng(0)
  mp, L = params.max_passes, params.max_length
  bases = rng.integers(0, 5, size=(batch, mp, L)).astype(np.int32)
  pw = rng.poisson(6.0, size=(batch, mp, L)).clip(0, 255).astype(np.int32)
  ip = rng.poisson(6.0, size=(batch, mp, L)).clip(0, 255).astype(np.int32)
  pw[bases == 0] = 0
  ip[bases == 0] = 0
  compact = {
      'bases': bases,
      'pw': pw,
      'ip': ip,
      'strand': rng.integers(1, 3, size=(batch, mp)).astype(np.int32),
      'ccs': rng.integers(0, 5, size=(batch, L)).astype(np.int32),
      'sn': rng.integers(0, 400, size=(batch, 4)).astype(np.int32),
  }
  if params.use_ccs_bq:
    compact['ccs_bq'] = rng.integers(-1, 94, size=(batch, L)).astype(np.int32)
  return jax.device_put(compact)


def timed_loop(fn, inputs, iters: int):
  """Wall time of ONE dispatch running `iters` chained evaluations of fn.

  fn: pytree -> array. Returns seconds per iteration.
  """

  @jax.jit
  def run(inp):
    def body(_, carry):
      z = carry * 0.0  # runtime zero XLA won't fold (NaN semantics)

      def pert(a):
        if jnp.issubdtype(a.dtype, jnp.integer):
          return a + z.astype(a.dtype)
        return a + z.astype(a.dtype)

      out = fn(jax.tree.map(pert, inp))
      return jnp.sum(out).astype(jnp.float32) * 1e-30

    return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

  jax.block_until_ready(run(inputs))  # compile + warm
  t0 = time.time()
  jax.block_until_ready(run(inputs))
  return (time.time() - t0) / iters


def main():
  batches = [
      int(b)
      for b in os.environ.get('DC_STAGES_BATCHES', '2048,4096').split(',')
  ]
  iters = int(os.environ.get('DC_STAGES_ITERS', '8'))
  ckpt = os.environ.get('DC_STAGES_CKPT', TOY)

  runner_u, params = engine.load_model_for_inference(
      ckpt, batches[0], param_overrides={'use_pallas_fused_encoder': False}
  )
  runner_f, _ = engine.load_model_for_inference(
      ckpt, batches[0], param_overrides={'use_pallas_fused_encoder': True}
  )
  model, variables = runner_u.model, runner_u.variables
  from deepconsensus_tpu.ops import fused_encoder as fe

  n_layers, win = params.num_hidden_layers, params.attn_win_size
  out = {'metric': 'stage_ms', 'iters': iters,
         'device_kind': jax.devices()[0].device_kind}

  # Tunnel probe: one tiny dispatch, recorded for context.
  t0 = time.time()
  jax.block_until_ready(jnp.dot(jnp.ones((128, 128)), jnp.ones((128, 128))))
  out['tunnel_probe_s'] = round(time.time() - t0, 2)

  for batch in batches:
    compact = synth_compact(params, batch)
    ccs_bq = compact.get('ccs_bq')

    def call(method_fn, c):
      args = [c['bases'], c['pw'], c['ip'], c['strand'], c['ccs'], c['sn'],
              c.get('ccs_bq')]
      return model.apply(variables, *args, method=method_fn)

    def embed_raw(c):
      def m_fn(m, bases, pw, ip, strand, ccs, sn, cbq):
        return m.compact_outputs(
            bases, pw, ip, strand, ccs, sn, cbq, embed_only=True,
            embed_matmul=True, pre_condense=True,
        )['encoder_input']
      return call(m_fn, c)

    def embed_full(c):
      def m_fn(m, bases, pw, ip, strand, ccs, sn, cbq):
        return m.compact_embed(bases, pw, ip, strand, ccs, sn, cbq,
                               embed_matmul=True)
      return call(m_fn, c)

    h = jax.device_put(jax.jit(embed_full)(compact))

    def enc_unfused(hh):
      def m_fn(m, x):
        return m.logits_layer(
            m.encoder_stack(x, deterministic=True)['final_output']
        )
      return model.apply(variables, hh, method=m_fn)

    def enc_fused(hh):
      return fe.fused_logits(variables['params'], hh, n_layers, win)

    def full_u(c):
      ids, maxp = runner_u._forward_compact_fn(variables, c)
      return maxp

    def full_f(c):
      ids, maxp = runner_f._forward_compact_fn(runner_f.variables, c)
      return maxp

    res = {}
    for name, fn, inp in (
        ('embed_raw', embed_raw, compact),
        ('embed', embed_full, compact),
        ('enc_unfused', enc_unfused, h),
        ('enc_fused', enc_fused, h),
        ('full_unfused', full_u, compact),
        ('full_fused', full_f, compact),
    ):
      try:
        dt = timed_loop(fn, inp, iters)
        res[name] = round(dt * 1e3, 2)
      except Exception as e:  # noqa: BLE001 — report per-stage failures
        res[name] = f'error: {type(e).__name__}: {e}'[:200]
      print(f'[{batch}] {name}: {res[name]}', file=sys.stderr)
    for k in ('full_unfused', 'full_fused'):
      if isinstance(res.get(k), float):
        res[f'windows_per_sec_{k}'] = round(batch / (res[k] / 1e3), 1)
    out[f'batch_{batch}'] = res
  print(json.dumps(out))


if __name__ == '__main__':
  main()
