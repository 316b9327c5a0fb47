"""On-chip training-throughput benchmark (committed artifact for BASELINE).

Measures sustained train steps/s and examples/s of the full flagship
training step (forward + AlignmentLoss wavefront + grads + LAMB update) at
a production batch size, on whatever device jax selects (the real TPU chip
under the tunnel; CPU when forced). Reference anchor: ~4.1 h per
100M-example epoch on TPU v2 at global batch 8192 == ~6,780 examples/s
(reference docs/train_tpu_model.md:283-327).

Writes/updates docs/train_tpu_bench.json and prints one JSON line.

Usage:
  timeout 560 python tools/train_bench.py
  DC_TRAIN_BENCH_BATCH=1024 DC_TRAIN_BENCH_BUDGET_S=240 ...
"""

import json
import os
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

_RESULTS = {}


def bench_variant(use_fused: bool, batch_size: int, budget_s: float) -> dict:
  import jax
  import numpy as np

  from deepconsensus_tpu.models import configs, model as model_lib
  from deepconsensus_tpu.train import loop as loop_lib

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.batch_size = batch_size
    params.use_pallas_fused_encoder = use_fused
    if use_fused and jax.devices()[0].platform not in ('tpu', 'axon'):
      params.fused_encoder_interpret = True
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  tx, _ = loop_lib.make_optimizer(params, decay_steps=1000)
  opt_state = tx.init(variables['params'])
  train_step, _ = loop_lib.build_train_step(model, tx, params, batch_size)
  jit_step = jax.jit(train_step, donate_argnums=(0, 1))

  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(batch_size, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  labels = rng.integers(
      0, 5, size=(batch_size, params.max_length)
  ).astype(np.float32)

  t_compile = time.time()
  variables, opt_state, metrics = jit_step(variables, opt_state, rows, labels)
  jax.block_until_ready(metrics)
  compile_s = time.time() - t_compile

  t0 = time.time()
  steps = 0
  deadline = t0 + budget_s
  while time.time() < deadline:
    variables, opt_state, metrics = jit_step(
        variables, opt_state, rows, labels
    )
    steps += 1
    if steps % 4 == 0:
      jax.block_until_ready(metrics)
      _RESULTS.setdefault('partial', {})[
          'fused' if use_fused else 'unfused'
      ] = round(steps * batch_size / (time.time() - t0), 1)
  jax.block_until_ready(metrics)
  dt = time.time() - t0
  return {
      'steps_per_sec': round(steps / dt, 3),
      'examples_per_sec': round(steps * batch_size / dt, 1),
      'steps': steps,
      'batch_size': batch_size,
      'compile_s': round(compile_s, 1),
      'loss_finite': bool(np.isfinite(float(metrics['loss']))),
  }


def bench_chained(use_fused: bool, batch_size: int, budget_s: float) -> dict:
  """True device train throughput: K serially-dependent steps per dispatch.

  Per-dispatch timing understates device throughput when the chip sits
  behind a high-latency tunnel (each step pays a dispatch RPC); chaining K
  train steps inside one jitted fori_loop makes one dispatch cover K
  steps, amortizing RPC latency to noise — the same methodology
  tools/bench_stages.py uses for the forward pass. The chain is serially
  dependent by construction (each step consumes the previous step's
  params/opt_state), so XLA cannot collapse it.
  """
  import jax
  import jax.numpy as jnp
  import numpy as np

  from deepconsensus_tpu.models import configs, model as model_lib
  from deepconsensus_tpu.train import loop as loop_lib

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.batch_size = batch_size
    params.use_pallas_fused_encoder = use_fused
    if use_fused and jax.devices()[0].platform not in ('tpu', 'axon'):
      params.fused_encoder_interpret = True
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  tx, _ = loop_lib.make_optimizer(params, decay_steps=1000)
  opt_state = tx.init(variables['params'])
  train_step, _ = loop_lib.build_train_step(model, tx, params, batch_size)

  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(batch_size, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  labels = rng.integers(
      0, 5, size=(batch_size, params.max_length)
  ).astype(np.float32)

  k = int(os.environ.get('DC_TRAIN_BENCH_CHAIN_K', '24'))

  def run_chain(variables, opt_state, rows, labels):
    v, o, m = train_step(variables, opt_state, rows, labels)

    def body(_, carry):
      v, o, _ = carry
      return train_step(v, o, rows, labels)

    return jax.lax.fori_loop(0, k - 1, body, (v, o, m))

  jit_chain = jax.jit(run_chain, donate_argnums=(0, 1))
  t_compile = time.time()
  variables, opt_state, metrics = jit_chain(
      variables, opt_state, rows, labels
  )
  jax.block_until_ready(metrics)
  compile_s = time.time() - t_compile

  t0 = time.time()
  steps = 0
  key = f"chained_{'fused' if use_fused else 'unfused'}"
  while time.time() < t0 + budget_s:
    variables, opt_state, metrics = jit_chain(
        variables, opt_state, rows, labels
    )
    jax.block_until_ready(metrics)
    steps += k
    _RESULTS.setdefault('partial', {})[key] = round(
        steps * batch_size / (time.time() - t0), 1
    )
  dt = time.time() - t0
  return {
      'steps_per_sec': round(steps / dt, 3),
      'examples_per_sec': round(steps * batch_size / dt, 1),
      'steps': steps,
      'chain_k': k,
      'batch_size': batch_size,
      'compile_s': round(compile_s, 1),
      'loss_finite': bool(np.isfinite(float(metrics['loss']))),
  }


def main():
  batch = int(os.environ.get('DC_TRAIN_BENCH_BATCH', '1024'))
  budget = float(os.environ.get('DC_TRAIN_BENCH_BUDGET_S', '150'))
  total_budget = float(os.environ.get('DC_TRAIN_BENCH_TOTAL_S', '520'))

  # 'fused' variants removed in round 5: the Pallas training backward
  # was deleted (slower than XLA autodiff; ops/fused_encoder.py).
  variants = os.environ.get('DC_TRAIN_BENCH_VARIANTS', 'unfused')
  variants = [v.strip() for v in variants.split(',') if v.strip()]

  def body():
    import jax

    _RESULTS['device_kind'] = jax.devices()[0].device_kind
    if 'unfused' in variants:
      _RESULTS['unfused'] = bench_variant(False, batch, budget)
    if 'chained' in variants:
      _RESULTS['chained_unfused'] = bench_chained(False, batch, budget)

  worker = threading.Thread(target=body, daemon=True)
  worker.start()
  worker.join(timeout=total_budget)
  _RESULTS['timestamp'] = time.strftime('%Y-%m-%d %H:%M:%S')
  _RESULTS['note'] = (
      'synthetic batch; full train step (fwd + AlignmentLoss + grads + '
      'LAMB); reference anchor ~6780 ex/s on TPU v2 pod slice '
      '(docs/train_tpu_model.md:317-327)'
  )
  if worker.is_alive():
    _RESULTS['timeout'] = True
  out = os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      'docs', 'train_tpu_bench.json',
  )
  try:
    existing = json.load(open(out))
    if not isinstance(existing, list):
      existing = [existing]
  except (OSError, ValueError):
    existing = []
  existing.append(_RESULTS)
  with open(out, 'w') as f:
    json.dump(existing, f, indent=2)
  print(json.dumps(_RESULTS))
  if worker.is_alive():
    os._exit(0)


if __name__ == '__main__':
  main()
