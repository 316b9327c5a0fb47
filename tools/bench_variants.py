"""One-process TPU experiment: forward throughput + FASTQ drift per variant.

Measures raw jitted windows/sec at batch 1024 for {unfused, fused-pallas} x
{f32, bf16} and compares end-to-end FASTQ output of each variant against
the unfused f32 reference path on the bundled shard. Single process so the
chip is claimed once. Prints one JSON line at the end.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from deepconsensus_tpu.calibration import calibration as calibration_lib
from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.postprocess import stitch
from deepconsensus_tpu.preprocess import feeder, windows

TESTDATA = os.environ.get(
    'DC_TPU_TESTDATA', '/root/reference/deepconsensus/testdata/human_1m'
)
TOY = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   'models_out/toy_model')
BATCH = 1024


def measure_windows_per_sec(runner, params, iters=16, budget_s=75.0):
  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(BATCH, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  h = runner.predict(rows)  # compile + warmup
  t0 = time.time()
  done = 0
  pending = []
  for _ in range(iters):
    pending.append(runner.predict_async(rows))
    done += 1
    if len(pending) > 2:
      runner.collect(pending.pop(0))
    if time.time() - t0 > budget_s:
      break
  for p in pending:
    runner.collect(p)
  dt = time.time() - t0
  del h
  return BATCH * done / dt


def fastq_for(runner, params):
  dc_config = windows.DcConfig(
      params.max_passes, params.max_length, params.use_ccs_bq
  )
  options = engine.InferenceOptions(
      max_length=params.max_length,
      example_height=dc_config.tensor_height,
      max_passes=params.max_passes,
      min_quality=0,
      batch_size=BATCH,
      use_ccs_bq=params.use_ccs_bq,
      dc_calibration_values=calibration_lib.parse_calibration_string(
          params.get('dc_calibration', 'skip')
      ),
  )
  proc_feeder, _ = feeder.create_proc_feeder(
      subreads_to_ccs=f'{TESTDATA}/subreads_to_ccs.bam',
      ccs_bam=f'{TESTDATA}/ccs.bam',
      dc_config=dc_config,
      ins_trim=5,
  )
  inputs = [(reads, zmw, cfg, ww) for reads, zmw, cfg, _, ww in proc_feeder()]
  import collections
  stats = collections.Counter()
  timing = engine.Timing()
  feats, n_ex, n_sub = engine.featurize_round(inputs, 'x', stats, timing)
  st = engine.enqueue_round(feats, runner, options, 'x', n_ex, n_sub)
  outcome = stitch.OutcomeCounter()
  out_path = f'/tmp/bench_out/variant_{id(runner)}.fastq'
  os.makedirs('/tmp/bench_out', exist_ok=True)
  writer = engine.OutputWriter(out_path, f'{TESTDATA}/ccs.bam')
  engine.finish_round(st, runner, writer, options, outcome, timing)
  writer.close()
  return open(out_path).read()


def main():
  results = {}
  variants = [
      ('unfused_f32', {}, jnp.float32),
      ('fused_f32', {'use_pallas_fused_encoder': True}, jnp.float32),
      ('unfused_bf16', {}, jnp.bfloat16),
      ('fused_bf16', {'use_pallas_fused_encoder': True}, jnp.bfloat16),
  ]
  fastqs = {}
  for name, overrides, dtype in variants:
    runner, params = engine.load_model_for_inference(
        TOY, BATCH, dtype=dtype, param_overrides=overrides or None
    )
    wps = measure_windows_per_sec(runner, params)
    results[f'{name}_windows_per_sec'] = round(wps, 1)
    fastqs[name] = fastq_for(runner, params)
    del runner

  ref = fastqs['unfused_f32']
  for name, fq in fastqs.items():
    if name == 'unfused_f32':
      continue
    if fq == ref:
      results[f'{name}_fastq'] = 'identical'
    else:
      # Quantify drift: fraction of differing quality characters.
      ref_lines = ref.splitlines()
      lines = fq.splitlines()
      nq = diff = seqdiff = 0
      for i in range(0, min(len(ref_lines), len(lines)), 4):
        s1, s2 = ref_lines[i + 1], lines[i + 1]
        q1, q2 = ref_lines[i + 3], lines[i + 3]
        if s1 != s2:
          seqdiff += 1
        nq += max(len(q1), len(q2))
        diff += sum(a != b for a, b in zip(q1, q2)) + abs(len(q1) - len(q2))
      results[f'{name}_fastq'] = (
          f'q_drift={diff}/{nq} seq_diff_reads={seqdiff}'
      )
  print(json.dumps(results))


if __name__ == '__main__':
  main()
