"""Preprocess-CLI throughput benchmark (committed artifact for BASELINE).

Measures the training-data path — the `preprocess` subcommand writing
gzip TFRecord shards — at scale, serial and with a worker pool, against
the reference's pool architecture (reference preprocess/preprocess.py:
275-332, which reports examples/s from its main counter). The input is a
structurally valid N-fold replication of the bundled 10-ZMW shard
(tools/make_big_shard.py), run in both inference mode (the production
sharded-cell path) and training mode (with truth labels).

Writes/updates docs/preprocess_bench.json and prints one JSON line.

Usage:
  python tools/preprocess_bench.py              # 50 copies (500 ZMWs)
  DC_PP_BENCH_COPIES=20 DC_PP_BENCH_CPUS=0,4 python tools/preprocess_bench.py
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TESTDATA = '/root/reference/deepconsensus/testdata/human_1m'


def run_one(shard_dir: str, out_dir: str, cpus: int, training: bool) -> dict:
  tag = f"{'train' if training else 'infer'}_cpus{cpus}"
  output = os.path.join(out_dir, tag, '@split', 'examples.tfrecord.gz')
  os.makedirs(os.path.dirname(output), exist_ok=True)
  cmd = [
      sys.executable, '-m', 'deepconsensus_tpu.cli', 'preprocess',
      '--subreads_to_ccs', os.path.join(shard_dir, 'subreads_to_ccs.bam'),
      '--ccs_bam', os.path.join(shard_dir, 'ccs.bam'),
      '--output', output,
      '--cpus', str(cpus),
  ]
  if training:
    # Truth BAMs/bed reference the original ZMW names only; the training
    # run therefore uses the original 10-ZMW shard (every replicated copy
    # would be dropped as unlabeled, measuring nothing).
    cmd += [
        '--truth_to_ccs', os.path.join(TESTDATA, 'truth_to_ccs.bam'),
        '--truth_bed', os.path.join(TESTDATA, 'truth.bed'),
        '--truth_split', os.path.join(TESTDATA, 'truth_split.tsv'),
    ]
  t0 = time.time()
  proc = subprocess.run(
      cmd, cwd=REPO, capture_output=True, text=True, timeout=1800
  )
  dt = time.time() - t0
  if proc.returncode != 0:
    return {'tag': tag, 'error': proc.stderr[-1000:]}
  summary_name = 'training' if training else 'inference'
  summary_path = os.path.join(
      out_dir, tag, f'summary/examples.{summary_name}.json'
  )
  with open(summary_path) as f:
    summary = json.load(f)
  n = int(summary['n_examples'])
  return {
      'tag': tag,
      'cpus': cpus,
      'mode': summary_name,
      'zmws': int(summary.get('n_zmw_pass', summary.get('n_zmw_processed', 0))),
      'examples': n,
      'seconds': round(dt, 2),
      'examples_per_sec': round(n / dt, 1),
      'zmws_per_sec': round(int(summary.get('n_zmw_pass', summary.get('n_zmw_processed', 0))) / dt, 2),
  }


def main():
  copies = int(os.environ.get('DC_PP_BENCH_COPIES', '50'))
  cpu_list = [
      int(c) for c in os.environ.get('DC_PP_BENCH_CPUS', '0,4').split(',')
  ]
  results = {'copies': copies, 'runs': []}
  with tempfile.TemporaryDirectory() as tmp:
    shard_dir = os.path.join(tmp, 'shard')
    t0 = time.time()
    subprocess.run(
        [sys.executable, 'tools/make_big_shard.py', shard_dir, str(copies)],
        cwd=REPO, check=True, capture_output=True, timeout=600,
    )
    results['make_shard_s'] = round(time.time() - t0, 1)
    for cpus in cpu_list:
      results['runs'].append(run_one(shard_dir, tmp, cpus, training=False))
    for cpus in cpu_list:
      results['runs'].append(run_one(shard_dir, tmp, cpus, training=True))
  results['timestamp'] = time.strftime('%Y-%m-%d %H:%M:%S')
  results['note'] = (
      'preprocess CLI (tfrecord-writing training-data path) on an '
      f'{copies}x replicated human_1m shard; training mode uses the '
      'original 10-ZMW shard (truth only names original ZMWs). Reference '
      'pool architecture: preprocess/preprocess.py:275-332.'
  )
  out = os.path.join(REPO, 'docs', 'preprocess_bench.json')
  try:
    existing = json.load(open(out))
    if not isinstance(existing, list):
      existing = [existing]
  except (OSError, ValueError):
    existing = []
  existing.append(results)
  with open(out, 'w') as f:
    json.dump(existing, f, indent=2)
  print(json.dumps(results))


if __name__ == '__main__':
  main()
