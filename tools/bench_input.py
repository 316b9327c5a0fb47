"""Input-pipeline throughput: serial vs parallel workers.

Measures examples/s of the training input pipeline (tfrecord read ->
parse -> format -> shuffled batches) at a production-like batch size, and
compares against the train-step rate so it's visible that the pipeline
outruns the device (VERDICT r1 item 4; reference feeds this from tf.data,
data_providers.py:377-425).

Usage: python tools/bench_input.py [--batch 1024] [--seconds 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deepconsensus_tpu.models import configs  # noqa: E402
from deepconsensus_tpu.train import input_pipeline  # noqa: E402


def measure(params, batch_size, num_workers, seconds, shuffle=1000):
  stream = input_pipeline.example_stream(
      params.train_path, params, batch_size=batch_size,
      shuffle_buffer=shuffle, repeat=True, num_workers=num_workers,
  )
  it = input_pipeline.Prefetcher(stream, depth=4)
  # Warmup: first batch pays pool spawn + file open.
  next(it)
  n = 0
  t0 = time.time()
  while time.time() - t0 < seconds:
    rows, labels = next(it)
    n += rows.shape[0]
  dt = time.time() - t0
  return n / dt


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--batch', type=int, default=1024)
  ap.add_argument('--seconds', type=float, default=20.0)
  ap.add_argument('--workers', type=int, default=os.cpu_count())
  args = ap.parse_args()

  params = configs.get_config('transformer_learn_values+test')
  configs.finalize_params(params)

  serial = measure(params, args.batch, 0, args.seconds)
  print(f'serial (num_workers=0):        {serial:10.1f} examples/s')
  parallel = measure(params, args.batch, args.workers, args.seconds)
  print(f'parallel (num_workers={args.workers}):      {parallel:10.1f} '
        f'examples/s ({parallel / serial:.2f}x)')
  print(f'-> feeds a global batch {args.batch} at '
        f'{parallel / args.batch:.2f} steps/s')


if __name__ == '__main__':
  main()
