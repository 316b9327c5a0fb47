"""Dispatch-cost microbenchmark for the TPU tunnel.

Answers: is predict_async's ~1.3s/batch cost (bench_pipeline_diag) per-call
RPC latency or H2D bandwidth? And does dispatching batches from threads
overlap the cost?

Measures, on the real chip:
  1. raw device_put bandwidth (1MB / 8MB / 32MB uint8)
  2. tiny-dispatch RPC latency (jit add on 4 bytes)
  3. serial predict_async x4 (the engine's enqueue pattern) + bytes/batch
  4. threaded predict_async x4 (4 dispatch threads)
"""

import concurrent.futures
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def main():
  import jax
  import jax.numpy as jnp

  from deepconsensus_tpu.inference import engine

  checkpoint = bench.ensure_checkpoint()
  batch_size = 2048
  runner, params = engine.load_model_for_inference(
      checkpoint, batch_size,
      param_overrides={'use_pallas_fused_encoder': True},
  )

  # 1. raw H2D bandwidth
  for mb in (1, 8, 32):
    arr = np.ones(mb * 1024 * 1024, np.uint8)
    t0 = time.time()
    d = jax.device_put(arr)
    jax.block_until_ready(d)
    dt = time.time() - t0
    print(f'device_put {mb:>2}MB: {dt:6.3f}s  ({mb/dt:6.1f} MB/s)')

  # 2. tiny dispatch RPC latency
  f = jax.jit(lambda x: x + 1)
  x = jnp.zeros(4, jnp.uint8)
  jax.block_until_ready(f(x))  # compile
  lats = []
  for _ in range(5):
    t0 = time.time()
    jax.block_until_ready(f(x))
    lats.append(time.time() - t0)
  print(f'tiny dispatch roundtrip: {sorted(lats)} s')

  # 3/4. the real batches
  rng = np.random.default_rng(0)
  rows = rng.integers(
      0, 3, size=(batch_size, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  nbytes = sum(
      v.nbytes
      for v in __import__(
          'deepconsensus_tpu.models.data', fromlist=['data']
      ).compact_from_rows(rows, params).values()
  )
  print(f'compact batch payload: {nbytes/1e6:.2f} MB')

  h = runner.predict_async(rows)  # compile + warm
  runner.collect(h)

  t0 = time.time()
  handles = [runner.predict_async(rows) for _ in range(4)]
  t_enq = time.time() - t0
  for h in handles:
    runner.collect(h)
  t_all = time.time() - t0
  print(f'serial dispatch x4: enqueue {t_enq:.3f}s, total {t_all:.3f}s')

  t0 = time.time()
  with concurrent.futures.ThreadPoolExecutor(4) as ex:
    handles = list(ex.map(lambda _: runner.predict_async(rows), range(4)))
  t_enq = time.time() - t0
  for h in handles:
    runner.collect(h)
  t_all = time.time() - t0
  print(f'threaded dispatch x4: enqueue {t_enq:.3f}s, total {t_all:.3f}s')

  # repeat serial to control for phase drift
  t0 = time.time()
  handles = [runner.predict_async(rows) for _ in range(4)]
  t_enq = time.time() - t0
  for h in handles:
    runner.collect(h)
  t_all = time.time() - t0
  print(f'serial dispatch x4 (2nd): enqueue {t_enq:.3f}s, total {t_all:.3f}s')


if __name__ == '__main__':
  main()
