"""cProfile the host featurize stage (no TPU needed).

Ingests the big-shard BAMs once, then profiles engine.featurize_round over
N repeats to expose the numpy hotspots inside spacing/iter_windows.

Usage: python tools/profile_featurize.py [repeats]
"""

import cProfile
import os
import pstats
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault('JAX_PLATFORMS', 'cpu')

import bench  # noqa: E402


def main(repeats: int = 3):
  import collections

  from deepconsensus_tpu.inference import engine
  from deepconsensus_tpu.preprocess import feeder, windows

  shard = bench.ensure_big_shard()
  dc_config = windows.DcConfig(20, 100, False)

  def read_shard_inputs():
    proc_feeder, _ = feeder.create_proc_feeder(
        subreads_to_ccs=f'{shard}/subreads_to_ccs.bam',
        ccs_bam=f'{shard}/ccs.bam',
        dc_config=dc_config,
        ins_trim=5,
    )
    return [(reads, zmw, cfg, ww) for reads, zmw, cfg, _, ww in proc_feeder()]

  inputs = read_shard_inputs()
  stats = collections.Counter()
  timing = engine.Timing()
  clips = (255, 255, 500)
  # Warm (page-fault amortization).
  engine.featurize_round(inputs, 'w', stats, timing)
  engine.featurize_round_blocks(inputs, 'w', stats, timing, clips)

  t0 = time.time()
  for r in range(repeats):
    engine.featurize_round(inputs, str(r), stats, timing)
  legacy_dt = time.time() - t0

  t0 = time.time()
  prof = cProfile.Profile()
  prof.enable()
  for r in range(repeats):
    engine.featurize_round_blocks(inputs, str(r), stats, timing, clips)
  prof.disable()
  dt = time.time() - t0
  n_zmws = len(inputs)
  print(f'legacy: {repeats} rounds x {n_zmws} ZMWs: {legacy_dt:.3f}s '
        f'({legacy_dt / repeats:.3f}s/round)')
  print(f'blocks: {repeats} rounds x {n_zmws} ZMWs: {dt:.3f}s '
        f'({dt / repeats:.3f}s/round)')
  p = pstats.Stats(prof)
  p.sort_stats('cumulative').print_stats(30)
  p.sort_stats('tottime').print_stats(25)


if __name__ == '__main__':
  main(int(sys.argv[1]) if len(sys.argv) > 1 else 3)
