"""One-process TPU experiment: transport variants A/B on the streamed shard.

Featurizes the 50-ZMW shard once, then streams the SAME WindowBlocks through
the engine's round primitives under each transport configuration:

  spaced-multi : pre-wire behavior — spaced nibble pw/ip, one host->device
                 transfer per transport array (~9/batch)
  spaced-wire  : spaced nibble pw/ip fused into one uint8 buffer per batch
  dense-wire   : gap-elided dense pw/ip + fused wire buffer per batch
  dense-round  : dense + whole round behind ONE device_put (the default)

at one or more batch sizes. Prints one JSON line per (config, batch) with
rounds/s and mean run_model stage seconds. Single process = single chip
claim; run under `timeout` and leave the tunnel idle for 2-3 min before and
after (see CLAUDE.md).
"""

import collections
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deepconsensus_tpu.calibration import calibration as calibration_lib
from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.models import data
from deepconsensus_tpu.preprocess import feeder, windows

import bench

ROUNDS = int(os.environ.get('AB_ROUNDS', '6'))
BATCHES = [int(b) for b in os.environ.get('AB_BATCHES', '2048,4096').split(',')]
CONFIGS = os.environ.get(
    'AB_CONFIGS', 'spaced-multi,spaced-wire,dense-wire,dense-round'
)
# Round-size multiplier: replicate the featurized 50-ZMW block list k times
# so each streamed round carries 50*k ZMWs (the reference recommends
# --batch_zmws up to 1000; larger rounds amortize per-round RPCs).
COPIES = int(os.environ.get('AB_COPIES', '1'))


def featurize_blocks(params):
  shard = bench.ensure_big_shard()
  dc_config = windows.DcConfig(
      params.max_passes, params.max_length, params.use_ccs_bq
  )
  proc_feeder, _ = feeder.create_proc_feeder(
      subreads_to_ccs=f'{shard}/subreads_to_ccs.bam',
      ccs_bam=f'{shard}/ccs.bam', dc_config=dc_config, ins_trim=5,
  )
  inputs = [(reads, zmw, cfg, ww) for reads, zmw, cfg, _, ww in proc_feeder()]
  stats = collections.Counter()
  timing = engine.Timing()
  clips = engine.clip_maxima(params)
  blocks, n_ex, n_sub = engine.featurize_round_blocks(
      inputs, 'ab', stats, timing, clips
  )
  blocks = list(blocks) * COPIES
  return blocks, n_ex * COPIES, n_sub * COPIES, len(inputs) * COPIES


def run_config(runner, options, blocks, n_ex, n_sub, label, lookahead=2):
  """Streams ROUNDS rounds; collects device outputs (no stitch/FASTQ IO)."""
  dispatcher = engine.AsyncDispatcher()
  in_flight = []

  def drain(state):
    for handle in state.handles:
      runner.collect(handle)

  def finish_one():
    drain(in_flight.pop(0).result())

  # Warmup (compile) round.
  drain(engine.enqueue_round_blocks(blocks, runner, options, 'w', n_ex,
                                    n_sub))

  t0 = time.time()
  for r in range(ROUNDS):
    in_flight.append(
        dispatcher.submit(
            engine.enqueue_round_blocks, blocks, runner, options, str(r),
            n_ex, n_sub,
        )
    )
    while len(in_flight) > lookahead:
      finish_one()
  while in_flight:
    finish_one()
  return time.time() - t0


def main():
  checkpoint = bench.ensure_checkpoint()
  results = []
  for batch_size in BATCHES:
    runner, params = engine.load_model_for_inference(
        checkpoint, batch_size,
        param_overrides={
            'use_pallas_fused_encoder':
                os.environ.get('AB_FUSED', '1') == '1'
        },
    )
    dc_config = windows.DcConfig(
        params.max_passes, params.max_length, params.use_ccs_bq
    )
    options = engine.InferenceOptions(
        max_length=params.max_length,
        example_height=dc_config.tensor_height,
        max_passes=params.max_passes,
        min_quality=0,
        batch_size=batch_size,
        use_ccs_bq=params.use_ccs_bq,
        dc_calibration_values=calibration_lib.parse_calibration_string(
            'skip'
        ),
    )
    blocks, n_ex, n_sub, n_zmws = featurize_blocks(params)
    if os.environ.get('AB_D2H', 'full') == 'q8':
      # D2H-share experiment: return a device-computed uint8 quality
      # instead of the f32 max-probability (4x fewer result bytes;
      # ~3.3 MB/50-ZMW round). Throughput probe only — the real Q chain
      # stays on host for parity.
      import jax.numpy as jnp

      fwd = runner._forward_compact_fn

      def fwd_q8(variables, compact):
        ids, maxp = fwd(variables, compact)
        err = jnp.maximum(1.0 - maxp, 1e-10)
        q = jnp.clip(jnp.round(-10.0 * jnp.log10(err)), 0, 93)
        return ids, q.astype(jnp.uint8)

      runner._forward_compact_fn = fwd_q8
      runner._wire_jits = {}
    orig_dense = data.dense_pwip_encode
    orig_streams = data._dense_streams
    for config in CONFIGS.split(','):
      runner.wire_transport = config != 'spaced-multi'
      runner.round_upload = config.endswith('round')
      if config.startswith('spaced'):
        data.dense_pwip_encode = lambda *a, **k: None
        data._dense_streams = lambda *a, **k: None
      else:
        data.dense_pwip_encode = orig_dense
        data._dense_streams = orig_streams
      dt = run_config(runner, options, blocks, n_ex, n_sub, config)
      res = {
          'config': config,
          'batch_size': batch_size,
          'rounds': ROUNDS,
          'zmws_per_sec': round(ROUNDS * n_zmws / dt, 2),
          'sec_per_round': round(dt / ROUNDS, 3),
      }
      results.append(res)
      print(json.dumps(res), flush=True)
    data.dense_pwip_encode = orig_dense
    data._dense_streams = orig_streams
  print(json.dumps({'all': results}))


if __name__ == '__main__':
  main()
