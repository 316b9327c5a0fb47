"""Per-round stage timing for the streaming pipeline bench.

Runs the same stream as bench.bench_full_pipeline but prints, per round:
ingest (BAM decode), featurize, enqueue (triage+transport+dispatch), and
finish (collect wait + stitch + write) wall times, plus the end-to-end
rate. Diagnoses where pipeline time goes under the TPU tunnel's variable
latency (dispatch 0.3-45s swings).

Usage: timeout 540 python tools/bench_pipeline_diag.py [rounds] [lookahead]
"""

import collections
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main(rounds: int = 8, lookahead: int = 3):
  from deepconsensus_tpu.calibration import calibration as calibration_lib
  from deepconsensus_tpu.inference import engine
  from deepconsensus_tpu.postprocess import stitch
  from deepconsensus_tpu.preprocess import feeder, windows

  checkpoint = bench.ensure_checkpoint()
  batch_size = 2048
  runner, params = engine.load_model_for_inference(
      checkpoint, batch_size,
      param_overrides={'use_pallas_fused_encoder': True},
  )
  shard = bench.ensure_big_shard()
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
          params.get('dc_calibration', 'skip')
      ),
  )
  os.makedirs('/tmp/bench_out', exist_ok=True)
  outcome = stitch.OutcomeCounter()
  stats = collections.Counter()
  timing = engine.Timing()
  writer = engine.OutputWriter('/tmp/bench_out/diag.fastq', f'{shard}/ccs.bam')

  def read_shard_inputs():
    proc_feeder, _ = feeder.create_proc_feeder(
        subreads_to_ccs=f'{shard}/subreads_to_ccs.bam',
        ccs_bam=f'{shard}/ccs.bam',
        dc_config=dc_config,
        ins_trim=5,
    )
    return [(reads, zmw, cfg, ww) for reads, zmw, cfg, _, ww in proc_feeder()]

  in_flight = []
  stage = collections.defaultdict(list)

  def finish_one():
    st = in_flight.pop(0)
    t0 = time.time()
    engine.finish_round(st, runner, writer, options, outcome, timing)
    stage['finish'].append(time.time() - t0)
    return st.num_zmws

  # Warmup round pays compile.
  t0 = time.time()
  inputs = read_shard_inputs()
  feats, n_ex, n_sub = engine.featurize_round(inputs, 'w', stats, timing)
  in_flight.append(engine.enqueue_round(feats, runner, options, 'w', n_ex, n_sub))
  while in_flight:
    finish_one()
  print(f'warmup (compile) {time.time()-t0:.1f}s; {n_ex} windows/round')
  stage.clear()

  done = 0
  t_start = time.time()
  for r in range(rounds):
    t = time.time()
    inputs = read_shard_inputs()
    stage['ingest'].append(time.time() - t)
    t = time.time()
    feats, n_ex, n_sub = engine.featurize_round(inputs, str(r), stats, timing)
    stage['featurize'].append(time.time() - t)
    t = time.time()
    in_flight.append(
        engine.enqueue_round(feats, runner, options, str(r), n_ex, n_sub)
    )
    stage['enqueue'].append(time.time() - t)
    while len(in_flight) > lookahead:
      done += finish_one()
  while in_flight:
    done += finish_one()
  dt = time.time() - t_start
  writer.close()

  for k in ('ingest', 'featurize', 'enqueue', 'finish'):
    v = stage[k]
    print(
        f'{k:<10} n={len(v):<3} mean={sum(v)/len(v):6.3f}s '
        f'min={min(v):6.3f}s max={max(v):6.3f}s total={sum(v):7.2f}s'
    )
  print(f'rounds={rounds} zmws={done} wall={dt:.2f}s rate={done/dt:.2f} ZMW/s')


if __name__ == '__main__':
  main(
      int(sys.argv[1]) if len(sys.argv) > 1 else 8,
      int(sys.argv[2]) if len(sys.argv) > 2 else 3,
  )
