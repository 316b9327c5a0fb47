"""Closes the quality-calibration loop on the bundled toy model.

The reference ships a fitted linear calibration in its released
params.json (`dc_calibration="0,1.197654,-0.99781"`, reference
quality_calibration/calibration_lib.py:77-99, testdata/model/params.json),
produced by running inference calibration-free, aligning predictions to
truth, counting match/mismatch per predicted base quality
(calculate_baseq_calibration.py:112-478; insertions count as mismatch),
and fitting empirical ~ w*predicted + b.

This tool performs the same loop on the toy model using the bundled eval
split's labels as truth: the hard affine-gap alignment
(ops/alignment.alignment_metric — the same pbmm2-approximating scores the
reference's AlignmentMetric uses) stands in for the external pbmm2
aligner this zero-egress environment lacks. Per aligned prediction base:
match edges compare base identity, insertion edges count as mismatch,
deletion edges consume no prediction base — exactly the reference's
CIGAR-walk semantics.

Outputs:
  docs/toy_calibration.csv   — per-quality match/mismatch counts
  docs/toy_calibration.json  — fit summary
  (with --ship) models_out/toy_model/params.json gains dc_calibration

Run: DC_TPU_PLATFORM=cpu python tools/calibrate_toy_model.py [--ship]
"""

import argparse
import csv
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

import jax

if os.environ.get('DC_TPU_PLATFORM'):
  jax.config.update('jax_platforms', os.environ['DC_TPU_PLATFORM'])

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.ops import alignment
from deepconsensus_tpu.train import input_pipeline

TOY = os.path.join(_REPO, 'models_out', 'toy_model')


def collect_counts(ckpt_dir: str = TOY, limit: int = -1):
  """Streams the eval split; returns (match, mismatch) per quality 0..100."""
  params = configs.read_params_from_json(ckpt_dir)
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  latest = ckpt_lib.latest_checkpoint(ckpt_dir)
  payload = ckpt_lib.load_checkpoint(
      latest, {'variables': jax.device_get(variables)}
  )
  variables = payload['variables']

  options = engine.InferenceOptions(  # calibration-free Q chain
      max_length=params.max_length,
      example_height=params.total_rows,
      max_passes=params.max_passes,
  )
  assert not options.dc_calibration_values.enabled

  fwd = jax.jit(lambda v, rows: model.apply(v, rows, deterministic=True))
  metric = jax.jit(alignment.alignment_metric)

  match = np.zeros(101, np.int64)
  mismatch = np.zeros(101, np.int64)
  n = 0
  stream = input_pipeline.example_stream(
      params.eval_path, params, batch_size=64, shuffle_buffer=0,
      repeat=False, drop_remainder=False,
  )
  for rows, labels in stream:
    probs = np.asarray(fwd(variables, rows))
    _, paths, _ = jax.device_get(metric(labels, probs))
    ids = np.argmax(probs, -1)
    maxp = np.max(probs, -1)
    quals = engine.quality_scores_from_probs(maxp, options)
    for b in range(rows.shape[0]):
      pred_nongap = ids[b] != constants.GAP_INT
      pred = ids[b][pred_nongap]
      q = quals[b][pred_nongap]
      true = labels[b].astype(np.int64)
      true = true[true != constants.GAP_INT]
      p = paths[b]
      ii, jj = np.nonzero(p)
      for i, j, code in zip(ii, jj, p[ii, jj]):
        if code == 1:  # match edge: true[i-1] vs pred[j-1]
          if true[i - 1] == pred[j - 1]:
            match[q[j - 1]] += 1
          else:
            mismatch[q[j - 1]] += 1
        elif code in (2, 3):  # insertion: pred base absent from truth
          mismatch[q[j - 1]] += 1
    n += rows.shape[0]
    if limit > 0 and n >= limit:
      break
  return match, mismatch, n


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--ship', action='store_true',
                  help='write dc_calibration into the toy params.json')
  ap.add_argument('--limit', type=int, default=-1)
  args = ap.parse_args()

  match, mismatch, n = collect_counts(limit=args.limit)
  csv_path = os.path.join(_REPO, 'docs', 'toy_calibration.csv')
  with open(csv_path, 'w', newline='') as f:
    w = csv.writer(f)
    w.writerow(['baseq', 'total_match', 'total_mismatch'])
    for q in range(101):
      if match[q] + mismatch[q]:
        w.writerow([q, int(match[q]), int(mismatch[q])])
  print(f'wrote {csv_path} ({n} examples)')

  from tools import fit_calibration

  w_, b_, xs, ys = fit_calibration.fit(
      csv_path, threshold=0.0, min_observations=50
  )
  calib = f'0,{w_:.6f},{b_:.6f}'
  summary = {
      'examples': n,
      'calibration': calib,
      'w': w_,
      'b': b_,
      'bins_used': len(xs),
      'predicted_q': [float(x) for x in xs],
      'empirical_q': [round(float(y), 3) for y in ys],
  }
  out_json = os.path.join(_REPO, 'docs', 'toy_calibration.json')
  with open(out_json, 'w') as f:
    json.dump(summary, f, indent=2)
  print(json.dumps({k: summary[k] for k in
                    ('examples', 'calibration', 'bins_used')}))

  if args.ship:
    path = os.path.join(TOY, 'params.json')
    with open(path) as f:
      p = json.load(f)
    p['dc_calibration'] = calib
    with open(path, 'w') as f:
      json.dump(p, f, indent=2, sort_keys=True)
    print(f'shipped dc_calibration={calib} in {path}')


if __name__ == '__main__':
  main()
