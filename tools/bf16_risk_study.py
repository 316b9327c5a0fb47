"""Is a FASTQ-safe bf16 hybrid viable? Measure it instead of guessing.

The proposal (VERDICT r2 #9): run the forward in bf16, flag windows whose
outputs sit too close to a decision boundary (argmax flip or rounded-Q
flip), and re-run only flagged windows in f32 — byte-identical output at
bf16 speed if flags are rare.

This tool quantifies the two flag rates on real golden windows:

* argmax risk: windows where the bf16/f32 top-2 logit margin is within
  k * max|Δlogit| of zero (k = safety factor);
* Q risk: windows where ANY position's continuous quality score (after
  the exact reference op chain: 1-p -> phred -> calibration -> clip)
  moves across a rounding boundary under a maxp perturbation of
  k * max|Δmaxp|.

A window is re-run if either flag fires, so the hybrid's speedup is
bounded by 1 / (1 - flagged_fraction + flagged_fraction * 2.33) in MXU
terms (bf16 ~3x f32 matmul passes on TPU).

Prints one JSON line with deviation stats and flagged fractions for
safety factors 1/2/4.

Usage: [DC_BF16_STUDY_N=203] python tools/bf16_risk_study.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
  import jax
  import jax.numpy as jnp

  from deepconsensus_tpu.calibration import calibration as calibration_lib
  from deepconsensus_tpu.inference import engine
  from deepconsensus_tpu.io import tfrecord
  from deepconsensus_tpu.models import configs, data
  from deepconsensus_tpu.models import model as model_lib

  n_examples = int(os.environ.get('DC_BF16_STUDY_N', '203'))
  ckpt = os.path.join(
      os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
      'models_out/toy_model',
  )
  testdata = os.environ.get(
      'DC_TPU_TESTDATA', '/root/reference/deepconsensus/testdata/human_1m'
  )

  params = configs.read_params_from_json(ckpt)
  configs.finalize_params(params)

  rows = []
  for rec in tfrecord.read_tfrecords(
      f'{testdata}/tf_examples/test/test.tfrecord.gz'
  ):
    ex = data.parse_example_bytes(rec)
    rows.append(data.format_rows(ex['subreads'][..., 0], params))
    if len(rows) >= n_examples:
      break
  rows = np.stack(rows)[..., None].astype(np.float32)
  B, _, L, _ = rows.shape

  runner, _ = engine.load_model_for_inference(ckpt, B)
  variables = runner.variables

  def logits_fn(dtype):
    model = model_lib.get_model(params, dtype=dtype)

    def fwd(rows_in):
      out = model.apply(
          variables, rows_in, deterministic=True,
          method='intermediate_outputs',
      )
      return out['logits'].astype(jnp.float32)

    return jax.jit(fwd)

  logits_f32 = np.asarray(logits_fn(jnp.float32)(rows))
  logits_bf16 = np.asarray(logits_fn(jnp.bfloat16)(rows))

  def softmax(x):
    e = np.exp(x - x.max(-1, keepdims=True))
    return e / e.sum(-1, keepdims=True)

  probs_a, probs_b = softmax(logits_f32), softmax(logits_bf16)
  ids_a, ids_b = probs_a.argmax(-1), probs_b.argmax(-1)
  maxp_a, maxp_b = probs_a.max(-1), probs_b.max(-1)

  # --- observed deviations ---
  top2_a = np.sort(logits_f32, axis=-1)
  margin_a = top2_a[..., -1] - top2_a[..., -2]  # (B, L) f32 top-2 margin
  dlogit = np.abs(logits_bf16 - logits_f32).max()
  dmaxp = np.abs(maxp_b - maxp_a).max()
  id_flips = int((ids_a != ids_b).sum())

  # Continuous Q chain (reference op order), calibration = v1.2 default
  # (the string make_ref_golden ships; the bundled toy params.json carries
  # no dc_calibration key, so without this default the boundary analysis
  # would silently run uncalibrated, unlike the production/golden path).
  from tools.oracle.make_ref_golden import DC_CALIBRATION

  calib = calibration_lib.parse_calibration_string(
      params.get('dc_calibration', DC_CALIBRATION)
  )

  class _Opt:
    dc_calibration_values = calib
    max_base_quality = 93

  def qchar(maxp):
    return engine.quality_scores_from_probs(
        np.asarray(maxp, np.float64).clip(0.0, 1.0), _Opt
    )

  q_b = qchar(maxp_b)
  q_a = qchar(maxp_a)
  qchar_flips = int((q_a != q_b).sum())

  out = {
      'metric': 'bf16_risk_study',
      'n_windows': int(B),
      'device_kind': jax.devices()[0].device_kind,
      'max_abs_dlogit': round(float(dlogit), 6),
      'max_abs_dmaxp': round(float(dmaxp), 6),
      'id_flips_positions': id_flips,
      'id_flip_windows': int((ids_a != ids_b).any(axis=1).sum()),
      'qchar_flips_positions': qchar_flips,
      'qchar_flip_windows': int((q_a != q_b).any(axis=1).sum()),
  }

  # --- risk-gate simulation at safety factors k = 1, 2, 4 ---
  for k in (1, 2, 4):
    eps_logit = k * dlogit
    eps_p = k * dmaxp
    argmax_risky = (margin_a <= 2 * eps_logit).any(axis=1)
    q_lo = qchar(maxp_b - eps_p)
    q_hi = qchar(maxp_b + eps_p)
    q_risky = (q_lo != q_hi).any(axis=1)
    flagged = argmax_risky | q_risky
    frac = float(flagged.mean())
    # bf16 matmuls are 1 MXU pass vs f32's ~3; re-running flagged windows
    # costs bf16 + f32 = 4/3 of an f32 run for that window.
    speedup = 3.0 / (1.0 + 3.0 * frac)
    out[f'flagged_fraction_k{k}'] = round(frac, 4)
    out[f'q_risky_fraction_k{k}'] = round(float(q_risky.mean()), 4)
    out[f'argmax_risky_fraction_k{k}'] = round(float(argmax_risky.mean()), 4)
    out[f'implied_mxu_speedup_k{k}'] = round(speedup, 2)

  print(json.dumps(out))


if __name__ == '__main__':
  main()
