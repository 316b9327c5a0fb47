"""Fits a linear quality-calibration ('threshold,w,b') from calibrate output.

The `calibrate` CLI counts matches/mismatches per predicted base quality;
this tool converts those to empirical phred values and least-squares fits
empirical ~ w * predicted + b over qualities above the threshold —
producing the calibration string consumed by `run --dc_calibration`
(the workflow the reference performs in its analysis notebook; shipped
v1.2 value: "0,1.197654,-0.99781").

Usage: python tools/fit_calibration.py calibration.csv [--threshold T]
"""

import argparse
import csv
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def empirical_phred(match: int, mismatch: int) -> float:
  total = match + mismatch
  if total == 0:
    return float('nan')
  if mismatch == 0:
    # Rule-of-three upper bound keeps zero-error bins finite.
    err = 1.0 / (total + 1)
  else:
    err = mismatch / total
  return -10.0 * math.log10(err)


def fit(csv_path: str, threshold: float, min_observations: int):
  rows = list(csv.DictReader(open(csv_path)))
  xs, ys, ws = [], [], []
  for row in rows:
    q = float(row['baseq'])
    match = int(row['total_match'])
    mismatch = int(row['total_mismatch'])
    total = match + mismatch
    if q <= threshold or total < min_observations:
      continue
    emp = empirical_phred(match, mismatch)
    if not math.isfinite(emp):
      continue
    xs.append(q)
    ys.append(emp)
    ws.append(total)
  if len(xs) < 2:
    raise SystemExit('not enough populated quality bins to fit')
  x = np.asarray(xs)
  y = np.asarray(ys)
  w = np.sqrt(np.asarray(ws, dtype=np.float64))
  A = np.stack([x * w, w], axis=1)
  coef, *_ = np.linalg.lstsq(A, y * w, rcond=None)
  return float(coef[0]), float(coef[1]), x, y


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('csv')
  ap.add_argument('--threshold', type=float, default=0.0)
  ap.add_argument('--min_observations', type=int, default=100)
  args = ap.parse_args()
  slope, bias, x, y = fit(args.csv, args.threshold, args.min_observations)
  resid = y - (slope * x + bias)
  print(f'fitted on {len(x)} bins, rms residual {float(np.sqrt((resid**2).mean())):.2f} phred')
  print(f'calibration string: {args.threshold:g},{slope:.6f},{bias:.5f}')


if __name__ == '__main__':
  main()
