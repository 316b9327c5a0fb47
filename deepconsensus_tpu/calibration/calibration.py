"""Linear base-quality calibration.

Behavioral contract: reference
`deepconsensus/quality_calibration/calibration_lib.py`.
"""

import dataclasses

import numpy as np


@dataclasses.dataclass
class QualityCalibrationValues:
  """Linear transform spec: q' = q*w + b above threshold (calibration_lib.py:35-49)."""

  enabled: bool
  threshold: float
  w: float
  b: float


def parse_calibration_string(calibration: str) -> QualityCalibrationValues:
  """Parses 'threshold,w,b' or the 'skip' sentinel (calibration_lib.py:52-74)."""
  if calibration == 'skip':
    return QualityCalibrationValues(enabled=False, threshold=0.0, w=1.0, b=0.0)
  parts = calibration.split(',')
  if len(parts) != 3:
    raise ValueError(
        'Malformed calibration string. Expected 3 values (or "skip"): '
        f'{calibration!r}'
    )
  return QualityCalibrationValues(
      enabled=True,
      threshold=float(parts[0]),
      w=float(parts[1]),
      b=float(parts[2]),
  )


def calibrate_quality_scores(
    quality_scores: np.ndarray, calibration_values: QualityCalibrationValues
) -> np.ndarray:
  """Applies the linear transform (calibration_lib.py:77-99)."""
  if calibration_values.threshold == 0:
    return quality_scores * calibration_values.w + calibration_values.b
  w_values = np.where(
      quality_scores > calibration_values.threshold, calibration_values.w, 1.0
  )
  b_values = np.where(
      quality_scores > calibration_values.threshold, calibration_values.b, 0.0
  )
  return quality_scores * w_values + b_values
