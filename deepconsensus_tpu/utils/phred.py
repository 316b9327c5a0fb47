"""Phred quality-score utilities (reference: deepconsensus/utils/utils.py)."""

from typing import List, Union

import numpy as np

from deepconsensus_tpu import constants


def encoded_sequence_to_string(encoded_sequence: np.ndarray) -> str:
  """Decodes an int-encoded sequence to an 'ATCG '-alphabet string."""
  ids = np.asarray(encoded_sequence).astype(np.intp)
  return constants.SEQ_VOCAB_BYTES[ids].tobytes().decode('ascii')


def string_to_encoded(seq: Union[str, bytes]) -> np.ndarray:
  """Encodes an 'ATCG '-alphabet string as float32 vocab ids."""
  if isinstance(seq, str):
    seq = seq.encode('ascii')
  b = np.frombuffer(seq, dtype=np.uint8)
  return constants.BASE_TO_ID[b].astype(constants.NP_DATA_TYPE)


def quality_score_to_string(score: int) -> str:
  return chr(score + 33)


def quality_scores_to_string(scores: np.ndarray) -> str:
  """Phred+33 encode an array of quality scores."""
  arr = (np.asarray(scores) + 33).astype(np.uint8)
  return arr.tobytes().decode('ascii')


def quality_string_to_array(quality_string: str) -> List[int]:
  return [ord(char) - 33 for char in quality_string]


def avg_phred(base_qualities: Union[np.ndarray, List[int]]) -> float:
  """Average phred quality of a read.

  Averages in probability space, ignoring negative sentinel values used for
  spacing (reference: utils.py:88-106).
  """
  base_qualities = np.asarray(base_qualities)
  base_qualities = base_qualities[base_qualities >= 0]
  if not base_qualities.any():
    return 0.0
  probs = 10 ** (base_qualities / -10.0)
  avg_prob = probs.sum() / len(probs)
  return -10 * np.log10(avg_prob)


def avg_phred_rows(base_qualities: np.ndarray) -> np.ndarray:
  """Row-wise avg_phred over a (n, L) quality block.

  Deliberately per-row rather than one masked 2-D sum: numpy's pairwise
  summation tree depends on element count, so summing with 0.0 fill for
  masked positions differs from the scalar version's filtered sum in the
  last ulp — enough to flip a threshold comparison in principle. Triage
  decisions must be bit-identical across engine paths.
  """
  bq = np.asarray(base_qualities)
  return np.array([avg_phred(row) for row in bq], dtype=np.float64)


def left_shift_seq(seq: np.ndarray) -> np.ndarray:
  """Moves all gaps in an encoded sequence to the right end."""
  return np.concatenate(
      [seq[seq != constants.GAP_INT], seq[seq == constants.GAP_INT]]
  )


def left_shift(batch_seq: np.ndarray, axis: int = 1) -> np.ndarray:
  """Batched left_shift_seq."""
  return np.apply_along_axis(left_shift_seq, axis, batch_seq)
