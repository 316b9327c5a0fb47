"""Error-analysis and inspection helpers.

Equivalents of the reference's notebook/analysis utilities
(`reference: models/model_inference_transforms.py:35-79`,
`utils/colab_utils.py:47-159`) without TF: edit distance, homopolymer
content, example decoding/pretty-printing for window inspection.
"""

import itertools
from typing import List, Tuple

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.models import configs
from deepconsensus_tpu.utils import phred


def remove_gaps(seq: str) -> str:
  return seq.replace(constants.GAP, '')


def edit_distance(s1: str, s2: str) -> int:
  """Levenshtein distance over gap-stripped sequences.

  (reference: model_inference_transforms.py:35-70) — vectorized DP rows.
  """
  s1 = remove_gaps(s1)
  s2 = remove_gaps(s2)
  if len(s1) > len(s2):
    s1, s2 = s2, s1
  if not s1:
    return len(s2)
  a = np.frombuffer(s1.encode(), np.uint8)
  b = np.frombuffer(s2.encode(), np.uint8)
  prev = np.arange(len(a) + 1)
  for c2 in b:
    cur = np.empty_like(prev)
    cur[0] = prev[0] + 1
    # Substitution and deletion moves vectorize; the insertion move has a
    # left-to-right dependency resolved by the sequential pass below.
    sub = prev[:-1] + (a != c2)
    np.minimum(sub, prev[1:] + 1, out=sub)
    cur[1:] = sub
    for i in range(1, len(cur)):
      if cur[i] > cur[i - 1] + 1:
        cur[i] = cur[i - 1] + 1
    prev = cur
  return int(prev[-1])


def homopolymer_content(seq: str) -> float:
  """Fraction of bases inside runs of >= 3 (model_inference_transforms.py:72-79)."""
  seq = remove_gaps(seq).strip(constants.GAP)
  if not seq:
    return 0.0
  runs = [len(list(g)) for _, g in itertools.groupby(seq)]
  return round(sum(x for x in runs if x >= 3) / len(seq), 2)


def ints_to_bases(bases_row: np.ndarray) -> str:
  return phred.encoded_sequence_to_string(np.asarray(bases_row))


def convert_to_bases(
    rows: np.ndarray,
    label: np.ndarray,
    pred: np.ndarray,
    max_passes: int,
) -> Tuple[List[str], str, str]:
  """Decodes (rows, label, prediction) tensors into base strings.

  (reference: colab_utils.py:72-93) — empty subread rows are dropped.
  """
  rows = np.squeeze(np.asarray(rows))
  base_idx = configs.get_indices(max_passes, use_ccs_bq=False)[0]
  subread_rows = [rows[i] for i in range(*base_idx) if rows[i].sum() != 0]
  subread_bases = [ints_to_bases(r) for r in subread_rows]
  return (
      subread_bases,
      ints_to_bases(np.squeeze(np.asarray(label))),
      ints_to_bases(np.squeeze(np.asarray(pred))),
  )


def check_has_errors(label: str, pred: str) -> bool:
  return remove_gaps(label) != remove_gaps(pred)


def pretty_print_window(
    rows: np.ndarray,
    max_passes: int,
    label: np.ndarray = None,
    pred: np.ndarray = None,
) -> str:
  """Renders a window's subread stack (+CCS, label, prediction) as text."""
  rows = np.squeeze(np.asarray(rows))
  idx = configs.get_indices(max_passes, use_ccs_bq=False)
  lines = []
  for i in range(*idx[0]):
    if rows[i].sum() != 0:
      lines.append(f'subread {i:<3} >{ints_to_bases(rows[i])}')
  lines.append(f'{"ccs":<11} >{ints_to_bases(rows[idx[4][0]])}')
  if label is not None:
    lines.append(f'{"label":<11} >{ints_to_bases(np.squeeze(label))}')
  if pred is not None:
    lines.append(f'{"pred":<11} >{ints_to_bases(np.squeeze(pred))}')
  return '\n'.join(lines)
