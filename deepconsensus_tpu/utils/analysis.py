"""Error-analysis and inspection helpers.

Equivalents of the reference's notebook/analysis utilities
(`reference: models/model_inference_transforms.py:35-79`,
`utils/colab_utils.py:47-159`) without TF: edit distance, homopolymer
content, example decoding/pretty-printing for window inspection.
"""

import glob
import itertools
from typing import Callable, List, Sequence, Tuple

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.models import configs
from deepconsensus_tpu.utils import phred

# ANSI highlight codes for terminal/notebook error displays
# (reference: colab_utils.py:39-42).
WRITE_NORMAL = '\x1b[0m'
WRITE_GREEN_BACKGROUND = '\x1b[102m'
WRITE_RED_BACKGROUND = '\x1b[101m'
WRITE_YELLOW_BACKGROUND = '\x1b[103m'

KMER_SIZE = 10


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
    print_aux: bool = False,
) -> str:
  """Renders a window's subread stack (+CCS, label, prediction) as text.

  With print_aux, also renders the PW/IP/strand rows per subread
  (reference: colab_utils.py:96-121 pretty_print_proto(print_aux=True)).
  """
  rows = np.squeeze(np.asarray(rows))
  idx = configs.get_indices(max_passes, use_ccs_bq=False)
  present = [i for i in range(*idx[0]) if rows[i].sum() != 0]
  lines = []
  for i in present:
    lines.append(f'subread {i:<3} >{ints_to_bases(rows[i])}')
  lines.append(f'{"ccs":<11} >{ints_to_bases(rows[idx[4][0]])}')
  if label is not None:
    lines.append(f'{"label":<11} >{ints_to_bases(np.squeeze(label))}')
  if pred is not None:
    lines.append(f'{"pred":<11} >{ints_to_bases(np.squeeze(pred))}')
  if print_aux:
    pw0, ip0, strand0 = idx[1][0], idx[2][0], idx[3][0]
    for title, base in (('PW', pw0), ('IP', ip0)):
      lines.append('')
      lines.append(f'{title}:')
      for i in present:
        vals = rows[base + (i - idx[0][0])]
        lines.append(''.join('%4d' % v for v in vals))
    lines.append('')
    lines.append('Strand:')
    for i in present:
      vals = rows[strand0 + (i - idx[0][0])]
      lines.append(''.join('%4d' % v for v in vals))
  return '\n'.join(lines)


def highlight_errors(label: str, pred: str) -> str:
  """Renders pred with per-position ANSI highlights against label.

  Green = match, red = substitution, yellow = length overhang. An
  inspection aid for the notebook workflow built on the reference's
  ANSI constants (colab_utils.py:39-42).
  """
  out = []
  for i, c in enumerate(pred):
    if i < len(label) and c == label[i]:
      out.append(WRITE_GREEN_BACKGROUND + c)
    elif i < len(label):
      out.append(WRITE_RED_BACKGROUND + c)
    else:
      out.append(WRITE_YELLOW_BACKGROUND + c)
  out.append(WRITE_NORMAL)
  return ''.join(out)


def get_prediction(
    apply_fn: Callable[[np.ndarray], np.ndarray], rows: np.ndarray
) -> Tuple[np.ndarray, np.ndarray]:
  """Runs a forward fn on rows, returning (probabilities, argmax ids).

  Functional-JAX equivalent of the reference's
  get_deepconsensus_prediction (colab_utils.py:53-59): apply_fn is any
  callable mapping a (B, rows, length, 1) batch to per-position softmax
  probabilities, e.g. a jitted partial of Model.apply or an inference
  ModelRunner's forward.
  """
  probs = np.asarray(apply_fn(rows))
  return probs, probs.argmax(axis=-1)


def get_results_df(
    experiments: Sequence[int], experiment_pattern: str, decimals: int = 5
):
  """Aggregates batch-eval inference.csv files into one DataFrame.

  (reference: colab_utils.py:124-152) — experiment_pattern contains '{}'
  filled with each experiment number and may glob; the last three path
  components identify the experiment/work-unit. Imports pandas lazily so
  the core package keeps its minimal dependency set.
  """
  import pandas as pd

  frames = []
  for experiment in experiments:
    for inference_csv in sorted(glob.glob(experiment_pattern.format(experiment))):
      n_rows = 2
      curr_df = pd.read_csv(inference_csv, nrows=n_rows)
      curr_df['experiment_and_work_unit'] = [
          '/'.join(inference_csv.split('/')[-3:-1])
      ] * len(curr_df)
      curr_df['dataset_type'] = 'eval'
      frames.append(curr_df)
  assert frames, f'no inference CSVs matched {experiment_pattern!r}'
  all_lines = pd.concat(frames, ignore_index=True)
  cols = all_lines.columns.tolist()
  reordered_columns = cols[-2:] + cols[1:-2] + [cols[0]]
  return all_lines[reordered_columns].round(decimals)


def get_results_df_compact(df):
  """Keeps only the headline columns (reference: colab_utils.py:155-159)."""
  cols_to_keep = [
      'dataset_type',
      'experiment_and_work_unit',
      'accuracy',
      'per_example_accuracy',
  ]
  return df[cols_to_keep]
