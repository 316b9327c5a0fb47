"""Compares two FASTQ files: read sets, sequence identity, quality deltas.

Usage: python tools/compare_fastq.py A.fastq B.fastq
Exit 0 when sequences are identical and qualities match exactly.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deepconsensus_tpu.io import fastq
from deepconsensus_tpu.utils import analysis


def load(path):
  return {name.split()[0]: (seq, qual) for name, seq, qual in
          fastq.read_fastq(path)}


def main(path_a: str, path_b: str) -> int:
  a = load(path_a)
  b = load(path_b)
  only_a = sorted(set(a) - set(b))
  only_b = sorted(set(b) - set(a))
  if only_a:
    print(f'only in {path_a}: {len(only_a)} reads (e.g. {only_a[:3]})')
  if only_b:
    print(f'only in {path_b}: {len(only_b)} reads (e.g. {only_b[:3]})')

  identical = 0
  seq_equal_qual_diff = 0
  seq_diff = 0
  max_q_delta = 0
  for name in sorted(set(a) & set(b)):
    seq_a, qual_a = a[name]
    seq_b, qual_b = b[name]
    if seq_a == seq_b:
      if qual_a == qual_b:
        identical += 1
      else:
        seq_equal_qual_diff += 1
        qa = np.frombuffer(qual_a.encode(), np.uint8).astype(np.int32)
        qb = np.frombuffer(qual_b.encode(), np.uint8).astype(np.int32)
        max_q_delta = max(max_q_delta, int(np.abs(qa - qb).max()))
    else:
      seq_diff += 1
      ed = analysis.edit_distance(seq_a, seq_b)
      print(
          f'{name}: sequences differ '
          f'(len {len(seq_a)} vs {len(seq_b)}, edit distance {ed})'
      )
  print(
      f'common reads: {identical} identical, '
      f'{seq_equal_qual_diff} same-sequence/different-quality '
      f'(max Q delta {max_q_delta}), {seq_diff} different-sequence'
  )
  ok = not (only_a or only_b or seq_equal_qual_diff or seq_diff)
  print('IDENTICAL' if ok else 'DIFFERENT')
  return 0 if ok else 1


if __name__ == '__main__':
  sys.exit(main(sys.argv[1], sys.argv[2]))
