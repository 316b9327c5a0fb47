"""Filter FASTQ/BAM reads by average read quality.

Behavioral contract: reference
`deepconsensus/quality_calibration/filter_reads.py`.
"""

import logging
import math
from typing import Sequence

import numpy as np

from deepconsensus_tpu.io import bam, fastq

logger = logging.getLogger(__name__)


def avg_phred(base_qualities: Sequence[float]) -> float:
  """Probability-space mean phred (filter_reads.py:68-81)."""
  if base_qualities is None or not len(base_qualities):
    return 0
  q = np.asarray(base_qualities, dtype=np.float64)
  return -10 * math.log10(float(np.mean(10 ** (q / -10))))


def filter_bam_or_fastq_by_quality(
    input_seq: str, output_fastq: str, quality_threshold: int
) -> None:
  """Writes reads whose avg phred >= threshold to a FASTQ.

  BAM input uses the unrounded average; FASTQ input rounds to 5 places
  before comparing — both quirks preserved from the reference
  (filter_reads.py:105-115).
  """
  total_reads = 0
  total_above = 0
  with open(output_fastq, 'w') as out:
    if input_seq.endswith('.bam'):
      with bam.BamReader(input_seq) as reader:
        for read in reader:
          total_reads += 1
          phred = avg_phred(read.qual)
          if phred >= quality_threshold:
            total_above += 1
            qual_str = (
                (np.asarray(read.qual) + 33).astype(np.uint8).tobytes().decode()
            )
            out.write(f'@{read.qname}\n{read.seq}\n+\n{qual_str}\n')
    else:
      for name, seq, qual in fastq.read_fastq(input_seq):
        total_reads += 1
        scores = np.frombuffer(qual.encode(), np.uint8).astype(np.int64) - 33
        phred = round(avg_phred(scores), 5)
        if phred >= quality_threshold:
          total_above += 1
          out.write(f'@{name}\n{seq}\n+\n{qual}\n')
  logger.info('TOTAL READS IN INPUT: %d', total_reads)
  logger.info('TOTAL READS IN OUTPUT: %d', total_above)
  logger.info('TOTAL FILTERED READS: %d', total_reads - total_above)
