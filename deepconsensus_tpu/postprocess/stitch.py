"""Window stitching, filtering, and FASTQ formatting.

Behavioral contract: reference `deepconsensus/postprocess/stitch_utils.py`.
"""

import dataclasses
import logging
from typing import Iterable, Optional, Tuple

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.utils import phred

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class DCModelOutput:
  """One window's predicted sequence + qualities (stitch_utils.py:39-48)."""

  molecule_name: str
  window_pos: int
  ec: Optional[float] = None
  np_num_passes: Optional[int] = None
  rq: Optional[float] = None
  rg: Optional[str] = None
  sequence: Optional[str] = None
  quality_string: Optional[str] = None


@dataclasses.dataclass
class OutcomeCounter:
  """Terminal outcome per ZMW (stitch_utils.py:122-128)."""

  empty_sequence: int = 0
  only_gaps: int = 0
  failed_quality_filter: int = 0
  failed_length_filter: int = 0
  success: int = 0


def get_full_sequence(
    deepconsensus_outputs: Iterable[DCModelOutput],
    max_length: int,
    fill_n: bool = False,
) -> Tuple[Optional[str], str]:
  """Concatenates sorted windows; a gap in coverage aborts (or fills N).

  (stitch_utils.py:51-81)
  """
  sequence_parts = []
  quality_parts = []
  start = 0
  for dc_output in deepconsensus_outputs:
    while dc_output.window_pos > start:
      if not fill_n:
        return None, ''
      sequence_parts.append('N' * max_length)
      quality_parts.append(
          phred.quality_scores_to_string(
              np.full(max_length, constants.EMPTY_QUAL)
          )
      )
      start += max_length
    sequence_parts.append(dc_output.sequence)
    quality_parts.append(dc_output.quality_string)
    start += max_length
  return ''.join(sequence_parts), ''.join(quality_parts)


def remove_gaps(sequence: str, quality_string: str) -> Tuple[str, str]:
  """Strips gap characters and their qualities (stitch_utils.py:84-98)."""
  seq = np.frombuffer(sequence.encode('ascii'), dtype=np.uint8)
  qual = np.frombuffer(quality_string.encode('ascii'), dtype=np.uint8)
  keep = seq != ord(constants.GAP)
  return (
      seq[keep].tobytes().decode('ascii'),
      qual[keep].tobytes().decode('ascii'),
  )


def is_quality_above_threshold(quality_string: str, min_quality: int) -> bool:
  """Average-phred filter, rounded to 5 places (stitch_utils.py:101-109)."""
  scores = np.frombuffer(
      quality_string.encode('ascii'), dtype=np.uint8
  ).astype(np.int64) - 33
  rounded_avg = round(phred.avg_phred(scores), 5)
  return rounded_avg >= min_quality


def format_as_fastq(
    molecule_name: str, sequence: str, quality_string: str
) -> str:
  return f'@{molecule_name}\n{sequence}\n+\n{quality_string}\n'


def stitch_to_fastq(
    molecule_name: str,
    predictions: Iterable[DCModelOutput],
    max_length: int,
    min_quality: int,
    min_length: int,
    outcome_counter: OutcomeCounter,
) -> Optional[str]:
  """Stitch, filter, and emit one FASTQ record (stitch_utils.py:131-189)."""
  full_sequence, full_quality = get_full_sequence(
      deepconsensus_outputs=predictions, max_length=max_length
  )
  if not full_sequence:
    outcome_counter.empty_sequence += 1
    logger.debug('empty after stitching: %s', molecule_name)
    return None
  final_sequence, final_quality = remove_gaps(full_sequence, full_quality)
  if not final_sequence:
    outcome_counter.only_gaps += 1
    logger.debug('only gaps: %s', molecule_name)
    return None
  if not is_quality_above_threshold(final_quality, min_quality):
    outcome_counter.failed_quality_filter += 1
    logger.debug('below quality threshold: %s', molecule_name)
    return None
  if len(final_sequence) < min_length:
    outcome_counter.failed_length_filter += 1
    logger.debug('below length threshold: %s', molecule_name)
    return None
  outcome_counter.success += 1
  return format_as_fastq(molecule_name, final_sequence, final_quality)
