"""Window tiling and feature-tensor assembly.

Reimplements the reference's `DcConfig`/`DcExample` featurization
(reference: preprocess/pre_lib.py:450-819) around a whole-ZMW feature
matrix: after spacing, the full (tensor_height, spaced_len) matrix is
assembled once with vectorized numpy, and each window is a column slice —
instead of building per-window Python Read objects as the reference does.
"""

import collections
import dataclasses
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import example_pb
from deepconsensus_tpu.preprocess.reads import AlignedRead, GAP_BYTE
from deepconsensus_tpu.preprocess.spacing import space_out_subreads


class DcConfig:
  """Feature-row layout of model input examples.

  Rows: bases/pw/ip/strand x max_passes, 1 ccs row, optional ccs_bq row,
  4 sn rows (reference: pre_lib.py:450-528; the layout contract is mirrored
  by models/data_providers.py:61-113).
  """

  n_subread_features = ('bases', 'pw', 'ip', 'strand')

  def __init__(self, max_passes: int, max_length: int, use_ccs_bq: bool = False):
    self.max_passes = max_passes
    self.max_length = max_length
    self.use_ccs_bq = use_ccs_bq
    self.feature_rows = {
        'bases': max_passes,
        'pw': max_passes,
        'ip': max_passes,
        'strand': max_passes,
        'ccs': 1,
        'ccs_bq': 1 if use_ccs_bq else 0,
        'sn': 4,
    }
    self.feature_indices = {}
    i = 0
    for k, v in self.feature_rows.items():
      self.feature_indices[k] = slice(i, i + v)
      setattr(self, k, i)
      i += v

  def indices(self, feature: str, n_subreads: int = 0) -> slice:
    start = getattr(self, feature)
    if n_subreads:
      assert feature in DcConfig.n_subread_features
      return slice(start, start + min(n_subreads, self.max_passes))
    assert feature not in DcConfig.n_subread_features
    return slice(start, start + self.feature_rows[feature])

  @property
  def tensor_height(self) -> int:
    return sum(self.feature_rows.values())

  def to_dict(self) -> Dict[str, str]:
    return {
        'max_passes': str(self.max_passes),
        'max_length': str(self.max_length),
        'tensor_height': str(self.tensor_height),
        'tensor_width': str(self.max_length),
    }


def dc_config_from_shape(subreads_shape, use_ccs_bq: bool = False) -> DcConfig:
  """Recovers a DcConfig from an example tensor shape."""
  height, width, _ = subreads_shape
  fixed = 6 if use_ccs_bq else 5
  max_passes, rem = divmod(height - fixed, len(DcConfig.n_subread_features))
  if rem != 0:
    raise ValueError(f'Invalid subreads shape {subreads_shape!r}.')
  return DcConfig(max_passes, width, use_ccs_bq)


@dataclasses.dataclass
class WindowFeatures:
  """One window's model-input features (inference feature-dict contract)."""

  subreads: np.ndarray  # (tensor_height, width, 1) float32
  num_passes: int
  name: str
  window_pos: int
  ccs_base_quality_scores: np.ndarray
  overflow: bool
  ec: Optional[float]
  np_num_passes: Optional[int]
  rq: Optional[float]
  rg: Optional[str]
  label: Optional[np.ndarray] = None  # (max_length,) float32, training only

  def to_dict(self) -> Dict[str, Any]:
    """Matches reference DcExample.to_features_dict (pre_lib.py:746-762)."""
    return {
        'subreads': self.subreads,
        'subreads/num_passes': self.num_passes,
        'name': self.name,
        'window_pos': self.window_pos,
        'ccs_base_quality_scores': self.ccs_base_quality_scores,
        'overflow': self.overflow,
        'ec': self.ec,
        'np_num_passes': self.np_num_passes,
        'rq': self.rq,
        'rg': self.rg,
    }

  def to_example_bytes(self) -> bytes:
    """Serializes to a tf.train.Example (pre_lib.py:764-787)."""
    data = self.subreads
    feats = {
        'subreads/encoded': ('bytes', [data.tobytes()]),
        'subreads/shape': ('int64', list(data.shape)),
        'subreads/num_passes': ('int64', [self.num_passes]),
        'name': ('bytes', [self.name.encode()]),
        'window_pos': ('int64', [self.window_pos]),
        'ccs_base_quality_scores': (
            'int64',
            [int(x) for x in self.ccs_base_quality_scores],
        ),
    }
    if self.label is not None:
      feats['label/encoded'] = ('bytes', [self.label.tobytes()])
      feats['label/shape'] = ('int64', [self.label.shape[0]])
    return example_pb.encode_example(feats)


class ZmwStack:
  """A spaced ZMW: the whole-molecule feature matrix plus window iteration.

  Equivalent of the reference's DcExample (pre_lib.py:531-819), built once
  per ZMW.
  """

  def __init__(
      self,
      name: str,
      spaced_reads: List[AlignedRead],
      config: DcConfig,
      window_widths: Optional[np.ndarray] = None,
  ):
    self.name = name
    self.config = config
    self.window_widths = window_widths
    self.counter = collections.Counter()

    self.is_training = spaced_reads[-1].is_label
    if self.is_training:
      self.subreads = spaced_reads[:-2]
      self.ccs = spaced_reads[-2]
      self.label = spaced_reads[-1]
    else:
      self.subreads = spaced_reads[:-1]
      self.ccs = spaced_reads[-1]
      self.label = None

    self.width = len(self.ccs.bases)
    # Spaced width minus trailing gap columns (pre_lib.py:603-609).
    nongap = np.nonzero(self.ccs.bases != GAP_BYTE)[0]
    self.ccs_width = int(nongap[-1]) + 1 if nongap.size else 0

    self._matrix = self._build_matrix()

  @property
  def n_subreads(self) -> int:
    return len(self.subreads)

  @property
  def keep_subreads(self) -> int:
    return min(self.config.max_passes, self.n_subreads)

  def _build_matrix(self) -> np.ndarray:
    """Assembles the full (tensor_height, spaced_len) float32 matrix."""
    cfg = self.config
    L = self.width
    data = np.zeros((cfg.tensor_height, L), dtype=constants.NP_DATA_TYPE)
    n = self.keep_subreads
    kept = self.subreads[: cfg.max_passes]
    if n:
      bases = np.stack([r.bases for r in kept])
      data[cfg.indices('bases', n)] = constants.BASE_TO_ID[bases]
      data[cfg.indices('pw', n)] = np.stack([r.pw for r in kept])
      data[cfg.indices('ip', n)] = np.stack([r.ip for r in kept])
      strands = np.array([float(r.strand) for r in kept])
      data[cfg.indices('strand', n)] = strands[:, None]
    data[cfg.indices('ccs')] = constants.BASE_TO_ID[self.ccs.bases]
    if cfg.use_ccs_bq:
      data[cfg.indices('ccs_bq')] = self.ccs.base_quality_scores
    data[cfg.indices('sn')] = np.asarray(self.subreads[0].sn, dtype=np.float64)[
        :, None
    ]
    return data

  def calculate_windows(self) -> List[int]:
    """Window widths in spaced coordinates (pre_lib.py:625-650)."""
    max_length = self.config.max_length
    if self.window_widths is not None:
      # "Smart windows": convert CCS-base window widths to spaced widths by
      # walking non-gap columns (vectorized version of pre_lib.py:630-644).
      nongap_cum = np.cumsum(self.ccs.bases != GAP_BYTE)
      widths = []
      last_pos = 0
      for window_width in self.window_widths:
        base = nongap_cum[last_pos - 1] if last_pos else 0
        target = base + window_width
        # First spaced index where cumulative non-gap count reaches target.
        end = int(np.searchsorted(nongap_cum, target, side='left'))
        spaced_w = end + 1 - last_pos
        widths.append(spaced_w)
        last_pos += spaced_w
      if sum(widths) != self.ccs_width:
        raise ValueError(
            f'{self.name}: smart windows cover {sum(widths)} spaced columns, '
            f'expected {self.ccs_width}'
        )
      return widths
    n_windows = self.ccs_width // max_length
    if self.ccs_width % max_length:
      n_windows += 1
    return [max_length] * n_windows

  def iter_windows(self) -> Iterator[WindowFeatures]:
    """Yields per-window features (reference: iter_examples, pre_lib.py:652-697)."""
    self.counter = collections.Counter()
    cfg = self.config
    max_length = cfg.max_length
    start = 0
    for w in self.calculate_windows():
      self.counter[f'example_width_bucket_{w}'] += 1
      if start > self.ccs_width:
        break
      s, e = start, start + w
      start += w

      ccs_idx_win = self.ccs.ccs_idx[s:e]
      covered = ccs_idx_win[ccs_idx_win >= 0]
      if covered.size == 0:
        self.counter['n_examples_no_ccs_idx'] += 1
        continue
      window_pos = int(covered.min())

      label_enc = None
      if self.is_training:
        label_win = self.label.ccs_slice(int(covered.min()), int(covered.max()))
        if len(label_win) > max_length:
          adjusted = label_win.remove_gaps(max_length)
          if adjusted is None:
            self.counter['n_examples_label_overflow'] += 1
            continue
          self.counter['n_examples_adjusted_label'] += 1
          label_win = adjusted

      overflow = w > max_length
      if overflow:
        self.counter['n_examples_overflow'] += 1
        if self.is_training:
          continue
      else:
        self.counter['n_examples_skip_large_windows_keep'] += 1

      if self.is_training:
        label_enc = label_win.pad(max_length).bases_encoded

      width = max(w, max_length)
      if w >= width and e <= self.width:
        tile = self._matrix[:, s:e]
      else:
        tile = np.zeros((cfg.tensor_height, width), dtype=constants.NP_DATA_TYPE)
        avail = self._matrix[:, s : min(e, self.width)]
        tile[:, : avail.shape[1]] = avail
        # Constant rows (strand, sn) span the full padded width because the
        # reference repeats them after padding (pre_lib.py:707-742).
        n = self.keep_subreads
        tile[cfg.indices('strand', n), avail.shape[1] :] = np.array(
            [float(r.strand) for r in self.subreads[: cfg.max_passes]]
        )[:, None]
        tile[cfg.indices('sn')] = np.asarray(
            self.subreads[0].sn, dtype=np.float64
        )[:, None]
        if cfg.use_ccs_bq:
          tile[cfg.indices('ccs_bq'), avail.shape[1] :] = -1.0

      bq = np.full(width, -1, dtype=np.int64)
      bq_avail = self.ccs.base_quality_scores[s : min(e, self.width)]
      bq[: len(bq_avail)] = bq_avail

      yield WindowFeatures(
          subreads=np.ascontiguousarray(tile)[..., None],
          num_passes=self.keep_subreads,
          name=self.name,
          window_pos=window_pos,
          ccs_base_quality_scores=bq,
          overflow=overflow,
          ec=self.ccs.ec,
          np_num_passes=self.ccs.np_num_passes,
          rq=self.ccs.rq,
          rg=self.ccs.rg,
          label=label_enc,
      )


def subreads_to_zmw_stack(
    subreads: List[AlignedRead],
    ccs_seqname: str,
    dc_config: DcConfig,
    window_widths: Optional[np.ndarray] = None,
) -> ZmwStack:
  """Spaces out a ZMW's reads and builds the window generator.

  (reference: pre_lib.py:1370-1384)
  """
  spaced = space_out_subreads(subreads)
  return ZmwStack(
      name=ccs_seqname,
      spaced_reads=spaced,
      config=dc_config,
      window_widths=window_widths,
  )
