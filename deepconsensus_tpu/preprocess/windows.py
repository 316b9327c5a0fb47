"""Window tiling and feature-tensor assembly.

Reimplements the reference's `DcConfig`/`DcExample` featurization
(reference: preprocess/pre_lib.py:450-819) around a whole-ZMW feature
matrix: after spacing, the full (tensor_height, spaced_len) matrix is
assembled once with vectorized numpy, and each window is a column slice —
instead of building per-window Python Read objects as the reference does.
"""

import collections
import dataclasses
from typing import Any, Dict, Iterator, List, Optional, Tuple

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
        # ndarray passes straight to the vectorized varint encoder
        # (bit-identical to the int-list path; avoids a 100-int Python
        # list per window on the preprocess hot path).
        'ccs_base_quality_scores': ('int64', self.ccs_base_quality_scores),
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

    self._matrix = None  # built lazily; the transport fast path skips it

  @property
  def matrix(self) -> np.ndarray:
    if self._matrix is None:
      self._matrix = self._build_matrix()
    return self._matrix

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
      bq_src = self.ccs.base_quality_scores
      if len(bq_src) == data.shape[1]:
        data[cfg.indices('ccs_bq')] = bq_src
      else:
        # All-zero qualities stay UNSPACED (spacing's `if bq.any()` quirk
        # mirroring the reference); window the raw array over a -1 gap
        # sentinel row exactly as zmw_window_block does, instead of
        # crashing on the width mismatch.
        row = np.full(data.shape[1], -1, dtype=data.dtype)
        m = min(len(bq_src), data.shape[1])
        row[:m] = bq_src[:m]
        data[cfg.indices('ccs_bq')] = row
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
        tile = self.matrix[:, s:e]
      else:
        tile = np.zeros((cfg.tensor_height, width), dtype=constants.NP_DATA_TYPE)
        avail = self.matrix[:, s : min(e, self.width)]
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


@dataclasses.dataclass
class WindowBlock:
  """All of one ZMW's windows in device-transport (integer) layout.

  The inference fast path: featurization goes straight from the spaced
  reads to the integer arrays the ragged transport ships, never
  materializing the (tensor_height, width, 1) float32 tiles of the
  tf.Example contract. Values are small integers that the float32 tiles
  represent exactly, so casting back and forth is bit-preserving — the
  transport built from a block equals the one built from the dense tiles
  (tested in tests/test_window_block.py).
  """

  name: str
  num_passes: int  # keep_subreads (the per-window num_passes of every window)
  strand: np.ndarray  # (num_passes,) uint8
  sn: np.ndarray  # (4,) uint16, clipped to SN_MAX
  ec: Optional[float]
  np_num_passes: Optional[int]
  rq: Optional[float]
  rg: Optional[str]
  window_pos: np.ndarray  # (nw,) int64
  bases: np.ndarray  # (nw, num_passes, L) uint8 vocab ids
  pw: np.ndarray  # (nw, num_passes, L) uint8, clipped to PW_MAX
  ip: np.ndarray  # (nw, num_passes, L) uint8, clipped to IP_MAX
  ccs: np.ndarray  # (nw, L) uint8 vocab ids
  bq: np.ndarray  # (nw, L) int64 CCS base qualities, -1 pad

  @property
  def n_windows(self) -> int:
    return len(self.window_pos)


def _clipped_sn(sn, sn_max: Optional[int]) -> np.ndarray:
  """SN values through the dense path's dtype chain: f64 -> f32 -> clip -> u16."""
  vals = np.asarray(sn, np.float64).astype(np.float32)
  if sn_max:
    vals = np.clip(vals, 0, sn_max)
  return vals.astype(np.uint16)


def _pad_cols(values: np.ndarray, width: int, fill) -> np.ndarray:
  """Right-pads the last axis of `values` to `width` with `fill`."""
  out = np.full(values.shape[:-1] + (width,), fill, dtype=values.dtype)
  m = min(values.shape[-1], width)
  out[..., :m] = values[..., :m]
  return out


def zmw_window_block(
    reads: List[AlignedRead],
    name: str,
    cfg: DcConfig,
    pw_max: Optional[int] = 255,
    ip_max: Optional[int] = 255,
    sn_max: Optional[int] = 500,
) -> Tuple[WindowBlock, 'collections.Counter']:
  """Fused spacing + featurization: unspaced ZMW reads -> WindowBlock.

  Fixed-width inference windows only (no smart windows / training labels —
  those go through space_out_subreads + iter_windows). The spaced
  AlignedReads are never materialized: spacing.spaced_columns assigns each
  read position its output column and values scatter directly into the
  transport arrays, whose zero/-1 init is exactly the spaced gap fill
  (gap base == id 0, pw/ip 0, quality -1). Window selection, window_pos,
  counters, and every array value match the legacy chain bit-for-bit
  (tests/test_window_block.py).

  (reference behavior: pre_lib.py:1242-1276 spacing + 652-762 windowing)
  """
  from deepconsensus_tpu.preprocess import spacing

  counter = collections.Counter()
  L = cfg.max_length
  cols, _, _ = spacing.spaced_columns(reads)
  subs, ccs = reads[:-1], reads[-1]
  ccs_col = cols[-1]
  # Spaced width minus trailing gap columns (pre_lib.py:603-609): the last
  # CCS base's column + 1 (CCS columns are monotonically increasing).
  ccs_width = int(ccs_col[-1]) + 1 if ccs_col.size else 0
  k = min(cfg.max_passes, len(subs))
  subs = subs[:k]
  meta = dict(
      name=name,
      num_passes=k,
      strand=np.array([r.strand for r in subs], np.uint8),
      sn=_clipped_sn(subs[0].sn, sn_max),
      ec=ccs.ec,
      np_num_passes=ccs.np_num_passes,
      rq=ccs.rq,
      rg=ccs.rg,
  )
  n_win = -(-ccs_width // L) if ccs_width else 0
  if n_win == 0:
    z = np.zeros
    return WindowBlock(
        window_pos=z(0, np.int64), bases=z((0, k, L), np.uint8),
        pw=z((0, k, L), np.uint8), ip=z((0, k, L), np.uint8),
        ccs=z((0, L), np.uint8), bq=z((0, L), np.int64), **meta,
    ), counter
  counter[f'example_width_bucket_{L}'] += n_win
  W = n_win * L

  bases = np.zeros((k, W), np.uint8)
  pw = np.zeros((k, W), np.uint8)
  ip = np.zeros((k, W), np.uint8)
  sub_lens = np.array([len(r.bases) for r in subs], np.int64)
  sub_offs = np.zeros(k + 1, np.int64)
  np.cumsum(sub_lens, out=sub_offs[1:])
  from deepconsensus_tpu import native

  if not native.scatter_windows(
      np.concatenate(cols[:k]) if k else np.empty(0, np.int32),
      sub_offs,
      np.concatenate([r.bases for r in subs]),
      np.concatenate([r.pw for r in subs]),
      np.concatenate([r.ip for r in subs]),
      constants.BASE_TO_ID,
      bases, pw, ip,
  ):
    for i, r in enumerate(subs):
      c = cols[i]
      msk = c < W  # columns past the last window are never featurized
      if not msk.all():
        c = c[msk]
        bases[i, c] = constants.BASE_TO_ID[r.bases[msk]]
        pw[i, c] = r.pw[msk]
        ip[i, c] = r.ip[msk]
      else:
        bases[i, c] = constants.BASE_TO_ID[r.bases]
        pw[i, c] = r.pw
        ip[i, c] = r.ip
  if pw_max is not None and pw_max < 255:
    np.clip(pw, 0, pw_max, out=pw)
  if ip_max is not None and ip_max < 255:
    np.clip(ip, 0, ip_max, out=ip)

  cmsk = ccs_col < W
  cc = ccs_col[cmsk] if not cmsk.all() else ccs_col
  ccs_ids = np.zeros(W, np.uint8)
  ccs_ids[cc] = constants.BASE_TO_ID[ccs.bases[cmsk]]
  ccs_ids = ccs_ids.reshape(n_win, L)
  bq = np.full(W, -1, np.int64)
  bq_src = ccs.base_quality_scores
  if bq_src.size and bq_src.any():
    bq[cc] = bq_src[cmsk]
  elif bq_src.size:
    # All-zero qualities: spacing leaves them unspaced (the reference's
    # `if bq.any()` quirk), so the legacy path windows the raw array.
    m2 = min(W, len(bq_src))
    bq[:m2] = bq_src[:m2]
  bq = bq.reshape(n_win, L)

  ccs_idx = np.full(W, -1, np.int32)
  ccs_idx[cc] = ccs.ccs_idx[cmsk]
  ccs_idx = ccs_idx.reshape(n_win, L)
  sentinel = np.iinfo(np.int32).max
  window_pos = np.where(ccs_idx < 0, sentinel, ccs_idx).min(axis=1)
  valid = window_pos != sentinel
  n_valid = int(valid.sum())
  counter['n_examples_no_ccs_idx'] += n_win - n_valid
  counter['n_examples_skip_large_windows_keep'] += n_valid

  def windowed(a: np.ndarray) -> np.ndarray:
    # (k, W) -> (n_win, k, L), window-major rows (contiguous per window).
    w = np.ascontiguousarray(a.reshape(k, n_win, L).transpose(1, 0, 2))
    return w if n_valid == n_win else w[valid]

  if n_valid != n_win:
    window_pos, ccs_ids, bq = window_pos[valid], ccs_ids[valid], bq[valid]
  return WindowBlock(
      window_pos=window_pos,
      bases=windowed(bases),
      pw=windowed(pw),
      ip=windowed(ip),
      ccs=ccs_ids,
      bq=bq,
      **meta,
  ), counter


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
