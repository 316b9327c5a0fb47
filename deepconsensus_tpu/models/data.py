"""Input formatting: the row-layout contract between featurizer and model.

numpy implementation of the reference's tf.data-side example processing
(`reference: models/data_providers.py:116-304`): row slicing, PW/IP/SN
clipping, label gap removal, and fixed-shape batching for jit.
"""

import os
from typing import Any, Dict, Iterator, List, Optional

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import example_pb
from deepconsensus_tpu.models import configs


def format_rows(subreads: np.ndarray, params) -> np.ndarray:
  """Clips PW/IP/SN rows and re-concatenates (data_providers.py:128-184)."""
  (
      base_idx,
      pw_idx,
      ip_idx,
      strand_idx,
      ccs_idx,
      ccs_bq_idx,
      sn_idx,
  ) = configs.get_indices(params.max_passes, params.use_ccs_bq)
  base_rows = subreads[slice(*base_idx)]
  pw_rows = subreads[slice(*pw_idx)]
  ip_rows = subreads[slice(*ip_idx)]
  strand_rows = subreads[slice(*strand_idx)]
  ccs_rows = subreads[slice(*ccs_idx)]
  ccs_bq_rows = subreads[slice(*ccs_bq_idx)]
  sn_rows = subreads[slice(*sn_idx)]
  if params.PW_MAX:
    pw_rows = np.clip(pw_rows, 0, params.PW_MAX)
  if params.IP_MAX:
    ip_rows = np.clip(ip_rows, 0, params.IP_MAX)
  if params.SN_MAX:
    sn_rows = np.clip(sn_rows, 0, params.SN_MAX)
  feats = [base_rows, pw_rows, ip_rows, strand_rows, ccs_rows]
  if params.use_ccs_bq:
    feats.append(ccs_bq_rows)
  feats.append(sn_rows)
  rows = np.concatenate(feats, axis=0)
  assert rows.shape[0] == params.total_rows
  return rows


def remove_internal_gaps_and_shift(label: np.ndarray) -> np.ndarray:
  """Left-shifts non-gap label tokens (data_providers.py:116-125)."""
  # reshape(-1), not squeeze: squeeze collapses a length-1 label to 0-d
  # and the slice assignment below would raise IndexError.
  label = np.asarray(label).reshape(-1)
  keep = label[label != constants.GAP_INT]
  out = np.zeros_like(label)
  out[: len(keep)] = keep
  return out


def format_rows_batch(subreads: np.ndarray, params) -> np.ndarray:
  """format_rows over a stacked (n, R, L[, 1]) block in one numpy pass.

  One clip+concat for the whole block instead of per-example calls — the
  vectorization that lets input-pipeline workers format a records chunk
  at memory bandwidth (equivalence-tested vs format_rows).
  """
  (
      base_idx,
      pw_idx,
      ip_idx,
      strand_idx,
      ccs_idx,
      ccs_bq_idx,
      sn_idx,
  ) = configs.get_indices(params.max_passes, params.use_ccs_bq)

  def rows(idx):
    return subreads[:, idx[0] : idx[1]]

  pw_rows = rows(pw_idx)
  ip_rows = rows(ip_idx)
  sn_rows = rows(sn_idx)
  if params.PW_MAX:
    pw_rows = np.clip(pw_rows, 0, params.PW_MAX)
  if params.IP_MAX:
    ip_rows = np.clip(ip_rows, 0, params.IP_MAX)
  if params.SN_MAX:
    sn_rows = np.clip(sn_rows, 0, params.SN_MAX)
  feats = [rows(base_idx), pw_rows, ip_rows, rows(strand_idx), rows(ccs_idx)]
  if params.use_ccs_bq:
    feats.append(rows(ccs_bq_idx))
  feats.append(sn_rows)
  out = np.concatenate(feats, axis=1)
  assert out.shape[1] == params.total_rows
  return out


def format_rows_is_identity(n_raw_rows: int, params) -> bool:
  """True when format_rows' slice+concat reproduces the input layout.

  Holds for on-disk examples written with the same DcConfig (the feature
  slices are consecutive and cover all rows in order) — then formatting
  reduces to clipping PW/IP/SN in place, no 4-byte-per-cell copy.
  """
  idx = configs.get_indices(params.max_passes, params.use_ccs_bq)
  order = [idx[0], idx[1], idx[2], idx[3], idx[4]]
  if params.use_ccs_bq:
    order.append(idx[5])
  order.append(idx[6])
  pos = 0
  for lo, hi in order:
    if lo != pos:
      return False
    pos = hi
  return pos == n_raw_rows == params.total_rows


def format_rows_batch_inplace(subreads: np.ndarray, params) -> np.ndarray:
  """Clips PW/IP/SN rows of an identity-layout block in place.

  Only valid when format_rows_is_identity(...) — asserted. Returns the
  same array (now formatted), saving the full-block copy of
  format_rows_batch.
  """
  assert format_rows_is_identity(subreads.shape[1], params)
  idx = configs.get_indices(params.max_passes, params.use_ccs_bq)
  for (lo, hi), cap in (
      (idx[1], params.PW_MAX),
      (idx[2], params.IP_MAX),
      (idx[6], params.SN_MAX),
  ):
    if cap:
      np.clip(subreads[:, lo:hi], 0, cap, out=subreads[:, lo:hi])
  return subreads


def remove_internal_gaps_and_shift_batch(labels: np.ndarray) -> np.ndarray:
  """Vectorized left-shift of non-gap tokens over a (n, L) label block."""
  labels = labels.reshape(labels.shape[0], -1)
  mask = labels != constants.GAP_INT
  # Stable argsort of the gap mask moves non-gaps left, preserving order.
  order = np.argsort(~mask, axis=1, kind='stable')
  shifted = np.take_along_axis(labels, order, axis=1)
  counts = mask.sum(axis=1, keepdims=True)
  cols = np.arange(labels.shape[1])[None, :]
  return np.where(cols < counts, shifted, 0).astype(labels.dtype)


def parse_example_bytes(
    buf: bytes, inference: bool = False, max_length: int = 100
) -> Dict[str, Any]:
  """Decodes one serialized example into arrays (data_providers.py:226-297)."""
  ex = example_pb.decode_example(buf)
  shape = ex['subreads/shape'][1]
  subreads = np.frombuffer(ex['subreads/encoded'][1][0], np.float32).reshape(
      shape
  )
  out = {
      'subreads': subreads,
      'subreads/shape': shape,
      'subreads/num_passes': int(ex['subreads/num_passes'][1][0]),
      'name': ex['name'][1][0].decode(),
      'window_pos': int(ex['window_pos'][1][0]),
      'ccs_base_quality_scores': np.array(
          ex['ccs_base_quality_scores'][1], dtype=np.int64
      ),
  }
  if not inference:
    label = np.frombuffer(ex['label/encoded'][1][0], np.float32).reshape(
        ex['label/shape'][1]
    )
    out['label'] = label
  del max_length
  return out


def process_feature_dict(features: Dict[str, Any], params) -> Dict[str, Any]:
  """Formats one in-memory inference feature dict (data_providers.py:187-223)."""
  rows = format_rows(features['subreads'], params)
  return {
      'rows': rows,
      'label': np.array([]),
      'num_passes': features['subreads/num_passes'],
      'window_pos': features['window_pos'],
      'name': features['name'],
      'ccs_base_quality_scores': features['ccs_base_quality_scores'],
      'ec': features['ec'],
      'np_num_passes': features['np_num_passes'],
      'rq': features['rq'],
      'rg': features['rg'],
  }


def pass_bucket(num_passes: int, max_passes: int) -> int:
  """Smallest transport bucket covering a window's subread count."""
  for b in (max_passes // 4, max_passes // 2, (3 * max_passes) // 4):
    if b >= 1 and num_passes <= b:
      return b
  return max_passes


def batch_feature_dicts(
    feature_dicts: List[Dict[str, Any]],
    params,
    batch_size: int,
    bucket_passes: bool = False,
) -> Iterator[Dict[str, Any]]:
  """Stacks per-window dicts into dense batches (quick_inference.py:304-338).

  bucket_passes groups windows by pass-count bucket so each batch ships
  only the subread rows its windows actually use (batch['pass_limit']).
  """
  processed = [process_feature_dict(f, params) for f in feature_dicts]
  if bucket_passes:
    groups: Dict[int, List[Dict[str, Any]]] = {}
    for f in processed:
      b = pass_bucket(int(f['num_passes']), params.max_passes)
      groups.setdefault(b, []).append(f)
    ordered = sorted(groups.items())
  else:
    ordered = [(None, processed)]
  for pass_limit, group in ordered:
    for i in range(0, len(group), batch_size):
      chunk = group[i : i + batch_size]
      batch: Dict[str, Any] = {}
      for key in constants.DC_FEATURES:
        vals = [x[key] for x in chunk]
        if vals and key == 'rows':
          batch[key] = np.stack(vals)
        else:
          batch[key] = vals
      if pass_limit is not None:
        batch['pass_limit'] = pass_limit
      yield batch


# Flat-array capacity tiers for the ragged transport, in units of
# batch_size subread rows. Chosen so the padded flat size tracks the
# batch's MEAN pass count (typical HiFi data: ~8-14 passes) while keeping
# the number of distinct compiled shapes small (the persistent compile
# cache amortizes each tier to one compile ever).
RAGGED_ROW_TIERS = (4, 6, 8, 10, 12, 14, 16, 18, 20)

# pw/ip wire encoding: 4-bit codes (value, or 15 = escape) + a stream of
# full uint8 values for escaped positions. ~78% of real HiFi pw/ip values
# are < 15, so this roughly halves the dominant transport bytes. The
# escape stream capacity is a fixed fraction of the flat array so each row
# tier keeps a single compiled shape; batches whose escape rate exceeds it
# (never observed on real data; measured ~22%) fall back to plain uint8.
PWIP_ESC_FRAC = 0.30
PWIP_ESC_CODE = 15


def pwip_esc_capacity(cap_rows: int, length: int) -> int:
  """Escape-stream capacity (values) for a flat array of cap_rows x length."""
  cap = int(cap_rows * length * PWIP_ESC_FRAC)
  return -(-cap // 512) * 512


def nibble_escape_encode(
    flat_vals: np.ndarray,
) -> Optional[Dict[str, np.ndarray]]:
  """Encodes a (cap_rows, L) uint8 array as 4-bit codes + escape stream.

  Returns {'codes': (cap_rows, ceil(L/2)) uint8, 'esc': (esc_cap,) uint8}
  or None when the escape stream would overflow its fixed capacity (the
  caller then ships plain uint8). Decoding (device side:
  engine.decode_nibble_escape; numpy oracle: nibble_escape_decode) is
  exact for all uint8 inputs.
  """
  cap_rows, length = flat_vals.shape
  esc_cap = pwip_esc_capacity(cap_rows, length)
  mask = flat_vals >= PWIP_ESC_CODE
  esc_vals = flat_vals[mask]  # row-major flat order
  if len(esc_vals) > esc_cap:
    return None
  codes = np.where(mask, np.uint8(PWIP_ESC_CODE), flat_vals)
  esc = np.zeros(esc_cap, np.uint8)
  esc[: len(esc_vals)] = esc_vals
  return {'codes': pack_nibbles(codes), 'esc': esc}


def nibble_escape_decode(
    codes_packed: np.ndarray, esc: np.ndarray, length: int
) -> np.ndarray:
  """numpy inverse of nibble_escape_encode (oracle for the device decode)."""
  lo = codes_packed & np.uint8(0xF)
  hi = codes_packed >> 4
  codes = np.stack([lo, hi], axis=-1).reshape(codes_packed.shape[0], -1)
  codes = codes[:, :length]
  flat = codes.reshape(-1).astype(np.int64)
  mask = flat == PWIP_ESC_CODE
  idx = np.cumsum(mask) - 1
  vals = np.where(mask, esc[np.clip(idx, 0, len(esc) - 1)], flat)
  return vals.reshape(codes.shape).astype(np.uint8)


def pack_nibbles(x: np.ndarray) -> np.ndarray:
  """Packs small-vocab uint8 ids (< 16) two per byte along the last axis."""
  if x.shape[-1] % 2:
    x = np.concatenate(
        [x, np.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1
    )
  return (x[..., 0::2] | (x[..., 1::2] << 4)).astype(np.uint8)


def pack_crumbs(x: np.ndarray) -> np.ndarray:
  """Packs 2-bit ids (< 4) four per byte along the last axis.

  Used for the per-window strand rows (values 0 pad / 1 fwd / 2 rev;
  reference: pre_lib.py Strand enum) — 4x fewer strand bytes on the wire.
  """
  pad = (-x.shape[-1]) % 4
  if pad:
    x = np.concatenate(
        [x, np.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
    )
  return (
      x[..., 0::4]
      | (x[..., 1::4] << 2)
      | (x[..., 2::4] << 4)
      | (x[..., 3::4] << 6)
  ).astype(np.uint8)


def unpack_crumbs(packed: np.ndarray, length: int) -> np.ndarray:
  """numpy inverse of pack_crumbs (oracle for engine.unpack_crumbs)."""
  vals = [(packed >> (2 * i)) & 3 for i in range(4)]
  out = np.stack(vals, axis=-1).reshape(packed.shape[:-1] + (-1,))
  return out[..., :length].astype(np.uint8)


def pack_base3(x: np.ndarray) -> np.ndarray:
  """Packs base-vocab ids (< 5) three per byte (v0 + 5*v1 + 25*v2)."""
  pad = (-x.shape[-1]) % 3
  if pad:
    x = np.concatenate(
        [x, np.zeros(x.shape[:-1] + (pad,), x.dtype)], axis=-1
    )
  xi = x.astype(np.uint16)
  return (
      xi[..., 0::3] + 5 * xi[..., 1::3] + 25 * xi[..., 2::3]
  ).astype(np.uint8)


def unpack_base3(packed: np.ndarray, length: int) -> np.ndarray:
  """numpy inverse of pack_base3 (oracle for the device unpack)."""
  v0 = packed % 5
  v1 = (packed // 5) % 5
  v2 = packed // 25
  out = np.stack([v0, v1, v2], axis=-1).reshape(
      packed.shape[:-1] + (3 * packed.shape[-1],)
  )
  return out[..., :length].astype(np.uint8)


def pack_base12(x: np.ndarray) -> np.ndarray:
  """Packs base-vocab ids (< 5) five per 12 bits (5^5 = 3125 <= 2^12).

  2.4 bits/id vs pack_base3's 2.67 — 11% fewer base bytes on the wire.
  Layout: groups of 5 ids combine base-5 into a 12-bit word; word pairs
  pack little-endian into 3 bytes. The trailing partial group pads with 0.
  """
  lp = (-x.shape[-1]) % 10
  if lp:
    x = np.concatenate([x, np.zeros(x.shape[:-1] + (lp,), x.dtype)], axis=-1)
  v = x.astype(np.uint16).reshape(x.shape[:-1] + (-1, 5))
  g = v[..., 0] + 5 * v[..., 1] + 25 * v[..., 2] + 125 * v[..., 3] + (
      625 * v[..., 4]
  )
  g = g.reshape(g.shape[:-1] + (-1, 2))
  b0 = g[..., 0] & 0xFF
  b1 = (g[..., 0] >> 8) | ((g[..., 1] & 0xF) << 4)
  b2 = g[..., 1] >> 4
  return np.stack([b0, b1, b2], axis=-1).astype(np.uint8).reshape(
      x.shape[:-1] + (-1,)
  )


def unpack_base12(packed: np.ndarray, length: int) -> np.ndarray:
  """numpy inverse of pack_base12 (oracle for the device unpack)."""
  b = packed.reshape(packed.shape[:-1] + (-1, 3)).astype(np.uint16)
  g0 = b[..., 0] | ((b[..., 1] & 0xF) << 8)
  g1 = (b[..., 1] >> 4) | (b[..., 2] << 4)
  out = np.empty(g0.shape[:-1] + (g0.shape[-1], 10), np.uint16)
  for i, g in ((0, g0), (5, g1)):
    out[..., i + 0] = g % 5
    out[..., i + 1] = (g // 5) % 5
    out[..., i + 2] = (g // 25) % 5
    out[..., i + 3] = (g // 125) % 5
    out[..., i + 4] = g // 625
  out = out.reshape(packed.shape[:-1] + (-1,))
  return out[..., :length].astype(np.uint8)


def row_index_from_passes(p: np.ndarray, max_passes: int) -> np.ndarray:
  """(B, max_passes) flat-row gather indices from per-window pass counts.

  numpy oracle for the device-side expansion in engine.reconstruct_compact;
  valid because both transport producers fill flat rows window-major
  contiguously (flat row 0 is the zeros sentinel).
  """
  p = p.astype(np.int64)
  off = np.cumsum(p) - p
  j = np.arange(max_passes)
  return np.where(
      j[None, :] < p[:, None], 1 + off[:, None] + j[None, :], 0
  ).astype(np.int32)


def ragged_flat_capacity(n_rows: int, batch: int, max_passes: int) -> int:
  """Smallest flat-array tier (incl. the zeros sentinel row) >= n_rows."""
  for m in RAGGED_ROW_TIERS:
    cap = min(m, max_passes) * batch + 1
    if cap >= n_rows:
      return cap
  return max_passes * batch + 1


def ragged_from_rows(
    rows: np.ndarray, num_passes: List[int], params
) -> Dict[str, np.ndarray]:
  """Dense rows batch -> ragged device transport (minimum-byte encoding).

  The pass-bucketed compact transport still ships zero rows (every window
  padded to its bucket's pass ceiling) and fragments rounds into
  per-bucket partial batches. This encoding ships ONLY the subread rows
  that exist, in one flat array per feature, plus a (B, max_passes) index
  matrix; the device gathers rows back into the padded layout (row 0 of
  each flat array is an all-zeros sentinel that padding slots point at).
  Bases (vocab 5) additionally pack two ids per byte. Bit-identical to the
  dense path: gathered+unpacked integers equal the dense rows exactly, and
  zero rows embed to zeros either way (ScaledEmbedding masks id 0).

  rows: (B, total_rows, L, 1) float32 (already clipped by format_rows),
  possibly including all-zero padding windows (num_passes may be shorter
  than B; the tail is treated as zero-pass padding).
  """
  (
      base_idx,
      pw_idx,
      ip_idx,
      strand_idx,
      ccs_idx,
      ccs_bq_idx,
      sn_idx,
  ) = configs.get_indices(params.max_passes, params.use_ccs_bq)
  x = rows[..., 0]
  B, _, L = x.shape
  p = np.zeros(B, np.int64)
  p[: len(num_passes)] = np.minimum(
      np.asarray(num_passes, np.int64), params.max_passes
  )
  total = int(p.sum())
  # (window, subread-row) coordinates of every real row, batch-major.
  win = np.repeat(np.arange(B), p)
  row = np.arange(total) - np.repeat(np.cumsum(p) - p, p)

  cap = ragged_flat_capacity(total + 1, B, params.max_passes)
  flat_base_ids = np.zeros((cap, L), np.uint8)
  flat_base_ids[1 : total + 1] = x[win, base_idx[0] + row].astype(np.uint8)
  flat_pw = np.zeros((cap, L), np.uint8)
  flat_pw[1 : total + 1] = x[win, pw_idx[0] + row].astype(np.uint8)
  flat_ip = np.zeros((cap, L), np.uint8)
  flat_ip[1 : total + 1] = x[win, ip_idx[0] + row].astype(np.uint8)

  out = {
      # Flat rows are window-major contiguous, so the (B, max_passes)
      # gather-index matrix is fully determined by the per-window pass
      # count: row_index[w, j] = 1 + cumsum(p)[w-1] + j for j < p[w]
      # (row_index_from_passes / engine device decode). One uint8 per
      # window instead of max_passes uint16s.
      'passes': p.astype(np.uint8),
      'flat_bases12': pack_base12(flat_base_ids),
      'ccs12': pack_base12(x[:, ccs_idx[0]].astype(np.uint8)),
      'sn': x[:, slice(*sn_idx), 0].astype(np.uint16),
  }
  strand = x[:, strand_idx[0] : strand_idx[0] + params.max_passes, 0].astype(
      np.uint8
  )
  if strand.max(initial=0) < 4:
    out['strand2'] = pack_crumbs(strand)
  else:  # synthetic rows outside the {0: pad, 1: fwd, 2: rev} vocab
    out['strand'] = strand
  if params.use_ccs_bq:
    out['ccs_bq'] = x[:, ccs_bq_idx[0]].astype(np.int16)
  out.update(encode_pwip_transport(flat_base_ids, flat_pw, flat_ip))
  return out


def encode_pwip_transport(
    flat_base_ids: np.ndarray,
    flat_pw: np.ndarray,
    flat_ip: np.ndarray,
    trusted: bool = False,
) -> Dict[str, np.ndarray]:
  """Best eligible pw/ip encoding: gap-elided dense > spaced nibble > plain."""
  dense = dense_pwip_encode(flat_base_ids, flat_pw, flat_ip, trusted=trusted)
  if dense is not None:
    return dense
  return _encode_pwip(flat_pw, flat_ip)


def _encode_pwip(
    flat_pw: np.ndarray, flat_ip: np.ndarray
) -> Dict[str, np.ndarray]:
  """pw/ip wire encoding: nibble+escape, or plain uint8 on overflow.

  Both features use the same scheme so each row tier has exactly two
  possible transport signatures (encoded / fallback).
  """
  pw_enc = nibble_escape_encode(flat_pw)
  ip_enc = nibble_escape_encode(flat_ip) if pw_enc is not None else None
  if pw_enc is None or ip_enc is None:
    return {'flat_pw': flat_pw, 'flat_ip': flat_ip}
  return {
      'pw_codes': pw_enc['codes'],
      'pw_esc': pw_enc['esc'],
      'ip_codes': ip_enc['codes'],
      'ip_esc': ip_enc['esc'],
  }


# Gap-elided pw/ip transport: ~41% of spaced pw/ip values sit at gap columns
# (base id 0), where the featurizer writes exactly 0 (spacing inserts gaps
# into all three features together; reference: pre_lib.py space_out_subreads).
# Those zeros are fully determined by the bases row the device already has,
# so pw/ip ship as DENSE streams of non-gap values only (nibble+escape coded)
# and the device scatters them back through the base-gap mask — bit-exact,
# ~34% fewer pw/ip bytes on real HiFi data. The encoder VERIFIES the
# pw==ip==0-at-gaps invariant and falls back to the spaced encoding when any
# value violates it (synthetic inputs), so correctness never depends on it.
# Fine 0.025 steps across [0.45, 0.65] where real HiFi non-gap density lands
# (~0.51-0.585 measured on the bundled shard): the coarse 4-tier ladder left
# 6-11% of the dense-code stream as padding; this one leaves <2.5%. Each tier
# is a distinct wire layout/executable, but only the 2-3 tiers a shard's
# density actually hits ever compile, and the persistent compilation cache
# amortizes each to one compile ever.
DENSE_FRAC_TIERS = (
    0.45, 0.475, 0.50, 0.525, 0.55, 0.575, 0.60, 0.625, 0.65, 0.725, 0.80,
)
# Code widths the dense encoder may pick per feature per batch (w bits per
# value; value >= 2^w-1 escapes to a full-uint8 side stream whose capacity
# comes from a small tier ladder). On real HiFi data the dense escape rates
# are ~0.40 / ~0.13-0.17 / ~0.02-0.05 at 4/5/6 bits, so 5-bit usually wins
# (~0.79 bytes/value vs 0.95 for nibble+0.45-tier escapes); the host picks
# by EXACT byte count so any distribution gets its cheapest eligible width.
DENSE_WIDTHS = (4, 5, 6)
ESC_FRAC_TIERS = (
    0.025, 0.05, 0.075, 0.10, 0.125, 0.15, 0.175, 0.20, 0.25, 0.325, 0.45,
)


def dense_capacity(n: int, flat_values: int) -> Optional[int]:
  """Smallest dense-stream tier >= n (values), or None past the top tier."""
  for f in DENSE_FRAC_TIERS:
    cap = -(-int(flat_values * f) // 1024) * 1024
    if cap >= n:
      return cap
  return None


def esc_tier_capacity(cap: int, n_esc: int) -> Optional[int]:
  """Smallest escape-stream tier >= n_esc values, or None past the top."""
  for f in ESC_FRAC_TIERS:
    esc_cap = -(-int(cap * f) // 512) * 512
    if esc_cap >= n_esc:
      return esc_cap
  return None


def pack_bitcodes(x: np.ndarray, w: int) -> np.ndarray:
  """Packs a 1-D uint8 stream of w-bit codes (w in 4/5/6; len(x) % 8 == 0)."""
  if w == 4:
    return pack_nibbles(x)
  v = x.astype(np.uint16)
  if w == 6:
    v = v.reshape(-1, 4)
    b0 = (v[:, 0] | (v[:, 1] << 6)) & 0xFF
    b1 = ((v[:, 1] >> 2) | (v[:, 2] << 4)) & 0xFF
    b2 = ((v[:, 2] >> 4) | (v[:, 3] << 2)) & 0xFF
    return np.stack([b0, b1, b2], -1).astype(np.uint8).reshape(-1)
  assert w == 5, w
  v = v.reshape(-1, 8)
  b0 = (v[:, 0] | (v[:, 1] << 5)) & 0xFF
  b1 = ((v[:, 1] >> 3) | (v[:, 2] << 2) | (v[:, 3] << 7)) & 0xFF
  b2 = ((v[:, 3] >> 1) | (v[:, 4] << 4)) & 0xFF
  b3 = ((v[:, 4] >> 4) | (v[:, 5] << 1) | (v[:, 6] << 6)) & 0xFF
  b4 = ((v[:, 6] >> 2) | (v[:, 7] << 3)) & 0xFF
  return np.stack([b0, b1, b2, b3, b4], -1).astype(np.uint8).reshape(-1)


def unpack_bitcodes_np(packed: np.ndarray, w: int) -> np.ndarray:
  """numpy inverse of pack_bitcodes (oracle for engine.unpack_bitcodes)."""
  if w == 4:
    lo = packed & np.uint8(0xF)
    hi = packed >> 4
    return np.stack([lo, hi], -1).reshape(-1)
  if w == 6:
    b = packed.reshape(-1, 3)
    v0 = b[:, 0] & 63
    v1 = (b[:, 0] >> 6) | ((b[:, 1] & 15) << 2)
    v2 = (b[:, 1] >> 4) | ((b[:, 2] & 3) << 4)
    v3 = b[:, 2] >> 2
    return np.stack([v0, v1, v2, v3], -1).astype(np.uint8).reshape(-1)
  assert w == 5, w
  b = packed.reshape(-1, 5)
  v0 = b[:, 0] & 31
  v1 = (b[:, 0] >> 5) | ((b[:, 1] & 3) << 3)
  v2 = (b[:, 1] >> 2) & 31
  v3 = (b[:, 1] >> 7) | ((b[:, 2] & 15) << 1)
  v4 = (b[:, 2] >> 4) | ((b[:, 3] & 1) << 4)
  v5 = (b[:, 3] >> 1) & 31
  v6 = (b[:, 3] >> 6) | ((b[:, 4] & 7) << 2)
  v7 = b[:, 4] >> 3
  return (
      np.stack([v0, v1, v2, v3, v4, v5, v6, v7], -1)
      .astype(np.uint8)
      .reshape(-1)
  )


def _esc_counts(dense: np.ndarray) -> Dict[int, int]:
  """{width: count of values that escape at that width}, one bincount pass."""
  hist = np.bincount(dense, minlength=256)
  below = np.cumsum(hist)  # below[t] = count of values <= t
  n = len(dense)
  return {w: n - int(below[(1 << w) - 2]) for w in DENSE_WIDTHS}


def _select_width(n_escs: Dict[int, int], cap: int):
  """(width, esc_cap) minimizing wire bytes, deterministically.

  The choice is a pure function of the batch's escape histogram so both
  transport producers emit identical bytes for identical windows (pinned
  by tests/test_window_block.py). Each distinct (width, escape tier) pair
  is its own wire layout and compiled executable; the combination count
  is bounded by len(DENSE_WIDTHS) x len(ESC_FRAC_TIERS) per row tier and
  the persistent compilation cache amortizes each to one compile ever.
  """
  best = None
  for w in DENSE_WIDTHS:
    esc_cap = esc_tier_capacity(cap, n_escs[w])
    if esc_cap is None:
      continue
    cost = cap * w // 8 + esc_cap
    if best is None or cost < best[0]:
      best = (cost, w, esc_cap)
  if best is None:
    return None
  return best[1], best[2]


def _dense_code_encode(
    dense: np.ndarray, cap: int, w: int, esc_cap: Optional[int] = None
):
  """1-D w-bit+escape encoding of a dense value stream at fixed capacity."""
  th = np.uint8((1 << w) - 1)
  esc_vals = dense[dense >= th]
  if esc_cap is None:
    esc_cap = esc_tier_capacity(cap, len(esc_vals))
  if esc_cap is None or esc_cap < len(esc_vals):
    return None
  codes = np.zeros(cap, np.uint8)
  np.minimum(dense, th, out=codes[: len(dense)])  # values >= th -> escape
  esc = np.zeros(esc_cap, np.uint8)
  esc[: len(esc_vals)] = esc_vals
  return {'codes': pack_bitcodes(codes, w), 'esc': esc}


def dense_key_suffix(w: int) -> str:
  """Wire key suffix carrying the code width ('' keeps 4-bit legacy keys)."""
  return '' if w == 4 else str(w)


def _dense_streams(
    flat_base_ids: np.ndarray,
    flat_pw: np.ndarray,
    flat_ip: np.ndarray,
    trusted: bool = False,
):
  """(dense_pw, dense_ip) non-gap value streams, or None if ineligible.

  trusted=True skips the zeros-at-gaps invariant check: WindowBlock arrays
  hold it BY CONSTRUCTION (expand_clip_indent zero-fills pw/ip at deletion
  and padding columns, and zmw_window_block scatters into zero-init arrays
  whose untouched columns ARE the gaps; equality with the checked path is
  pinned by tests/test_window_block.py). ragged_from_rows takes arbitrary
  dense rows, so it must keep the check. Setting DC_TPU_CHECK_INVARIANTS=1
  (on in tests, off in benches) re-verifies the trusted path too and FAILS
  LOUDLY on violation — a future featurizer change that breaks the
  invariant must not silently ship corrupted pw/ip in the FASTQ.
  """
  nz = np.flatnonzero(flat_base_ids.reshape(-1))
  fpw = flat_pw.reshape(-1)
  fip = flat_ip.reshape(-1)
  dense_pw = fpw[nz]
  dense_ip = fip[nz]
  check = not trusted or os.environ.get(
      'DC_TPU_CHECK_INVARIANTS', ''
  ) not in ('', '0')
  if check:
    # Invariant: every nonzero pw/ip sits at a non-gap (nonzero base)
    # position — then and only then does the masked scatter round-trip.
    violated = np.count_nonzero(fpw) != np.count_nonzero(dense_pw) or (
        np.count_nonzero(fip) != np.count_nonzero(dense_ip)
    )
    if violated and trusted:
      raise ValueError(
          'zeros-at-gaps invariant violated on the trusted (builder) '
          'transport path: nonzero pw/ip found at gap columns. The '
          'featurizer no longer zero-fills gaps; gap-elided transport '
          'would corrupt output.'
      )
    if violated:
      return None
  return dense_pw, dense_ip


def dense_pwip_encode(
    flat_base_ids: np.ndarray,
    flat_pw: np.ndarray,
    flat_ip: np.ndarray,
    trusted: bool = False,
) -> Optional[Dict[str, np.ndarray]]:
  """Gap-elided pw/ip encoding, or None when ineligible (caller falls back).

  Returns {'pwd_codes[w]','pwd_esc[w]','ipd_codes[w]','ipd_esc[w]'} with the
  per-feature code width picked by exact byte count (sticky across batches,
  see _select_width); the dense order is row-major over the (cap_rows, L)
  flat layout restricted to non-gap positions, exactly what
  engine.reconstruct_compact's masked prefix-sum scatter reads back.
  Sharded builds use _encode_dense_shards instead, which coordinates one
  shared width/escape tier across all shards.
  """
  streams = _dense_streams(flat_base_ids, flat_pw, flat_ip, trusted=trusted)
  if streams is None:
    return None
  dense_pw, dense_ip = streams
  cap = dense_capacity(len(dense_pw), flat_pw.size)
  if cap is None:
    return None
  out = {}
  for name, dense in (('pwd', dense_pw), ('ipd', dense_ip)):
    sel = _select_width(_esc_counts(dense), cap)
    if sel is None:
      return None
    w, esc_cap = sel
    enc = _dense_code_encode(dense, cap, w, esc_cap=esc_cap)
    if enc is None:
      return None
    suf = dense_key_suffix(w)
    out[f'{name}_codes{suf}'] = enc['codes']
    out[f'{name}_esc{suf}'] = enc['esc']
  return out


def _encode_dense_shards(streams, cap: int):
  """Per-shard dense pw/ip encodings sharing one width + escape tier.

  streams: [(dense_pw, dense_ip)] per shard; all shards must emit the same
  transport signature, so the width/escape tier are chosen from the
  per-shard maxima. Returns a list of per-shard dicts, or None.
  """
  out = [dict() for _ in streams]
  for fi, name in ((0, 'pwd'), (1, 'ipd')):
    shard_escs = [_esc_counts(s[fi]) for s in streams]
    worst = {w: max(e[w] for e in shard_escs) for w in DENSE_WIDTHS}
    sel = _select_width(worst, cap)
    if sel is None:
      return None
    w, esc_cap = sel
    suf = dense_key_suffix(w)
    for d, s in zip(out, streams):
      enc = _dense_code_encode(s[fi], cap, w, esc_cap=esc_cap)
      if enc is None:
        return None
      d[f'{name}_codes{suf}'] = enc['codes']
      d[f'{name}_esc{suf}'] = enc['esc']
  return out


def dense_pwip_decode(
    flat_base_ids: np.ndarray,
    codes_packed: np.ndarray,
    esc: np.ndarray,
    w: int = 4,
) -> np.ndarray:
  """numpy inverse of dense_pwip_encode for one feature (device oracle)."""
  mask = flat_base_ids != 0
  codes = unpack_bitcodes_np(codes_packed, w)
  n = int(mask.sum())
  dense_codes = codes[:n].astype(np.int64)
  emask = dense_codes == (1 << w) - 1
  eidx = np.cumsum(emask) - 1
  dense = np.where(emask, esc[np.clip(eidx, 0, len(esc) - 1)], dense_codes)
  out = np.zeros(mask.shape, np.uint8)
  out[mask] = dense.astype(np.uint8)
  return out


class RaggedBatchBuilder:
  """Assembles one ragged transport batch from per-ZMW window segments.

  The transport-native featurization path: WindowBlock segments (already
  uint8, window-major) are appended until the batch is full, then build()
  emits exactly the dict ragged_from_rows would produce from the dense f32
  tiles of the same windows — same shapes (so the jitted forward is shared
  between both paths) and same bytes (tested in tests/test_window_block.py).
  """

  def __init__(self, params, batch_size: int):
    self.params = params
    self.batch_size = batch_size
    self._segments: List[Any] = []
    self.n = 0  # windows added so far

  @property
  def room(self) -> int:
    return self.batch_size - self.n

  def add_segment(self, block, i0: int, i1: int) -> None:
    """Appends windows [i0:i1) of a WindowBlock (views, no copies)."""
    if i1 <= i0:
      return
    self._segments.append((block, i0, i1))
    self.n += i1 - i0

  def _segment_rows(self, segments) -> int:
    max_passes = int(self.params.max_passes)
    return sum(
        (i1 - i0) * min(b.num_passes, max_passes) for b, i0, i1 in segments
    )

  def _split_segments(self, shard_windows: int, num_shards: int):
    """Splits the segment list into per-shard lists of equal window count."""
    shards: List[List[Any]] = [[] for _ in range(num_shards)]
    w = 0
    for block, i0, i1 in self._segments:
      while i0 < i1:
        s = w // shard_windows
        take = min(i1 - i0, (s + 1) * shard_windows - w)
        shards[s].append((block, i0, i0 + take))
        i0 += take
        w += take
    return shards

  def _assemble(self, segments, bpad: int, cap: int):
    """Fills one shard's arrays; returns (dict sans pw/ip, flat_pw, flat_ip)."""
    params = self.params
    L = int(params.max_length)
    max_passes = int(params.max_passes)
    flat_base_ids = np.zeros((cap, L), np.uint8)
    flat_pw = np.zeros((cap, L), np.uint8)
    flat_ip = np.zeros((cap, L), np.uint8)
    passes = np.zeros(bpad, np.uint8)
    strand = np.zeros((bpad, max_passes), np.uint8)
    sn = np.zeros((bpad, 4), np.uint16)
    ccs_ids = np.zeros((bpad, L), np.uint8)
    use_bq = bool(params.use_ccs_bq)
    ccs_bq = np.zeros((bpad, L), np.int16) if use_bq else None

    w0 = 0
    ofs = 0  # real rows filled so far (flat row 0 is the zeros sentinel)
    for block, i0, i1 in segments:
      nw = i1 - i0
      k = min(block.num_passes, max_passes)
      cnt = nw * k
      flat_base_ids[1 + ofs : 1 + ofs + cnt] = block.bases[
          i0:i1, :k
      ].reshape(cnt, L)
      flat_pw[1 + ofs : 1 + ofs + cnt] = block.pw[i0:i1, :k].reshape(cnt, L)
      flat_ip[1 + ofs : 1 + ofs + cnt] = block.ip[i0:i1, :k].reshape(cnt, L)
      passes[w0 : w0 + nw] = k
      strand[w0 : w0 + nw, :k] = block.strand[None, :k]
      sn[w0 : w0 + nw] = block.sn[None, :]
      ccs_ids[w0 : w0 + nw] = block.ccs[i0:i1]
      if use_bq:
        ccs_bq[w0 : w0 + nw] = block.bq[i0:i1].astype(np.int16)
      w0 += nw
      ofs += cnt

    out = {
        'flat_bases12': pack_base12(flat_base_ids),
        'passes': passes,
        # WindowBlock strand is {0: pad, 1: fwd, 2: rev} by construction
        # (preprocess/windows.py writes the BAM-flag strand enum), so the
        # 2-bit packing is always exact here.
        'strand2': pack_crumbs(strand),
        'ccs12': pack_base12(ccs_ids),
        'sn': sn,
    }
    if use_bq:
      out['ccs_bq'] = ccs_bq
    return out, flat_pw, flat_ip, flat_base_ids

  def build(self, num_shards: int = 1) -> Dict[str, np.ndarray]:
    params = self.params
    max_passes = int(params.max_passes)
    if num_shards == 1:
      bpad = padded_size(self.n, self.batch_size)
      total = self._segment_rows(self._segments)
      cap = ragged_flat_capacity(total + 1, bpad, max_passes)
      out, flat_pw, flat_ip, ids = self._assemble(self._segments, bpad, cap)
      # trusted: WindowBlock arrays hold zeros-at-gaps by construction
      # (see _dense_streams).
      out.update(
          encode_pwip_transport(ids, flat_pw, flat_ip, trusted=True)
      )
      return out

    # Sharded build: one independent transport per device, stacked on a
    # new leading axis that shard_map splits over the mesh. Each shard's
    # flat arrays are self-contained (window rows are batch-major, so a
    # contiguous window range owns a contiguous row range); all shards
    # share the max capacity tier so the stack is rectangular, and the
    # pw/ip escape encoding falls back for ALL shards if any overflows
    # (one transport signature per batch).
    bpad = padded_size(self.n, self.batch_size, multiple=num_shards)
    shard_windows = bpad // num_shards
    shard_segments = self._split_segments(shard_windows, num_shards)
    cap = max(
        ragged_flat_capacity(
            self._segment_rows(segs) + 1, shard_windows, max_passes
        )
        for segs in shard_segments
    )
    parts = [
        self._assemble(segs, shard_windows, cap) for segs in shard_segments
    ]
    # Gap-elided dense encoding first, with one dense tier + code width +
    # escape tier shared by all shards (one transport signature per batch);
    # spaced nibble next; plain uint8 last. Any shard falling back drops
    # ALL shards to the next tier.
    L = int(params.max_length)
    stream_list = [
        _dense_streams(ids, fp, fi, trusted=True)
        for _, fp, fi, ids in parts
    ]
    dense_encs = None
    if all(s is not None for s in stream_list):
      dcap = dense_capacity(max(len(s[0]) for s in stream_list), cap * L)
      if dcap is not None:
        dense_encs = _encode_dense_shards(stream_list, dcap)
    if dense_encs is not None:
      for (out, _, _, _), enc in zip(parts, dense_encs):
        out.update(enc)
    else:
      pw_encs = [nibble_escape_encode(fp) for _, fp, _, _ in parts]
      ip_encs = [nibble_escape_encode(fi) for _, _, fi, _ in parts]
      encoded = all(e is not None for e in pw_encs + ip_encs)
      for (out, flat_pw, flat_ip, _), pw_e, ip_e in zip(
          parts, pw_encs, ip_encs
      ):
        if encoded:
          out['pw_codes'], out['pw_esc'] = pw_e['codes'], pw_e['esc']
          out['ip_codes'], out['ip_esc'] = ip_e['codes'], ip_e['esc']
        else:
          out['flat_pw'], out['flat_ip'] = flat_pw, flat_ip
    dicts = [out for out, _, _, _ in parts]
    return {k: np.stack([d[k] for d in dicts]) for k in dicts[0]}


# ---------------------------------------------------------------------------
# Fused wire buffer: one uint8 array per transport batch.
#
# The ragged transport is a dict of ~9 small host arrays; a jit call uploads
# each argument as its own host->device transfer. When the chip sits behind a
# high-latency link, per-transfer overhead dominates over bandwidth, so the
# runner fuses each batch's transport into ONE flat uint8 buffer and the
# compiled forward rebuilds the fields with static slices (engine.unpack_wire)
# — bit-identical, 9x fewer transfers. The layout (field order, dtypes,
# shapes, offsets) is a hashable tuple derived only from the transport's
# shape signature, so the runner caches one compiled executable per layout
# (same cardinality as the existing per-tier jit cache).
# ---------------------------------------------------------------------------


def wire_layout(transport: Dict[str, np.ndarray]):
  """Static layout for a fused wire buffer: ((key, dtype, shape, offset)...).

  Deterministic field order (sorted keys); offsets are byte positions into
  the flat buffer. Returns (layout, total_bytes).
  """
  items = []
  off = 0
  for k in sorted(transport):
    v = transport[k]
    # engine.unpack_wire rebuilds fields with byte arithmetic for exactly
    # these widths; anything else must fail at pack time, not decode time.
    assert str(v.dtype) in (
        'uint8', 'uint16', 'int16', 'uint32', 'int32'
    ), (k, v.dtype)
    items.append((k, str(v.dtype), tuple(int(s) for s in v.shape), off))
    off += int(v.nbytes)
  return tuple(items), off


def wire_pack(
    transport: Dict[str, np.ndarray],
    out: Optional[np.ndarray] = None,
    offset: int = 0,
    layout_total=None,
):
  """Fuses a transport dict into one flat uint8 buffer. -> (buf, layout).

  With `out`, the fields pack straight into out[offset : offset+total]
  (and that view is returned) — the round-fused upload path uses this to
  assemble a whole round's batches in the final buffer with one copy
  instead of packing per-batch buffers and memcpying them again.
  layout_total: a precomputed wire_layout(transport) result to avoid a
  second layout walk on the per-round hot path.
  """
  layout, total = layout_total if layout_total is not None else wire_layout(
      transport
  )
  if out is None:
    buf = np.empty(total, np.uint8)
  else:
    buf = out[offset : offset + total]
  for k, _, _, off in layout:
    a = np.ascontiguousarray(transport[k])
    buf[off : off + a.nbytes] = a.view(np.uint8).reshape(-1)
  return buf, layout


def wire_unpack(buf: np.ndarray, layout) -> Dict[str, np.ndarray]:
  """numpy inverse of wire_pack (oracle for engine.unpack_wire)."""
  out = {}
  for k, dt, shape, off in layout:
    n = int(np.prod(shape, dtype=np.int64)) * np.dtype(dt).itemsize
    out[k] = buf[off : off + n].view(dt).reshape(shape).copy()
  return out


def compact_from_rows(
    rows: np.ndarray, params, pass_limit: Optional[int] = None
) -> Dict[str, np.ndarray]:
  """De-duplicates a dense rows batch into compact device-transport arrays.

  rows: (B, total_rows, L, 1) float32 (already clipped by format_rows).
  Returns uint8/uint16 integer features ~5.5x smaller than the dense f32
  tile; strand and SN are constant along the window in the dense layout so
  only one value per subread / per window is shipped.

  pass_limit truncates the per-subread features to the first pass_limit
  rows — exact whenever every window in the batch has at most that many
  subreads, because rows beyond a window's subread count are all-zero and
  embed to zero either way (the pass-bucketing transport optimization).
  """
  (
      base_idx,
      pw_idx,
      ip_idx,
      strand_idx,
      ccs_idx,
      ccs_bq_idx,
      sn_idx,
  ) = configs.get_indices(params.max_passes, params.use_ccs_bq)
  x = rows[..., 0]
  p = pass_limit if pass_limit is not None else params.max_passes

  def rows_of(idx):
    return x[:, idx[0] : idx[0] + p]

  out = {
      'bases': rows_of(base_idx).astype(np.uint8),
      'pw': rows_of(pw_idx).astype(np.uint8),
      'ip': rows_of(ip_idx).astype(np.uint8),
      'strand': x[:, strand_idx[0] : strand_idx[0] + p, 0].astype(np.uint8),
      'ccs': x[:, ccs_idx[0]].astype(np.uint8),
      'sn': x[:, slice(*sn_idx), 0].astype(np.uint16),
  }
  if params.use_ccs_bq:
    out['ccs_bq'] = x[:, ccs_bq_idx[0]].astype(np.int16)
  return out


def padded_size(
    n: int, batch_size: int, min_tier: int = 256, multiple: int = 1
) -> int:
  """Smallest power-of-two tier >= n (capped at batch_size).

  Bounds both the zero-padding waste of partial batches (important with
  pass-bucketed batching, where each bucket ends with a partial batch)
  and the number of compiled executables (log2 tiers). `multiple` rounds
  each tier up so sharded runners keep every batch divisible by the
  device count (e.g. tier 256 with 6 devices -> 258); batch_size itself
  must already satisfy the divisibility (ShardedModelRunner rounds it up).
  """
  if n >= batch_size:
    return batch_size
  tier = min(min_tier, batch_size)
  while tier < n:
    tier *= 2
  if multiple > 1:
    tier = -(-tier // multiple) * multiple
  return min(tier, batch_size)


def pad_batch(
    rows: np.ndarray, batch_size: int, multiple: int = 1
) -> np.ndarray:
  """Pads a partial batch to the next size tier with zeros."""
  n = rows.shape[0]
  target = padded_size(n, batch_size, multiple=multiple)
  if n == target:
    return rows
  padded = np.zeros((target,) + rows.shape[1:], dtype=rows.dtype)
  padded[:n] = rows
  return padded
