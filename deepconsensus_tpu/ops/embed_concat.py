"""Pallas TPU kernel: fused embedding lookups + feature concatenation.

The learned-values model embeds seven feature streams and concatenates
them per position before the condenser matmul (reference:
models/networks.py:444-514). On TPU the XLA formulation — per-feature
one-hot matmuls (N=8 → ~6% MXU lane utilization), big f32 transposes to
the (B, L, P*width) layout, and a materialized concat — costs ~12 ms of a
~66 ms forward at batch 2048 (tools/bench_stages.py, round 3/4). The
actual work is a table lookup: every embedded value is an exact row of a
tiny table (≤ 256×8 f32 once padded), so the whole stage is
bandwidth-bound at ~0.6 GB of output per 2048-batch.

This kernel produces the concatenated (B*L, D) tensor in ONE pass using
Mosaic's `tpu.dynamic_gather` (via jnp.take_along_axis) with full-vreg
lane tiles:

  * tables are pre-scaled, id-0-masked, padded to 256 rows, and
    lane-expanded OUTSIDE the kernel into (256, 128) "t16" operands where
    lane j holds column j//16 of the 8-wide table;
  * per 256-row tile, subread ids for 16 passes (256, 16) are
    lane-tile-repeated ×8 (`pltpu.repeat`) so lane j = r*16+p reads
    ids[:, p], one axis-0 dynamic_gather against t16 yields
    g[i, r*16+p] = eff[id, r], and one axis-1 dynamic_gather with the
    static permutation j -> (j%8)*16 + j//8 reorders lanes to the
    pass-major p*8+r layout the concat contract requires;
  * ccs / ccs_bq gathers and strand / sn row copies fill the small tail
    blocks, and a single store writes the (256, D) tile.

Every output value is an exact table row (or an exact XLA-computed strand/
sn row), so the result is BIT-IDENTICAL to the dense/compact embedding
paths — verified against them in tests/test_embed_concat.py and by the
golden FASTQ suite.
"""

import functools
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS = 256  # gather tiles are (256, lanes): 256 = padded table height
_CHUNK = 16  # passes per 128-lane gather chunk (16 passes × 8 widths)


def _gather16(ids16, t16):
  """ids16 (256, 16) int32, t16 (256, 128) -> (256, 128) embedded rows.

  Output lane j = p*8 + r holds eff_table[ids16[:, p], r].
  """
  idx = pltpu.repeat(ids16, 8, axis=1)  # lane j = r*16 + p -> ids[:, p]
  g = jnp.take_along_axis(t16, idx, axis=0, mode='promise_in_bounds')
  j = jax.lax.broadcasted_iota(jnp.int32, (_ROWS, 8 * _CHUNK), 1)
  perm = (j % 8) * _CHUNK + j // 8
  return jnp.take_along_axis(g, perm, axis=1, mode='promise_in_bounds')


def _feature_block(ids_ref, t16_ref, n_passes: int, max_passes: int):
  """All of one feature's subread lanes: (256, max_passes*8)."""
  pieces = []
  for start in range(0, n_passes, _CHUNK):
    width = min(_CHUNK, n_passes - start)
    ids = ids_ref[:, start : start + width]
    if width < _CHUNK:
      ids = jnp.pad(ids, ((0, 0), (0, _CHUNK - width)))
    full = _gather16(ids, t16_ref[:])
    pieces.append(full[:, : width * 8] if width < _CHUNK else full)
  if max_passes > n_passes:
    pieces.append(
        jnp.zeros((_ROWS, (max_passes - n_passes) * 8), jnp.float32)
    )
  return jnp.concatenate(pieces, axis=1) if len(pieces) > 1 else pieces[0]


def _narrow_gather(ids1_ref, table_ref):
  """Per-row single-id lookup: ids (256, 1), table (256, w) -> (256, w)."""
  w = table_ref.shape[1]
  idx = jnp.broadcast_to(ids1_ref[:], (_ROWS, w))
  return jnp.take_along_axis(table_ref[:], idx, axis=0,
                             mode='promise_in_bounds')


def _kernel(
    bases_ref, pw_ref, ip_ref, ccs_ref, strand_ref, sn_ref, bq_ref,
    tb_ref, tp_ref, ti_ref, tc_ref, tq_ref,
    out_ref, *, n_passes: int, max_passes: int, use_bq: bool,
):
  blocks = [
      _feature_block(bases_ref, tb_ref, n_passes, max_passes),
      _feature_block(pw_ref, tp_ref, n_passes, max_passes),
      _feature_block(ip_ref, ti_ref, n_passes, max_passes),
      strand_ref[:],
      _narrow_gather(ccs_ref, tc_ref),
  ]
  if use_bq:
    blocks.append(_narrow_gather(bq_ref, tq_ref))
  blocks.append(sn_ref[:])
  out_ref[:] = jnp.concatenate(blocks, axis=1)


def _pad256(table: jnp.ndarray) -> jnp.ndarray:
  """Zero-pads a (vocab, w) table to (256, w); ids never reach the pad."""
  v = table.shape[0]
  if v > _ROWS:
    raise ValueError(f'table height {v} > {_ROWS}')
  return jnp.pad(table, ((0, _ROWS - v), (0, 0))) if v < _ROWS else table


def _t16(table: jnp.ndarray) -> jnp.ndarray:
  """(256, 8) eff table -> (256, 128) lane-expanded gather operand."""
  return jnp.repeat(_pad256(table), _CHUNK, axis=1)


def _rows(x, m):
  """(B, L, D) or (B*L, D) feature rows -> (Mp, D) row-padded."""
  x = x.reshape(-1, x.shape[-1])
  return jnp.pad(x, ((0, m - x.shape[0]), (0, 0)))


def embed_concat(
    bases: jnp.ndarray,  # (B, P, L) int
    pw: jnp.ndarray,  # (B, P, L) int
    ip: jnp.ndarray,  # (B, P, L) int
    ccs: jnp.ndarray,  # (B, L) int
    strand_rows: jnp.ndarray,  # (B, L, Wstrand) f32 (pre-embedded)
    sn_rows: jnp.ndarray,  # (B, L, Wsn) f32 (pre-embedded)
    tables: Dict[str, jnp.ndarray],  # eff tables: bases/pw/ip (+ccs_bq)
    ccs_bq: Optional[jnp.ndarray] = None,  # (B, L) int (pre-shifted +1)
    max_passes: int = 20,
    interpret: bool = False,
) -> jnp.ndarray:
  """Fused embed+concat -> (B, L, D); bit-identical to the XLA concat.

  `tables` hold the EFFECTIVE tables — raw embedding × sqrt(width) with
  row 0 zeroed — exactly the values the one-hot-matmul path multiplies
  with (models/model.py:ScaledEmbedding). strand_rows / sn_rows arrive
  pre-embedded from XLA (per-window features broadcast over L; sn's
  501-row vocab exceeds the 256-row gather tile, and both are tiny).
  """
  B, P, L = bases.shape
  M = B * L
  Mp = -(-M // _ROWS) * _ROWS
  use_bq = ccs_bq is not None

  def ids_t(x):
    # (B, P, L) -> (Mp, P) int32 rows: transpose the tiny int tensor so
    # the kernel's flat row order matches the (B, L, ...) output layout.
    x = jnp.transpose(x.astype(jnp.int32), (0, 2, 1)).reshape(M, P)
    return jnp.pad(x, ((0, Mp - M), (0, 0)))

  def col(x):
    return jnp.pad(x.astype(jnp.int32).reshape(M, 1), ((0, Mp - M), (0, 0)))

  d_strand = strand_rows.shape[-1]
  d_sn = sn_rows.shape[-1]
  D = max_passes * 24 + d_strand + 8 + (8 if use_bq else 0) + d_sn

  grid = (Mp // _ROWS,)
  row_spec = lambda w: pl.BlockSpec((_ROWS, w), lambda i: (i, 0))
  table_spec = lambda w: pl.BlockSpec((_ROWS, w), lambda i: (0, 0))

  bq_ids = col(ccs_bq) if use_bq else jnp.zeros((Mp, 1), jnp.int32)
  tq = tables.get('ccs_bq')
  if tq is None:
    tq = jnp.zeros((1, 8), jnp.float32)

  out = pl.pallas_call(
      functools.partial(
          _kernel, n_passes=P, max_passes=max_passes, use_bq=use_bq
      ),
      grid=grid,
      in_specs=[
          row_spec(P), row_spec(P), row_spec(P),  # bases/pw/ip ids
          row_spec(1),  # ccs ids
          row_spec(d_strand), row_spec(d_sn),  # pre-embedded rows
          row_spec(1),  # ccs_bq ids
          table_spec(128), table_spec(128), table_spec(128),
          table_spec(8), table_spec(8),
      ],
      out_specs=row_spec(D),
      out_shape=jax.ShapeDtypeStruct((Mp, D), jnp.float32),
      interpret=interpret,
  )(
      ids_t(bases), ids_t(pw), ids_t(ip), col(ccs),
      _rows(strand_rows, Mp), _rows(sn_rows, Mp), bq_ids,
      _t16(tables['bases']), _t16(tables['pw']), _t16(tables['ip']),
      _pad256(tables['bases']), _pad256(tq),
  )
  return out[:M].reshape(B, L, D)
