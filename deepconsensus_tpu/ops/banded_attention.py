"""Pallas TPU kernel: fused banded multi-head self-attention.

The model attends within a +/-attn_win_size band of each 100-wide window
(reference: models/attention_layer.py:112-121,196-218). The XLA fallback
materializes (B, N, L, L) logits in HBM between matmul, mask, softmax, and
the value contraction; this kernel fuses all four stages in VMEM per batch
tile, so the only HBM traffic is q/k/v in and the context out.

Shapes: q, k, v are (B, L, N, H). The kernel grids over the batch in
BLOCK_B-sized tiles, keeps each tile's q/k/v resident in VMEM, computes the
masked logits with MXU dot_generals per head, applies a numerically stable
softmax, and writes the (BLOCK_B, L, N, H) context tile. L and H are padded
to lane multiples by Mosaic automatically.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attention_kernel(q_ref, k_ref, v_ref, o_ref, *, win: Optional[int],
                      scale: float):
  # Blocks are (BLOCK_B, 1, L, H): one head per grid step.
  q = q_ref[:][:, 0] * scale  # (BB, L, H)
  k = k_ref[:][:, 0]
  v = v_ref[:][:, 0]
  L = q.shape[1]

  # logits[b, f, t] = sum_h q[b, f, h] k[b, t, h]
  logits = jax.lax.dot_general(
      q,
      k,
      dimension_numbers=(((2,), (2,)), ((0,), (0,))),
      preferred_element_type=jnp.float32,
  )
  if win:  # win in (None, 0) = full attention (model.band_mask semantics)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    band = jnp.abs(row - col) <= win
    logits = jnp.where(band[None, :, :], logits, -1e9)
  m = jnp.max(logits, axis=-1, keepdims=True)
  e = jnp.exp(logits - m)
  w = e / jnp.sum(e, axis=-1, keepdims=True)
  ctx = jax.lax.dot_general(
      w.astype(v.dtype),
      v,
      dimension_numbers=(((2,), (1,)), ((0,), (0,))),
      preferred_element_type=jnp.float32,
  )
  o_ref[:] = ctx.astype(q_ref.dtype)[:, None]


def _on_tpu() -> bool:
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False


def banded_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    win: Optional[int] = 12,
    block_b: int = 8,
    interpret: bool = False,
) -> jnp.ndarray:
  """Fused banded attention over (B, L, N, H) tensors.

  Matches softmax((q*scale) k^T + bandmask) v with scale = H**-0.5, the
  reference's attention math (attention_layer.py:196-218), where fully
  masked rows cannot occur because the diagonal is always in-band.
  Dispatches to the Pallas kernel on TPU backends (even batch tiles) and
  to a semantically identical XLA formulation otherwise.
  """
  B, L, N, H = q.shape
  scale = H**-0.5
  block_b = min(block_b, B)
  if not interpret and (not _on_tpu() or B % block_b != 0 or B < 2):
    return _xla_reference(q, k, v, win, scale)
  if B % block_b != 0:
    # interpret mode has no XLA fallback; a non-dividing block would drop
    # the remainder rows of the grid (silent NaNs). Verification path, so
    # per-example blocks are fine.
    block_b = 1

  kernel = functools.partial(_attention_kernel, win=win, scale=scale)
  grid = (B // block_b, N)
  # Head axis second for contiguous (L, H) tiles per head.
  qt = jnp.transpose(q, (0, 2, 1, 3))  # (B, N, L, H)
  kt = jnp.transpose(k, (0, 2, 1, 3))
  vt = jnp.transpose(v, (0, 2, 1, 3))
  spec = pl.BlockSpec(
      (block_b, 1, L, H),
      lambda i, n: (i, n, 0, 0),
      memory_space=(getattr(pl, 'ANY', None) or pltpu.ANY)
      if interpret
      else pltpu.VMEM,
  )
  out = pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(qt.shape, q.dtype),
      grid=grid,
      in_specs=[spec, spec, spec],
      out_specs=spec,
      interpret=interpret,
  )(qt, kt, vt)
  return jnp.transpose(out, (0, 2, 1, 3))


def _xla_reference(q, k, v, win, scale):
  """Plain-XLA fallback with identical semantics."""
  L = q.shape[1]
  logits = jnp.einsum('btnh,bfnh->bnft', k, q * scale)
  idx = jnp.arange(L)
  if win:  # win in (None, 0) = full attention (model.band_mask semantics)
    band = jnp.abs(idx[:, None] - idx[None, :]) <= win
    logits = jnp.where(band[None, None], logits, -1e9)
  w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
  return jnp.einsum('bnft,btnh->bfnh', w, v)
