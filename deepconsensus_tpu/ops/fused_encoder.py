"""Pallas TPU kernel: one fully fused encoder layer.

Fuses the reference encoder sublayer pair — banded multi-head
self-attention and the 2048-wide FFN, each in a ReZero residual wrapper
(reference: encoder_stack.py:141-198) — into a single kernel per layer.
Intermediates (q/k/v, attention logits, softmax weights, context, FFN
activations) never touch HBM; the only HBM traffic per layer is the
(B, L, E) activations in/out and one pass over the layer's weights.

Why per-layer (not whole-stack) fusion: the 6-layer encoder's weights are
~35 MB f32 (17.5 MB bf16) against ~16 MB VMEM/core, so a fully
weight-resident whole-stack kernel cannot fit; one layer (~5.9 MB) plus an
activation block is the largest working set that stays resident. Layer
weights stream from HBM once per layer per batch block, which at the
production batch sizes is already amortized to noise.

Memory strategy per grid step (one batch block):
* activations block (BLOCK_B, L, E) resident in VMEM; BLOCK_B=4 keeps
  the whole working set (double-buffered activation blocks + one layer's
  weights + FFN chunk intermediates) under the ~16 MB scoped-VMEM limit
  with headroom — BLOCK_B=8 was observed to exceed it by ~155 KB at some
  batch tiers;
* attention computed per head with MXU dot_generals;
* the FFN contracts in filter-dimension chunks
  (relu(x@W1[:,c]+b1[c]) @ W2[c,:] summed over chunks), so the big
  (BLOCK_B*L, filter) activation never materializes whole.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepconsensus_tpu.ops import banded_attention

FFN_CHUNK = 512


def _fused_layer_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, wo_ref, a_attn_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref, a_ffn_ref, o_ref,
    *, win: Optional[int], n_heads: int,
):
  x = x_ref[:]  # (BB, L, E)
  BB, L, E = x.shape
  head_dim = wq_ref.shape[1] // n_heads  # weights pre-reshaped to (E, N*H)
  scale = head_dim**-0.5

  x2 = x.reshape(BB * L, E)

  # ---- banded multi-head self-attention ----
  if win:  # win in (None, 0) = full attention (model.band_mask semantics)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    band = jnp.abs(row - col) <= win
  # Q/K/V for all heads in one full-width matmul each (E -> N*H): with the
  # production shape (2 heads of 140) a per-head matmul pads its 140-wide
  # output to 256 MXU lanes (55% util) while the fused 280-wide output pads
  # to 384 (73%), and there are 3 matmuls instead of 6. Weights arrive
  # pre-reshaped to (E, N*H) — Mosaic rejects merging the minor axes of a
  # loaded (E, N, H) value in-kernel.
  wq2 = wq_ref[:]
  wk2 = wk_ref[:]
  wv2 = wv_ref[:]
  q_all = (jax.lax.dot_general(
      x2, wq2, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  ) * scale).reshape(BB, L, n_heads * head_dim)
  k_all = jax.lax.dot_general(
      x2, wk2, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  ).reshape(BB, L, n_heads * head_dim)
  v_all = jax.lax.dot_general(
      x2, wv2, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  ).reshape(BB, L, n_heads * head_dim)
  ctx_heads = []
  for h in range(n_heads):
    # Lane-axis slices of the already-reshaped activations (Mosaic
    # supports reshaping a dot output, and slicing the minor axis; it
    # rejects reshapes of sliced values and 4-D head layouts).
    cols = slice(h * head_dim, (h + 1) * head_dim)
    q = q_all[:, :, cols]
    k = k_all[:, :, cols]
    v = v_all[:, :, cols]
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if win:  # win in (None, 0) = full attention (model.band_mask semantics)
      logits = jnp.where(band[None, :, :], logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        w, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (BB, L, head_dim)
    ctx_heads.append(ctx.reshape(BB * L, head_dim))
  ctx2 = jnp.concatenate(ctx_heads, axis=-1)  # (BB*L, N*H) head-major
  wo2 = wo_ref[:].reshape(n_heads * head_dim, E)
  attn = jax.lax.dot_general(
      ctx2, wo2,
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  y2 = x2 + a_attn_ref[0, 0] * attn  # ReZero residual

  # ---- FFN ----
  # Unchunked on purpose: a filter-dim-chunked second matmul accumulates
  # K=2048 as partial sums of 512 — a different f32 association than
  # XLA's sequential K-tile accumulation, which alone breaks bitwise
  # parity with the XLA encoder (docs/fused_exactness.json shows Mosaic
  # and XLA dots DO match bitwise at default precision when the
  # contraction isn't re-associated). The full (BB*L, filter) activation
  # is ~3.3 MB at BLOCK_B=4 — comfortably VMEM-resident.
  h1 = jax.lax.dot_general(
      y2, wf1_ref[:],
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  ) + bf1_ref[0, :][None, :]
  h1 = jnp.maximum(h1, 0.0)
  ffn = jax.lax.dot_general(
      h1, wf2_ref[:],
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  ) + bf2_ref[0, :][None, :]
  out2 = y2 + a_ffn_ref[0, 0] * ffn
  o_ref[:] = out2.reshape(BB, L, E).astype(x.dtype)


def fused_encoder_layer(
    x: jnp.ndarray,  # (B, L, E)
    wq, wk, wv,  # (E, N, H)
    wo,  # (N, H, E)
    alpha_attn,  # scalar
    wf1, bf1,  # (E, F), (F,)
    wf2, bf2,  # (F, E), (E,)
    alpha_ffn,  # scalar
    win: Optional[int] = 12,
    block_b: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
  """One fused ReZero encoder layer; falls back to XLA off-TPU/ragged."""
  B, L, E = x.shape
  if not interpret and (not _on_tpu() or B % block_b != 0):
    return _xla_layer(
        x, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn, win
    )
  block_b = min(block_b, B)
  if B % block_b != 0:
    # interpret mode has no XLA fallback; a non-dividing block would drop
    # the remainder rows of the grid (silent NaNs). Verification path, so
    # per-example blocks are fine.
    block_b = 1
  n_heads = wq.shape[1]
  kernel = functools.partial(_fused_layer_kernel, win=win, n_heads=n_heads)
  any_space = getattr(pl, 'ANY', None) or pltpu.ANY
  ms = any_space if interpret else pltpu.VMEM

  def fixed(shape):
    nargs = len(shape)
    return pl.BlockSpec(
        shape, lambda i, _n=nargs: (0,) * _n, memory_space=ms
    )

  a_attn = jnp.asarray(alpha_attn, jnp.float32).reshape(1, 1)
  a_ffn = jnp.asarray(alpha_ffn, jnp.float32).reshape(1, 1)
  bf1_2d = bf1.reshape(1, -1)
  bf2_2d = bf2.reshape(1, -1)
  # (E, N, H) -> (E, N*H) outside the kernel (free in XLA; Mosaic rejects
  # the minor-axis merge on a loaded value).
  wq2 = wq.reshape(E, -1)
  wk2 = wk.reshape(E, -1)
  wv2 = wv.reshape(E, -1)
  grid = (B // block_b,)
  x_spec = pl.BlockSpec((block_b, L, E), lambda i: (i, 0, 0), memory_space=ms)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
      grid=grid,
      in_specs=[
          x_spec,
          fixed(wq2.shape),
          fixed(wk2.shape),
          fixed(wv2.shape),
          fixed(wo.shape),
          fixed(a_attn.shape),
          fixed(wf1.shape),
          fixed(bf1_2d.shape),
          fixed(wf2.shape),
          fixed(bf2_2d.shape),
          fixed(a_ffn.shape),
      ],
      out_specs=x_spec,
      interpret=interpret,
  )(x, wq2, wk2, wv2, wo, a_attn, wf1, bf1_2d, wf2, bf2_2d, a_ffn)


# Platform detection shared with the sibling kernel module so a PJRT
# plugin rename is handled once.
_on_tpu = banded_attention._on_tpu


def _xla_layer(x, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn,
               win):
  """Reference XLA formulation with identical semantics."""
  E = x.shape[-1]
  head_dim = wq.shape[2]
  scale = head_dim**-0.5
  q = jnp.einsum('ble,enh->blnh', x, wq) * scale
  k = jnp.einsum('ble,enh->blnh', x, wk)
  v = jnp.einsum('ble,enh->blnh', x, wv)
  logits = jnp.einsum('bfnh,btnh->bnft', q, k)
  if win:  # win in (None, 0) = full attention (model.band_mask semantics)
    L = x.shape[1]
    idx = jnp.arange(L)
    band = jnp.abs(idx[:, None] - idx[None, :]) <= win
    logits = jnp.where(band[None, None], logits, -1e9)
  w = jax.nn.softmax(logits, axis=-1)
  ctx = jnp.einsum('bnft,btnh->bfnh', w, v)
  attn = jnp.einsum('bfnh,nhe->bfe', ctx, wo)
  y = x + alpha_attn * attn
  h1 = jnp.maximum(jnp.einsum('ble,ef->blf', y, wf1) + bf1, 0.0)
  ffn = jnp.einsum('blf,fe->ble', h1, wf2) + bf2
  return y + alpha_ffn * ffn


def fused_encoder_stack(x, layer_params, win=12, block_b=4, interpret=False):
  """Applies N fused layers sequentially.

  layer_params: list of dicts with keys wq, wk, wv, wo, alpha_attn,
  wf1, bf1, wf2, bf2, alpha_ffn (the flax EncoderStack parameter layout;
  see extract_layer_params).
  """
  for lp in layer_params:
    x = fused_encoder_layer(
        x,
        lp['wq'], lp['wk'], lp['wv'], lp['wo'], lp['alpha_attn'],
        lp['wf1'], lp['bf1'], lp['wf2'], lp['bf2'], lp['alpha_ffn'],
        win=win, block_b=block_b, interpret=interpret,
    )
  return x


# ---------------------------------------------------------------------------
# Trainable path: Pallas forward (saving the post-attention residual y2)
# plus a true Pallas backward split into an FFN kernel and an attention
# kernel. Intermediates (q/k/v, softmax weights, FFN activations) are
# REcomputed per batch block inside VMEM — flash-attention style — so the
# only HBM traffic of the backward is the (B, L, E) activations/cotangents
# and one pass over each layer's weights + weight-grad accumulators.
# Weight gradients reduce over the batch by accumulating into
# constant-index output blocks across the (sequential) TPU grid.
# ---------------------------------------------------------------------------


def _fwd_save_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, wo_ref, a_attn_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref, a_ffn_ref, o_ref, y2_ref,
    *, win: Optional[int],
):
  """Forward kernel that also writes y2 = x + alpha_attn*attn (residual)."""
  x = x_ref[:]
  BB, L, E = x.shape
  x2 = x.reshape(BB * L, E)
  y2 = _attn_sublayer(x2, BB, L, wq_ref, wk_ref, wv_ref, wo_ref, a_attn_ref,
                      win)
  y2_ref[:] = y2.reshape(BB, L, E).astype(x.dtype)
  filter_size = wf1_ref.shape[1]
  acc = jnp.zeros_like(y2)
  for c in range(pl.cdiv(filter_size, FFN_CHUNK)):
    lo = c * FFN_CHUNK
    hi = min(filter_size, lo + FFN_CHUNK)
    h1 = jax.lax.dot_general(
        y2, wf1_ref[:, lo:hi],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bf1_ref[0, lo:hi][None, :]
    h1 = jnp.maximum(h1, 0.0)
    acc = acc + jax.lax.dot_general(
        h1, wf2_ref[lo:hi, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
  ffn = acc + bf2_ref[0, :][None, :]
  out2 = y2 + a_ffn_ref[0, 0] * ffn
  o_ref[:] = out2.reshape(BB, L, E).astype(x.dtype)


def _attn_sublayer(x2, BB, L, wq_ref, wk_ref, wv_ref, wo_ref, a_attn_ref,
                   win):
  """Recomputes y2 = x + alpha_attn * MHA(x) from refs (shared fwd/bwd)."""
  n_heads = wq_ref.shape[1]
  head_dim = wq_ref.shape[2]
  scale = head_dim**-0.5
  if win:  # win in (None, 0) = full attention (model.band_mask semantics)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    band = jnp.abs(row - col) <= win
  ctx_heads = []
  for h in range(n_heads):
    q = jax.lax.dot_general(
        x2, wq_ref[:, h, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(BB, L, head_dim) * scale
    k = jax.lax.dot_general(
        x2, wk_ref[:, h, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(BB, L, head_dim)
    v = jax.lax.dot_general(
        x2, wv_ref[:, h, :],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(BB, L, head_dim)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if win:  # win in (None, 0) = full attention (model.band_mask semantics)
      logits = jnp.where(band[None, :, :], logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        w, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    ctx_heads.append(ctx.reshape(BB * L, head_dim))
  ctx2 = jnp.concatenate(ctx_heads, axis=-1)
  wo2 = wo_ref[:].reshape(n_heads * head_dim, x2.shape[1])
  attn = jax.lax.dot_general(
      ctx2, wo2,
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )
  return x2 + a_attn_ref[0, 0] * attn


def _mm(a, b):
  """2-D matmul with f32 accumulation (MXU)."""
  return jax.lax.dot_general(
      a, b,
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )


def _mmT(a, b):
  """a @ b.T without materializing the transpose."""
  return jax.lax.dot_general(
      a, b,
      dimension_numbers=(((1,), (1,)), ((), ())),
      preferred_element_type=jnp.float32,
  )


def _Tmm(a, b):
  """a.T @ b without materializing the transpose."""
  return jax.lax.dot_general(
      a, b,
      dimension_numbers=(((0,), (0,)), ((), ())),
      preferred_element_type=jnp.float32,
  )


def _acc(ref, value, idx=None):
  """Init-or-accumulate into a constant-index output block across the grid."""
  i = pl.program_id(0)
  sl = idx if idx is not None else tuple(slice(None) for _ in ref.shape)

  @pl.when(i == 0)
  def _init():
    ref[sl] = value

  @pl.when(i != 0)
  def _add():
    ref[sl] += value


def _ffn_bwd_kernel(
    y2_ref, g_ref, wf1_ref, bf1_ref, wf2_ref, bf2_ref, a_ffn_ref,
    dy2_ref, dwf1_ref, dbf1_ref, dwf2_ref, dbf2_ref, da_ffn_ref,
):
  """Backward of out = y2 + a2*FFN(y2): dy2 + all FFN weight grads.

  Recomputes the chunked forward; dW1/dW2 accumulate per chunk so the
  (rows, filter) activation never materializes whole.
  """
  BB, L, E = y2_ref.shape
  y2 = y2_ref[:].reshape(BB * L, E)
  g = g_ref[:].reshape(BB * L, E)
  a2 = a_ffn_ref[0, 0]
  dffn = a2 * g
  filter_size = wf1_ref.shape[1]
  ffn_acc = jnp.zeros_like(y2)
  dy2 = g
  for c in range(pl.cdiv(filter_size, FFN_CHUNK)):
    lo = c * FFN_CHUNK
    hi = min(filter_size, lo + FFN_CHUNK)
    h1 = jnp.maximum(
        _mm(y2, wf1_ref[:, lo:hi]) + bf1_ref[0, lo:hi][None, :], 0.0
    )
    ffn_acc = ffn_acc + _mm(h1, wf2_ref[lo:hi, :])
    dh1 = _mmT(dffn, wf2_ref[lo:hi, :]) * (h1 > 0.0)
    dy2 = dy2 + _mmT(dh1, wf1_ref[:, lo:hi])
    _acc(dwf1_ref, _Tmm(y2, dh1), (slice(None), slice(lo, hi)))
    _acc(dwf2_ref, _Tmm(h1, dffn), (slice(lo, hi), slice(None)))
    _acc(dbf1_ref, jnp.sum(dh1, axis=0)[None, :], (slice(None), slice(lo, hi)))
  _acc(dbf2_ref, jnp.sum(dffn, axis=0)[None, :])
  ffn = ffn_acc + bf2_ref[0, :][None, :]
  _acc(da_ffn_ref, jnp.sum(g * ffn).reshape(1, 1))
  dy2_ref[:] = dy2.reshape(BB, L, E).astype(y2_ref.dtype)


def _attn_bwd_kernel(
    x_ref, dy2_ref, wq_ref, wk_ref, wv_ref, wo_ref, a_attn_ref,
    dx_ref, dwq_ref, dwk_ref, dwv_ref, dwo_ref, da_attn_ref,
    *, win: Optional[int],
):
  """Backward of y2 = x + a1*MHA(x): dx + all attention weight grads.

  Recomputes per-head q/k/v/softmax in VMEM (flash-attention-style
  rematerialization) — the (BB, L, L) weight matrices exist only here.
  """
  BB, L, E = x_ref.shape
  n_heads = wq_ref.shape[1]
  head_dim = wq_ref.shape[2]
  scale = head_dim**-0.5
  x2 = x_ref[:].reshape(BB * L, E)
  dy2 = dy2_ref[:].reshape(BB * L, E)
  a1 = a_attn_ref[0, 0]
  if win:  # win in (None, 0) = full attention (model.band_mask semantics)
    row = jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
    band = jnp.abs(row - col) <= win

  # Recompute per-head forward, keep (q, k, v, w, ctx) resident.
  heads = []
  for h in range(n_heads):
    q = _mm(x2, wq_ref[:, h, :]).reshape(BB, L, head_dim) * scale
    k = _mm(x2, wk_ref[:, h, :]).reshape(BB, L, head_dim)
    v = _mm(x2, wv_ref[:, h, :]).reshape(BB, L, head_dim)
    logits = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    if win:  # win in (None, 0) = full attention (model.band_mask semantics)
      logits = jnp.where(band[None, :, :], logits, -1e9)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    ctx = jax.lax.dot_general(
        w, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    heads.append((q, k, v, w, ctx.reshape(BB * L, head_dim)))

  ctx2 = jnp.concatenate([hd[4] for hd in heads], axis=-1)
  wo2 = wo_ref[:].reshape(n_heads * head_dim, E)
  attn = _mm(ctx2, wo2)
  _acc(da_attn_ref, jnp.sum(dy2 * attn).reshape(1, 1))
  dattn = a1 * dy2
  _acc(dwo_ref, _Tmm(ctx2, dattn).reshape(n_heads, head_dim, E))
  dctx2 = _mmT(dattn, wo2)

  dx2 = dy2
  for h in range(n_heads):
    q, k, v, w, _ = heads[h]
    dctx = dctx2[:, h * head_dim : (h + 1) * head_dim].reshape(
        BB, L, head_dim
    )
    # dw[b,i,j] = <dctx[b,i,:], v[b,j,:]>
    dw = jax.lax.dot_general(
        dctx, v,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dv[b,j,:] = sum_i w[b,i,j] * dctx[b,i,:]
    dv = jax.lax.dot_general(
        w, dctx,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dlogits = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    if win:  # win in (None, 0) = full attention (model.band_mask semantics)
      dlogits = jnp.where(band[None, :, :], dlogits, 0.0)
    # dq[b,i,:] = sum_j dlogits[b,i,j] * k[b,j,:]
    dq = jax.lax.dot_general(
        dlogits, k,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    # dk[b,j,:] = sum_i dlogits[b,i,j] * q[b,i,:]
    dk = jax.lax.dot_general(
        dlogits, q,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    dq2 = dq.reshape(BB * L, head_dim) * scale  # undo fwd q-scaling
    dk2 = dk.reshape(BB * L, head_dim)
    dv2 = dv.reshape(BB * L, head_dim)
    _acc(dwq_ref, _Tmm(x2, dq2), (slice(None), h, slice(None)))
    _acc(dwk_ref, _Tmm(x2, dk2), (slice(None), h, slice(None)))
    _acc(dwv_ref, _Tmm(x2, dv2), (slice(None), h, slice(None)))
    dx2 = dx2 + _mmT(dq2, wq_ref[:, h, :])
    dx2 = dx2 + _mmT(dk2, wk_ref[:, h, :])
    dx2 = dx2 + _mmT(dv2, wv_ref[:, h, :])
  dx_ref[:] = dx2.reshape(BB, L, E).astype(x_ref.dtype)


def fused_encoder_layer_fwd_save(
    x, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn,
    win: Optional[int] = 12,
    block_b: int = 4,
    interpret: bool = False,
):
  """Forward returning (out, y2); y2 is the saved residual for backward."""
  B, L, E = x.shape
  block_b = min(block_b, B)
  if B % block_b != 0:
    block_b = 1  # a non-dividing block would silently drop remainder rows
  kernel = functools.partial(_fwd_save_kernel, win=win)
  any_space = getattr(pl, 'ANY', None) or pltpu.ANY
  ms = any_space if interpret else pltpu.VMEM

  def fixed(shape):
    nargs = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nargs: (0,) * _n, memory_space=ms)

  a_attn = jnp.asarray(alpha_attn, jnp.float32).reshape(1, 1)
  a_ffn = jnp.asarray(alpha_ffn, jnp.float32).reshape(1, 1)
  bf1_2d = bf1.reshape(1, -1)
  bf2_2d = bf2.reshape(1, -1)
  x_spec = pl.BlockSpec((block_b, L, E), lambda i: (i, 0, 0), memory_space=ms)
  out, y2 = pl.pallas_call(
      kernel,
      out_shape=(
          jax.ShapeDtypeStruct(x.shape, x.dtype),
          jax.ShapeDtypeStruct(x.shape, x.dtype),
      ),
      grid=(B // block_b,),
      in_specs=[
          x_spec,
          fixed(wq.shape), fixed(wk.shape), fixed(wv.shape), fixed(wo.shape),
          fixed(a_attn.shape),
          fixed(wf1.shape), fixed(bf1_2d.shape),
          fixed(wf2.shape), fixed(bf2_2d.shape), fixed(a_ffn.shape),
      ],
      out_specs=(x_spec, x_spec),
      interpret=interpret,
  )(x, wq, wk, wv, wo, a_attn, wf1, bf1_2d, wf2, bf2_2d, a_ffn)
  return out, y2


def fused_encoder_layer_bwd(
    x, y2, g, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn,
    win: Optional[int] = 12,
    block_b: int = 2,
    interpret: bool = False,
):
  """True Pallas backward: returns grads for (x, wq..alpha_ffn).

  block_b=2 (vs the forward's 4) keeps the FFN kernel's working set —
  W1+W2 plus their grad accumulators (~9.4 MB f32 at production shapes)
  plus double-buffered activation blocks — under the ~16 MB scoped VMEM.
  """
  B, L, E = x.shape
  block_b = min(block_b, B)
  if B % block_b != 0:
    block_b = 1  # a non-dividing block would silently drop remainder rows
  any_space = getattr(pl, 'ANY', None) or pltpu.ANY
  ms = any_space if interpret else pltpu.VMEM

  def fixed(shape):
    nargs = len(shape)
    return pl.BlockSpec(shape, lambda i, _n=nargs: (0,) * _n, memory_space=ms)

  a_attn = jnp.asarray(alpha_attn, jnp.float32).reshape(1, 1)
  a_ffn = jnp.asarray(alpha_ffn, jnp.float32).reshape(1, 1)
  bf1_2d = bf1.reshape(1, -1)
  bf2_2d = bf2.reshape(1, -1)
  x_spec = pl.BlockSpec((block_b, L, E), lambda i: (i, 0, 0), memory_space=ms)
  grid = (B // block_b,)
  f32 = jnp.float32

  # --- FFN sublayer backward: g -> dy2 + FFN weight grads ---
  dy2, dwf1, dbf1_2d, dwf2, dbf2_2d, da_ffn = pl.pallas_call(
      _ffn_bwd_kernel,
      out_shape=(
          jax.ShapeDtypeStruct(x.shape, x.dtype),
          jax.ShapeDtypeStruct(wf1.shape, f32),
          jax.ShapeDtypeStruct(bf1_2d.shape, f32),
          jax.ShapeDtypeStruct(wf2.shape, f32),
          jax.ShapeDtypeStruct(bf2_2d.shape, f32),
          jax.ShapeDtypeStruct((1, 1), f32),
      ),
      grid=grid,
      in_specs=[
          x_spec, x_spec,
          fixed(wf1.shape), fixed(bf1_2d.shape),
          fixed(wf2.shape), fixed(bf2_2d.shape), fixed(a_ffn.shape),
      ],
      out_specs=(
          x_spec,
          fixed(wf1.shape), fixed(bf1_2d.shape),
          fixed(wf2.shape), fixed(bf2_2d.shape), fixed((1, 1)),
      ),
      interpret=interpret,
  )(y2, g, wf1, bf1_2d, wf2, bf2_2d, a_ffn)

  # --- attention sublayer backward: dy2 -> dx + attention weight grads ---
  kernel = functools.partial(_attn_bwd_kernel, win=win)
  dx, dwq, dwk, dwv, dwo, da_attn = pl.pallas_call(
      kernel,
      out_shape=(
          jax.ShapeDtypeStruct(x.shape, x.dtype),
          jax.ShapeDtypeStruct(wq.shape, f32),
          jax.ShapeDtypeStruct(wk.shape, f32),
          jax.ShapeDtypeStruct(wv.shape, f32),
          jax.ShapeDtypeStruct(wo.shape, f32),
          jax.ShapeDtypeStruct((1, 1), f32),
      ),
      grid=grid,
      in_specs=[
          x_spec, x_spec,
          fixed(wq.shape), fixed(wk.shape), fixed(wv.shape), fixed(wo.shape),
          fixed(a_attn.shape),
      ],
      out_specs=(
          x_spec,
          fixed(wq.shape), fixed(wk.shape), fixed(wv.shape), fixed(wo.shape),
          fixed((1, 1)),
      ),
      interpret=interpret,
  )(x, dy2, wq, wk, wv, wo, a_attn)

  def like(arr, g_arr):
    return g_arr.astype(arr.dtype).reshape(arr.shape)

  return (
      dx,
      like(wq, dwq), like(wk, dwk), like(wv, dwv), like(wo, dwo),
      like(jnp.asarray(alpha_attn), da_attn),
      like(wf1, dwf1), like(bf1, dbf1_2d), like(wf2, dwf2),
      like(bf2, dbf2_2d),
      like(jnp.asarray(alpha_ffn), da_ffn),
  )


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 12))
def fused_encoder_layer_trainable(
    x, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn,
    win: Optional[int] = 12,
    interpret: bool = False,
):
  """Differentiable fused layer: Pallas forward AND Pallas backward.

  On TPU (or under interpret=True) both passes run as Pallas kernels; the
  backward rematerializes q/k/v/softmax/FFN activations inside VMEM
  (flash-attention style) instead of storing them, and accumulates weight
  grads across the sequential grid. Off-TPU with ragged batches it falls
  back to the XLA formulation and its autodiff — same math either way
  (grad-parity tested in tests/test_fused_encoder.py).
  """
  return fused_encoder_layer(
      x, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn, win=win,
      interpret=interpret,
  )


def _fused_fwd(x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2, win, interpret):
  block_b = next(b for b in (4, 2, 1) if x.shape[0] % b == 0)
  use_pallas = interpret or _on_tpu()
  if use_pallas:
    out, y2 = fused_encoder_layer_fwd_save(
        x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2,
        win=win, block_b=block_b, interpret=interpret,
    )
  else:
    out = _xla_layer(x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2, win)
    y2 = None
  return out, (x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2, y2)


def _fused_bwd(win, interpret, residuals, g):
  (x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2, y2) = residuals
  if y2 is None:
    _, vjp = jax.vjp(
        lambda *args: _xla_layer(*args, win=win),
        x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2,
    )
    return vjp(g)
  block_b = 2 if x.shape[0] % 2 == 0 else 1
  return fused_encoder_layer_bwd(
      x, y2, g, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2,
      win=win, block_b=block_b, interpret=interpret,
  )


fused_encoder_layer_trainable.defvjp(_fused_fwd, _fused_bwd)


def fused_logits(params_tree, h, num_layers, win, trainable=False,
                 interpret=False):
  """Fused encoder stack + functional LayerNorm/logits tail.

  params_tree is variables['params'] of LearnedValuesTransformer; `h` the
  encoder input from compact_embed/rows_embed. trainable=True routes
  through the custom-VJP layers (Pallas forward AND backward) so the
  result is differentiable w.r.t. params_tree — used by the train loop.
  """
  lps = extract_layer_params(params_tree['encoder_stack'], num_layers)
  if trainable:
    for lp in lps:
      h = fused_encoder_layer_trainable(
          h, lp['wq'], lp['wk'], lp['wv'], lp['wo'], lp['alpha_attn'],
          lp['wf1'], lp['bf1'], lp['wf2'], lp['bf2'], lp['alpha_ffn'],
          win, interpret,
      )
  else:
    h = fused_encoder_stack(h, lps, win=win, interpret=interpret)
  norm = params_tree['encoder_stack']['output_norm']
  mu = jnp.mean(h, axis=-1, keepdims=True)
  var = jnp.mean(jnp.square(h - mu), axis=-1, keepdims=True)
  h = (h - mu) * jax.lax.rsqrt(var + 1e-6) * norm['scale'] + norm['bias']
  return h @ params_tree['logits']['kernel'] + params_tree['logits']['bias']


def extract_layer_params(encoder_stack_params, num_layers):
  """Pulls per-layer weight dicts out of the flax EncoderStack pytree."""
  out = []
  es = encoder_stack_params
  if 'alpha' not in es.get('attention_wrapper_0', {}):
    raise ValueError(
        'fused encoder requires a ReZero-parameterized stack '
        "(params.rezero=True): 'attention_wrapper_0/alpha' not found. "
        'Pre-LayerNorm (rezero=False) configs must use the XLA encoder.'
    )
  for n in range(num_layers):
    attn = es[f'attention_{n}']
    ffn = es[f'ffn_{n}']
    out.append({
        'wq': attn['query']['kernel'],
        'wk': attn['key']['kernel'],
        'wv': attn['value']['kernel'],
        'wo': attn['output_transform']['kernel'],
        'alpha_attn': es[f'attention_wrapper_{n}']['alpha'],
        'wf1': ffn['filter_layer']['kernel'],
        'bf1': ffn['filter_layer']['bias'],
        'wf2': ffn['output_layer']['kernel'],
        'bf2': ffn['output_layer']['bias'],
        'alpha_ffn': es[f'ffn_wrapper_{n}']['alpha'],
    })
  return out
