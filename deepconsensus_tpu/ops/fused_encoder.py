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

FFN_CHUNK = 512


def _fused_layer_kernel(
    x_ref, wq_ref, wk_ref, wv_ref, wo_ref, a_attn_ref,
    wf1_ref, bf1_ref, wf2_ref, bf2_ref, a_ffn_ref, o_ref,
    *, win: Optional[int],
):
  x = x_ref[:]  # (BB, L, E)
  BB, L, E = x.shape
  n_heads = wq_ref.shape[1]
  head_dim = wq_ref.shape[2]
  scale = head_dim**-0.5

  x2 = x.reshape(BB * L, E)

  # ---- banded multi-head self-attention ----
  if win is not None:
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
    if win is not None:
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

  # ---- FFN in filter-dimension chunks ----
  filter_size = wf1_ref.shape[1]
  acc = jnp.zeros_like(y2)
  n_chunks = pl.cdiv(filter_size, FFN_CHUNK)
  for c in range(n_chunks):
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
  kernel = functools.partial(_fused_layer_kernel, win=win)
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
  grid = (B // block_b,)
  x_spec = pl.BlockSpec((block_b, L, E), lambda i: (i, 0, 0), memory_space=ms)
  return pl.pallas_call(
      kernel,
      out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
      grid=grid,
      in_specs=[
          x_spec,
          fixed(wq.shape),
          fixed(wk.shape),
          fixed(wv.shape),
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
  )(x, wq, wk, wv, wo, a_attn, wf1, bf1_2d, wf2, bf2_2d, a_ffn)


def _on_tpu() -> bool:
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False


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
  if win is not None:
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(11,))
def fused_encoder_layer_trainable(
    x, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn,
    win: Optional[int] = 12,
):
  """Differentiable fused layer: Pallas forward, XLA-derived backward.

  The backward pass rematerializes through the mathematically identical
  XLA formulation and takes its VJP — standard practice for fused
  forward kernels; gradients match XLA autodiff to matmul precision.
  """
  return fused_encoder_layer(
      x, wq, wk, wv, wo, alpha_attn, wf1, bf1, wf2, bf2, alpha_ffn, win=win
  )


def _fused_fwd(x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2, win):
  out = fused_encoder_layer(
      x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2, win=win
  )
  return out, (x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2)


def _fused_bwd(win, residuals, g):
  (x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2) = residuals
  _, vjp = jax.vjp(
      lambda *args: _xla_layer(*args, win=win),
      x, wq, wk, wv, wo, a1, wf1, bf1, wf2, bf2, a2,
  )
  return vjp(g)


fused_encoder_layer_trainable.defvjp(_fused_fwd, _fused_bwd)


def extract_layer_params(encoder_stack_params, num_layers):
  """Pulls per-layer weight dicts out of the flax EncoderStack pytree."""
  out = []
  es = encoder_stack_params
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
