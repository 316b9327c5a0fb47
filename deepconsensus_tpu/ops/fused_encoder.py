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

Parity status (round-5 investigation, VERDICT r4 #2): the fused forward
is ~2e-5 off the XLA encoder in Q characters and CANNOT be made bitwise
identical. Evidence chain (docs/fused_exactness.json,
fused_drift_components.json, fused_drift_sublayer.json): isolated Mosaic
dots/exp/softmax all match XLA bitwise at default precision, and the one
in-kernel re-association (the chunked FFN) was removed — yet both
sublayers still drift at <=3e-6 on 1-2% of values with real weights,
because XLA applies rounding-changing whole-graph rewrites (FMA
contraction, scalar sinking into matmuls) that Mosaic neither replicates
nor exposes control over. The kernel therefore stays an OPT-IN
inference path (params.use_pallas_fused_encoder / DC_BENCH_FUSED); the
byte-parity headline keeps the XLA graph. The hand-written Pallas
backward was deleted with the same evidence — it also measured slower
than XLA autodiff (3301 vs 3484 ex/s, docs/train_tpu_bench.json).

Memory strategy per grid step (one batch block):
* activations block (BLOCK_B, L, E) resident in VMEM; BLOCK_B=4 keeps
  the whole working set (double-buffered activation blocks + one layer's
  weights + FFN chunk intermediates) under the ~16 MB scoped-VMEM limit
  with headroom — BLOCK_B=8 was observed to exceed it by ~155 KB at some
  batch tiers;
* attention computed per head with MXU dot_generals;
* the FFN runs unchunked (the ~3.3 MB (BLOCK_B*L, filter) activation is
  VMEM-resident), preserving XLA's K-accumulation association.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepconsensus_tpu.ops import banded_attention



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


def fused_logits(params_tree, h, num_layers, win, interpret=False):
  """Fused encoder stack + functional LayerNorm/logits tail.

  params_tree is variables['params'] of LearnedValuesTransformer; `h` the
  encoder input from compact_embed/rows_embed. Inference-only: the
  hand-written Pallas backward was deleted in round 5 — it measured
  SLOWER than XLA autodiff through the XLA encoder (3301 vs 3484 ex/s,
  docs/train_tpu_bench.json), and the fused forward cannot be made
  bitwise-parity anyway (see the module docstring), so training always
  uses the XLA encoder.
  """
  lps = extract_layer_params(params_tree['encoder_stack'], num_layers)
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
