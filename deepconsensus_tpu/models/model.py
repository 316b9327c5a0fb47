"""Pure-JAX (flax.linen) encoder-only transformer for CCS polishing.

Re-design of the reference's TF2/Keras model family
(`reference: models/networks.py`, `encoder_stack.py`, `attention_layer.py`,
`ffn_layer.py`) as functional JAX:

* per-feature learned embeddings are single vectorized gathers over all
  subread rows at once (the reference loops 20 embedding-layer calls per
  feature, networks.py:457-504) — identical math, one XLA gather each;
* banded local attention implemented as a masked dense attention (band
  width 2*attn_win_size+1, attention_layer.py:112-121,202-214), jit/pjit
  friendly with static shapes;
* ReZero residual wrappers (alpha scalars init 0, encoder_stack.py:54-93);
* sinusoidal relative position encoding matching tf-models'
  RelativePositionEmbedding (min timescale 1, max 1e4).

All compute runs under jit; bfloat16 activation support via the `dtype`
attribute (params stay float32).
"""

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import ml_collections

from deepconsensus_tpu import constants
from deepconsensus_tpu.models import configs


def sinusoidal_position_encoding(
    length: int,
    hidden_size: int,
    min_timescale: float = 1.0,
    max_timescale: float = 1.0e4,
    dtype=jnp.float32,
) -> jnp.ndarray:
  """tf-models RelativePositionEmbedding encoding: concat(sin, cos)."""
  position = jnp.arange(length, dtype=jnp.float32)
  num_timescales = hidden_size // 2
  log_increment = math.log(max_timescale / min_timescale) / max(
      num_timescales - 1, 1
  )
  inv_timescales = min_timescale * jnp.exp(
      jnp.arange(num_timescales, dtype=jnp.float32) * -log_increment
  )
  scaled_time = position[:, None] * inv_timescales[None, :]
  return jnp.concatenate(
      [jnp.sin(scaled_time), jnp.cos(scaled_time)], axis=1
  ).astype(dtype)


def band_mask(length: int, win: Optional[int]) -> jnp.ndarray:
  """Boolean (length, length) mask, True inside the attention band."""
  if not win:
    return jnp.ones((length, length), dtype=bool)
  idx = jnp.arange(length)
  return jnp.abs(idx[:, None] - idx[None, :]) <= win


class ScaledEmbedding(nn.Module):
  """Embedding with sqrt(width) scaling and zero-masked id 0.

  Matches the reference's ModifiedOnDeviceEmbedding (networks.py:42-63):
  init stddev width**-0.5, lookup scaled by width**0.5, and rows for id 0
  forced to zero output.
  """

  vocab_size: int
  width: int
  dtype: Any = jnp.float32

  def setup(self):
    self.embedding = self.param(
        'embedding',
        nn.initializers.normal(stddev=self.width**-0.5),
        (self.vocab_size, self.width),
        jnp.float32,
    )

  def eff_table(self) -> jnp.ndarray:
    """The effective lookup table: scaled by sqrt(width), row 0 zeroed.

    (eff_table)[id] is bitwise what __call__ computes for id — the same
    two multiplies (scale, then 0/1 mask) on the same f32 row values —
    so lookup-reformulating consumers (the one-hot matmul below) stay
    exact.
    """
    eff = self.embedding.astype(self.dtype) * jnp.asarray(
        self.width**0.5, self.dtype
    )
    return eff * (jnp.arange(self.vocab_size) != 0)[:, None].astype(
        self.dtype
    )

  def __call__(self, ids: jnp.ndarray, via_matmul: bool = False) -> jnp.ndarray:
    table = self.embedding
    if via_matmul:
      # One-hot matmul lookup: TPU gathers are ~11 GB/s on these small
      # non-contiguous rows, while the MXU chews the equivalent one-hot
      # contraction ~4x faster (XLA fuses the iota-compare one-hot into
      # the matmul operand tiles, so the (N, vocab) one-hot never hits
      # HBM). Bit-identical to the gather: each output is a sum of exact
      # zeros plus the (pre-scaled, id-0-masked) table row, and HIGHEST
      # precision keeps the f32 products exact.
      #
      # Round-5 A/B (docs/embed_ab_tpu.json): a manual exact bf16x3
      # table split (3 one-pass dots) and an int-side layout transpose
      # both REGRESS this path ~2-3x — XLA's fusion of the one-hot into
      # the single HIGHEST contraction plus its f32-side transpose
      # placement beat the hand-restructured variants. Keep this form.
      eff = self.eff_table()
      # Clip like the gather path below (one_hot would instead zero an
      # out-of-vocab id, silently diverging from mode='clip' for corrupt
      # inputs — review r5); in-range ids are untouched, so the one-hot
      # exactness argument is unchanged.
      ids = jnp.clip(ids, 0, self.vocab_size - 1)
      oh = jax.nn.one_hot(ids, self.vocab_size, dtype=self.dtype)
      out = jax.lax.dot_general(
          oh.reshape(-1, self.vocab_size),
          eff,
          dimension_numbers=(((1,), (0,)), ((), ())),
          precision=jax.lax.Precision.HIGHEST,
      )
      return out.reshape(ids.shape + (self.width,))
    # mode='clip' matches TF-on-TPU gather clamping for out-of-range ids
    # (and avoids jnp.take's default NaN fill on malformed inputs).
    out = jnp.take(table.astype(self.dtype), ids, axis=0, mode='clip')
    out = out * jnp.asarray(self.width**0.5, self.dtype)
    return out * (ids != 0)[..., None].astype(self.dtype)


class EinsumDense(nn.Module):
  """Headed projection like tf EinsumDense BTE,ENH->BTNH (no bias)."""

  num_heads: int
  head_dim: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    kernel = self.param(
        'kernel',
        nn.initializers.variance_scaling(1.0, 'fan_avg', 'uniform'),
        (x.shape[-1], self.num_heads, self.head_dim),
        jnp.float32,
    )
    return jnp.einsum('bte,enh->btnh', x, kernel.astype(self.dtype))


class HeadMerge(nn.Module):
  """Output projection BTNH,NHE->BTE (no bias)."""

  hidden_size: int
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
    kernel = self.param(
        'kernel',
        nn.initializers.variance_scaling(1.0, 'fan_avg', 'uniform'),
        (x.shape[-2], x.shape[-1], self.hidden_size),
        jnp.float32,
    )
    return jnp.einsum('btnh,nhe->bte', x, kernel.astype(self.dtype))


class BandedSelfAttention(nn.Module):
  """Multi-head self-attention with a static band mask.

  (reference: attention_layer.py:34-237)
  """

  hidden_size: int
  num_heads: int
  dropout: float
  attn_win_size: Optional[int]
  dtype: Any = jnp.float32

  use_pallas: bool = False

  @nn.compact
  def __call__(
      self, x: jnp.ndarray, deterministic: bool = True
  ) -> Dict[str, jnp.ndarray]:
    head_dim = self.hidden_size // self.num_heads
    q = EinsumDense(self.num_heads, head_dim, self.dtype, name='query')(x)
    k = EinsumDense(self.num_heads, head_dim, self.dtype, name='key')(x)
    v = EinsumDense(self.num_heads, head_dim, self.dtype, name='value')(x)

    if self.use_pallas and deterministic:
      # Fused Pallas kernel: mask+softmax+both matmuls in VMEM, no
      # (B, N, L, L) logits tensor in HBM.
      from deepconsensus_tpu.ops import banded_attention as ba

      out = ba.banded_attention(q, k, v, win=self.attn_win_size)
      out = HeadMerge(self.hidden_size, self.dtype, name='output_transform')(
          out
      )
      return {'main_output': out, 'attention_scores': None}

    q = q * jnp.asarray(head_dim**-0.5, self.dtype)
    # logits[b,n,f,t] — f queries, t keys (reference einsum BTNH,BFNH->BNFT).
    logits = jnp.einsum('btnh,bfnh->bnft', k, q)
    mask = band_mask(x.shape[1], self.attn_win_size)
    logits = jnp.where(mask[None, None, :, :], logits, -1e9)
    weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
        self.dtype
    )
    if not deterministic and self.dropout > 0.0:
      weights = nn.Dropout(rate=self.dropout)(weights, deterministic=False)
    out = jnp.einsum('bnft,btnh->bfnh', weights, v)
    out = HeadMerge(self.hidden_size, self.dtype, name='output_transform')(out)
    return {'main_output': out, 'attention_scores': weights}


class FeedForward(nn.Module):
  """filter dense (relu) -> dropout -> output dense (ffn_layer.py:34-87)."""

  hidden_size: int
  filter_size: int
  dropout: float
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(
      self, x: jnp.ndarray, deterministic: bool = True
  ) -> Dict[str, jnp.ndarray]:
    h = nn.Dense(
        self.filter_size, dtype=self.dtype, param_dtype=jnp.float32,
        name='filter_layer',
    )(x)
    h = nn.relu(h)
    if not deterministic and self.dropout > 0.0:
      h = nn.Dropout(rate=self.dropout)(h, deterministic=False)
    h = nn.Dense(
        self.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
        name='output_layer',
    )(h)
    return {'main_output': h}


class ReZero(nn.Module):
  """Residual wrapper: x + alpha * dropout(f(x)), alpha init 0.

  With rezero=False this is a pre-LayerNorm wrapper instead
  (encoder_stack.py:43-93).
  """

  layer: nn.Module
  rezero: bool
  dropout: float
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(
      self, x: jnp.ndarray, deterministic: bool = True
  ) -> Dict[str, jnp.ndarray]:
    if self.rezero:
      y_in = x
    else:
      y_in = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32)(x).astype(
          self.dtype
      )
    out = self.layer(y_in, deterministic=deterministic)
    y = out['main_output']
    if not deterministic and self.dropout > 0.0:
      y = nn.Dropout(rate=self.dropout)(y, deterministic=False)
    if self.rezero:
      alpha = self.param('alpha', nn.initializers.zeros, (), jnp.float32)
      out['main_output'] = x + alpha.astype(self.dtype) * y
    else:
      out['main_output'] = x + y
    return out


class EncoderStack(nn.Module):
  """N x [banded self-attention, FFN] with final LayerNorm.

  (reference: encoder_stack.py:96-198)
  """

  params: ml_collections.FrozenConfigDict
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(
      self, x: jnp.ndarray, deterministic: bool = True
  ) -> Dict[str, jnp.ndarray]:
    p = self.params
    outputs: Dict[str, jnp.ndarray] = {}
    use_pallas = bool(p.get('use_pallas_attention', False))
    for n in range(p.num_hidden_layers):
      attn = BandedSelfAttention(
          hidden_size=p.hidden_size,
          num_heads=p.num_heads,
          dropout=p.attention_dropout,
          attn_win_size=p.attn_win_size,
          dtype=self.dtype,
          use_pallas=use_pallas,
          name=f'attention_{n}',
      )
      wrapped_attn = ReZero(
          layer=attn,
          rezero=p.rezero,
          dropout=p.layer_postprocess_dropout,
          dtype=self.dtype,
          name=f'attention_wrapper_{n}',
      )
      out = wrapped_attn(x, deterministic=deterministic)
      x = out['main_output']
      outputs[f'self_attention_layer_{n}'] = x
      if out['attention_scores'] is not None:
        outputs[f'attention_scores_{n}'] = out['attention_scores']

      ffn = FeedForward(
          hidden_size=p.hidden_size,
          filter_size=p.filter_size,
          dropout=p.relu_dropout,
          dtype=self.dtype,
          name=f'ffn_{n}',
      )
      wrapped_ffn = ReZero(
          layer=ffn,
          rezero=p.rezero,
          dropout=p.layer_postprocess_dropout,
          dtype=self.dtype,
          name=f'ffn_wrapper_{n}',
      )
      x = wrapped_ffn(x, deterministic=deterministic)['main_output']
      outputs[f'ffn_layer_{n}'] = x

    final = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name='output_norm')(
        x
    )
    outputs['final_output'] = final
    return outputs


class LearnedValuesTransformer(nn.Module):
  """The production model: per-feature embeddings + condenser + encoder.

  Two equivalent input paths share the same parameters:
  * `__call__`/`intermediate_outputs`: the dense rows tensor
    (batch, total_rows, length, 1) float32 with the DcConfig row layout —
    the reference's on-disk example format (networks.py:368-520).
  * `compact_outputs`: de-duplicated integer features (bases/pw/ip uint-ish
    per subread row, strand per subread, sn per window) — ~5.5x less data
    across the host->device link; mathematically identical because the
    strand/sn rows of the dense layout are constant along the window.
  """

  params: ml_collections.FrozenConfigDict
  dtype: Any = jnp.float32

  def setup(self):
    p = self.params
    self.bases_embedding = ScaledEmbedding(
        constants.SEQ_VOCAB_SIZE, p.per_base_hidden_size, self.dtype,
        name='bases_embedding',
    )
    if p.use_pw:
      self.pw_embedding = ScaledEmbedding(
          p.PW_MAX + 1, p.pw_hidden_size, self.dtype, name='pw_embedding'
      )
    if p.use_ip:
      self.ip_embedding = ScaledEmbedding(
          p.IP_MAX + 1, p.ip_hidden_size, self.dtype, name='ip_embedding'
      )
    if p.use_strand:
      self.strand_embedding = ScaledEmbedding(
          p.STRAND_MAX + 1, p.strand_hidden_size, self.dtype,
          name='strand_embedding',
      )
    if p.use_ccs_bq:
      self.ccs_bq_embedding = ScaledEmbedding(
          p.CCS_BQ_MAX, p.ccs_bq_hidden_size, self.dtype,
          name='ccs_bq_embedding',
      )
    if p.use_sn:
      self.sn_embedding = ScaledEmbedding(
          p.SN_MAX + 1, p.sn_hidden_size, self.dtype, name='sn_embedding'
      )
    if p.condense_transformer_input:
      self.condenser = nn.Dense(
          p.transformer_input_size, use_bias=False, dtype=self.dtype,
          param_dtype=jnp.float32, name='condenser',
      )
    self.encoder_stack = EncoderStack(
        self.params, self.dtype, name='encoder_stack'
    )
    self.logits_layer = nn.Dense(
        constants.SEQ_VOCAB_SIZE, dtype=jnp.float32, param_dtype=jnp.float32,
        name='logits',
    )
    if not deterministic_dropout_ok(p):
      self.dropout = nn.Dropout(rate=p.layer_postprocess_dropout)

  def _encode(self, h, deterministic, embed_only=False):
    """Condense + pos-encode + encoder + logits (shared by both paths)."""
    p = self.params
    if p.condense_transformer_input:
      h = self.condenser(h)
    if p.add_pos_encoding:
      pos = sinusoidal_position_encoding(
          h.shape[1], p.hidden_size, dtype=self.dtype
      )
      h = h + pos[None, :, :]
    if not deterministic and p.layer_postprocess_dropout > 0.0:
      h = self.dropout(h, deterministic=False)
    if embed_only:
      return {'encoder_input': h}
    outputs = self.encoder_stack(h, deterministic=deterministic)
    outputs['logits'] = self.logits_layer(outputs['final_output'])
    return outputs

  def rows_embed(self, rows: jnp.ndarray) -> jnp.ndarray:
    """Dense rows -> encoder input h (condensed + pos-encoded).

    The pre-encoder half of the dense-rows path, exposed so external
    encoder implementations (the trainable fused Pallas stack in
    ops/fused_encoder.py) can consume the same embeddings in training.
    """
    return self.intermediate_outputs(rows, deterministic=True,
                                     embed_only=True)['encoder_input']

  def intermediate_outputs(
      self, rows: jnp.ndarray, deterministic: bool = True,
      embed_only: bool = False,
  ) -> Dict[str, jnp.ndarray]:
    p = self.params
    # (B, R, L, 1) -> (B, L, R)
    x = jnp.transpose(jnp.squeeze(rows, -1), (0, 2, 1))
    (
        base_idx,
        pw_idx,
        ip_idx,
        strand_idx,
        ccs_idx,
        ccs_bq_idx,
        sn_idx,
    ) = configs.get_indices(p.max_passes, p.use_ccs_bq)

    embedded = []
    ids = x.astype(jnp.int32)

    def gather(layer, sl):
      # One vectorized gather over all rows of a feature: (B, L, n, width)
      # flattened to (B, L, n*width) — concat order identical to the
      # reference's per-row loop.
      e = layer(ids[:, :, sl[0] : sl[1]])
      return e.reshape(e.shape[0], e.shape[1], -1)

    if p.use_bases:
      embedded.append(gather(self.bases_embedding, base_idx))
    if p.use_pw:
      embedded.append(gather(self.pw_embedding, pw_idx))
    if p.use_ip:
      embedded.append(gather(self.ip_embedding, ip_idx))
    if p.use_strand:
      embedded.append(gather(self.strand_embedding, strand_idx))
    if p.use_ccs:
      embedded.append(gather(self.bases_embedding, ccs_idx))
    if p.use_ccs_bq:
      # Shift -1 gap sentinels to id 0 (networks.py:491-497).
      e = self.ccs_bq_embedding(ids[:, :, ccs_bq_idx[0] : ccs_bq_idx[1]] + 1)
      embedded.append(e.reshape(e.shape[0], e.shape[1], -1))
    if p.use_sn:
      embedded.append(gather(self.sn_embedding, sn_idx))

    h = jnp.concatenate(embedded, axis=-1)
    return self._encode(h, deterministic, embed_only=embed_only)

  def compact_embed(
      self,
      bases: jnp.ndarray,
      pw: jnp.ndarray,
      ip: jnp.ndarray,
      strand: jnp.ndarray,
      ccs: jnp.ndarray,
      sn: jnp.ndarray,
      ccs_bq: Optional[jnp.ndarray] = None,
      embed_matmul: bool = False,
  ) -> jnp.ndarray:
    """Compact features -> encoder input h (condensed + pos-encoded).

    The pre-encoder half of compact_outputs, exposed so external encoder
    implementations (e.g. the fused Pallas stack in ops/fused_encoder.py)
    can consume the same embeddings.
    """
    outputs = self.compact_outputs(
        bases, pw, ip, strand, ccs, sn, ccs_bq, deterministic=True,
        embed_only=True, embed_matmul=embed_matmul,
    )
    return outputs['encoder_input']

  def compact_outputs(
      self,
      bases: jnp.ndarray,  # (B, P, L) int
      pw: jnp.ndarray,  # (B, P, L) int
      ip: jnp.ndarray,  # (B, P, L) int
      strand: jnp.ndarray,  # (B, P) int
      ccs: jnp.ndarray,  # (B, L) int
      sn: jnp.ndarray,  # (B, 4) int (pre-clipped)
      ccs_bq: Optional[jnp.ndarray] = None,  # (B, L) int, -1 for gaps
      deterministic: bool = True,
      embed_only: bool = False,
      embed_matmul: bool = False,
      pre_condense: bool = False,
  ) -> Dict[str, jnp.ndarray]:
    """Forward from de-duplicated features — same math, less transport.

    The subread axis P may be smaller than max_passes (pass-bucketed
    transport): rows beyond a window's subread count are all-zero in the
    dense layout and embed to exact zeros, so the embedded features are
    zero-padded back to the max_passes width on device before the
    condenser — bit-identical to the dense path, ~P/max_passes of the
    host->device bytes.

    embed_matmul routes the three big per-position lookups (bases/pw/ip,
    each (B, P, L)) through ScaledEmbedding's one-hot MXU path — ~4x
    faster than TPU gathers with bit-identical values. (A fully fused
    Mosaic dynamic-gather embed+concat kernel was prototyped and
    measured in round 5 — interpret-exact, but unprofitable on-chip:
    Mosaic's lane-gather needs an 8-width × 2-half composition that
    costs more than this already-fused XLA path; evidence in
    docs/gather_ubench.json and docs/embed_ab_tpu.json.)
    """
    p = self.params
    B, P, L = bases.shape
    embedded = []

    def per_subread(layer, x, width):
      # (B, P, L, width) -> (B, L, P*width): row-major over subread rows,
      # matching the dense layout's concat order; zero-pad to max_passes.
      # (Transposing the int ids BEFORE the lookup instead measured 2x
      # slower on-chip — docs/embed_ab_tpu.json — XLA places this f32
      # transpose better than the hand-moved int one.)
      e = layer(x.astype(jnp.int32), via_matmul=embed_matmul)
      e = jnp.transpose(e, (0, 2, 1, 3)).reshape(B, L, P * width)
      if P < p.max_passes:
        e = jnp.pad(e, ((0, 0), (0, 0), (0, (p.max_passes - P) * width)))
      return e

    if p.use_bases:
      embedded.append(
          per_subread(self.bases_embedding, bases, p.per_base_hidden_size)
      )
    if p.use_pw:
      embedded.append(per_subread(self.pw_embedding, pw, p.pw_hidden_size))
    if p.use_ip:
      embedded.append(per_subread(self.ip_embedding, ip, p.ip_hidden_size))
    if p.use_strand:
      e = self.strand_embedding(strand.astype(jnp.int32))  # (B, P, w)
      e = e.reshape(B, 1, P * p.strand_hidden_size)
      if P < p.max_passes:
        e = jnp.pad(
            e,
            ((0, 0), (0, 0), (0, (p.max_passes - P) * p.strand_hidden_size)),
        )
      embedded.append(jnp.broadcast_to(e, (B, L, e.shape[-1])))
    if p.use_ccs:
      e = self.bases_embedding(ccs.astype(jnp.int32))
      embedded.append(e)
    if p.use_ccs_bq:
      e = self.ccs_bq_embedding(ccs_bq.astype(jnp.int32) + 1)
      embedded.append(e)
    if p.use_sn:
      e = self.sn_embedding(sn.astype(jnp.int32))  # (B, 4, w)
      e = e.reshape(B, 1, -1)
      embedded.append(jnp.broadcast_to(e, (B, L, e.shape[-1])))

    h = jnp.concatenate(embedded, axis=-1)
    if pre_condense:
      # Raw embedded concat, before condenser/pos-encoding — stage
      # isolation hook for perf diagnostics (tools/bench_stages.py).
      return {'encoder_input': h}
    return self._encode(h, deterministic, embed_only=embed_only)

  def __call__(
      self, rows: jnp.ndarray, deterministic: bool = True
  ) -> jnp.ndarray:
    outputs = self.intermediate_outputs(rows, deterministic=deterministic)
    return jax.nn.softmax(outputs['logits'], axis=-1)


def deterministic_dropout_ok(p) -> bool:
  """True when the model never needs a Dropout submodule."""
  return p.layer_postprocess_dropout <= 0.0


class RawRowsTransformer(nn.Module):
  """Encoder-only transformer over raw feature rows (no learned embeddings).

  The reference's base `EncoderOnlyTransformer` (networks.py:173-365):
  rows are squeezed/transposed to (B, L, total_rows) and fed directly to
  the encoder; an odd feature width gains one zero column so the
  sinusoidal position encoding splits evenly (networks.py:301-306).
  """

  params: ml_collections.FrozenConfigDict
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(
      self, rows: jnp.ndarray, deterministic: bool = True
  ) -> jnp.ndarray:
    p = self.params
    x = jnp.transpose(jnp.squeeze(rows, -1), (0, 2, 1)).astype(self.dtype)
    if p.add_pos_encoding and x.shape[-1] % 2 != 0:
      x = jnp.pad(x, ((0, 0), (0, 0), (0, 1)))
    if p.add_pos_encoding:
      pos = sinusoidal_position_encoding(
          x.shape[1], x.shape[-1], dtype=self.dtype
      )
      x = x + pos[None, :, :]
    if not deterministic and p.layer_postprocess_dropout > 0.0:
      x = nn.Dropout(rate=p.layer_postprocess_dropout)(x, deterministic=False)
    outputs = EncoderStack(self.params, self.dtype, name='encoder_stack')(
        x, deterministic=deterministic
    )
    logits = nn.Dense(
        constants.SEQ_VOCAB_SIZE, dtype=jnp.float32, param_dtype=jnp.float32,
        name='logits',
    )(outputs['final_output'])
    return jax.nn.softmax(logits, axis=-1)


class FullyConnectedNet(nn.Module):
  """FC baseline (reference: networks.py:67-92)."""

  params: ml_collections.FrozenConfigDict
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(
      self, rows: jnp.ndarray, deterministic: bool = True
  ) -> jnp.ndarray:
    p = self.params
    h = rows.reshape(rows.shape[0], -1).astype(self.dtype)
    for i, size in enumerate(p.fc_size):
      h = nn.Dense(size, dtype=self.dtype, name=f'fc_{i}')(h)
      h = nn.relu(h)
      if not deterministic and p.fc_dropout > 0.0:
        h = nn.Dropout(rate=p.fc_dropout)(h, deterministic=False)
    h = nn.Dense(
        p.max_length * constants.SEQ_VOCAB_SIZE, dtype=jnp.float32, name='out'
    )(h)
    h = h.reshape(h.shape[0], p.max_length, constants.SEQ_VOCAB_SIZE)
    return jax.nn.softmax(h, axis=-1)


class BottleneckV2(nn.Module):
  """Pre-activation bottleneck block (He et al. v2; keras resnet_v2.block2).

  preact norm+relu -> 1x1 reduce -> norm+relu -> 3x3 (carries the stride)
  -> norm+relu -> 1x1 expand to 4*filters. Shortcut: 1x1 conv on the
  preactivated input when the block changes width, a strided 1x1 max-pool
  when it only downsamples, identity otherwise — exactly keras's wiring.
  """

  filters: int
  stride: int = 1
  conv_shortcut: bool = False
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    preact = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(x)
    preact = nn.relu(preact)
    if self.conv_shortcut:
      shortcut = nn.Conv(
          4 * self.filters, (1, 1), (self.stride, self.stride),
          dtype=self.dtype, name='shortcut',
      )(preact)
    elif self.stride > 1:
      shortcut = nn.max_pool(
          x, (1, 1), strides=(self.stride, self.stride)
      )
    else:
      shortcut = x
    h = nn.Conv(
        self.filters, (1, 1), use_bias=False, dtype=self.dtype, name='conv1'
    )(preact)
    h = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(h)
    h = nn.relu(h)
    h = nn.Conv(
        self.filters, (3, 3), (self.stride, self.stride), use_bias=False,
        dtype=self.dtype, name='conv2',
    )(h)
    h = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(h)
    h = nn.relu(h)
    h = nn.Conv(4 * self.filters, (1, 1), dtype=self.dtype, name='conv3')(h)
    return shortcut + h


# Stage depths of the three backbones the reference instantiates
# (keras ResNet{50,101,152}V2; reference networks.py:100-117).
_RESNET_DEPTHS = {
    'resnet50': (3, 4, 6, 3),
    'resnet101': (3, 4, 23, 3),
    'resnet152': (3, 8, 36, 3),
}


class ResNetV2(nn.Module):
  """ResNetV2 backbone, architecturally equivalent to keras ResNet*V2.

  Stem: 7x7/2 conv + 3x3/2 max pool; four bottleneck stages with widths
  64/128/256/512 (x4 expansion), downsampling at the END of stages 1-3
  (keras's stack2 places stride1=2 on each stage's last block); final
  norm+relu; global average pool. Documented deviation from the
  reference: BatchNorm is replaced by GroupNorm(32) — batch statistics
  would need cross-replica sync on a TPU mesh, while GroupNorm is
  batch-independent and mesh-free with equivalent capacity at these
  widths. Weights are random-init in the reference too (weights=None,
  networks.py:131-136), so there is no pretrained-checkpoint contract to
  preserve.
  """

  depths: Tuple[int, ...]
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x):
    h = nn.Conv(
        64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)], dtype=self.dtype,
        name='stem_conv',
    )(x)
    h = nn.max_pool(h, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
    for stage, (filters, blocks) in enumerate(
        zip((64, 128, 256, 512), self.depths)
    ):
      last_stride = 2 if stage < 3 else 1
      for i in range(blocks):
        h = BottleneckV2(
            filters,
            stride=last_stride if i == blocks - 1 else 1,
            conv_shortcut=(i == 0),
            dtype=self.dtype,
            name=f'stage{stage + 1}_block{i + 1}',
        )(h)
    h = nn.GroupNorm(num_groups=32, dtype=jnp.float32, name='post_norm')(h)
    h = nn.relu(h)
    return jnp.mean(h, axis=(1, 2))  # pooling='avg'


class ConvNet(nn.Module):
  """Convolutional baseline (reference ConvNet, networks.py:121-170).

  A full ResNet50/101/152V2 backbone (params.conv_model) over the window
  feature image, global-average-pooled, with the 4 SN values concatenated
  when params.use_sn, then a single dense to max_length*vocab logits —
  the reference's exact head (networks.py:142-169). Input scaling mirrors
  resnet_v2.preprocess_input (x/127.5 - 1). The reference splits off the
  SN channel before the backbone; here the equivalent SN rows are dropped
  from the image and re-enter at the head, the same information flow over
  the row-stacked (not channel-stacked) layout this framework uses.
  """

  params: ml_collections.FrozenConfigDict
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(
      self, rows: jnp.ndarray, deterministic: bool = True
  ) -> jnp.ndarray:
    p = self.params
    x = rows.astype(self.dtype)  # (B, R, L, 1)
    sn_slice = configs.get_indices(p.max_passes, p.use_ccs_bq)[6]
    sn_rows = x[:, sn_slice[0] : sn_slice[1], 0, 0]  # (B, 4), constant rows
    img = x[:, : sn_slice[0]]  # backbone sees everything but the SN rows
    img = img / 127.5 - 1.0  # resnet_v2.preprocess_input equivalent

    depths = _RESNET_DEPTHS.get(p.get('conv_model', 'resnet50'))
    if depths is None:
      raise NotImplementedError(
          f'conv model "{p.conv_model}" not found'
      )  # same error contract as reference networks.py:117
    feat = ResNetV2(depths, dtype=self.dtype, name='backbone')(img)

    if p.use_sn:
      feat = jnp.concatenate([feat, sn_rows.astype(self.dtype)], axis=-1)
    h = nn.Dense(
        p.max_length * constants.SEQ_VOCAB_SIZE, dtype=jnp.float32,
        name='head',
    )(feat)
    h = h.reshape(h.shape[0], p.max_length, constants.SEQ_VOCAB_SIZE)
    return jax.nn.softmax(h, axis=-1)


def get_model(params: ml_collections.ConfigDict, dtype=jnp.float32):
  """Model factory (reference: model_utils.get_model, model_utils.py:142-152)."""
  frozen = ml_collections.FrozenConfigDict(params)
  name = params.model_name
  if name in ('transformer_learn_values', 'transformer_learn_values_distill'):
    return LearnedValuesTransformer(frozen, dtype)
  if name == 'transformer':
    return RawRowsTransformer(frozen, dtype)
  if name == 'fc':
    return FullyConnectedNet(frozen, dtype)
  if name == 'conv_net':
    return ConvNet(frozen, dtype)
  raise ValueError(f'unknown model {name!r}')


def init_params(model, params_config, rng=None, batch: int = 1):
  """Initializes a variables pytree with a dummy forward pass."""
  if rng is None:
    rng = jax.random.PRNGKey(params_config.seed)
  shape = (
      batch,
      params_config.total_rows,
      params_config.max_length,
      params_config.num_channels,
  )
  dummy = jnp.zeros(shape, jnp.float32)
  return model.init({'params': rng}, dummy, deterministic=True)
