"""Differentiable alignment loss + hard alignment metric in JAX.

TPU-first reimplementation of the reference's alignment math
(`reference: models/losses_and_metrics.py`):

* `alignment_loss` — soft-min (−reg·logsumexp(−x/reg)) Needleman-Wunsch over
  (sub, ins, del) moves with constant deletion cost, computed as a
  `lax.scan` over antidiagonals (the reference's "wavefront" recursion,
  losses_and_metrics.py:346-411). Fully differentiable; gradients flow
  through the logsumexp soft-min.
* `alignment_metric` — hard affine-gap NW approximating pbmm2 (match 2,
  mismatch 5, open 5+ext, extend 4) with a 3-state (M/I/D) forward wavefront
  plus integer backtracking reconstructing the full alignment path, from
  which per-example match/insertion/deletion/identity(PID) counts derive
  (losses_and_metrics.py:666-1058).

Antidiagonal tensors are precomputed with one vectorized gather instead of
the reference's per-row TensorArray loops (losses_and_metrics.py:210-260).
All shapes are static; both functions jit and vmap cleanly.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepconsensus_tpu import constants

GAP = constants.GAP_INT
INF = 1e9


def left_shift_sequence(y: jnp.ndarray) -> jnp.ndarray:
  """Moves internal gaps right, preserving base order (batch, length).

  Two-stage index sort, as in the reference (losses_and_metrics.py:92-115).
  """
  seq_length = y.shape[1]
  ixs = jnp.broadcast_to(jnp.arange(seq_length), y.shape)
  sort_order = jnp.sort(jnp.where(y != GAP, ixs, seq_length + ixs), axis=1)
  sort_order = jnp.where(
      sort_order < seq_length, sort_order, sort_order - seq_length
  )
  return jnp.take_along_axis(y, sort_order, axis=1)


def xentropy_subs_cost_fn(y_true_oh, y_pred, eps=1e-7):
  """Outer-product cross-entropy costs [b, m, n] (losses_and_metrics.py:123-143)."""
  y_pred = jnp.clip(y_pred, eps, 1 - eps)
  # -sum_k y_true[b,i,k] * log y_pred[b,j,k]
  return -jnp.einsum('bik,bjk->bij', y_true_oh, jnp.log(y_pred))


def xentropy_ins_cost_fn(y_pred, eps=1e-7):
  """-log P(gap) per predicted position [b, n] (losses_and_metrics.py:191-207)."""
  return -jnp.log(jnp.clip(y_pred[..., GAP], eps, 1 - eps))


def accuracy_subs_cost_fn(y_true_oh, y_pred):
  """1.0 where argmax labels agree, else 0.0 (losses_and_metrics.py:146-163)."""
  t = jnp.argmax(y_true_oh, axis=-1)
  p = jnp.argmax(y_pred, axis=-1)
  return (t[:, :, None] == p[:, None, :]).astype(y_pred.dtype)


def pbmm2_subs_cost_fn(y_true, y_pred, matching_score, mismatch_penalty):
  """Match/mismatch scores for int sequences (losses_and_metrics.py:166-188)."""
  return jnp.where(
      y_true[:, :, None] == y_pred[:, None, :],
      matching_score,
      -mismatch_penalty,
  )


def _wavefrontify(subs: jnp.ndarray) -> jnp.ndarray:
  """[b, m, n] -> [m+n-1, m, b] with out[k, i, b] = subs[b, i, k - i]."""
  b, m, n = subs.shape
  k = jnp.arange(m + n - 1)[:, None]
  i = jnp.arange(m)[None, :]
  j = k - i
  valid = (j >= 0) & (j < n)
  jc = jnp.clip(j, 0, n - 1)
  gathered = subs[:, i, jc]  # [b, K, m]
  gathered = jnp.where(valid[None], gathered, 0.0)
  return jnp.transpose(gathered, (1, 2, 0))


def _wavefrontify_vec(vec: jnp.ndarray, len1: int) -> jnp.ndarray:
  """[b, n] -> [len1+n-1, len1, b] with out[k, i, b] = vec[b, k - i]."""
  b, n = vec.shape
  k = jnp.arange(len1 + n - 1)[:, None]
  i = jnp.arange(len1)[None, :]
  j = k - i
  valid = (j >= 0) & (j < n)
  jc = jnp.clip(j, 0, n - 1)
  gathered = vec[:, jc]  # [b, K, len1]
  gathered = jnp.where(valid[None], gathered, 0.0)
  return jnp.transpose(gathered, (1, 2, 0))


def preprocess_y_true(y_true: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Left-shifts labels, returns (one-hot [b,m,V], seq_lens [b])."""
  y_true = left_shift_sequence(y_true.astype(jnp.int32))
  seq_lens = jnp.sum((y_true != GAP).astype(jnp.int32), axis=-1)
  y_true_oh = jax.nn.one_hot(y_true, constants.SEQ_VOCAB_SIZE)
  return y_true_oh, seq_lens


def alignment_loss(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    del_cost: float = 10.0,
    loss_reg: Optional[float] = 0.1,
    width: Optional[int] = None,
) -> jnp.ndarray:
  """Per-example soft alignment loss [b].

  Args:
    y_true: [b, m] int/float label token ids (with gaps/padding).
    y_pred: [b, n, V] predicted probability simplexes, n >= m.
    del_cost: constant deletion cost.
    loss_reg: soft-min temperature; None = hard min.
    width: optional band half-width restricting |i-j| along the path.
  """
  y_true_oh, seq_lens = preprocess_y_true(y_true)
  y_pred = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
  subs_costs = xentropy_subs_cost_fn(y_true_oh, y_pred)
  ins_costs = xentropy_ins_cost_fn(y_pred)
  if width is not None:
    return _banded_forward(
        subs_costs, ins_costs, del_cost, seq_lens, loss_reg, width
    )
  return _alignment_forward(subs_costs, ins_costs, del_cost, seq_lens, loss_reg)


def alignment_loss_with_matches(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    del_cost: float = 10.0,
    loss_reg: Optional[float] = 0.1,
    width: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Soft alignment loss plus recovered match probabilities.

  Equivalent of the reference's `AlignmentLoss.eval(return_matches=True)`
  (losses_and_metrics.py:549-595): the gradient of the soft-min DP value
  with respect to the substitution costs is, by Danskin/Gibbs duality, the
  marginal probability that true position i aligns to predicted position j
  under the Gibbs distribution the soft-min induces. With `loss_reg=None`
  (hard min) the matches collapse to the 0/1 indicator of the optimal path's
  substitution edges.

  Returns:
    (loss [b], matches [b, m, n]).
  """
  y_true_oh, seq_lens = preprocess_y_true(y_true)
  y_pred = y_pred / jnp.sum(y_pred, axis=-1, keepdims=True)
  subs_costs = xentropy_subs_cost_fn(y_true_oh, y_pred)
  ins_costs = xentropy_ins_cost_fn(y_pred)

  def forward(sc):
    if width is not None:
      return _banded_forward(sc, ins_costs, del_cost, seq_lens, loss_reg, width)
    return _alignment_forward(sc, ins_costs, del_cost, seq_lens, loss_reg)

  # Each example's loss depends only on its own cost slab, so the VJP with
  # an all-ones cotangent yields every example's d loss / d subs_costs.
  loss, vjp = jax.vjp(forward, subs_costs)
  (matches,) = vjp(jnp.ones_like(loss))
  return loss, matches


def _alignment_forward(subs_costs, ins_costs, del_cost, seq_lens, loss_reg):
  """Wavefront DP over antidiagonals k = 2..m+n via lax.scan.

  (losses_and_metrics.py:346-411)

  Caveat shared with the reference recursion: an example whose
  k_end = seq_lens + n < 2 (all-gap label AND n <= 1) never matches a
  scanned antidiagonal, so its loss stays at the INF init. Unreachable
  at production window widths (n = max_length >= 2).
  """
  b, m, n = subs_costs.shape
  ws = _wavefrontify(subs_costs)  # [m+n-1, m, b]
  wi = _wavefrontify_vec(ins_costs, m + 1)  # [m+n, m+1, b]

  if loss_reg is None:
    minop = lambda t: jnp.min(t, axis=0)
  else:
    minop = lambda t: -loss_reg * jax.nn.logsumexp(-t / loss_reg, axis=0)

  i_range = jnp.arange(m + 1)
  k_end = seq_lens + n
  batch_idx = jnp.arange(b)

  v_opt0 = jnp.full((b,), INF)
  v_p2_0 = jnp.concatenate([jnp.zeros((1, b)), jnp.full((m - 1, b), INF)])
  v_p1_0 = jnp.concatenate(
      [wi[0][:1], jnp.full((1, b), del_cost), jnp.full((m - 1, b), INF)]
  )

  def step(carry, k):
    v_p1, v_p2, v_opt = carry
    j_range = k - i_range
    inv_mask = ((j_range >= 0) & (j_range <= n))[:, None]
    o_m = v_p2 + ws[k - 2]
    o_i = v_p1 + wi[k - 1]
    v_p2_new = v_p1[:-1]
    o_d = v_p2_new + del_cost
    core = minop(jnp.stack([o_m, o_i[1:], o_d]))
    v_p1_new = jnp.concatenate([o_i[:1], core])
    v_p1_new = jnp.where(inv_mask, v_p1_new, INF)
    v_opt = jnp.where(k_end == k, v_p1_new[seq_lens, batch_idx], v_opt)
    return (v_p1_new, v_p2_new, v_opt), None

  (_, _, v_opt), _ = jax.lax.scan(
      step, (v_p1_0, v_p2_0, v_opt0), jnp.arange(2, m + n + 1)
  )
  return v_opt


def _banded_forward(subs_costs, ins_costs, del_cost, seq_lens, loss_reg, width):
  """Banded variant: DP restricted to the diagonal band |i - j| <= width.

  Computes the same optimum as the reference's diagonal-weave formulation
  (losses_and_metrics.py:475-547) as a row-by-row DP over a (2w+1)-wide
  band in offset coordinates d = j - i + width (i over true positions,
  j over predicted positions). Move costs match the unbanded recursion:
  consuming a predicted position costs ins_costs[j-1], consuming a true
  position costs del_cost, and the diagonal costs subs_costs[i-1, j-1].
  The result is fetched at (seq_lens, min(n, seq_lens + width)) — the
  band's closest point to consuming the whole prediction
  (losses_and_metrics.py:458-473).

  The soft-min composes associatively (logsumexp over a 3-way min equals
  nested 2-way logsumexps), so the in-row left-to-right pass is exact.
  """
  b, m, n = subs_costs.shape
  w = int(width)
  nd = 2 * w + 1
  if loss_reg is None:
    minop = lambda t: jnp.min(t, axis=0)
  else:
    minop = lambda t: -loss_reg * jax.nn.logsumexp(-t / loss_reg, axis=0)

  d_range = jnp.arange(nd)

  # Row 0 (no true consumed): V[0, j] = prefix-sum of insertion costs.
  ins_prefix = jnp.concatenate(
      [jnp.zeros((b, 1)), jnp.cumsum(ins_costs, axis=1)], axis=1
  )  # [b, n+1]
  j0 = d_range - w
  row0 = jnp.where(
      (j0 >= 0) & (j0 <= n),
      jnp.take_along_axis(
          ins_prefix, jnp.clip(j0, 0, n)[None, :].repeat(b, 0), axis=1
      ),
      INF,
  )

  subs_pad = jnp.pad(subs_costs, ((0, 0), (0, 0), (1, 0)))  # j 1-based
  ins_pad = jnp.pad(ins_costs, ((0, 0), (1, 0)))  # ins cost of pred j

  def step(prev_row, i):
    # prev_row: [b, nd] = V[i-1, j] at offsets d = j-(i-1)+w.
    j_idx = d_range[None, :] + i - w  # actual j at offset d for row i
    valid = (j_idx >= 0) & (j_idx <= n)
    jc = jnp.clip(j_idx, 0, n)

    subs_here = jnp.where(
        valid & (jc >= 1),
        jnp.take_along_axis(subs_pad[:, i - 1, :], jc, axis=1),
        INF,
    )
    ins_here = jnp.where(
        valid & (jc >= 1),
        jnp.take_along_axis(ins_pad, jc, axis=1),
        INF,
    )

    # diag: V[i-1, j-1] at prev offset d (j-1-(i-1)+w = d).
    diag = prev_row + subs_here
    # consume true i only: V[i-1, j] at prev offset d+1.
    up = (
        jnp.concatenate([prev_row[:, 1:], jnp.full((b, 1), INF)], axis=1)
        + del_cost
    )
    base = minop(jnp.stack([diag, up]))

    # consume pred j: V[i, j-1] at offset d-1 in the SAME row — resolved by
    # a left-to-right scan across the band.
    def band_scan(left, d):
      cand = minop(jnp.stack([base[:, d], left + ins_here[:, d]]))
      cand = jnp.where(valid[:, d], cand, INF)
      return cand, cand

    _, row_t = jax.lax.scan(band_scan, jnp.full((b,), INF), d_range)
    row = jnp.transpose(row_t)
    return row, row

  _, rows = jax.lax.scan(step, row0, jnp.arange(1, m + 1))
  rows = jnp.concatenate([row0[None], rows])  # [m+1, b, nd]

  i_star = seq_lens
  j_star = jnp.minimum(n, seq_lens + w)
  d_star = j_star - i_star + w
  return rows[i_star, jnp.arange(b), d_star]


def alignment_metric(
    y_true: jnp.ndarray,
    y_pred_scores: jnp.ndarray,
    matching_score: float = 2.0,
    mismatch_penalty: float = 5.0,
    gap_open_penalty: float = 5.0,
    gap_extend_penalty: float = 4.0,
) -> Tuple[jnp.ndarray, jnp.ndarray, Dict[str, jnp.ndarray]]:
  """Hard affine-gap NW with backtracking (losses_and_metrics.py:704-1043).

  Returns (v_opt [b], paths [b, m+1, n+1] int edge codes, metrics dict).
  Edge codes: 1 match, 2 insert-open, 3 insert-extend, 4 delete-open,
  5 delete-extend.
  """
  y_true = left_shift_sequence(y_true.astype(jnp.int32))
  y_true_lens = jnp.sum((y_true != GAP).astype(jnp.int32), axis=-1)
  y_pred = left_shift_sequence(
      jnp.argmax(y_pred_scores, axis=-1).astype(jnp.int32)
  )
  y_pred_lens = jnp.sum((y_pred != GAP).astype(jnp.int32), axis=-1)

  b, m = y_true.shape
  n = y_pred.shape[1]
  gap_open = gap_open_penalty + gap_extend_penalty  # pbmm2 convention shift
  gap_extend = gap_extend_penalty

  subs_costs = pbmm2_subs_cost_fn(
      y_true, y_pred, matching_score, mismatch_penalty
  )
  ws = _wavefrontify(subs_costs)  # [m+n-1, m, b]
  gap_pens = jnp.array([gap_open, gap_open, gap_extend])[:, None, None]

  i_range = jnp.arange(m + 1)
  k_end = y_true_lens + y_pred_lens
  samp_idx = jnp.arange(b)

  # k = 0 state.
  v_all_p2 = jnp.concatenate(
      [
          jnp.pad(
              jnp.full((1, m - 1, b), -INF),
              ((0, 0), (1, 0), (0, 0)),
              constant_values=0.0,
          ),
          jnp.full((2, m, b), -INF),
      ]
  )
  dir0 = jnp.concatenate(
      [
          jnp.pad(
              jnp.full((1, m, b), -2, jnp.int32),
              ((0, 0), (1, 0), (0, 0)),
              constant_values=-1,
          ),
          jnp.full((2, m + 1, b), -2, jnp.int32),
      ]
  )
  # k = 1 state.
  col_open = jnp.pad(
      jnp.full((m, b), -INF), ((1, 0), (0, 0)), constant_values=-gap_open
  )
  v_all_p1 = jnp.stack(
      [jnp.full((m + 1, b), -INF), col_open, jnp.roll(col_open, 1, axis=0)]
  )
  dir_col = jnp.pad(
      jnp.full((m, b), -2, jnp.int32), ((1, 0), (0, 0)), constant_values=0
  )
  dir1 = jnp.stack(
      [jnp.full((m + 1, b), -2, jnp.int32), dir_col, jnp.roll(dir_col, 1, 0)]
  )

  v_opt0 = jnp.zeros((b,))
  m_opt0 = jnp.full((b,), -1, jnp.int32)

  def maybe_update(k, v_opt, m_opt, v_all):
    v_k = jnp.max(v_all, axis=0)
    m_k = jnp.argmax(v_all, axis=0).astype(jnp.int32)
    cond = k_end == k
    v_opt = jnp.where(cond, v_k[y_true_lens, samp_idx], v_opt)
    m_opt = jnp.where(cond, m_k[y_true_lens, samp_idx], m_opt)
    return v_opt, m_opt

  v_opt0, m_opt0 = maybe_update(1, v_opt0, m_opt0, v_all_p1)

  def fwd_step(carry, k):
    v_all_p1, v_all_p2, v_opt, m_opt = carry
    j_range = k - i_range
    inv_mask = ((j_range >= 0) & (j_range <= n))[None, :, None]

    o_match = v_all_p2 + ws[k - 2]  # [3, m, b]
    o_ins = v_all_p1[:2] - gap_pens[1:]  # [2, m+1, b]
    v_all_p2_new = v_all_p1[:, :-1]  # [3, m, b]
    o_del = v_all_p2_new - gap_pens  # [3, m, b]

    v_match = jnp.max(o_match, 0)
    d_match = jnp.argmax(o_match, 0).astype(jnp.int32)
    v_ins = jnp.max(o_ins, 0)
    d_ins = jnp.argmax(o_ins, 0).astype(jnp.int32)
    v_del = jnp.max(o_del, 0)
    d_del = jnp.argmax(o_del, 0).astype(jnp.int32)

    v_match = jnp.pad(v_match, ((1, 0), (0, 0)), constant_values=-INF)
    v_del = jnp.pad(v_del, ((1, 0), (0, 0)), constant_values=-INF)
    d_match = jnp.pad(d_match, ((1, 0), (0, 0)), constant_values=-2)
    d_del = jnp.pad(d_del, ((1, 0), (0, 0)), constant_values=-2)

    v_all_new = jnp.where(inv_mask, jnp.stack([v_match, v_ins, v_del]), -INF)
    dirs_k = jnp.stack([d_match, d_ins, d_del])
    v_opt, m_opt = maybe_update(k, v_opt, m_opt, v_all_new)
    return (v_all_new, v_all_p2_new, v_opt, m_opt), dirs_k.astype(jnp.int8)

  (v_all_p1, _, v_opt, m_opt), dirs = jax.lax.scan(
      fwd_step, (v_all_p1, v_all_p2, v_opt0, m_opt0), jnp.arange(2, m + n + 1)
  )
  # dir_all[k] for k = 0..m+n.
  dir_all = jnp.concatenate(
      [dir0[None].astype(jnp.int8), dir1[None].astype(jnp.int8), dirs]
  )

  # Backtracking (losses_and_metrics.py:945-1006).
  steps_k = jnp.array([-2, -1, -1], jnp.int32)
  steps_i = jnp.array([-1, 0, -1], jnp.int32)
  trans_enc = jnp.array([[1, 1, 1], [2, 3, 2], [4, 4, 5]], jnp.int32)

  def bwd_step(carry, inputs):
    k, dir_k = inputs
    k_opt, i_opt, m_opt = carry
    safe_m = jnp.maximum(m_opt, 0)
    safe_i = jnp.maximum(i_opt, 0)
    k_opt_n = k_opt + steps_k[safe_m]
    i_opt_n = i_opt + steps_i[safe_m]
    m_opt_n = dir_k[safe_m, safe_i, samp_idx].astype(jnp.int32)
    safe_m_n = jnp.maximum(m_opt_n, 0)
    edges_n = trans_enc[safe_m, safe_m_n]
    paths_sp_n = jnp.stack([samp_idx, i_opt, k_opt - i_opt, edges_n], -1)
    reached_start = m_opt_n == -1
    cond = (k_opt == k) & ~reached_start
    k_opt = jnp.where(cond, k_opt_n, k_opt)
    i_opt = jnp.where(cond, i_opt_n, i_opt)
    m_opt = jnp.where(cond, m_opt_n, m_opt)
    paths_sp_k = jnp.where(cond[:, None], paths_sp_n, 0)
    return (k_opt, i_opt, m_opt), paths_sp_k

  ks = jnp.arange(m + n, -1, -1)
  (_, _, _), paths_sp = jax.lax.scan(
      bwd_step, (k_end, y_true_lens, m_opt), (ks, dir_all[ks])
  )
  paths_sp = paths_sp.reshape(-1, 4)
  paths = jnp.zeros((b, m + 1, n + 1), jnp.int32)
  paths = paths.at[paths_sp[:, 0], paths_sp[:, 1], paths_sp[:, 2]].add(
      paths_sp[:, 3]
  )

  matches_mask = paths == 1
  insertions_mask = (paths == 2) | (paths == 3)
  deletions_mask = (paths == 4) | (paths == 5)
  correct_matches = matches_mask[:, 1:, 1:] & (subs_costs > 0)

  def sum_positions(t):
    return jnp.sum(t.astype(jnp.int32), axis=(1, 2))

  metric_values = {
      'num_matches': sum_positions(matches_mask),
      'num_insertions': sum_positions(insertions_mask),
      'num_deletions': sum_positions(deletions_mask),
      'num_correct_matches': sum_positions(correct_matches),
  }
  metric_values['alignment_length'] = (
      metric_values['num_matches']
      + metric_values['num_insertions']
      + metric_values['num_deletions']
  )
  unsafe_pid = metric_values['num_correct_matches'] / jnp.maximum(
      metric_values['alignment_length'], 1
  )
  metric_values['pid'] = jnp.where(
      metric_values['alignment_length'] > 0, unsafe_pid, 1.0
  )
  return v_opt, paths, metric_values


def per_batch_identity(metric_values: Dict[str, jnp.ndarray]) -> jnp.ndarray:
  """Batch-pooled identity (losses_and_metrics.py:1101-1111)."""
  tot = jnp.sum(metric_values['alignment_length'])
  pid = jnp.sum(metric_values['num_correct_matches']) / jnp.maximum(tot, 1)
  return jnp.where(tot > 0, pid, 1.0).astype(jnp.float32)


def batch_identity_ccs_pred(
    ccs: jnp.ndarray, y_pred_scores: jnp.ndarray, y_true: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """Identity of (ccs, prediction) vs label (losses_and_metrics.py:1061-1098)."""
  _, _, mv_pred = alignment_metric(y_true, y_pred_scores)
  identity_pred = per_batch_identity(mv_pred)
  ccs_oh = jax.nn.one_hot(ccs.astype(jnp.int32), constants.SEQ_VOCAB_SIZE)
  _, _, mv_ccs = alignment_metric(y_true, ccs_oh)
  identity_ccs = per_batch_identity(mv_ccs)
  return identity_ccs, identity_pred


def per_example_accuracy(
    y_true: jnp.ndarray, y_pred_scores: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """(#exact-match examples, #examples) after left-shifting both sides.

  (losses_and_metrics.py:37-65)
  """
  y_true_shifted = left_shift_sequence(y_true.astype(jnp.int32))
  y_pred = left_shift_sequence(
      jnp.argmax(y_pred_scores, axis=-1).astype(jnp.int32)
  )
  exact = jnp.all(y_true_shifted == y_pred, axis=-1)
  return jnp.sum(exact.astype(jnp.int32)), y_true.shape[0]


def per_class_accuracy(
    y_true: jnp.ndarray, y_pred_scores: jnp.ndarray, class_value: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """(#correct, #total) at positions where the label equals class_value.

  (losses_and_metrics.py:68-89)
  """
  y_true = y_true.astype(jnp.int32)
  y_pred = jnp.argmax(y_pred_scores, axis=-1).astype(jnp.int32)
  mask = y_true == class_value
  correct = jnp.sum((mask & (y_true == y_pred)).astype(jnp.int32))
  total = jnp.sum(mask.astype(jnp.int32))
  return correct, total


def distillation_loss(
    teacher_logits: jnp.ndarray,
    student_logits: jnp.ndarray,
    temperature: float = 1.0,
    kind: str = 'mean_squared_error',
) -> jnp.ndarray:
  """Per-example distillation loss [b] (losses_and_metrics.py:1170-1213)."""
  t = jax.nn.softmax(teacher_logits / temperature, axis=-1)
  s = jax.nn.softmax(student_logits / temperature, axis=-1)
  if kind == 'mean_squared_error':
    per_pos = jnp.mean((t - s) ** 2, axis=-1)
  elif kind == 'kl_divergence':
    eps = 1e-7
    per_pos = jnp.sum(
        jnp.clip(t, eps, 1.0)
        * jnp.log(jnp.clip(t, eps, 1.0) / jnp.clip(s, eps, 1.0)),
        axis=-1,
    )
  else:
    raise ValueError(f'unknown distillation loss {kind!r}')
  return jnp.mean(per_pos, axis=-1)


def xentropy_loss(y_true: jnp.ndarray, y_pred: jnp.ndarray) -> jnp.ndarray:
  """Plain per-example cross-entropy over positions (non-alignment option)."""
  y_true_oh = jax.nn.one_hot(
      y_true.astype(jnp.int32), constants.SEQ_VOCAB_SIZE
  )
  logp = jnp.log(jnp.clip(y_pred, 1e-7, 1.0))
  return -jnp.mean(jnp.sum(y_true_oh * logp, axis=-1), axis=-1)


