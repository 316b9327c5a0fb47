"""Custom training loop: jitted train/eval steps, LAMB, checkpoints.

Functional-JAX redesign of the reference's tf.distribute custom loop
(`reference: models/model_train_custom_loop.py:93-347`,
`models/model_utils.py:493-669`): one jitted train step (forward, alignment
loss, grads, LAMB update, on-device metrics) runs under a data-parallel
mesh — batch sharded on axis 0, params/opt-state replicated, XLA inserting
the gradient all-reduces. Checkpoint/best-checkpoint/eval bookkeeping
matches the reference's file contract (eval_checkpoint.txt,
best_checkpoint.txt, checkpoint_metrics.tsv, params.json).
"""

import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import ml_collections
import numpy as np
import optax

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import tb_events
from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.ops import alignment
from deepconsensus_tpu.parallel import mesh as mesh_lib
from deepconsensus_tpu.train import input_pipeline

logger = logging.getLogger(__name__)


def make_learning_rate_schedule(params, decay_steps: int):
  """Polynomial decay with linear warmup (model_utils.py:621-669).

  Matches tf-models' LinearWarmup contract: during warmup the LR ramps
  linearly from 0 to poly(warmup_steps); AFTER warmup the polynomial is
  evaluated at the GLOBAL step (continuous at the boundary). The naive
  optax.join_schedules composition evaluates the second schedule at
  (step - warmup_steps), which both jumps the LR back UP to the initial
  value at the boundary and delays the whole decay by warmup_steps —
  with the production 16000-step warmup, a materially different curve
  (review r5, verified numerically).
  """
  poly = optax.polynomial_schedule(
      init_value=params.initial_learning_rate,
      end_value=params.end_learning_rate,
      power=1.0,
      transition_steps=max(decay_steps, 1),
  )
  warmup_steps = int(params.warmup_steps)
  if warmup_steps <= 0:
    return poly

  def schedule(step):
    step = jnp.asarray(step)
    frac = step.astype(jnp.float32) / float(warmup_steps)
    warm = frac * poly(warmup_steps)
    return jnp.where(step < warmup_steps, warm, poly(step))

  return schedule


def _decay_mask(params_tree):
  """LAMB weight-decay mask: skip bias/norm params (model_utils.py:641-647)."""

  def mask_path(path, _):
    names = [str(getattr(k, 'key', k)) for k in path]
    joined = '/'.join(names).lower()
    return not ('bias' in joined or 'norm' in joined)

  return jax.tree_util.tree_map_with_path(mask_path, params_tree)


def make_optimizer(params, decay_steps: int):
  """LAMB + schedule (reference uses tf-models' LAMB factory)."""
  schedule = make_learning_rate_schedule(params, decay_steps)
  tx = optax.lamb(
      learning_rate=schedule,
      b1=params.beta_1,
      b2=params.beta_2,
      eps=params.epsilon,
      weight_decay=params.weight_decay_rate,
      mask=_decay_mask,
  )
  return tx, schedule


@dataclasses.dataclass
class TrainState:
  variables: Any
  opt_state: Any
  step: int


def make_loss_fn(params):
  """Selects the configured loss (model_utils.get_deepconsensus_loss)."""
  if params.loss_function == 'alignment_loss':
    width = params.get('band_width', None)

    def loss_fn(labels, predictions):
      return alignment.alignment_loss(
          labels,
          predictions,
          del_cost=float(params.del_cost),
          loss_reg=params.loss_reg,
          width=width,
      )

    return loss_fn
  if params.loss_function in ('xentropy', 'sparse_categorical_crossentropy'):
    return alignment.xentropy_loss
  raise ValueError(f'unknown loss_function {params.loss_function!r}')


def build_train_step(model, tx, params, global_batch_size: int):
  """Returns a jitted (state, rows, labels) -> (state, metrics) step."""
  loss_fn = make_loss_fn(params)
  ccs_slice = configs.get_indices(params.max_passes, params.use_ccs_bq)[4]
  if params.get('use_pallas_fused_encoder', False):
    # Training always uses the XLA encoder: the hand-written Pallas
    # backward measured slower than XLA autodiff (3301 vs 3484 ex/s,
    # docs/train_tpu_bench.json) and was deleted in round 5 along with
    # the fused forward's parity ambitions (ops/fused_encoder.py
    # docstring records the evidence). The fused forward remains an
    # inference-only option. Ignore (don't reject) the flag so params.json
    # files persisted by round-4 training runs still evaluate/resume.
    logger.warning(
        'use_pallas_fused_encoder is inference-only since round 5; '
        'training/eval use the XLA encoder (same math, faster backward)'
    )

  def forward(variables, rows):
    return model.apply(variables, rows, deterministic=True)

  def compute_loss(variables, rows, labels):
    preds = forward(variables, rows)
    per_example = loss_fn(labels, preds)
    # compute_average_loss semantics: sum/global_batch
    # (model_train_custom_loop.py:148-155).
    return jnp.sum(per_example) / global_batch_size, preds

  def step_metrics(rows, labels, preds):
    ccs = rows[:, ccs_slice[0], :, 0]
    identity_ccs, identity_pred = alignment.batch_identity_ccs_pred(
        ccs, preds, labels
    )
    correct, total = alignment.per_example_accuracy(labels, preds)
    return {
        'correct_examples': correct,
        'total_examples': total,
        'identity_pred': identity_pred,
        'identity_ccs': identity_ccs,
    }

  def train_step(variables, opt_state, rows, labels):
    (loss, preds), grads = jax.value_and_grad(compute_loss, has_aux=True)(
        variables, rows, labels
    )
    updates, opt_state = tx.update(
        grads['params'], opt_state, variables['params']
    )
    new_params = optax.apply_updates(variables['params'], updates)
    variables = dict(variables, params=new_params)
    metrics = step_metrics(rows, labels, preds)
    metrics['loss'] = loss
    return variables, opt_state, metrics

  def eval_step(variables, rows, labels):
    loss, preds = compute_loss(variables, rows, labels)
    metrics = step_metrics(rows, labels, preds)
    metrics['loss'] = loss
    return metrics

  return train_step, eval_step


class MetricAccumulator:
  """Host-side running aggregation of per-step metric dicts.

  Mirrors the reference metric set: loss mean, per_example_accuracy,
  alignment_identity (mean of batch identity), yield_over_ccs
  (model_utils.py:69-96).
  """

  def __init__(self, quality_threshold: float = 0.997):
    self.quality_threshold = quality_threshold
    self.reset()

  _KNOWN = ('loss', 'correct_examples', 'total_examples', 'identity_pred',
            'identity_ccs')

  def reset(self):
    self.loss_sum = 0.0
    self.n_steps = 0
    self.correct = 0
    self.total = 0
    self.identity_sum = 0.0
    self.yield_dc = 0
    self.yield_ccs = 0
    self.extra_sums: Dict[str, float] = {}

  def update(self, m: Dict[str, Any]):
    self.loss_sum += float(m['loss'])
    self.n_steps += 1
    self.correct += int(m['correct_examples'])
    self.total += int(m['total_examples'])
    self.identity_sum += float(m['identity_pred'])
    self.yield_dc += int(float(m['identity_pred']) >= self.quality_threshold)
    self.yield_ccs += int(float(m['identity_ccs']) >= self.quality_threshold)
    # Extra scalar metrics (e.g. distillation's student_loss/distill_loss
    # components) accumulate as means so specialized loops can report
    # more than the fixed reference set without reimplementing this.
    for key, value in m.items():
      if key in self._KNOWN or key == 'total_loss':
        continue
      try:
        self.extra_sums[key] = self.extra_sums.get(key, 0.0) + float(value)
      except (TypeError, ValueError):
        continue

  def result(self, prefix: str) -> Dict[str, float]:
    n = max(self.n_steps, 1)
    out = {f'{prefix}/{k}': v / n for k, v in self.extra_sums.items()}
    out.update({
        f'{prefix}/loss': self.loss_sum / n,
        f'{prefix}/per_example_accuracy': self.correct / max(self.total, 1),
        f'{prefix}/alignment_identity': self.identity_sum / n,
        f'{prefix}/yield_over_ccs': (
            self.yield_dc / self.yield_ccs if self.yield_ccs else 0.0
        ),
    })
    return out


def get_step_counts(params, eval_and_log_every_step: bool = False):
  """(model_utils.py:493-510)"""
  if eval_and_log_every_step:
    return 1, 1
  if params.limit <= 0:
    return (
        params.n_examples_train // params.batch_size,
        params.n_examples_eval // params.batch_size,
    )
  return (
      max(1, params.limit // params.batch_size),
      max(1, params.limit // params.batch_size),
  )


def _read_best_metric(metrics_tsv_path: str) -> float:
  """Max historical MAIN_EVAL_METRIC from checkpoint_metrics.tsv (0.0 if none)."""
  best = 0.0
  try:
    with open(metrics_tsv_path) as f:
      header = f.readline().rstrip('\n').split('\t')
      try:
        col = header.index(constants.MAIN_EVAL_METRIC_NAME)
      except ValueError:
        return best
      for line in f:
        fields = line.rstrip('\n').split('\t')
        if len(fields) > col:
          try:
            best = max(best, float(fields[col]))
          except ValueError:
            continue
  except OSError:
    pass
  return best


def write_metrics_row(path: str, checkpoint_name: str, metrics: Dict[str, Any]):
  """Appends a checkpoint_metrics.tsv row (model_utils.py:591-618)."""
  exists = os.path.exists(path)
  with open(path, 'a') as f:
    if not exists:
      f.write('checkpoint\t' + '\t'.join(metrics) + '\n')
    f.write(
        checkpoint_name
        + '\t'
        + '\t'.join(str(v) for v in metrics.values())
        + '\n'
    )


class _NullWriter:
  """Event-writer stand-in for secondary hosts of a multi-host job."""

  def scalars(self, *args, **kwargs):
    pass

  def flush(self):
    pass

  def close(self):
    pass


def train(
    out_dir: str,
    params: ml_collections.ConfigDict,
    num_devices: Optional[int] = None,
    eval_and_log_every_step: bool = False,
    write_checkpoint_metrics: bool = True,
    initial_checkpoint: Optional[str] = None,
    log_train_steps: int = 100,
    log_eval_steps: int = 3000,
    profile_steps: Optional[Tuple[int, int]] = None,
) -> Dict[str, float]:
  """Runs the full training loop; returns the last eval metrics.

  profile_steps=(start, stop) captures a jax.profiler trace of those steps
  to out_dir/profile (the reference wraps every step in
  tf.profiler traces, model_train_custom_loop.py:248,277).
  """
  os.makedirs(out_dir, exist_ok=True)
  configs.finalize_params(
      params,
      num_replicas=(num_devices or len(jax.devices())),
      batch_scale=False,
  )
  frozen = params

  mesh = mesh_lib.make_mesh(num_devices)
  n_dev = mesh.devices.size
  if frozen.batch_size % n_dev != 0 and n_dev > 1:
    raise ValueError(
        f'global batch {frozen.batch_size} not divisible by {n_dev} devices'
    )
  # Multi-host (pod-scale) data parallelism: when the CLI brought up
  # jax.distributed, the mesh above already spans every host's devices;
  # each process feeds its local slice of the global batch and only the
  # main process writes logs/markers (orbax checkpoint saves run on all
  # processes — it coordinates its own primary-host writes). Mirrors the
  # reference's TPUStrategy multi-host training
  # (model_train_custom_loop.py:333-347, docs/train_tpu_model.md:283-292).
  n_proc = jax.process_count()
  proc_id = jax.process_index()
  is_main = proc_id == 0
  if num_devices is not None and n_proc > 1:
    raise ValueError('--num_devices cannot restrict a multi-host mesh')

  if is_main:
    configs.save_params_json(frozen, os.path.join(out_dir, 'params.json'))

  model = model_lib.get_model(frozen)
  rng = jax.random.PRNGKey(frozen.seed)
  variables = model_lib.init_params(model, frozen, rng)

  steps_per_epoch, steps_per_eval = get_step_counts(
      frozen, eval_and_log_every_step
  )
  total_train_steps = steps_per_epoch * frozen.num_epochs
  decay_steps = steps_per_epoch * frozen.num_epochs_for_decay
  tx, schedule = make_optimizer(frozen, decay_steps)

  if initial_checkpoint:
    payload = ckpt_lib.load_checkpoint(
        initial_checkpoint, {'variables': jax.device_get(variables)}
    )
    variables = payload['variables']

  opt_state = tx.init(variables['params'])

  # Resume from an interrupted run in out_dir (reference eval_checkpoint.txt
  # contract: "name\tepoch\tstep", model_utils.py:511-540). The marker WINS
  # over initial_checkpoint: a warm-started run that gets preempted must
  # continue from its own latest checkpoint on retry, not restart the whole
  # run from the warm-start weights at epoch 0 (review r5 —
  # train_with_retry re-enters this function with initial_checkpoint still
  # set).
  initial_epoch = 0
  initial_step = 0
  resume_marker = os.path.join(out_dir, 'eval_checkpoint.txt')
  parts = None
  if os.path.exists(resume_marker):
    with open(resume_marker) as f:
      candidate = f.read().strip().split('\t')
    if len(candidate) == 3 and os.path.exists(candidate[0]):
      parts = candidate
  if n_proc > 1:
    # Multi-host resume must be all-or-nothing, checked BEFORE any
    # checkpoint restore (orbax restores run their own cross-host
    # collectives, so a lone resuming host would die in an opaque gloo
    # size-mismatch instead): each process read its own out_dir marker
    # above, and a non-shared out_dir would let host 0 resume checkpoint
    # weights while others fresh-init — the 'replicated' params would
    # then silently differ across hosts. Gather every host's
    # (resuming?, epoch, step) and fail loudly on mismatch.
    from jax.experimental import multihost_utils

    state = (
        [1, int(parts[1]), int(parts[2])] if parts is not None else [0, 0, 0]
    )
    states = multihost_utils.process_allgather(np.asarray(state, np.int32))
    if not (states == states[0]).all():
      raise ValueError(
          'hosts disagree on resume state (per-host [resuming, epoch, '
          f'step] = {states.tolist()}): --out_dir must be shared storage '
          'visible to every host of a multi-host job'
      )
  if parts is not None:
    payload = ckpt_lib.load_checkpoint(
        parts[0],
        {
            'variables': jax.device_get(variables),
            'opt_state': jax.device_get(opt_state),
        },
    )
    variables = payload['variables']
    if 'opt_state' in payload:
      opt_state = jax.tree_util.tree_unflatten(
          jax.tree_util.tree_structure(opt_state),
          jax.tree_util.tree_leaves(payload['opt_state']),
      )
    initial_epoch = int(parts[1])
    initial_step = int(parts[2]) + 1
    logger.info(
        'Resuming from %s at epoch %d step %d',
        parts[0], initial_epoch, initial_step,
    )

  train_step, eval_step = build_train_step(
      model, tx, frozen, frozen.batch_size
  )
  batch_shard = mesh_lib.batch_sharding(mesh)
  repl = mesh_lib.replicated(mesh)
  jit_train = jax.jit(
      train_step,
      in_shardings=(repl, repl, batch_shard, batch_shard),
      out_shardings=(repl, repl, repl),
      donate_argnums=(0, 1),
  )
  jit_eval = jax.jit(
      eval_step,
      in_shardings=(repl, batch_shard, batch_shard),
      out_shardings=repl,
  )
  variables = mesh_lib.shard_params(variables, mesh)
  opt_state = mesh_lib.shard_params(opt_state, mesh)

  input_workers = int(frozen.get('input_workers', 0))
  train_iter = input_pipeline.Prefetcher(
      input_pipeline.multihost_stream(
          frozen.train_path,
          frozen,
          frozen.batch_size,
          host_id=proc_id,
          num_hosts=n_proc,
          shuffle_buffer=frozen.buffer_size,
          seed=frozen.seed,
          num_workers=input_workers,
      )
  )
  eval_iter = input_pipeline.Prefetcher(
      input_pipeline.multihost_stream(
          frozen.eval_path, frozen, frozen.batch_size,
          host_id=proc_id, num_hosts=n_proc, shuffle_buffer=0,
          num_workers=input_workers,
      )
  )

  train_acc = MetricAccumulator()
  eval_acc = MetricAccumulator()
  eval_checkpoint_path = os.path.join(out_dir, 'eval_checkpoint.txt')
  metrics_tsv = os.path.join(out_dir, 'checkpoint_metrics.tsv')
  scalars_path = os.path.join(out_dir, 'scalars.jsonl')
  # TensorBoard-compatible event streams, mirroring the reference's
  # train/ and eval/ writer layout (model_train_custom_loop.py:165-166,
  # model_utils.py:549-583). Tags keep the reference names (no prefix).
  # Only the main process writes logs/events/markers; secondary hosts of
  # a multi-host job compute identical replicated metrics and discard
  # them (the reference's TPUStrategy likewise logs from the coordinator).
  if is_main:
    scalars_f = open(scalars_path, 'a')
    tb_train = tb_events.SummaryWriter(os.path.join(out_dir, 'train'))
    tb_eval = tb_events.SummaryWriter(os.path.join(out_dir, 'eval'))
  else:
    scalars_f = open(os.devnull, 'w')
    tb_train = tb_eval = _NullWriter()

  def tb_write(writer, prefix, metrics, step_num):
    writer.scalars(
        {
            (k[len(prefix) :] if k.startswith(prefix) else k): v
            for k, v in metrics.items()
            if k not in ('step', 'epoch')
        },
        step_num,
    )
    writer.flush()

  # Restore the historical best from checkpoint_metrics.tsv on resume: a
  # 0.0 init would let the FIRST post-resume eval overwrite
  # best_checkpoint.txt with a worse checkpoint (review r5).
  max_main_metric = _read_best_metric(metrics_tsv)
  step = initial_epoch * steps_per_epoch + initial_step
  last_eval_metrics: Dict[str, float] = {}
  t_start = time.time()
  steps_since_log = 0
  for epoch in range(initial_epoch, frozen.num_epochs):
    logger.info('Starting epoch %d', epoch)
    for step_train in range(initial_step, steps_per_epoch):
      rows, labels = next(train_iter)
      rows = mesh_lib.shard_batch(rows, mesh)
      labels = mesh_lib.shard_batch(labels, mesh)
      if profile_steps and step == profile_steps[0]:
        jax.profiler.start_trace(os.path.join(out_dir, 'profile'))
      variables, opt_state, metrics = jit_train(
          variables, opt_state, rows, labels
      )
      train_acc.update(jax.device_get(metrics))
      step += 1
      steps_since_log += 1
      if profile_steps and step == profile_steps[1]:
        jax.profiler.stop_trace()
      if step % log_train_steps == 0:
        result = train_acc.result('train')
        # Count the steps actually timed since t_start: an eval or a
        # resume inside the window resets the clock, and assuming
        # log_train_steps would inflate the rate ~2x (review r5).
        result['train/steps_per_second'] = steps_since_log / max(
            time.time() - t_start, 1e-9
        )
        result['train/learning_rate'] = float(schedule(step))
        result.update(epoch=epoch, step=step)
        logger.info('step %d: %s', step, result)
        scalars_f.write(json.dumps(result) + '\n')
        scalars_f.flush()
        result['progress/epoch'] = epoch
        result['progress/overall_progress'] = step / max(total_train_steps, 1)
        tb_write(tb_train, 'train/', result, step)
        train_acc.reset()
        t_start = time.time()
        steps_since_log = 0

      if step % log_eval_steps == 0 or step == total_train_steps:
        eval_acc.reset()
        for _ in range(steps_per_eval):
          erows, elabels = next(eval_iter)
          erows = mesh_lib.shard_batch(erows, mesh)
          elabels = mesh_lib.shard_batch(elabels, mesh)
          eval_acc.update(jax.device_get(jit_eval(variables, erows, elabels)))
        eval_metrics = eval_acc.result('eval')
        last_eval_metrics = eval_metrics
        logger.info('eval @%d: %s', step, eval_metrics)
        scalars_f.write(
            json.dumps(dict(eval_metrics, step=step, epoch=epoch)) + '\n'
        )
        scalars_f.flush()
        tb_write(tb_eval, 'eval/', eval_metrics, step)

        ckpt_name = ckpt_lib.save_checkpoint(
            out_dir,
            jax.device_get(variables),
            frozen,
            step=step,
            opt_state=jax.device_get(opt_state),
        )
        if is_main:
          with open(eval_checkpoint_path, 'w') as f:
            f.write(f'{ckpt_name}\t{epoch}\t{step_train}')
          if write_checkpoint_metrics:
            write_metrics_row(metrics_tsv, os.path.basename(ckpt_name),
                              eval_metrics)
        main_metric = eval_metrics[constants.MAIN_EVAL_METRIC_NAME]
        if main_metric >= max_main_metric:
          max_main_metric = main_metric
          if is_main:
            with open(os.path.join(out_dir, 'best_checkpoint.txt'), 'w') as f:
              f.write(os.path.basename(ckpt_name))
        t_start = time.time()
        steps_since_log = 0
    initial_step = 0

  # Always leave a final checkpoint (covers runs shorter than
  # log_eval_steps, e.g. the reference's smoke-test configuration).
  if not last_eval_metrics:
    eval_acc.reset()
    for _ in range(steps_per_eval):
      erows, elabels = next(eval_iter)
      erows = mesh_lib.shard_batch(erows, mesh)
      elabels = mesh_lib.shard_batch(elabels, mesh)
      eval_acc.update(jax.device_get(jit_eval(variables, erows, elabels)))
    last_eval_metrics = eval_acc.result('eval')
    tb_write(tb_eval, 'eval/', last_eval_metrics, step)
    ckpt_name = ckpt_lib.save_checkpoint(
        out_dir,
        jax.device_get(variables),
        frozen,
        step=step,
        opt_state=jax.device_get(opt_state),
    )
    if is_main:
      # Marker field 2 is the WITHIN-EPOCH step (what the resume parser
      # and the in-loop marker use) — writing the global `step` here
      # would inflate step numbers on every rerun of a short job.
      final_step_train = (step - 1) % steps_per_epoch if step else 0
      with open(eval_checkpoint_path, 'w') as f:
        f.write(f'{ckpt_name}\t{frozen.num_epochs - 1}\t{final_step_train}')
      if write_checkpoint_metrics:
        write_metrics_row(
            metrics_tsv, os.path.basename(ckpt_name), last_eval_metrics
        )
      with open(os.path.join(out_dir, 'best_checkpoint.txt'), 'w') as f:
        f.write(os.path.basename(ckpt_name))

  scalars_f.close()
  tb_train.close()
  tb_eval.close()
  return last_eval_metrics


def train_with_retry(*args, max_retries: Optional[int] = None, **kwargs):
  """Retries training on accelerator-unavailable errors.

  The reference loops forever on tf UnavailableError (TPU preemption,
  model_train_custom_loop.py:333-347); combined with the resume path above
  this gives crude preemption tolerance. max_retries=None retries forever.
  """
  attempt = 0
  while True:
    try:
      return train(*args, **kwargs)
    except Exception as e:  # pylint: disable=broad-except
      msg = str(e).upper()
      transient = any(
          key in msg
          for key in ('UNAVAILABLE', 'DEADLINE_EXCEEDED', 'CONNECTION')
      )
      attempt += 1
      if not transient or (max_retries is not None and attempt > max_retries):
        raise
      logger.warning(
          'Transient accelerator error (attempt %d), retrying: %s', attempt, e
      )
      time.sleep(min(30, attempt * 5))
