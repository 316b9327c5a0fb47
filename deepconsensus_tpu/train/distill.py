"""Knowledge-distillation training: teacher -> smaller student.

JAX port of the reference distillation loop
(`reference: models/model_distillation.py`): the student is initialized from
mapped teacher encoder layers plus all non-encoder layers, and trains
against student_alpha * AlignmentLoss + distill_alpha * DistillationLoss
(MSE/KL between temperature-softened logits). The teacher forward runs
inside the same jitted step with frozen weights.
"""

import json
import logging
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import ml_collections
import optax

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import tb_events
from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, model as model_lib
from deepconsensus_tpu.ops import alignment
from deepconsensus_tpu.parallel import mesh as mesh_lib
from deepconsensus_tpu.train import input_pipeline, loop as loop_lib

logger = logging.getLogger(__name__)


def init_student_from_teacher(
    student_vars: Dict[str, Any],
    teacher_vars: Dict[str, Any],
    params: ml_collections.ConfigDict,
) -> Dict[str, Any]:
  """Copies mapped encoder layers + non-encoder layers teacher->student.

  (reference: model_distillation.py:104-144)
  """
  import flax

  student = flax.core.unfreeze(jax.device_get(student_vars))
  teacher = jax.device_get(teacher_vars)
  sp = student['params']
  tp = teacher['params']

  if params.init_encoder_stack:
    layer_map = dict(
        zip(params.teacher_encoder_layers, params.student_encoder_layers)
    )
    for t_layer, s_layer in layer_map.items():
      for prefix in ('attention', 'ffn'):
        sp['encoder_stack'][f'{prefix}_{s_layer}'] = tp['encoder_stack'][
            f'{prefix}_{t_layer}'
        ]
        # ReZero alphas live in the wrapper modules.
        wrapper = f'{prefix}_wrapper_{s_layer}'
        t_wrapper = f'{prefix}_wrapper_{t_layer}'
        if wrapper in sp['encoder_stack'] and t_wrapper in tp['encoder_stack']:
          sp['encoder_stack'][wrapper] = tp['encoder_stack'][t_wrapper]

  if params.init_nonencoder_layers:
    for key in sp:
      if key == 'encoder_stack':
        continue
      if key in tp:
        sp[key] = tp[key]
    # Final layer norm of the encoder stack counts as a non-encoder layer in
    # the reference (it is not part of `layers`).
    if 'output_norm' in tp.get('encoder_stack', {}):
      sp['encoder_stack']['output_norm'] = tp['encoder_stack']['output_norm']
  return student


def train_distillation(
    out_dir: str,
    params: ml_collections.ConfigDict,
    teacher_checkpoint: str,
    num_devices: Optional[int] = None,
    eval_and_log_every_step: bool = False,
    log_train_steps: int = 100,
    log_eval_steps: int = 3000,
) -> Dict[str, float]:
  """Runs distillation training; returns final eval metrics."""
  os.makedirs(out_dir, exist_ok=True)
  configs.finalize_params(params)

  # Teacher (frozen).
  teacher_params = configs.read_params_from_json(teacher_checkpoint)
  configs.finalize_params(teacher_params)
  teacher_model = model_lib.get_model(teacher_params)
  teacher_vars = model_lib.init_params(teacher_model, teacher_params)
  ckpt_dir = teacher_checkpoint
  if os.path.isdir(ckpt_dir):
    latest = ckpt_lib.latest_checkpoint(ckpt_dir)
    if latest is not None:
      ckpt_dir = latest
  payload = ckpt_lib.load_checkpoint(
      ckpt_dir, {'variables': jax.device_get(teacher_vars)}
  )
  teacher_vars = payload['variables']

  configs.save_params_json(params, os.path.join(out_dir, 'params.json'))
  mesh = mesh_lib.make_mesh(num_devices)

  student_model = model_lib.get_model(params)
  student_vars = model_lib.init_params(student_model, params)
  student_vars = init_student_from_teacher(student_vars, teacher_vars, params)

  steps_per_epoch, steps_per_eval = loop_lib.get_step_counts(
      params, eval_and_log_every_step
  )
  decay_steps = steps_per_epoch * params.num_epochs_for_decay
  tx, schedule = loop_lib.make_optimizer(params, decay_steps)
  opt_state = tx.init(student_vars['params'])

  student_loss_fn = loop_lib.make_loss_fn(params)
  ccs_slice = configs.get_indices(params.max_passes, params.use_ccs_bq)[4]
  global_batch = params.batch_size

  def compute_losses(variables, teacher, rows, labels):
    # The frozen teacher arrives as a jit ARGUMENT (replicated), not a
    # closure: closing over host numpy would bake the full teacher tree
    # into both executables as XLA constants (review r5).
    teacher_out = teacher_model.apply(
        teacher, rows, deterministic=True, method='intermediate_outputs'
    )
    student_out = student_model.apply(
        variables, rows, deterministic=True, method='intermediate_outputs'
    )
    student_logits = student_out['logits']
    student_preds = jax.nn.softmax(student_logits, axis=-1)
    per_student = student_loss_fn(labels, student_preds)
    per_distill = alignment.distillation_loss(
        teacher_out['logits'],
        student_logits,
        temperature=params.temperature,
        kind=params.logit_loss_identifier,
    )
    per_total = (
        params.student_alpha * per_student + params.distill_alpha * per_distill
    )
    losses = {
        'total_loss': jnp.sum(per_total) / global_batch,
        'student_loss': jnp.sum(per_student) / global_batch,
        'distill_loss': jnp.sum(per_distill) / global_batch,
    }
    return losses['total_loss'], (losses, student_preds)

  def train_step(variables, opt_state, teacher, rows, labels):
    grads, (losses, preds) = jax.grad(compute_losses, has_aux=True)(
        variables, teacher, rows, labels
    )
    updates, opt_state = tx.update(
        grads['params'], opt_state, variables['params']
    )
    variables = dict(
        variables, params=optax.apply_updates(variables['params'], updates)
    )
    ccs = rows[:, ccs_slice[0], :, 0]
    identity_ccs, identity_pred = alignment.batch_identity_ccs_pred(
        ccs, preds, labels
    )
    correct, total = alignment.per_example_accuracy(labels, preds)
    metrics = dict(
        losses,
        loss=losses['total_loss'],
        correct_examples=correct,
        total_examples=total,
        identity_pred=identity_pred,
        identity_ccs=identity_ccs,
    )
    return variables, opt_state, metrics

  def eval_step(variables, teacher, rows, labels):
    _, (losses, preds) = compute_losses(variables, teacher, rows, labels)
    ccs = rows[:, ccs_slice[0], :, 0]
    identity_ccs, identity_pred = alignment.batch_identity_ccs_pred(
        ccs, preds, labels
    )
    correct, total = alignment.per_example_accuracy(labels, preds)
    return dict(
        losses,
        loss=losses['total_loss'],
        correct_examples=correct,
        total_examples=total,
        identity_pred=identity_pred,
        identity_ccs=identity_ccs,
    )

  batch_shard = mesh_lib.batch_sharding(mesh)
  repl = mesh_lib.replicated(mesh)
  jit_train = jax.jit(
      train_step,
      in_shardings=(repl, repl, repl, batch_shard, batch_shard),
      out_shardings=(repl, repl, repl),
      donate_argnums=(0, 1),
  )
  jit_eval = jax.jit(
      eval_step, in_shardings=(repl, repl, batch_shard, batch_shard),
      out_shardings=repl,
  )
  student_vars = mesh_lib.shard_params(student_vars, mesh)
  opt_state = mesh_lib.shard_params(opt_state, mesh)
  teacher_vars = mesh_lib.shard_params(teacher_vars, mesh)

  train_iter = input_pipeline.Prefetcher(
      input_pipeline.example_stream(
          params.train_path,
          params,
          params.batch_size,
          shuffle_buffer=params.buffer_size,
          seed=params.seed,
      )
  )
  eval_iter = input_pipeline.Prefetcher(
      input_pipeline.example_stream(
          params.eval_path, params, params.batch_size, shuffle_buffer=0
      )
  )

  train_acc = loop_lib.MetricAccumulator()
  eval_acc = loop_lib.MetricAccumulator()
  scalars_f = open(os.path.join(out_dir, 'scalars.jsonl'), 'a')
  tb_train = tb_events.SummaryWriter(os.path.join(out_dir, 'train'))
  tb_eval = tb_events.SummaryWriter(os.path.join(out_dir, 'eval'))

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
  metrics_tsv = os.path.join(out_dir, 'checkpoint_metrics.tsv')
  max_main = 0.0
  step = 0
  last_eval: Dict[str, float] = {}
  total_steps = steps_per_epoch * params.num_epochs

  def run_eval():
    eval_acc.reset()
    for _ in range(steps_per_eval):
      erows, elabels = next(eval_iter)
      eval_acc.update(
          jax.device_get(
              jit_eval(
                  student_vars,
                  teacher_vars,
                  mesh_lib.shard_batch(erows, mesh),
                  mesh_lib.shard_batch(elabels, mesh),
              )
          )
      )
    return eval_acc.result('eval')

  for epoch in range(params.num_epochs):
    for step_train in range(steps_per_epoch):
      rows, labels = next(train_iter)
      student_vars, opt_state, metrics = jit_train(
          student_vars,
          opt_state,
          teacher_vars,
          mesh_lib.shard_batch(rows, mesh),
          mesh_lib.shard_batch(labels, mesh),
      )
      train_acc.update(jax.device_get(metrics))
      step += 1
      if step % log_train_steps == 0:
        result = train_acc.result('train')
        result.update(epoch=epoch, step=step)
        result['train/learning_rate'] = float(schedule(step))
        logger.info('distill step %d: %s', step, result)
        scalars_f.write(json.dumps(result) + '\n')
        scalars_f.flush()
        tb_write(tb_train, 'train/', result, step)
        train_acc.reset()
      if step % log_eval_steps == 0 or step == total_steps:
        last_eval = run_eval()
        logger.info('distill eval @%d: %s', step, last_eval)
        tb_write(tb_eval, 'eval/', last_eval, step)
        ckpt_name = ckpt_lib.save_checkpoint(
            out_dir,
            jax.device_get(student_vars),
            params,
            step=step,
            opt_state=jax.device_get(opt_state),
        )
        with open(os.path.join(out_dir, 'eval_checkpoint.txt'), 'w') as f:
          f.write(f'{ckpt_name}\t{epoch}\t{step_train}')
        loop_lib.write_metrics_row(
            metrics_tsv, os.path.basename(ckpt_name), last_eval
        )
        main = last_eval[constants.MAIN_EVAL_METRIC_NAME]
        if main >= max_main:
          max_main = main
          with open(os.path.join(out_dir, 'best_checkpoint.txt'), 'w') as f:
            f.write(os.path.basename(ckpt_name))

  if not last_eval:
    last_eval = run_eval()
    tb_write(tb_eval, 'eval/', last_eval, step)
    ckpt_name = ckpt_lib.save_checkpoint(
        out_dir,
        jax.device_get(student_vars),
        params,
        step=step,
        opt_state=jax.device_get(opt_state),
    )
    # Marker field 2 is the WITHIN-EPOCH step (the resume parser's
    # contract; mirrors loop.py's final-marker fix) — the global `step`
    # here would make a later resume skip the final epoch entirely.
    final_step_train = (step - 1) % steps_per_epoch if step else 0
    with open(os.path.join(out_dir, 'eval_checkpoint.txt'), 'w') as f:
      f.write(f'{ckpt_name}\t{params.num_epochs - 1}\t{final_step_train}')
    loop_lib.write_metrics_row(
        metrics_tsv, os.path.basename(ckpt_name), last_eval
    )
    with open(os.path.join(out_dir, 'best_checkpoint.txt'), 'w') as f:
      f.write(os.path.basename(ckpt_name))
  scalars_f.close()
  tb_train.close()
  tb_eval.close()
  return last_eval
