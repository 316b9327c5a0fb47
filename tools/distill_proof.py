"""End-to-end distillation proof on the bundled data (VERDICT r4 #7).

Demonstrates the reference's distillation capability
(reference: models/model_distillation.py:104-144,170-468): the toy
teacher (6-layer transformer_learn_values) is distilled into the 5-layer
student config twice — once with the reference's layer-mapped
initialization (teacher layers [1..5] -> student [0..4] + non-encoder
layers), once cold — and the mapped student must (a) approach the
teacher's eval metrics and (b) beat the cold student at equal step
budget, proving the init mapping carries signal.

Writes docs/distill_proof.json; tests/test_distill_proof.py pins the
recorded numbers' invariants.

Run: DC_TPU_PLATFORM=cpu python tools/distill_proof.py [--epochs N]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

import jax

if os.environ.get('DC_TPU_PLATFORM'):
  jax.config.update('jax_platforms', os.environ['DC_TPU_PLATFORM'])

TOY = os.path.join(_REPO, 'models_out', 'toy_model')


def student_params(epochs: int, mapped: bool):
  from deepconsensus_tpu.models import configs

  params = configs.get_config('transformer_learn_values_distill+test')
  with params.unlocked():
    params.batch_size = 64
    params.num_epochs = epochs
    params.warmup_steps = 50  # the 16000-step default swallows short runs
    params.buffer_size = 256
    # The production LR (3.6e-3, tuned for 100M-example epochs) diverges
    # on the 1239-example bundled split — a 24-epoch run took the mapped
    # student from 0.69 to 0.25 accuracy. Scale it down for the toy data.
    params.initial_learning_rate = 3e-4
    params.end_learning_rate = 3e-5
    if not mapped:
      params.init_encoder_stack = False
      params.init_nonencoder_layers = False
  return params


def teacher_eval():
  from deepconsensus_tpu.train import evaluate

  with tempfile.TemporaryDirectory() as tmp:
    return evaluate.run_eval(TOY, tmp, batch_size=64, num_devices=1)


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument('--epochs', type=int, default=24)
  args = ap.parse_args()

  from deepconsensus_tpu.train import distill

  results = {'teacher': teacher_eval(), 'epochs': args.epochs}
  print('teacher:', results['teacher'])
  for name, mapped in (('student_mapped', True), ('student_cold', False)):
    out_dir = os.path.join(_REPO, 'models_out', f'distill_{name}')
    shutil.rmtree(out_dir, ignore_errors=True)
    metrics = distill.train_distillation(
        out_dir,
        student_params(args.epochs, mapped),
        teacher_checkpoint=TOY,
        num_devices=1,
        log_train_steps=50,
    )
    results[name] = {k: float(v) for k, v in metrics.items()}
    print(name, results[name])

  path = os.path.join(_REPO, 'docs', 'distill_proof.json')
  with open(path, 'w') as f:
    json.dump(results, f, indent=2, default=float)
  print('wrote', path)

  mapped = results['student_mapped']['eval/per_example_accuracy']
  cold = results['student_cold']['eval/per_example_accuracy']
  teacher = results['teacher']['eval/per_example_accuracy']
  print(f'teacher acc {teacher:.4f}  mapped {mapped:.4f}  cold {cold:.4f}')


if __name__ == '__main__':
  main()
