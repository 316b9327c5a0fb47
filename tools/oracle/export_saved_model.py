"""Exports a repo checkpoint as a reference-format TF SavedModel.

The reference ships models as SavedModel directories via
`reference: models/convert_to_saved_model.py:67-105` (restore checkpoint
into the Keras model, `tf.saved_model.save`, copy params.json inside).
This tool produces the same artifact from a repo (orbax) checkpoint by
chaining the existing oracle machinery: JAX weights → reference Keras
model (tools/oracle/export_tf_checkpoint.export_to_tf) → restore →
tf.saved_model.save.

Requires TensorFlow (tooling environments only — the core package never
imports TF). The inverse direction — *consuming* a SavedModel — is
TF-free: deepconsensus_tpu/io/tf_bundle.py.

Usage:
  python -m tools.oracle.export_saved_model <checkpoint_dir> <output_dir>
"""

import os
import shutil
import sys
import tempfile

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)


def export_saved_model(
    checkpoint_dir: str,
    output_dir: str,
    config_name: str = 'transformer_learn_values+test',
) -> str:
  """Repo checkpoint dir → SavedModel dir (returns output_dir)."""
  import tensorflow as tf

  from tools.oracle import export_tf_checkpoint as ex
  from tools.oracle import tf_ref_model

  variables, params = ex.load_jax_variables(checkpoint_dir)
  with tempfile.TemporaryDirectory() as tmp:
    ex.export_to_tf(variables, params, config_name, tmp)
    ref_model, _ = tf_ref_model.build_reference_model(
        config_name, max_length=params.max_length
    )
    ckpt = tf.train.Checkpoint(model=ref_model)
    latest = tf.train.latest_checkpoint(tmp)
    ckpt.restore(latest).expect_partial().assert_existing_objects_matched()
    tf.saved_model.save(ref_model, output_dir)
  # params.json inside the SavedModel dir, as the reference converter does
  # (convert_to_saved_model.py:101-105). Prefer the checkpoint dir's
  # params.json so trained/calibrated values travel with the artifact.
  shutil.copy(
      os.path.join(checkpoint_dir, 'params.json'),
      os.path.join(output_dir, 'params.json'),
  )
  return output_dir


if __name__ == '__main__':
  export_saved_model(sys.argv[1], sys.argv[2])
  print(f'SavedModel written to {sys.argv[2]}')
