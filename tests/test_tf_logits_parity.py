"""Numeric forward parity: JAX model vs the reference TF/Keras model.

The missing link in the bit-identical-FASTQ chain (featurization is
golden-verified, the Q-score math is unit-verified): this test constructs
the REFERENCE model itself (imported from /root/reference with the two
tf-models layers stubbed — tools/oracle/tf_ref_model.py), saves a real
tf.train.Checkpoint with random weights, translates it with
models/checkpoint.load_tf_checkpoint, and asserts the JAX forward
reproduces the TF forward on the bundled golden examples:

* probabilities match to f32 tolerance (reference networks.py:368-520,
  attention_layer.py:132-221, encoder_stack.py:141-198);
* the engine's ModelRunner (compact transport path) yields identical
  argmax ids and Q-score strings through quality_scores_from_probs
  (reference quick_inference.py:377-389).
"""

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from tools.oracle import tf_ref_model

from deepconsensus_tpu.inference import engine
from deepconsensus_tpu.io import tfrecord
from deepconsensus_tpu.models import checkpoint, configs, data
from deepconsensus_tpu.models import model as model_lib
from tests.conftest import HUMAN_1M

N_EXAMPLES = 64


@pytest.fixture(
    scope='module',
    params=['transformer_learn_values+test', 'transformer_learn_values+test_bq'],
)
def oracle(request, tmp_path_factory):
  config_name = request.param
  ref_model, ref_params = tf_ref_model.build_reference_model(
      config_name=config_name, seed=3
  )
  ckpt_dir = tmp_path_factory.mktemp('tf_ckpt')
  prefix = tf_ref_model.save_reference_checkpoint(ref_model, str(ckpt_dir))

  params = configs.get_config(config_name)
  configs.finalize_params(params)
  # The two configs must describe the same architecture, or parity is
  # meaningless.
  for key in (
      'max_passes', 'total_rows', 'hidden_size', 'num_hidden_layers',
      'num_heads', 'filter_size', 'attn_win_size', 'per_base_hidden_size',
      'pw_hidden_size', 'ip_hidden_size', 'strand_hidden_size',
      'sn_hidden_size', 'transformer_input_size', 'use_ccs_bq', 'rezero',
  ):
    assert params[key] == ref_params[key], key

  jax_model = model_lib.get_model(params)
  variables = model_lib.init_params(jax_model, params)
  translated = checkpoint.load_tf_checkpoint(prefix, variables, params)
  return ref_model, jax_model, translated, params


def _golden_rows(params, n=N_EXAMPLES):
  """Golden examples -> format_rows'd (n, total_rows, length, 1) f32."""
  sub = 'tf_examples_bq' if params.use_ccs_bq else 'tf_examples'
  path = f'{HUMAN_1M}/{sub}/train/train.tfrecord.gz'
  rows = []
  for rec in tfrecord.read_tfrecords(path):
    ex = data.parse_example_bytes(rec)
    rows.append(data.format_rows(ex['subreads'][..., 0], params))
    if len(rows) >= n:
      break
  return np.stack(rows)[..., None].astype(np.float32)


def test_probs_match_reference_forward(oracle):
  ref_model, jax_model, translated, params = oracle
  batch = _golden_rows(params)
  tf_probs = np.asarray(ref_model(tf.constant(batch), training=False))
  jax_probs = np.asarray(jax_model.apply(translated, batch))
  assert tf_probs.shape == jax_probs.shape == (N_EXAMPLES, 100, 5)
  np.testing.assert_allclose(jax_probs, tf_probs, atol=2e-5, rtol=1e-4)
  np.testing.assert_array_equal(
      jax_probs.argmax(-1), tf_probs.argmax(-1)
  )


def test_engine_runner_matches_reference_qscores(oracle):
  ref_model, _, translated, params = oracle
  batch = _golden_rows(params)
  tf_probs = np.asarray(ref_model(tf.constant(batch), training=False))

  runner = engine.ModelRunner(params, translated, batch_size=N_EXAMPLES)
  ids, maxp = runner.predict(batch)
  np.testing.assert_array_equal(ids, tf_probs.argmax(-1))
  np.testing.assert_allclose(maxp, tf_probs.max(-1), atol=2e-5)

  # Q-score chain: same op order on both sides must round identically.
  options = engine.InferenceOptions(
      max_length=100, example_height=85, max_passes=20
  )
  ours = engine.quality_scores_from_probs(maxp, options)
  theirs = engine.quality_scores_from_probs(tf_probs.max(-1), options)
  mismatch = np.mean(ours != theirs)
  # f32 max-prob agreement to 2e-5 can still flip a rounded Q at the
  # half-integer boundary in rare cases; require better than 1 in 10^3.
  assert mismatch < 1e-3, f'Q mismatch rate {mismatch}'
