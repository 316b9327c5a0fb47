"""Imports the reference TF/Keras model as a numeric oracle.

The reference model (`/root/reference/deepconsensus/models/networks.py`)
depends on two layers from tf-models-official (`official.nlp.modeling
.layers.OnDeviceEmbedding` / `RelativePositionEmbedding`) which is not
installed here. Those two layers are small and fully specified by their
tf-models-2.9.1 semantics, so this harness reimplements them, registers
them as an `official` module stub, and imports the reference model modules
unchanged — the same stub-the-missing-dep pattern the featurizer oracle
uses for pysam (tools/oracle/spacing_fuzz.py).

Oracle code only: never imported by the shipped package. TF is pinned to
legacy Keras (tf_keras) because the reference targets Keras 2.9 APIs
(`tf.keras.layers.experimental.EinsumDense`, subclassed-model checkpoint
object graphs).
"""

import math
import os
import sys
import types

os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')

import tensorflow as tf  # noqa: E402


class OnDeviceEmbedding(tf.keras.layers.Layer):
  """tf-models OnDeviceEmbedding: gather + optional scale.

  Semantics per tf-models-official 2.9.1 nlp/modeling/layers/on_device_
  embedding.py: weight named `embeddings` [vocab, width]; lookup by gather
  (or one-hot matmul); multiplied by scale_factor when set. The weight name
  matters — it is the checkpoint object-graph path the translator maps.
  """

  def __init__(
      self,
      vocab_size,
      embedding_width,
      initializer='glorot_uniform',
      use_one_hot=False,
      scale_factor=None,
      **kwargs,
  ):
    super().__init__(**kwargs)
    self._vocab_size = vocab_size
    self._embedding_width = embedding_width
    self._initializer = initializer
    self._use_one_hot = use_one_hot
    self._scale_factor = scale_factor

  def build(self, input_shape):
    self.embeddings = self.add_weight(
        'embeddings',
        shape=[self._vocab_size, self._embedding_width],
        initializer=self._initializer,
        dtype=tf.float32,
    )
    super().build(input_shape)

  def call(self, inputs):
    flat_inputs = tf.reshape(inputs, [-1])
    if self._use_one_hot:
      one_hot_data = tf.one_hot(
          flat_inputs, depth=self._vocab_size, dtype=self.embeddings.dtype
      )
      embeddings = tf.matmul(one_hot_data, self.embeddings)
    else:
      embeddings = tf.gather(self.embeddings, flat_inputs)
    embeddings = tf.reshape(
        embeddings,
        tf.concat([tf.shape(inputs), [self._embedding_width]], axis=0),
    )
    embeddings.set_shape(
        inputs.shape.as_list() + [self._embedding_width]
    )
    if self._scale_factor:
      embeddings *= self._scale_factor
    return embeddings


class RelativePositionEmbedding(tf.keras.layers.Layer):
  """tf-models RelativePositionEmbedding: non-learned sinusoid [len, hidden].

  Semantics per tf-models-official 2.9.1 nlp/modeling/layers/position_
  embedding.py: geometric inv_timescales over hidden_size//2 channels,
  concat(sin, cos) along the channel axis.
  """

  def __init__(
      self, hidden_size, min_timescale=1.0, max_timescale=1.0e4, **kwargs
  ):
    super().__init__(**kwargs)
    self._hidden_size = hidden_size
    self._min_timescale = min_timescale
    self._max_timescale = max_timescale

  def call(self, inputs, length=None):
    if inputs is None and length is None:
      raise ValueError('If inputs is None, length must be set.')
    if inputs is not None:
      input_shape = tf.shape(inputs)
      if length is not None and length != input_shape[1]:
        raise ValueError('If inputs is not None, length must equal dim 1.')
      length = input_shape[1]
    position = tf.cast(tf.range(length), tf.float32)
    num_timescales = self._hidden_size // 2
    min_timescale, max_timescale = self._min_timescale, self._max_timescale
    log_timescale_increment = math.log(
        float(max_timescale) / float(min_timescale)
    ) / (tf.cast(num_timescales, tf.float32) - 1)
    inv_timescales = min_timescale * tf.exp(
        tf.cast(tf.range(num_timescales), tf.float32)
        * -log_timescale_increment
    )
    scaled_time = tf.expand_dims(position, 1) * tf.expand_dims(
        inv_timescales, 0
    )
    return tf.concat([tf.sin(scaled_time), tf.cos(scaled_time)], axis=1)


def _install_official_stub():
  if 'official' in sys.modules:
    return
  official = types.ModuleType('official')
  nlp = types.ModuleType('official.nlp')
  modeling = types.ModuleType('official.nlp.modeling')
  layers_mod = types.ModuleType('official.nlp.modeling.layers')
  layers_mod.OnDeviceEmbedding = OnDeviceEmbedding
  layers_mod.RelativePositionEmbedding = RelativePositionEmbedding
  modeling.layers = layers_mod
  nlp.modeling = modeling
  official.nlp = nlp
  off_modeling = types.ModuleType('official.modeling')
  # model_utils imports `official.modeling.optimization` at module scope but
  # only touches it in create_optimizer, which the oracle never calls.
  optimization = types.ModuleType('official.modeling.optimization')
  off_modeling.optimization = optimization
  official.modeling = off_modeling
  sys.modules['official'] = official
  sys.modules['official.nlp'] = nlp
  sys.modules['official.nlp.modeling'] = modeling
  sys.modules['official.nlp.modeling.layers'] = layers_mod
  sys.modules['official.modeling'] = off_modeling
  sys.modules['official.modeling.optimization'] = optimization


def _install_pysam_stub():
  """Minimal pysam stub so reference modules import (dc_constants et al.)."""
  if 'pysam' in sys.modules:
    return
  fake = types.ModuleType('pysam')
  for i, name in enumerate([
      'CMATCH', 'CINS', 'CDEL', 'CREF_SKIP', 'CSOFT_CLIP', 'CHARD_CLIP',
      'CPAD', 'CEQUAL', 'CDIFF', 'CBACK',
  ]):
    setattr(fake, name, i)
  fake.set_verbosity = lambda *a: 0
  fake.AlignmentFile = object
  fake.FastaFile = object
  fake.FastxFile = object
  fake.qualitystring_to_array = lambda s: s

  class _FakeAlignedSegment:
    pass

  fake.AlignedSegment = _FakeAlignedSegment
  lib = types.ModuleType('pysam.libcalignedsegment')
  lib.AlignedSegment = _FakeAlignedSegment
  fake.libcalignedsegment = lib
  sys.modules['pysam'] = fake
  sys.modules['pysam.libcalignedsegment'] = lib


def import_reference_models():
  """Returns (networks, model_configs, model_utils) reference modules."""
  _install_official_stub()
  _install_pysam_stub()
  if '/root/reference' not in sys.path:
    sys.path.insert(0, '/root/reference')
  from deepconsensus.models import model_configs as ref_model_configs
  from deepconsensus.models import model_utils as ref_model_utils
  from deepconsensus.models import networks as ref_networks

  return ref_networks, ref_model_configs, ref_model_utils


def build_reference_model(
    config_name: str = 'transformer_learn_values+test',
    max_length: int = 100,
    seed: int = 0,
    overrides=None,
):
  """Builds the reference Keras model with random initialized weights.

  Returns (model, params) with variables created (built by a dummy call).
  """
  ref_networks, ref_model_configs, ref_model_utils = import_reference_models()
  params = ref_model_configs.get_config(config_name)
  ref_model_utils.modify_params(
      params, max_length=max_length, is_training=False
  )
  if overrides:
    with params.unlocked():
      for k, v in overrides.items():
        params[k] = v
  tf.keras.utils.set_random_seed(seed)
  model = ref_model_utils.get_model(params)
  dummy = tf.zeros(
      (1, params.total_rows, params.max_length, 1), dtype=tf.float32
  )
  model(dummy, training=False)
  return model, params


def save_reference_checkpoint(model, out_dir: str) -> str:
  """Saves a tf.train.Checkpoint with the reference's object-graph names.

  Mirrors the reference's checkpoint layout (model_utils.py:511-540):
  `tf.train.Checkpoint(model=model)` so every variable lands under
  `model/<attr path>/.ATTRIBUTES/VARIABLE_VALUE`.
  """
  ckpt = tf.train.Checkpoint(model=model)
  return ckpt.save(os.path.join(out_dir, 'ckpt'))
