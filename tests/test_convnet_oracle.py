"""Structural oracle: our ConvNet vs the reference Keras ConvNet.

The reference ConvNet is a keras ResNet50/101/152V2 backbone + dense head
(reference: networks.py:95-170). Our port deviates in two DOCUMENTED ways
(models/model.py:ConvNet docstring): GroupNorm replaces BatchNorm (so
numeric forward parity is impossible by design — both sides are random
init in the reference too), and the constant SN/channel layout is
de-duplicated. Everything else must line up, which this suite pins
against the actually-instantiated reference model:

  * identical conv-layer count and an identical multiset of conv kernel
    geometries (H, W, C_out) across the whole backbone;
  * identical C_in everywhere except the stem conv (the documented 1- vs
    3-channel image layout deviation);
  * identical head width and identical output contract (B, L, vocab)
    softmax rows.
"""

import collections

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

import jax  # noqa: E402

from deepconsensus_tpu.models import configs, model as model_lib  # noqa: E402


@pytest.fixture(scope='module')
def reference_convnet():
  # The OSS reference ships ConvNet (networks.py:121-170) but strips its
  # dataset configs (model_configs.py:360-367 call removed setters), so
  # instantiate it directly with the fields its __init__/call read.
  import ml_collections

  from tools.oracle import tf_ref_model

  ref_networks, _, _ = tf_ref_model.import_reference_models()
  params = ml_collections.ConfigDict(dict(
      conv_model='resnet50', hidden_size=85, max_length=100, use_sn=True
  ))
  model = ref_networks.ConvNet(params)
  # Build variables with a dummy call.
  model(tf.zeros((1, 85, 100, 5)), training=False)
  return model, params


def _keras_convs(model):
  return [
      tuple(l.kernel.shape.as_list())
      for l in model.model.layers
      if isinstance(l, tf.keras.layers.Conv2D)
  ]


def _flax_convs(variables):
  convs = []

  def walk(node):
    for key, value in node.items():
      if isinstance(value, dict):
        walk(value)
      elif key == 'kernel' and getattr(value, 'ndim', 0) == 4:
        convs.append(tuple(int(d) for d in value.shape))

  walk(jax.tree_util.tree_map(lambda x: x, variables['params']))
  return convs


@pytest.fixture(scope='module')
def ours():
  params = configs.get_config('conv_net+test')
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  return model, params, variables


def test_conv_inventory_matches_reference(reference_convnet, ours):
  ref_model, _ = reference_convnet
  _, _, variables = ours
  ref = _keras_convs(ref_model)
  mine = _flax_convs(variables)
  assert len(ref) == len(mine), (len(ref), len(mine))
  # Full-geometry multiset (H, W, Cout); Cin compared below.
  ref_geo = collections.Counter((h, w, co) for h, w, _, co in ref)
  my_geo = collections.Counter((h, w, co) for h, w, _, co in mine)
  assert ref_geo == my_geo
  # Cin multiset differs only at the stem conv (3- vs 1-channel image).
  ref_cin = collections.Counter(ref)
  my_cin = collections.Counter(mine)
  only_ref = ref_cin - my_cin
  only_mine = my_cin - ref_cin
  assert sum(only_ref.values()) == 1 and sum(only_mine.values()) == 1
  ((h, w, ref_in, co),) = only_ref.keys()
  ((h2, w2, my_in, co2),) = only_mine.keys()
  assert (h, w, co) == (h2, w2, co2)
  assert ref_in == 3 and my_in == 1


def test_head_and_output_contract(reference_convnet, ours):
  ref_model, ref_params = reference_convnet
  model, params, variables = ours
  assert ref_model.layer_dense.units == params.max_length * 5

  rows = np.random.default_rng(0).normal(
      size=(2, params.total_rows, params.max_length, 1)
  ).astype(np.float32)
  got = np.asarray(model.apply(variables, rows, deterministic=True))
  assert got.shape == (2, params.max_length, 5)
  np.testing.assert_allclose(got.sum(-1), 1.0, rtol=1e-5)

  ref_rows = np.random.default_rng(0).normal(
      size=(2, ref_params.hidden_size, ref_params.max_length, 5)
  ).astype(np.float32)  # reference stacks 5 channels; ours stacks rows
  ref_out = ref_model(tf.constant(ref_rows), training=False).numpy()
  assert ref_out.shape == (2, ref_params.max_length, 5)
  np.testing.assert_allclose(ref_out.sum(-1), 1.0, rtol=1e-5)