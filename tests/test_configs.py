"""Config-system tests: reference params.json compatibility, derivations."""

import os

import numpy as np
import pytest

from deepconsensus_tpu.models import configs
from tests.conftest import TESTDATA


def test_reference_params_json_loads_unchanged():
  """The v1.2 release params.json drives this framework directly."""
  params = configs.read_params_from_json(f'{TESTDATA}/model')
  configs.finalize_params(params)
  assert params.hidden_size == 280
  assert params.total_rows == 85
  assert params.max_passes == 20
  assert params.num_hidden_layers == 6
  assert params.filter_size == 2048
  assert params.attn_win_size == 12
  assert params.rezero is True
  assert params.get('dc_calibration') == '0,1.197654,-0.99781'


def test_reference_bq_params_json_loads():
  params = configs.read_params_from_json(f'{TESTDATA}/model_bq')
  configs.finalize_params(params)
  assert params.use_ccs_bq is True
  assert params.total_rows == 86


def test_hidden_size_derivation_matches_reference_formula():
  """modify_params math (model_utils.py:315-346)."""
  params = configs.get_config('transformer_learn_values+custom')
  configs.finalize_params(params)
  # 20 * (8+8+8+2) + 8 (ccs) + 4*8 (sn) = 560 concat, condensed to 280.
  assert params.embedding_concat_size == 560
  assert params.hidden_size == 280


def test_batch_scaling_explicit():
  params = configs.get_config('transformer_learn_values+custom')
  with params.unlocked():
    params.batch_size = 256
    params.tpu_scale_factor = 1
  configs.finalize_params(params, num_replicas=32, batch_scale=True)
  assert params.batch_size == 256 * 32  # the reference's 8192 global batch


def test_invalid_config_names():
  with pytest.raises(ValueError):
    configs.get_config('nope+test')
  with pytest.raises(ValueError):
    configs.get_config('transformer_learn_values+nope')
  with pytest.raises(ValueError):
    configs.get_config('noseparator')


def test_custom_dataset_via_tf_dataset():
  golden_root = '/root/reference/deepconsensus/testdata/human_1m/tf_examples'
  params = configs.get_config('transformer_learn_values+custom')
  with params.unlocked():
    params.tf_dataset = [golden_root]
  configs.finalize_params(params)
  assert params.train_path == [f'{golden_root}/train/*']
  assert params.eval_path == [f'{golden_root}/eval/*']
  assert params.n_examples_train == 1239
  assert params.n_examples_eval == 65


def test_custom_dataset_manual_counts_override():
  golden_root = '/root/reference/deepconsensus/testdata/human_1m/tf_examples'
  params = configs.get_config('transformer_learn_values+custom')
  with params.unlocked():
    params.tf_dataset = [golden_root]
    params.n_examples_train = 100
    params.n_examples_eval = 10
  configs.finalize_params(params)
  assert params.n_examples_train == 100
  assert params.n_examples_eval == 10


def test_custom_dataset_max_passes_mismatch_raises():
  golden_root = '/root/reference/deepconsensus/testdata/human_1m/tf_examples'
  params = configs.get_config('transformer_learn_values+custom')
  with params.unlocked():
    params.tf_dataset = [golden_root]
    params.max_passes = 15
  import pytest as _pytest

  with _pytest.raises(ValueError, match='max_passes'):
    configs.finalize_params(params)


def test_custom_dataset_trains_via_cli(tmp_path):
  import jax

  from deepconsensus_tpu import cli

  golden_root = '/root/reference/deepconsensus/testdata/human_1m/tf_examples'
  out_dir = str(tmp_path / 'custom_run')
  rc = cli.main([
      'train', '--config', 'transformer_learn_values+custom',
      '--tf_dataset', golden_root, '--out_dir', out_dir,
      '--batch_size', '8', '--num_epochs', '1', '--limit', '8',
      '--num_devices', '1',
  ])
  assert rc == 0
  assert os.path.exists(os.path.join(out_dir, 'best_checkpoint.txt'))


def test_custom_trained_checkpoint_params_reload_for_inference(tmp_path):
  """A custom-dataset training run persists BOTH tf_dataset and the
  derived train_path in params.json; reloading it for inference must not
  re-run dataset expansion (review r5 — it used to raise 'Cannot specify
  both', making every custom-trained checkpoint unusable for run/eval/
  export)."""
  import json
  import os

  p = configs.get_config('transformer_learn_values+custom')
  with p.unlocked():
    p.tf_dataset = ['/nonexistent/dataset']
    p.train_path = ['/nonexistent/dataset/train/*']
    p.eval_path = ['/nonexistent/dataset/eval/*']
    p.test_path = ['/nonexistent/dataset/test/*']
    p.n_examples_train = 100
    p.n_examples_eval = 10
  configs.save_params_json(p, os.path.join(tmp_path, 'params.json'))

  loaded = configs.read_params_from_json(str(tmp_path))
  configs.finalize_params(loaded, is_training=False)  # must not raise
  assert loaded.max_passes == 20
  assert loaded.hidden_size > 0


def test_reference_internal_dataset_names_fall_back(tmp_path):
  """Reference-trained checkpoints carry internal dataset names ('ccs',
  'poa', ...) whose setters the OSS reference strips; params.json load
  must fall back to the empty 'custom' dataset instead of raising
  (review r5)."""
  import json
  import os

  with open('/root/reference/deepconsensus/testdata/model/params.json') as f:
    ref = json.load(f)
  ref['dataset_config_name'] = 'ccs'
  with open(os.path.join(tmp_path, 'params.json'), 'w') as f:
    json.dump(ref, f)
  params = configs.read_params_from_json(str(tmp_path))
  assert params.dataset_config_name == 'ccs'  # loaded value preserved
  configs.finalize_params(params, is_training=False)
  assert params.hidden_size == 280
