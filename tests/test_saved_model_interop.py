"""SavedModel interop: pure-Python readers + end-to-end run equality.

The reference accepts either a tf.train.Checkpoint prefix or a SavedModel
directory at inference, auto-detected (reference
quick_inference.py:797-800, loaded at :512-529), and exports SavedModels
via models/convert_to_saved_model.py:67-105. This suite proves:

  1. io/tf_bundle.TensorBundleReader reproduces tf.train.load_checkpoint
     byte-for-byte on a real SavedModel variables bundle and agrees with
     tf.train.list_variables on the bundled (index-only) reference model.
  2. A CLI `run` pointed at a SavedModel dir emits a FASTQ byte-identical
     to the same run pointed at the orbax checkpoint the SavedModel was
     exported from — i.e. a SavedModel-only user gets the exact pipeline.

TF is used here only as the oracle and to build the SavedModel artifact
(tools/oracle/export_saved_model.py); the ingestion path under test never
imports TF.
"""

import os

import numpy as np
import pytest

tf = pytest.importorskip('tensorflow')

from deepconsensus_tpu import cli
from deepconsensus_tpu.io import tf_bundle
from tests.conftest import HUMAN_1M, TESTDATA

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TOY = os.path.join(REPO, 'models_out', 'toy_model')


@pytest.fixture(scope='module')
def saved_model_dir(tmp_path_factory):
  from tools.oracle import export_saved_model

  out = str(tmp_path_factory.mktemp('sm') / 'saved_model')
  export_saved_model.export_saved_model(TOY, out)
  return out


def test_bundle_reader_matches_tf_reader(saved_model_dir):
  prefix = os.path.join(saved_model_dir, 'variables', 'variables')
  ours = tf_bundle.TensorBundleReader(prefix)
  theirs = tf.train.load_checkpoint(prefix)
  tf_vars = dict(tf.train.list_variables(prefix))
  assert dict(ours.list_variables()) == {
      k: list(v) for k, v in tf_vars.items()
  }
  checked = 0
  for name in tf_vars:
    if name == '_CHECKPOINTABLE_OBJECT_GRAPH':
      continue  # string tensor; not needed for weight translation
    a = ours.get_tensor(name)
    b = theirs.get_tensor(name)
    assert a.dtype == b.dtype, name
    np.testing.assert_array_equal(a, b, err_msg=name)
    checked += 1
  assert checked >= 70  # every toy-model weight


def test_bundle_reader_on_index_only_reference_checkpoint():
  """The bundled testdata model ships only .index files; list_variables
  (shapes/dtype metadata) must still agree with TF's."""
  prefix = f'{TESTDATA}/model/checkpoint-1'
  ours = tf_bundle.TensorBundleReader(prefix)
  assert dict(ours.list_variables()) == {
      k: list(v) for k, v in dict(tf.train.list_variables(prefix)).items()
  }
  assert ours.has_tensor(
      'model/bases_embedding_layer/embeddings/.ATTRIBUTES/VARIABLE_VALUE'
  )


def test_saved_model_object_graph_resolution(saved_model_dir):
  idx = tf_bundle.SavedModelVariableIndex(saved_model_dir)
  key = idx.checkpoint_key('bases_embedding_layer/embeddings')
  assert key.startswith('variables/') and key.endswith(
      '/.ATTRIBUTES/VARIABLE_VALUE'
  )
  with pytest.raises(KeyError):
    idx.checkpoint_key('no_such_layer/kernel')
  # A resolvable node that is not a variable (a layer object).
  with pytest.raises(KeyError):
    idx.checkpoint_key('encoder_stack')


def test_saved_model_reader_rekeys_training_names(saved_model_dir):
  reader = tf_bundle.SavedModelCheckpointReader(saved_model_dir)
  name = 'model/bases_embedding_layer/embeddings/.ATTRIBUTES/VARIABLE_VALUE'
  assert reader.has_tensor(name)
  assert reader.get_tensor(name).shape == (5, 8)
  assert not reader.has_tensor('model/nope/.ATTRIBUTES/VARIABLE_VALUE')


def _run_cli(checkpoint: str, out: str) -> bytes:
  rc = cli.main([
      'run',
      '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
      '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
      '--checkpoint', checkpoint,
      '--output', out,
      '--cpus', '0',
      '--limit', '4',
  ])
  assert rc == 0
  with open(out, 'rb') as f:
    data = f.read()
  assert data
  return data


def test_saved_model_run_byte_identical_to_checkpoint_run(
    saved_model_dir, tmp_path
):
  from_ckpt = _run_cli(TOY, str(tmp_path / 'ckpt.fastq'))
  from_sm = _run_cli(saved_model_dir, str(tmp_path / 'sm.fastq'))
  assert from_sm == from_ckpt


def test_bundle_reader_rejects_corrupt_index(tmp_path, saved_model_dir):
  """Truncated/garbage index files fail with a clean IOError, not a
  silent mis-parse."""
  import shutil

  src = os.path.join(saved_model_dir, 'variables')
  dst = tmp_path / 'variables'
  shutil.copytree(src, dst)
  idx = dst / 'variables.index'
  data = idx.read_bytes()

  idx.write_bytes(data[: len(data) // 2])  # drop the footer
  with pytest.raises(IOError):
    tf_bundle.TensorBundleReader(str(dst / 'variables'))

  idx.write_bytes(b'\x00' * 64)  # bad magic
  with pytest.raises(IOError, match='magic'):
    tf_bundle.TensorBundleReader(str(dst / 'variables'))

  with pytest.raises(FileNotFoundError):
    tf_bundle.TensorBundleReader(str(tmp_path / 'nope' / 'variables'))


def test_saved_model_reader_rejects_non_savedmodel(tmp_path):
  assert not tf_bundle.is_saved_model_dir(str(tmp_path))
  (tmp_path / 'saved_model.pb').write_bytes(b'\x08\x01')  # no MetaGraphDef
  assert tf_bundle.is_saved_model_dir(str(tmp_path))
  with pytest.raises(IOError, match='MetaGraphDef'):
    tf_bundle.SavedModelVariableIndex(str(tmp_path))
