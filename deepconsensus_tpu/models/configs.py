"""Model/training hyperparameter configs and params.json IO.

Mirrors the configuration surface of the reference
(`reference: models/model_configs.py`, `models/model_utils.py:237-354`,
`models/transformer_basic_params.py`): configs are selected by
'{model}+{dataset}' strings, derived sizes are filled in by
`finalize_params`, and the resulting dict round-trips through params.json so
checkpoints stay self-describing (and reference params.json files load
directly).
"""

import json
import os
from typing import Optional

import ml_collections

from deepconsensus_tpu import constants

# Bundled test dataset location; override with DC_TPU_TESTDATA so the
# package is not coupled to this checkout layout.
_HUMAN_1M = os.environ.get(
    'DC_TPU_TESTDATA', '/root/reference/deepconsensus/testdata/human_1m'
)


def _set_base_transformer_hparams(params):
  """Base encoder-only transformer values (model_configs.py:76-124)."""
  params.model_name = 'transformer'
  params.add_pos_encoding = True
  params.num_heads = 2
  params.layer_norm = False
  params.rezero = True
  params.condense_transformer_input = False
  params.transformer_model_size = 'base'
  params.attn_win_size = 12
  params.num_channels = 1
  params.per_base_hidden_size = 1
  params.pw_hidden_size = 1
  params.ip_hidden_size = 1
  params.sn_hidden_size = 1
  params.ccs_bq_hidden_size = 1
  params.strand_hidden_size = 1
  params.layer_postprocess_dropout = 0.1
  params.attention_dropout = 0.1
  params.relu_dropout = 0.1
  params.batch_size = 256
  params.num_epochs = 9
  params.num_epochs_for_decay = 9
  params.buffer_size = 1_000_000
  params.initial_learning_rate = 3.6246e-3
  params.end_learning_rate = 2.86594e-5
  params.warmup_steps = 35536
  params.weight_decay_rate = 6.9868e-3
  params.beta_1 = 0.9
  params.beta_2 = 0.999
  params.epsilon = 1e-6


def _set_learned_embeddings_hparams(params):
  """Production model values (model_configs.py:127-139)."""
  _set_base_transformer_hparams(params)
  params.model_name = 'transformer_learn_values'
  params.per_base_hidden_size = 8
  params.pw_hidden_size = 8
  params.ip_hidden_size = 8
  params.strand_hidden_size = 2
  params.sn_hidden_size = 8
  params.ccs_bq_hidden_size = 8
  params.condense_transformer_input = True
  params.transformer_input_size = 280


def _set_distill_hparams(params):
  """Distilled student values (model_configs.py:150-190)."""
  _set_learned_embeddings_hparams(params)
  params.model_name = 'transformer_learn_values_distill'
  params.num_hidden_layers = 5
  params.filter_size = 2048
  params.layer_postprocess_dropout = 0.0
  params.attention_dropout = 0.1
  params.relu_dropout = 0.0
  params.init_encoder_stack = True
  params.init_nonencoder_layers = True
  params.teacher_encoder_layers = [1, 2, 3, 4, 5]
  params.student_encoder_layers = [0, 1, 2, 3, 4]
  params.warmup_steps = 0
  params.distill_alpha = 1.0e5
  params.student_alpha = 1.0
  params.temperature = 1.0
  params.logit_loss_identifier = 'mean_squared_error'


def _set_fc_hparams(params):
  """Fully-connected baseline (model_configs.py:43-73)."""
  params.model_name = 'fc'
  params.fc_size = [256, 512, 256, 128]
  params.fc_dropout = 0.0
  params.num_channels = 1
  params.per_base_hidden_size = 1
  params.pw_hidden_size = 1
  params.ip_hidden_size = 1
  params.strand_hidden_size = 1
  params.ccs_bq_hidden_size = 1
  params.sn_hidden_size = 1
  params.l2 = 0.0
  params.batch_size = 256
  params.num_epochs = 15
  params.num_epochs_for_decay = 15
  params.buffer_size = 1_000_000
  params.initial_learning_rate = 3.6246e-3
  params.end_learning_rate = 2.86594e-5
  params.warmup_steps = 35536
  params.weight_decay_rate = 6.9868e-3
  params.beta_1 = 0.9
  params.beta_2 = 0.999
  params.epsilon = 1e-6


def _set_test_dataset(params, use_ccs_bq=False):
  """Bundled human_1m testdata dataset (model_configs.py:198-246)."""
  sub = 'tf_examples_bq' if use_ccs_bq else 'tf_examples'
  params.use_ccs_bq = use_ccs_bq
  params.train_path = [f'{_HUMAN_1M}/{sub}/train/*']
  params.eval_path = params.train_path
  params.test_path = params.train_path
  params.inference_path = f'{_HUMAN_1M}/{sub}/inference/*'
  params.n_examples_train = 253
  params.n_examples_eval = 253
  params.max_passes = 20
  params.batch_size = 1
  params.num_epochs = 1
  params.buffer_size = 10
  if params.model_name == 'fc':
    params.fc_size = [4, 4]


# Transformer size presets merged for params not already set
# (transformer_basic_params.py:33-97; only these keys end up mattering for
# the dc configs).
_TRANSFORMER_SIZE_PRESETS = {
    'tiny': dict(num_hidden_layers=2, filter_size=512, num_heads=2),
    'base': dict(
        default_batch_size=2048,
        default_batch_size_tpu=32768,
        initializer_gain=1.0,
        num_hidden_layers=6,
        filter_size=2048,
        label_smoothing=0.1,
        learning_rate=2.0,
        learning_rate_decay_rate=1.0,
        learning_rate_warmup_steps=16000,
        optimizer_adam_beta1=0.9,
        optimizer_adam_beta2=0.997,
        optimizer_adam_epsilon=1e-09,
        extra_decode_length=50,
        beam_size=4,
        alpha=0.6,
        use_tpu=False,
        static_batch=False,
        allow_ffn_pad=True,
    ),
    'big': dict(num_hidden_layers=6, filter_size=4096, num_heads=16),
}


def get_config(config_name: Optional[str] = None) -> ml_collections.ConfigDict:
  """Builds a config from a '{model}+{dataset}' name.

  Models: fc | transformer | transformer_learn_values |
  transformer_learn_values_distill. Datasets: test | test_bq | custom.
  """
  params = ml_collections.ConfigDict()
  params.dataset_config_name = ''
  params.model_config_name = ''
  params.trial = 1
  params.seed = 1
  params.limit = -1
  params.vocab_size = constants.SEQ_VOCAB_SIZE
  params.tensorboard_update_freq = 'batch'
  params.model_checkpoint_freq = 'epoch'
  params.use_bases = True
  params.use_pw = True
  params.use_ip = True
  params.use_strand = True
  params.use_ccs = True
  params.use_sn = True
  params.use_ccs_bq = False
  params.use_dnabert = False
  params.dnabert_desired_hidden_size = 0
  params.PW_MAX = 255
  params.IP_MAX = 255
  params.SN_MAX = 500
  params.STRAND_MAX = 2
  params.CCS_BQ_MAX = 95
  params.max_length = 100
  params.max_passes = 20
  params.loss_function = 'alignment_loss'
  # Float like the reference base config (model_configs.py:321) so both
  # int (bundled testdata params.json) and float (freshly dumped reference
  # configs) values load; ml_collections casts int->float but not the
  # reverse.
  params.del_cost = 10.0
  params.loss_reg = 0.1
  params.band_width = None
  params.remove_label_gaps = False
  # Input-pipeline parallelism: worker processes parsing/formatting record
  # chunks (0 = in-process serial). The reference gets this from tf.data
  # num_parallel_calls (data_providers.py:377-425).
  params.input_workers = 0
  params.tpu_scale_factor = 1
  params.num_epochs_for_decay = 9

  if config_name is None:
    config_name = 'transformer_learn_values+test'
  if '+' not in config_name:
    raise ValueError(
        f'config name must look like model+dataset, got {config_name!r}'
    )
  model_name, dataset_name = config_name.split('+')
  params.model_config_name = model_name
  params.dataset_config_name = dataset_name

  if model_name == 'fc':
    _set_fc_hparams(params)
  elif model_name == 'conv_net':
    _set_fc_hparams(params)
    params.model_name = 'conv_net'
    # ResNet50/101/152V2 backbone selection (reference
    # model_configs.py:333 default + networks.py:100-117).
    params.conv_model = 'resnet50'
  elif model_name == 'transformer':
    _set_base_transformer_hparams(params)
  elif model_name == 'transformer_learn_values':
    _set_learned_embeddings_hparams(params)
  elif model_name == 'transformer_learn_values_distill':
    _set_distill_hparams(params)
  else:
    raise ValueError(f'unknown model config {model_name!r}')

  if dataset_name == 'test':
    _set_test_dataset(params, use_ccs_bq=False)
  elif dataset_name == 'test_bq':
    _set_test_dataset(params, use_ccs_bq=True)
  elif dataset_name == 'custom':
    # Real-data training: point tf_dataset at one or more preprocess output
    # dirs (layout <dir>/{train,eval,test}/* + <dir>/summary/
    # summary.training.json); set_dataset fills paths and example counts
    # (reference model_configs.py:142-148 + model_utils.py:155-229).
    params.max_passes = 20
    params.tf_dataset = []
  else:
    raise ValueError(f'unknown dataset config {dataset_name!r}')

  return params


def get_total_rows(max_passes: int, use_ccs_bq: bool) -> int:
  """Example height (reference: data_providers.py:61-78)."""
  fixed = 6 if use_ccs_bq else 5
  return max_passes * 4 + fixed


def get_indices(max_passes: int, use_ccs_bq: bool):
  """(start, end) rows per feature (reference: data_providers.py:81-113)."""
  base_indices = (0, max_passes)
  pw_indices = (max_passes, max_passes * 2)
  ip_indices = (max_passes * 2, max_passes * 3)
  strand_indices = (max_passes * 3, max_passes * 4)
  ccs_indices = (max_passes * 4, max_passes * 4 + 1)
  if use_ccs_bq:
    ccs_bq_indices = (max_passes * 4 + 1, max_passes * 4 + 2)
    sn_indices = (max_passes * 4 + 2, max_passes * 4 + 6)
  else:
    ccs_bq_indices = (0, 0)
    sn_indices = (max_passes * 4 + 1, max_passes * 4 + 5)
  return (
      base_indices,
      pw_indices,
      ip_indices,
      strand_indices,
      ccs_indices,
      ccs_bq_indices,
      sn_indices,
  )


def load_dataset_summary(dataset_path: str):
  """Loads summary.training.json for a preprocess output dir.

  Accepts both the preprocess driver's `<dir>/summary/summary.training.json`
  layout (from --output '<dir>/@split/@split.tfrecord.gz') and a flat
  `<dir>/summary.training.json` (reference model_utils.py:606-628).
  """
  for cand in (
      os.path.join(dataset_path, 'summary', 'summary.training.json'),
      os.path.join(dataset_path, 'summary.training.json'),
  ):
    if os.path.exists(cand):
      with open(cand) as f:
        return cand, json.load(f)
  raise FileNotFoundError(
      f'no summary.training.json under {dataset_path!r} '
      '(expected <dir>/summary/summary.training.json from preprocess)'
  )


def set_dataset(params) -> None:
  """Expands params.tf_dataset into paths + example counts.

  Reference semantics (model_utils.py:155-229): each tf_dataset entry is a
  preprocess output root; train/eval/test globs are derived, example counts
  come from the dataset summary unless both n_examples_{train,eval} are
  already set, and the dataset's max_passes must match the model config.
  """
  if 'tf_dataset' not in params or not params.tf_dataset:
    return
  if 'train_path' in params and params.train_path:
    raise ValueError(
        'Cannot specify both tf_dataset and individual paths (train_path)'
    )
  with params.unlocked():
    params.train_path = []
    params.eval_path = []
    params.test_path = []
    have_train = 'n_examples_train' in params and params.n_examples_train > 0
    have_eval = 'n_examples_eval' in params and params.n_examples_eval > 0
    if have_train != have_eval:
      raise ValueError(
          'Set both n_examples_train and n_examples_eval, or neither '
          '(counts then load from summary.training.json).'
      )
    load_counts = not have_train
    if load_counts:
      params.n_examples_train = 0
      params.n_examples_eval = 0
    for dataset_path in params.tf_dataset:
      params.train_path.append(os.path.join(dataset_path, 'train', '*'))
      params.eval_path.append(os.path.join(dataset_path, 'eval', '*'))
      params.test_path.append(os.path.join(dataset_path, 'test', '*'))
      summary_path, summary = load_dataset_summary(dataset_path)
      n_train = int(summary.get('n_examples_train', 0))
      n_eval = int(summary.get('n_examples_eval', 0))
      if not n_train or not n_eval:
        raise ValueError(f'No example counts in {summary_path}')
      if load_counts:
        params.n_examples_train += n_train
        params.n_examples_eval += n_eval
      dataset_max_passes = int(summary['max_passes'])
      if int(params.max_passes) != dataset_max_passes:
        raise ValueError(
            f'dataset max_passes {dataset_max_passes} != model '
            f'max_passes {params.max_passes} ({summary_path})'
        )


def finalize_params(
    params: ml_collections.ConfigDict,
    max_length: Optional[int] = None,
    num_replicas: int = 1,
    batch_scale: bool = False,
    is_training: bool = True,
) -> ml_collections.ConfigDict:
  """Fills in derived sizes (reference: model_utils.modify_params).

  Unlike the reference, accelerator batch scaling is explicit: pass
  num_replicas (mesh data-axis size) and batch_scale=True to multiply the
  per-replica batch to the global batch, instead of sniffing GPUs/TPUs.

  is_training=False (inference/export from a checkpoint) skips dataset
  expansion entirely, like the reference's modify_params deleting the
  dataset keys (model_utils.py:270-276): a custom-trained checkpoint's
  params.json persists BOTH tf_dataset and the derived train_path, so
  re-running set_dataset would either raise (both set) or re-require the
  training machine's summary.training.json on the inference host.
  """
  if is_training:
    set_dataset(params)
  with params.unlocked():
    if batch_scale and num_replicas > 1:
      params.batch_size = (
          params.batch_size * params.tpu_scale_factor * num_replicas
      )
    if max_length is not None:
      params.max_length = max_length
    params.total_rows = get_total_rows(params.max_passes, params.use_ccs_bq)

    if 'transformer_learn_values' in params.model_name:
      dim = (
          params.use_bases * params.per_base_hidden_size
          + params.use_pw * params.pw_hidden_size
          + params.use_ip * params.ip_hidden_size
          + params.use_strand * params.strand_hidden_size
          + params.use_ccs_bq * params.ccs_bq_hidden_size
      )
      params.hidden_size = (
          params.max_passes * dim
          + params.use_ccs * params.per_base_hidden_size
          + params.use_ccs_bq * params.ccs_bq_hidden_size
          + params.use_sn * params.sn_hidden_size * 4
      )
    else:
      params.hidden_size = params.total_rows

    if 'transformer' in params.model_name and params.hidden_size % 2 != 0:
      params.hidden_size += 1

    if 'transformer_learn_values' in params.model_name:
      params.default_batch_size = params.batch_size
      if params.condense_transformer_input:
        params.embedding_concat_size = params.hidden_size
        params.hidden_size = params.transformer_input_size
    elif params.model_name == 'transformer':
      params.default_batch_size = params.batch_size

    if 'transformer' in params.model_name:
      preset = _TRANSFORMER_SIZE_PRESETS[params.transformer_model_size]
      for k, v in preset.items():
        if k not in params:
          params[k] = v
  return params


def save_params_json(params: ml_collections.ConfigDict, path: str) -> None:
  """Writes params.json next to checkpoints (model_utils.py:468-475)."""
  with open(path, 'w') as f:
    json.dump(json.loads(params.to_json()), f, indent=2, sort_keys=True)


def read_params_from_json(checkpoint_path: str) -> ml_collections.ConfigDict:
  """Loads params.json for a checkpoint path or directory.

  Accepts reference-format params.json files unchanged
  (model_utils.py:434-465).
  """
  if os.path.isdir(checkpoint_path):
    json_path = os.path.join(checkpoint_path, 'params.json')
  else:
    json_path = os.path.join(os.path.dirname(checkpoint_path), 'params.json')
  with open(json_path) as f:
    loaded = json.load(f)
  dataset_name = loaded.get('dataset_config_name', 'test')
  if dataset_name not in ('test', 'test_bq', 'custom'):
    # Reference-trained checkpoints carry internal dataset names ('ccs',
    # 'poa', 'ecoli', ...) whose path setters the OSS reference itself
    # strips (reference model_configs.py:360-367). The dataset wiring is
    # irrelevant for loading weights at inference; start from 'custom'
    # (empty dataset) and let the loaded keys overwrite everything else.
    dataset_name = 'custom'
  params = get_config(
      loaded.get('model_config_name', 'transformer_learn_values')
      + '+'
      + dataset_name
  )
  with params.unlocked():
    for k, v in loaded.items():
      try:
        params[k] = v
      except TypeError:
        # Forward/cross-compat: e.g. a reference params.json carries
        # train_path=None where our config typed it as a list. Keep the
        # loaded value; the reference warns-and-continues similarly
        # (model_utils.py:448-460).
        with params.ignore_type():
          params[k] = v
  return params
