"""Executes the REFERENCE inference pipeline end-to-end as an oracle.

Imports `/root/reference/deepconsensus` unchanged (pysam replaced by
tools/oracle/ref_pysam.py backed by this repo's BAM stack; the two
tf-models layers stubbed by tools/oracle/tf_ref_model.py) and drives its
real `quick_inference.run()` (reference quick_inference.py:794-963) — the
whole chain: SubreadGrouper streaming, expand_clip_indent, spacing,
windowing, skip-window triage, TF model forward, Q-score math,
calibration, stitching, FASTQ writing, runtime CSV and stats JSON.

Used by tools/oracle/make_ref_golden.py to produce the committed golden
FASTQs that tests/test_reference_golden_fastq.py holds the repo CLI to.

Oracle tooling only: never imported by the shipped package.
"""

import dataclasses
import os
import sys

os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')
os.environ.setdefault('TF_CPP_MIN_LOG_LEVEL', '2')

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

from tools.oracle import ref_pysam  # noqa: E402

ref_pysam.install()  # must precede every reference import

from tools.oracle import tf_ref_model  # noqa: E402

tf_ref_model._install_official_stub()  # noqa: SLF001 — shared oracle scaffolding


def _install_dataclass_shim():
  """py3.12 rejects the reference's mutable dataclass defaults; wrap them.

  Same shim as tools/oracle/spacing_fuzz.py:18-27 — fields whose class
  default is a mutable value get a default_factory copying it.
  """
  orig_get_field = dataclasses._get_field  # noqa: SLF001

  def patched(cls, a_name, a_type, default_kw_only):
    try:
      return orig_get_field(cls, a_name, a_type, default_kw_only)
    except ValueError:
      default = getattr(cls, a_name)
      setattr(
          cls,
          a_name,
          dataclasses.field(default_factory=lambda d=default: d.copy()),
      )
      return orig_get_field(cls, a_name, a_type, default_kw_only)

  dataclasses._get_field = patched  # noqa: SLF001


_install_dataclass_shim()

if '/root/reference' not in sys.path:
  sys.path.insert(0, '/root/reference')

from deepconsensus.inference import quick_inference  # noqa: E402


def make_injected_model(tf_checkpoint_prefix: str, batch_size: int = 1024):
  """A model shim computing the forward with THIS REPO's jitted engine.

  Cross-framework f32 byte-identity of the FASTQ is impossible in
  principle: TF and XLA matmul kernels differ by ~1 ULP
  (measured max|dprob| 7e-7, ZERO argmax flips on the bundled examples),
  and the Q chain amplifies a 1-ULP difference in maxp near 1.0 into a
  rounded-Q flip (-10*log10(1-maxp) has unbounded derivative). This shim
  removes exactly that one component: the reference pipeline executes
  unchanged (triage, batching, ITS OWN numpy argmax/max/Q/calibration/
  rounding math at quick_inference.py:377-389, stitching, filters) on
  probabilities that reproduce the repo engine's (argmax, max) bitwise —
  maxp verbatim at the argmax index, (1-maxp)/5 < maxp elsewhere (softmax
  max >= 0.2 > 1/6 guarantees strictness). Byte equality against the repo
  CLI then tests the ENTIRE pipeline logic exactly; the forward itself is
  pinned numerically by tests/test_tf_logits_parity.py.
  """
  import jax

  jax.config.update('jax_platforms', 'cpu')
  import numpy as np

  from deepconsensus_tpu.inference import engine
  from deepconsensus_tpu.models import checkpoint as ckpt_lib
  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.models import model as model_lib

  params = configs.read_params_from_json(tf_checkpoint_prefix)
  configs.finalize_params(params)
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  translated = ckpt_lib.load_tf_checkpoint(
      tf_checkpoint_prefix, variables, params
  )
  runner = engine.ModelRunner(params, translated, batch_size=batch_size)
  vocab = params.vocab_size
  base_lo, base_hi = configs.get_indices(
      params.max_passes, params.use_ccs_bq
  )[0]

  class _Injected:

    def predict(self, rows):
      import tensorflow as tf

      r = np.asarray(rows)
      # Same transport (ragged/wire) as the repo CLI so the SAME jitted
      # executable computes the forward. num_passes must be the LAST
      # occupied row + 1, not the occupied-row count: a subread that
      # doesn't overlap the window leaves a mid-stack empty row (521 of
      # the shard's 1055 modeled windows have one), and the ragged
      # transport ships rows [0, num_passes) — an undercount would drop
      # real subreads. Trailing empty rows reconstruct as zeros either way.
      base_block = r[:, base_lo:base_hi, :, 0]
      occupied = base_block.max(-1) > 0
      mp = base_hi - base_lo
      num_passes = np.where(
          occupied.any(-1), mp - np.argmax(occupied[:, ::-1], -1), 1
      )
      ids, maxp = runner.collect(
          runner.predict_async(r, num_passes=num_passes.tolist())
      )
      ids = np.asarray(ids)
      maxp = np.asarray(maxp, dtype=np.float32)
      probs = np.repeat(
          ((1.0 - maxp) / vocab).astype(np.float32)[..., None], vocab, -1
      )
      np.put_along_axis(probs, ids[..., None], maxp[..., None], axis=-1)
      return tf.convert_to_tensor(probs)

  return _Injected()


def run_reference_inference(
    checkpoint: str,
    subreads_to_ccs: str,
    ccs_bam: str,
    output: str,
    batch_size: int = 1024,
    batch_zmws: int = 100,
    cpus: int = 0,
    min_quality: int = 0,
    min_length: int = 0,
    skip_windows_above: int = 45,
    dc_calibration: str | None = None,
    ccs_calibration: str = 'skip',
    limit: int | None = None,
    inject_jax_forward: bool = False,
):
  """Sets the reference FLAGS and calls its run(); returns OutcomeCounter.

  inject_jax_forward=True swaps only the model forward for the repo
  engine's jitted forward (see make_injected_model); every other line of
  the reference pipeline still executes.
  """
  FLAGS = quick_inference.FLAGS
  if not FLAGS.is_parsed():
    FLAGS(['ref_oracle'])
  FLAGS.subreads_to_ccs = subreads_to_ccs
  FLAGS.ccs_bam = ccs_bam
  FLAGS.output = output
  FLAGS.checkpoint = checkpoint
  FLAGS.batch_size = batch_size
  FLAGS.batch_zmws = batch_zmws
  FLAGS.cpus = cpus
  FLAGS.min_quality = min_quality
  FLAGS.min_length = min_length
  FLAGS.skip_windows_above = skip_windows_above
  FLAGS.dc_calibration = dc_calibration
  FLAGS.ccs_calibration = ccs_calibration
  FLAGS.limit = limit
  # Reset the reference's module-global timing accumulator between runs.
  quick_inference.timing = []
  if not inject_jax_forward:
    return quick_inference.run()
  orig_init = quick_inference.initialize_model

  def patched_init(checkpoint_path, params, options):
    # Keep the reference's own modify_params/params plumbing; replace only
    # the returned model object.
    _, model_params = orig_init(
        checkpoint_path=checkpoint_path, params=params, options=options
    )
    return make_injected_model(checkpoint_path, options.batch_size), (
        model_params
    )

  quick_inference.initialize_model = patched_init
  try:
    return quick_inference.run()
  finally:
    quick_inference.initialize_model = orig_init
