"""End-to-end FASTQ parity against the EXECUTED reference pipeline.

The committed goldens at tests/data/ref_golden/ were produced by actually
running the reference's `quick_inference.run()` (reference
quick_inference.py:794-963) over testdata/human_1m — full chain:
SubreadGrouper streaming, expand_clip_indent, spacing, windowing,
skip-window triage, model forward, the reference's own numpy Q-score math
+ v1.2 calibration, stitching, FASTQ writing — via
tools/oracle/make_ref_golden.py (pysam replaced by
tools/oracle/ref_pysam.py backed by this repo's BAM stack; weights are
the committed toy model exported into the reference checkpoint format).

Two goldens per config:

* `{config}.fastq` — reference pipeline executed with the repo engine's
  jitted forward injected (reproducing the engine's argmax/maxp bitwise).
  The repo CLI must match BYTE-FOR-BYTE: a failure means the pipeline
  logic (triage, batching, Q rounding, calibration, stitching, filters)
  is no longer identical to v1.2's code.
* `{config}_tfforward.fastq` — the same run with the reference's own TF
  forward. Cross-framework f32 byte-identity is impossible in principle
  (TF-vs-XLA matmuls differ by ~1 ULP — measured max|dprob| 7e-7, zero
  argmax flips on the bundled examples — and -10*log10(1-maxp) amplifies
  a 1-ULP maxp difference near 1.0 into a rounded-Q flip), so this
  comparison is statistical: identical read names/lengths, sequences
  identical, Q flips rare and never more than one Phred bin.

Both run on CPU (the conftest forces it): CPU and TPU kernels also differ
by ULPs, so byte-reproducibility holds per-platform.
"""

import os

import pytest

tf = pytest.importorskip('tensorflow')

from tools.oracle import make_ref_golden

from deepconsensus_tpu import cli
from tests.conftest import HUMAN_1M

CONFIGS = ('test', 'test_bq')


@pytest.fixture(scope='module', params=CONFIGS)
def repo_run(request, tmp_path_factory):
  """(config, golden_dir, repo CLI fastq bytes) for one config."""
  config = request.param
  golden = make_ref_golden.golden_path(config)
  if not os.path.exists(golden):
    pytest.skip('goldens not generated (tools/oracle/make_ref_golden.py)')
  ckpt_dir = tmp_path_factory.mktemp(f'tfckpt_{config}')
  prefix = make_ref_golden.make_tf_checkpoint(config, str(ckpt_dir))
  out = str(tmp_path_factory.mktemp(f'out_{config}') / f'{config}.fastq')
  argv = [
      'run',
      '--subreads_to_ccs', f'{HUMAN_1M}/subreads_to_ccs.bam',
      '--ccs_bam', f'{HUMAN_1M}/ccs.bam',
      '--checkpoint', prefix,
      '--output', out,
      '--cpus', '0',
      '--dc_calibration', make_ref_golden.DC_CALIBRATION,
  ]
  for k, v in make_ref_golden.RUN_FLAGS.items():
    argv += [f'--{k}', str(v)]
  rc = cli.main(argv)
  assert rc == 0
  with open(out, 'rb') as f:
    ours = f.read()
  assert ours, 'repo CLI produced an empty FASTQ'
  return config, ours


def test_repo_cli_fastq_byte_identical_to_executed_reference(repo_run):
  config, ours = repo_run
  with open(make_ref_golden.golden_path(config), 'rb') as f:
    theirs = f.read()
  if ours != theirs:
    _explain_mismatch(ours, theirs)


def test_repo_cli_fastq_statistical_parity_vs_tf_forward(repo_run):
  config, ours = repo_run
  path = make_ref_golden.golden_path_tfforward(config)
  if not os.path.exists(path):
    pytest.skip('tfforward golden not generated')
  with open(path, 'rb') as f:
    theirs = f.read()
  stats = make_ref_golden.fastq_parity_stats(ours, theirs)
  assert stats['same_names'] and stats['same_line_count'], stats
  # ULP-level forward noise flips an occasional argmax at near-tied
  # probabilities (a gap flip shifts the whole read — those reads are
  # excluded from positional qual stats) and an occasional rounded Q.
  # Observed on the bundled shard (both configs): 0 seq mismatches,
  # 801-864/112k = 0.71-0.77% qual flips, max |delta| 11 Phred bins
  # (near maxp=1 the Q chain amplifies 1 ULP into several bins; the
  # delta histogram is {1,2,4,11} from the v1.2 calibration's bin
  # spacing). Bounds are observed + margin so a real Q-chain bug
  # (systematic shift, rate blow-up) fails while cross-framework ULP
  # noise passes.
  assert stats['seq_mismatch_reads'] <= 3, stats
  assert stats['qual_char_diffs'] <= 1.5e-2 * stats['seq_chars'], stats
  assert stats['qual_max_abs_delta'] <= 12, stats
  # Per-Q-bin flip rates: the flip probability must stay tiny in the
  # bulk Q93 bin (observed 0.08%), small at low/mid Q (observed <=1.5%
  # below Q60), and bounded even where ULP amplification peaks
  # (observed max 11.6% at Q71-76). Bins with <200 chars are skipped
  # (binomial noise dominates).
  for q_bin, n_chars in stats['qual_chars_by_bin'].items():
    if n_chars < 200:
      continue
    rate = stats['qual_flips_by_bin'].get(q_bin, 0) / n_chars
    if q_bin >= 93:
      bound = 0.005
    elif q_bin >= 60:
      bound = 0.18
    else:
      bound = 0.04
    assert rate <= bound, (
        f'Q{q_bin}: flip rate {rate:.4f} > {bound} '
        f'({stats["qual_flips_by_bin"].get(q_bin, 0)}/{n_chars})'
    )


def _explain_mismatch(ours: bytes, theirs: bytes):
  a = ours.decode().splitlines()
  b = theirs.decode().splitlines()
  diffs = []
  for i, (x, y) in enumerate(zip(a, b)):
    if x != y:
      kind = ('name', 'seq', 'plus', 'qual')[i % 4]
      nchar = sum(c != d for c, d in zip(x, y)) + abs(len(x) - len(y))
      diffs.append(f'line {i} ({kind}): {nchar} differing chars')
  raise AssertionError(
      f'FASTQ differs from executed-reference golden: {len(a)} vs '
      f'{len(b)} lines; first diffs: ' + '; '.join(diffs[:8])
  )
