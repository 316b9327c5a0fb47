"""Produces the executed-reference FASTQ goldens (and validates the repo).

For each config (test, test_bq):
  1. builds the REFERENCE TF/Keras model with deterministic seed 3 (the
     same seed/path tests/test_reference_golden_fastq.py regenerates),
     saves a real tf.train.Checkpoint + params.json;
  2. EXECUTES the reference `quick_inference.run()` end-to-end over the
     bundled testdata/human_1m shard (reference
     quick_inference.py:794-963) via tools/oracle/ref_pipeline.py,
     producing the golden FASTQ committed at tests/data/ref_golden/;
  3. runs this repo's `run` CLI with the SAME TF checkpoint and flags and
     byte-compares the outputs (the same comparison the test pins).

Flags chosen to exercise the full surface: dc_calibration is the v1.2
shipped string (reference testdata/model/params.json), min_quality=0 so
low-confidence seeded-random/toy weights still emit every read (the
quality-filter path itself is unit-tested; reference defaults would
filter everything at Q20 with an untrained model).

Usage: python tools/oracle/make_ref_golden.py [--skip-repo-check]
"""

import os
import subprocess
import sys

_REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO not in sys.path:
  sys.path.insert(0, _REPO)

TESTDATA = os.environ.get(
    'DC_TPU_TESTDATA', '/root/reference/deepconsensus/testdata/human_1m'
)
GOLDEN_DIR = os.path.join(_REPO, 'tests', 'data', 'ref_golden')
SEED = 3
DC_CALIBRATION = '0,1.197654,-0.99781'  # v1.2 shipped calibration string
RUN_FLAGS = dict(
    batch_size=1024,
    batch_zmws=100,
    min_quality=0,
    min_length=0,
    skip_windows_above=45,
)


TOY_MODEL = os.path.join(_REPO, 'models_out', 'toy_model')


def make_tf_checkpoint(config: str, out_dir: str) -> str:
  """Deterministic TRAINED weights -> reference TF checkpoint + params.json.

  A randomly initialized model is useless for cross-framework FASTQ
  byte-stability: its argmax margins are ~0, so the ~1e-6 TF-vs-JAX float
  noise flips predicted bases everywhere. The goldens therefore use the
  committed toy model's trained weights (confident argmax), exported into
  the reference checkpoint format: `test` is the toy model verbatim,
  `test_bq` is the deterministic zero-extended bq variant
  (tools/oracle/export_tf_checkpoint.py).
  """
  from tools.oracle import export_tf_checkpoint

  name = f'transformer_learn_values+{config}'
  if config == 'test':
    variables, params = export_tf_checkpoint.load_jax_variables(TOY_MODEL)
  elif config == 'test_bq':
    variables, params = export_tf_checkpoint.make_bq_variables_from_toy(
        TOY_MODEL, seed=SEED
    )
  else:
    raise ValueError(config)
  return export_tf_checkpoint.export_to_tf(variables, params, name, out_dir)


def golden_path(config: str) -> str:
  """The byte-equality golden: reference pipeline, repo-engine forward."""
  return os.path.join(GOLDEN_DIR, f'{config}.fastq')


def golden_path_tfforward(config: str) -> str:
  """The pure-TF-forward golden (statistical parity: ULP-flip analysis)."""
  return os.path.join(GOLDEN_DIR, f'{config}_tfforward.fastq')


def main(argv=None):
  argv = argv if argv is not None else sys.argv[1:]
  skip_repo = '--skip-repo-check' in argv
  os.makedirs(GOLDEN_DIR, exist_ok=True)
  # Host-side tooling must never claim the remote TPU (the env var alone
  # is overridden by the sandbox's sitecustomize; set the config knob).
  import jax

  jax.config.update('jax_platforms', 'cpu')

  from tools.oracle import ref_pipeline  # installs shims, imports reference

  for config in ('test', 'test_bq'):
    ckpt_dir = f'/tmp/ref_golden_ckpt_{config}'
    prefix = make_tf_checkpoint(config, ckpt_dir)
    for out, inject in (
        (golden_path(config), True),
        (golden_path_tfforward(config), False),
    ):
      outcome = ref_pipeline.run_reference_inference(
          checkpoint=prefix,
          subreads_to_ccs=f'{TESTDATA}/subreads_to_ccs.bam',
          ccs_bam=f'{TESTDATA}/ccs.bam',
          output=out,
          cpus=0,
          dc_calibration=DC_CALIBRATION,
          inject_jax_forward=inject,
          **RUN_FLAGS,
      )
      print(f'[{config}] reference outcome (inject={inject}): {outcome}')
      assert outcome.success > 0, 'reference produced no successful reads'
      # Machine-local timing byproduct — never committed (no test reads
      # it and it churns with noise on every regeneration).
      runtime_csv = f'{out}.runtime.csv'
      if os.path.exists(runtime_csv):
        os.remove(runtime_csv)

    if skip_repo:
      continue
    # Repo CLI with the same TF checkpoint, in a clean subprocess (CPU).
    repo_out = f'/tmp/repo_{config}.fastq'
    # DC_TPU_PLATFORM (config-level) — the JAX_PLATFORMS env var alone is
    # overridden by the sandbox's remote-TPU sitecustomize, which would
    # silently run this comparison on the chip (ULP-different from the
    # CPU-generated golden).
    env = dict(os.environ, JAX_PLATFORMS='cpu', DC_TPU_PLATFORM='cpu')
    cmd = [
        sys.executable, '-m', 'deepconsensus_tpu.cli', 'run',
        '--subreads_to_ccs', f'{TESTDATA}/subreads_to_ccs.bam',
        '--ccs_bam', f'{TESTDATA}/ccs.bam',
        '--checkpoint', prefix,
        '--output', repo_out,
        '--cpus', '0',
        '--dc_calibration', DC_CALIBRATION,
    ]
    for k, v in RUN_FLAGS.items():
      cmd += [f'--{k}', str(v)]
    subprocess.run(cmd, check=True, cwd=_REPO, env=env)
    repo_bytes = open(repo_out, 'rb').read()
    ref_bytes = open(golden_path(config), 'rb').read()
    if ref_bytes == repo_bytes:
      print(f'[{config}] repo CLI BYTE-IDENTICAL to injected-forward '
            f'reference golden ({len(ref_bytes)} bytes)')
    else:
      _diff_summary(config, ref_bytes, repo_bytes)
    tf_bytes = open(golden_path_tfforward(config), 'rb').read()
    stats = fastq_parity_stats(repo_bytes, tf_bytes)
    print(f'[{config}] vs pure-TF-forward golden: {stats}')


def fastq_parity_stats(ours: bytes, theirs: bytes) -> dict:
  """Mismatch statistics between two FASTQ byte strings (ULP-flip audit).

  Positional qual comparison is only meaningful when the sequences are
  identical: a single gap-flip shifts the rest of a read, making every
  downstream column "differ". Reads with any seq difference are counted
  in seq_mismatch_reads instead (each traces back to a handful of
  argmax/gap flips at near-tied probabilities).
  """
  a = ours.decode().splitlines()
  b = theirs.decode().splitlines()
  stats = {
      'reads': len(a) // 4,
      'same_names': a[0::4] == b[0::4],
      'same_line_count': len(a) == len(b),
      'seq_mismatch_reads': 0,
      'seq_chars': 0,
      'qual_char_diffs': 0,
      'qual_max_abs_delta': 0,
      # Per-Phred-bin flip accounting (bin = `theirs` Q value): flips
      # concentrate at high Q where -10*log10(1-p) amplifies 1-ULP maxp
      # noise, so the *rate per bin* is the meaningful parity bound, not
      # just the global rate.
      'qual_chars_by_bin': {},
      'qual_flips_by_bin': {},
  }
  for i in range(0, min(len(a), len(b)), 4):
    sa, sb = a[i + 1], b[i + 1]
    qa, qb = a[i + 3], b[i + 3]
    stats['seq_chars'] += max(len(sa), len(sb))
    if sa != sb:
      stats['seq_mismatch_reads'] += 1
      continue
    for x, y in zip(qa, qb):
      q_bin = ord(y) - 33
      stats['qual_chars_by_bin'][q_bin] = (
          stats['qual_chars_by_bin'].get(q_bin, 0) + 1
      )
      if x != y:
        stats['qual_char_diffs'] += 1
        stats['qual_flips_by_bin'][q_bin] = (
            stats['qual_flips_by_bin'].get(q_bin, 0) + 1
        )
        stats['qual_max_abs_delta'] = max(
            stats['qual_max_abs_delta'], abs(ord(x) - ord(y))
        )
  return stats


def _diff_summary(config, ref_bytes, repo_bytes):
  ref_lines = ref_bytes.decode().splitlines()
  repo_lines = repo_bytes.decode().splitlines()
  print(f'[{config}] MISMATCH: {len(ref_lines)} vs {len(repo_lines)} lines')
  n_diff = 0
  for i, (a, b) in enumerate(zip(ref_lines, repo_lines)):
    if a != b:
      n_diff += 1
      kind = ('name', 'seq', 'plus', 'qual')[i % 4]
      nchar = sum(x != y for x, y in zip(a, b)) + abs(len(a) - len(b))
      if n_diff <= 10:
        print(f'  line {i} ({kind}): {nchar} differing chars')
  print(f'[{config}] total differing lines: {n_diff}')
  sys.exit(1)


if __name__ == '__main__':
  main()
