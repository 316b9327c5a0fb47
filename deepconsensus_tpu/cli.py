"""Command-line dispatcher: preprocess | run | calibrate | filter_reads | merge.

Equivalent of the reference CLI (`reference: cli.py:50-122`), argparse-based.
"""

import argparse
import logging
import sys


def _add_run_parser(sub):
  p = sub.add_parser('run', help='Run polishing inference: BAMs -> FASTQ/BAM.')
  p.add_argument('--subreads_to_ccs', required=True)
  p.add_argument('--ccs_bam', required=True)
  p.add_argument(
      '--ccs_fasta', default=None,
      help='Deprecated (as in the reference, quick_inference.py:968-971): '
           'pass the ccs BAM via --ccs_bam.',
  )
  p.add_argument('--checkpoint', required=True)
  p.add_argument('--output', required=True)
  p.add_argument('--batch_size', type=int, default=1024)
  p.add_argument('--batch_zmws', type=int, default=100)
  p.add_argument('--skip_windows_above', type=int, default=45)
  p.add_argument('--min_quality', type=int, default=20)
  p.add_argument('--min_length', type=int, default=0)
  p.add_argument('--ins_trim', type=int, default=5)
  p.add_argument('--use_ccs_smart_windows', action='store_true')
  p.add_argument('--cpus', type=int, default=0)
  p.add_argument('--limit', type=int, default=None)
  p.add_argument('--max_base_quality', type=int, default=93)
  p.add_argument('--dc_calibration', default=None)
  p.add_argument('--ccs_calibration', default='skip')
  p.add_argument(
      '--dtype',
      default='float32',
      choices=['float32', 'bfloat16'],
      help='Activation dtype for the transformer forward pass.',
  )
  p.add_argument(
      '--num_devices', type=int, default=None,
      help='Shard window batches over this many chips (data parallel).',
  )
  p.add_argument(
      '--host_id', type=int, default=0,
      help='This host index when splitting a shard across hosts.',
  )
  p.add_argument(
      '--num_hosts', type=int, default=1,
      help='Total hosts splitting this shard (round-robin by ZMW).',
  )
  p.add_argument(
      '--end_after_stage',
      default='full',
      choices=['dc_input', 'tf_examples', 'run_model', 'full'],
      help='Stop each ZMW batch after this stage (runtime debugging).',
  )
  p.add_argument(
      '--use_pallas_attention', action='store_true',
      help='Use the fused Pallas banded-attention kernel (TPU only).',
  )
  p.add_argument(
      '--use_fused_encoder', action='store_true',
      help='Run the encoder as fused Pallas layer kernels (TPU only).',
  )
  p.add_argument(
      '--precision', default=None, choices=['highest', 'float32', 'default'],
      help='jax matmul precision; "highest" for strict f32 reproduction.',
  )
  p.add_argument(
      '--lookahead', type=int, default=2,
      help='ZMW rounds in flight on the device (pipeline depth).',
  )
  p.add_argument(
      '--host_quality', action='store_true',
      help='Compute base qualities on the host instead of the device '
           '(the device path is bit-exact; this is an escape hatch).',
  )
  return p


def _add_preprocess_parser(sub):
  p = sub.add_parser(
      'preprocess', help='Generate training/inference tfrecord examples.'
  )
  p.add_argument('--subreads_to_ccs', required=True)
  p.add_argument('--ccs_bam', required=True)
  p.add_argument(
      '--ccs_fasta', default=None,
      help='Deprecated (as in the reference, preprocess.py:247-250): pass '
           'the ccs BAM via --ccs_bam.',
  )
  p.add_argument('--output', required=True)
  p.add_argument('--truth_to_ccs', default=None)
  p.add_argument('--truth_bed', default=None)
  p.add_argument('--truth_split', default=None)
  p.add_argument('--cpus', type=int, default=0)
  p.add_argument('--limit', type=int, default=0)
  p.add_argument('--ins_trim', type=int, default=5)
  p.add_argument('--use_ccs_smart_windows', action='store_true')
  p.add_argument('--use_ccs_bq', action='store_true')
  p.add_argument('--max_passes', type=int, default=20)
  p.add_argument('--max_length', type=int, default=100)
  p.add_argument('--bam_reader_threads', type=int, default=8)
  return p


def _add_calibrate_parser(sub):
  p = sub.add_parser(
      'calibrate', help='Compute empirical-vs-predicted base quality stats.'
  )
  p.add_argument('--bam', required=True, help='Reads aligned to the truth.')
  p.add_argument('--fasta', '--ref', required=True, dest='fasta',
                 help='Truth reference FASTA (.fai); --ref as in the '
                      'reference CLI.')
  p.add_argument('--output_csv', required=True)
  p.add_argument('--region', default=None)
  p.add_argument('--interval_size', '--interval_length', type=int,
                 default=100000, dest='interval_size')
  p.add_argument('--cpus', type=int, default=0)
  p.add_argument('--min_mapq', type=int, default=60)
  p.add_argument('--dc_calibration', default='skip')
  return p


def _add_train_parser(sub):
  p = sub.add_parser('train', help='Train the gap-aware transformer.')
  p.add_argument('--config', default='transformer_learn_values+test',
                 help='Config name: {model}+{dataset}.')
  p.add_argument('--out_dir', required=True)
  p.add_argument('--batch_size', type=int, default=None)
  p.add_argument('--num_epochs', type=int, default=None)
  p.add_argument('--checkpoint', default=None, help='Warm-start checkpoint.')
  p.add_argument('--train_path', default=None)
  p.add_argument('--eval_path', default=None)
  p.add_argument(
      '--tf_dataset', action='append', default=None,
      help='Preprocess output root(s) (<dir>/{train,eval,test}/* + summary); '
           'repeatable. Paths and example counts derive from the dataset '
           'summary. Use with --config ...+custom.',
  )
  p.add_argument('--n_examples_train', type=int, default=None)
  p.add_argument('--n_examples_eval', type=int, default=None)
  p.add_argument('--max_passes', type=int, default=None)
  p.add_argument('--num_devices', type=int, default=None)
  p.add_argument('--eval_and_log_every_step', action='store_true')
  p.add_argument('--limit', type=int, default=None)
  p.add_argument(
      '--input_workers', type=int, default=None,
      help='Input-pipeline worker processes (0 = in-process serial).',
  )
  p.add_argument(
      '--coordinator', default=None,
      help='host:port of process 0 for multi-host (pod-scale) training; '
           'launch the same command on every host with its --host_id. The '
           'global device mesh spans all hosts (ICI within a slice, DCN '
           'across).',
  )
  p.add_argument(
      '--host_id', type=int, default=0,
      help='This process index in a multi-host training job.',
  )
  p.add_argument(
      '--num_hosts', type=int, default=1,
      help='Total processes in a multi-host training job.',
  )
  return p


def _add_distill_parser(sub):
  p = sub.add_parser('distill', help='Distill a teacher into a student.')
  p.add_argument('--config', default='transformer_learn_values_distill+test')
  p.add_argument('--out_dir', required=True)
  p.add_argument('--teacher_checkpoint', required=True)
  p.add_argument('--batch_size', type=int, default=None)
  p.add_argument('--num_epochs', type=int, default=None)
  p.add_argument('--num_devices', type=int, default=None)
  return p


def _add_eval_parser(sub):
  p = sub.add_parser(
      'eval', help='Evaluate a checkpoint over eval examples -> inference.csv.'
  )
  p.add_argument('--checkpoint', required=True)
  p.add_argument('--out_dir', required=True)
  p.add_argument('--eval_path', default=None)
  p.add_argument('--limit', type=int, default=-1)
  p.add_argument('--batch_size', type=int, default=None)
  p.add_argument(
      '--num_devices', type=int, default=None,
      help='Devices to shard eval batches over (default: all).',
  )
  return p


def _add_export_parser(sub):
  p = sub.add_parser(
      'export', help='Export a checkpoint as an inference-only model dir.'
  )
  p.add_argument('--checkpoint', required=True)
  p.add_argument('--output_directory', required=True)
  return p


def _add_merge_parser(sub):
  p = sub.add_parser(
      'merge',
      help='Merge per-host partial FASTQs (from run --num_hosts) into one.',
  )
  p.add_argument(
      'partials', nargs='+',
      help='Partial FASTQ paths in host-id order (host 0 first).',
  )
  p.add_argument('--output', '-o', required=True)
  return p


def _add_filter_parser(sub):
  p = sub.add_parser('filter_reads', help='Filter FASTQ/BAM by read quality.')
  p.add_argument('--input_seq', '-i', required=True)
  p.add_argument('--output_fastq', '-o', required=True)
  p.add_argument('--quality_threshold', '-q', type=int, required=True)
  return p


def _apply_platform_override() -> None:
  """Honors DC_TPU_PLATFORM=cpu|tpu for every subcommand.

  This environment registers a remote-TPU PJRT plugin from sitecustomize
  that overrides the JAX_PLATFORMS env var, so the var alone cannot force
  a CLI subprocess onto the CPU; the config knob (applied after import)
  can. Byte-reproducibility note: CPU and TPU kernels differ by ~1 ULP,
  which the Q chain can amplify into a rounded-Q flip, so runs on
  different platforms are not byte-identical to each other.
  """
  import os

  platform = os.environ.get('DC_TPU_PLATFORM')
  if platform:
    import jax

    jax.config.update('jax_platforms', platform)


def main(argv=None) -> int:
  logging.basicConfig(
      level=logging.INFO,
      format='%(asctime)s %(levelname)s %(name)s: %(message)s',
  )
  _apply_platform_override()
  parser = argparse.ArgumentParser(
      prog='deepconsensus_tpu',
      description=(
          'TPU-native DeepConsensus: transform PacBio subreads into '
          'polished CCS reads.'
      ),
  )
  from deepconsensus_tpu import constants

  parser.add_argument(
      '--version', action='version',
      version=f'deepconsensus_tpu {constants.__version__}',
  )
  sub = parser.add_subparsers(dest='command', required=True)
  _add_run_parser(sub)
  _add_preprocess_parser(sub)
  _add_train_parser(sub)
  _add_distill_parser(sub)
  _add_eval_parser(sub)
  _add_export_parser(sub)
  _add_calibrate_parser(sub)
  _add_filter_parser(sub)
  _add_merge_parser(sub)
  args = parser.parse_args(argv)

  if args.command == 'run':
    if args.ccs_fasta:
      raise SystemExit(
          'The --ccs_fasta flag has been deprecated. Please use --ccs_bam '
          'with a BAM of the ccs sequences instead.'
      )
    import jax.numpy as jnp

    from deepconsensus_tpu.inference import engine

    outcome = engine.run_inference(
        subreads_to_ccs=args.subreads_to_ccs,
        ccs_bam=args.ccs_bam,
        checkpoint_path=args.checkpoint,
        output=args.output,
        batch_size=args.batch_size,
        batch_zmws=args.batch_zmws,
        skip_windows_above=args.skip_windows_above,
        min_quality=args.min_quality,
        min_length=args.min_length,
        ins_trim=args.ins_trim,
        use_ccs_smart_windows=args.use_ccs_smart_windows,
        cpus=args.cpus,
        limit=args.limit,
        max_base_quality=args.max_base_quality,
        dc_calibration=args.dc_calibration,
        ccs_calibration=args.ccs_calibration,
        dtype=jnp.bfloat16 if args.dtype == 'bfloat16' else jnp.float32,
        num_devices=args.num_devices,
        host_id=args.host_id,
        num_hosts=args.num_hosts,
        end_after_stage=args.end_after_stage,
        use_pallas_attention=args.use_pallas_attention,
        use_fused_encoder=args.use_fused_encoder,
        matmul_precision=None if args.precision in (None, 'default')
        else args.precision,
        lookahead=args.lookahead,
        device_quality=not args.host_quality,
    )
    return 0 if outcome.success else 1

  if args.command == 'preprocess':
    if args.ccs_fasta:
      raise SystemExit(
          'The --ccs_fasta flag has been deprecated. Please use --ccs_bam '
          'with a BAM of the ccs sequences instead.'
      )
    from deepconsensus_tpu.preprocess import driver

    driver.run_preprocess(
        subreads_to_ccs=args.subreads_to_ccs,
        ccs_bam=args.ccs_bam,
        output=args.output,
        truth_to_ccs=args.truth_to_ccs,
        truth_bed=args.truth_bed,
        truth_split=args.truth_split,
        cpus=args.cpus,
        limit=args.limit,
        ins_trim=args.ins_trim,
        use_ccs_smart_windows=args.use_ccs_smart_windows,
        use_ccs_bq=args.use_ccs_bq,
        max_passes=args.max_passes,
        max_length=args.max_length,
        bam_reader_threads=args.bam_reader_threads,
    )
    return 0

  if args.command == 'train':
    from deepconsensus_tpu.models import configs
    from deepconsensus_tpu.train import loop

    if args.num_hosts > 1 or args.coordinator:
      if not args.coordinator:
        raise SystemExit('--num_hosts > 1 requires --coordinator host:port')
      from deepconsensus_tpu.parallel import mesh as mesh_lib

      mesh_lib.initialize_multihost(
          args.coordinator, args.num_hosts, args.host_id
      )

    params = configs.get_config(args.config)
    with params.unlocked():
      if args.batch_size:
        params.batch_size = args.batch_size
      if args.num_epochs:
        params.num_epochs = args.num_epochs
        params.num_epochs_for_decay = args.num_epochs
      if args.train_path:
        params.train_path = [args.train_path]
      if args.eval_path:
        params.eval_path = [args.eval_path]
      if args.tf_dataset:
        params.tf_dataset = list(args.tf_dataset)
      if args.n_examples_train is not None:
        params.n_examples_train = args.n_examples_train
      if args.n_examples_eval is not None:
        params.n_examples_eval = args.n_examples_eval
      if args.max_passes is not None:
        params.max_passes = args.max_passes
      if args.limit is not None:
        params.limit = args.limit
      if args.input_workers is not None:
        params.input_workers = args.input_workers
    loop.train_with_retry(
        args.out_dir,
        params,
        num_devices=args.num_devices,
        eval_and_log_every_step=args.eval_and_log_every_step,
        initial_checkpoint=args.checkpoint,
    )
    return 0

  if args.command == 'distill':
    from deepconsensus_tpu.models import configs
    from deepconsensus_tpu.train import distill

    params = configs.get_config(args.config)
    with params.unlocked():
      if args.batch_size:
        params.batch_size = args.batch_size
      if args.num_epochs:
        params.num_epochs = args.num_epochs
        params.num_epochs_for_decay = args.num_epochs
    distill.train_distillation(
        args.out_dir,
        params,
        teacher_checkpoint=args.teacher_checkpoint,
        num_devices=args.num_devices,
    )
    return 0

  if args.command == 'eval':
    from deepconsensus_tpu.train import evaluate

    evaluate.run_eval(
        checkpoint_path=args.checkpoint,
        out_dir=args.out_dir,
        eval_path=args.eval_path,
        limit=args.limit,
        batch_size=args.batch_size,
        num_devices=args.num_devices,
    )
    return 0

  if args.command == 'export':
    from deepconsensus_tpu.models import export

    export.export_model(args.checkpoint, args.output_directory)
    return 0

  if args.command == 'calibrate':
    from deepconsensus_tpu.calibration import calculate_baseq

    calculate_baseq.run(
        bam_path=args.bam,
        fasta=args.fasta,
        output_csv=args.output_csv,
        region=args.region,
        interval_size=args.interval_size,
        cpus=args.cpus,
        min_mapq=args.min_mapq,
        dc_calibration=args.dc_calibration,
    )
    return 0

  if args.command == 'filter_reads':
    from deepconsensus_tpu.calibration import filter_reads

    filter_reads.filter_bam_or_fastq_by_quality(
        args.input_seq, args.output_fastq, args.quality_threshold
    )
    return 0

  if args.command == 'merge':
    from deepconsensus_tpu.parallel import dp_inference

    n_reads = dp_inference.merge_fastq_partials(args.partials, args.output)
    logging.getLogger(__name__).info(
        'Merged %d partials -> %s (%d reads)',
        len(args.partials), args.output, n_reads,
    )
    return 0

  parser.error(f'unknown command {args.command}')
  return 2


if __name__ == '__main__':
  sys.exit(main())
