"""Preprocess CLI driver: BAMs -> tfrecord training/inference examples.

Equivalent of the reference's preprocess main (`reference:
preprocess/preprocess.py:243-361`): per-ZMW featurization fanned out over a
process pool, gzip TFRecord shards per split, and a summary JSON with all
pipeline counters. The writer lives in the main process (workers return
serialized example bytes), which replaces the reference's Manager-queue +
dedicated writer process with a simpler single-writer architecture.
"""

import collections
import concurrent.futures
import json
import logging
import os
from typing import Dict, List, Optional, Tuple

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import tfrecord
from deepconsensus_tpu.preprocess import feeder, windows

logger = logging.getLogger(__name__)


def process_subreads(
    args: Tuple,
) -> Tuple[List[bytes], str, collections.Counter]:
  """Worker: one ZMW -> serialized examples (preprocess.py:199-223)."""
  reads, ccs_seqname, dc_config, split, window_widths = args
  stack = windows.subreads_to_zmw_stack(
      reads, ccs_seqname, dc_config, window_widths
  )
  out = [wf.to_example_bytes() for wf in stack.iter_windows()]
  stack.counter[f'n_examples_{split}'] += len(out)
  stack.counter['n_examples'] += len(out)
  return out, split, stack.counter


def setup_writers(
    output_fname: str, splits
) -> Dict[str, tfrecord.TFRecordWriter]:
  writers = {}
  for split in splits:
    split_fname = output_fname.replace('@split', split)
    d = os.path.dirname(split_fname)
    if d:
      os.makedirs(d, exist_ok=True)
    # Background-thread writer: zlib of the f32 tensors releases the GIL
    # and overlaps with featurization/encoding (~45% of serial wall time).
    writers[split] = tfrecord.ThreadedTFRecordWriter(split_fname)
  return writers


def run_preprocess(
    subreads_to_ccs: str,
    ccs_bam: str,
    output: str,
    truth_to_ccs: Optional[str] = None,
    truth_bed: Optional[str] = None,
    truth_split: Optional[str] = None,
    cpus: int = 0,
    limit: int = 0,
    ins_trim: int = 5,
    use_ccs_smart_windows: bool = False,
    use_ccs_bq: bool = False,
    max_passes: int = 20,
    max_length: int = 100,
    bam_reader_threads: int = 8,
) -> collections.Counter:
  """Runs example generation end to end; returns the pipeline counter."""
  if cpus == 1:
    raise ValueError('Must set cpus to 0 or >=2 for parallel processing.')
  if not output.endswith('.tfrecord.gz'):
    raise ValueError('--output must end with .tfrecord.gz')

  is_training = bool(truth_to_ccs and truth_bed and truth_split)
  if is_training:
    logger.info('Generating examples in training mode.')
    contig_split = feeder.read_truth_split(truth_split)
    splits = set(contig_split.values())
    if '@split' not in output:
      raise ValueError('You must add @split to --output when training.')
  elif truth_to_ccs or truth_bed or truth_split:
    raise ValueError(
        'You must specify truth_to_ccs, truth_bed, and truth_split '
        'to generate a training dataset.'
    )
  else:
    logger.info('Generating examples in inference mode.')
    splits = ['inference']

  dc_config = windows.DcConfig(
      max_passes=max_passes, max_length=max_length, use_ccs_bq=use_ccs_bq
  )
  proc_feeder, main_counter = feeder.create_proc_feeder(
      subreads_to_ccs=subreads_to_ccs,
      ccs_bam=ccs_bam,
      dc_config=dc_config,
      ins_trim=ins_trim,
      use_ccs_smart_windows=use_ccs_smart_windows,
      truth_bed=truth_bed,
      truth_to_ccs=truth_to_ccs,
      truth_split=truth_split,
      limit=limit,
      bam_reader_threads=bam_reader_threads,
  )

  def bounded_pool_results(pool, inputs, window):
    """Ordered pool.map with a BOUNDED in-flight window.

    Executor.map consumes its input iterable eagerly (every ZMW's
    expanded reads would be pickled into pending work items before the
    first result returns — unbounded memory on production BAMs and no
    output until the whole input is read, the reference throttles via
    starmap_async+clear_tasks, preprocess.py:226-240). A deque of at
    most `window` futures keeps ingest, workers, and the writer
    streaming while preserving input order (cpus=0 == cpus=N byte
    equality depends on it).
    """
    import collections as _collections

    dq: '_collections.deque' = _collections.deque()
    for item in inputs:
      dq.append(pool.submit(process_subreads, item))
      if len(dq) >= window:
        yield dq.popleft().result()
    while dq:
      yield dq.popleft().result()

  writers = setup_writers(output, splits)
  try:
    if cpus == 0:
      results = (process_subreads(args) for args in proc_feeder())
      pool = None
    else:
      pool = concurrent.futures.ProcessPoolExecutor(max_workers=cpus)
      results = bounded_pool_results(pool, proc_feeder(), window=cpus * 8)
    try:
      for examples, split, counter in results:
        for ex in examples:
          writers[split].write(ex)
        main_counter.update(counter)
        if main_counter['n_zmw_pass'] % 20 == 0:
          logger.info('Processed %s ZMWs.', main_counter['n_zmw_pass'])
    finally:
      if pool is not None:
        pool.shutdown(wait=True, cancel_futures=True)
  finally:
    # Close EVERY split writer even when one close() raises (a threaded
    # writer re-raises its worker's error) or the user interrupts
    # (BaseException incl. KeyboardInterrupt): abandoning the rest would
    # leave their gzip streams unflushed/unterminated.
    import sys as _sys

    close_err = None
    for w in writers.values():
      try:
        w.close()
      except BaseException as e:  # noqa: BLE001 — re-raised/logged below
        if close_err is None:
          close_err = e
        else:
          logger.error('additional writer close failure: %r', e)
    # Don't mask an exception already propagating out of the try body.
    if close_err is not None:
      if _sys.exc_info()[0] is None:
        raise close_err
      logger.error('writer close failed during unwind: %r', close_err)

  logger.info('Completed processing %s ZMWs.', main_counter['n_zmw_pass'])
  summary_name = 'training' if is_training else 'inference'
  summary_path = output.replace('.tfrecord.gz', f'.{summary_name}.json')
  summary_path = summary_path.replace('@split', 'summary')
  d = os.path.dirname(summary_path)
  if d:
    os.makedirs(d, exist_ok=True)
  summary = dict(main_counter.items())
  summary.update(dc_config.to_dict())
  for name, value in [
      ('subreads_to_ccs', subreads_to_ccs),
      ('ccs_bam', ccs_bam),
      ('truth_to_ccs', truth_to_ccs),
      ('truth_bed', truth_bed),
      ('truth_split', truth_split),
      ('max_passes', max_passes),
      ('max_length', max_length),
      ('ins_trim', ins_trim),
  ]:
    summary[name] = str(value)
  summary['version'] = constants.__version__
  with open(summary_path, 'w') as f:
    json.dump(summary, f, indent=True)
  return main_counter
