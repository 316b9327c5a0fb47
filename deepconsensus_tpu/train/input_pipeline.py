"""Training input pipeline: tfrecord shards -> shuffled fixed-shape batches.

numpy replacement for the reference's tf.data pipeline
(`reference: models/data_providers.py:307-425`): glob TFRecord shards,
parse+format each example, shuffle with a reservoir buffer, emit
(rows, label) batches, repeat forever. A background thread keeps a small
queue of ready batches so the accelerator never waits on record parsing.
"""

import glob as glob_lib
import itertools
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from deepconsensus_tpu.io import tfrecord
from deepconsensus_tpu.models import data as data_lib


def create_glob_list(paths) -> List[str]:
  if isinstance(paths, str):
    paths = [paths]
  return list(
      itertools.chain.from_iterable(sorted(glob_lib.glob(p)) for p in paths)
  )


def _iter_parsed(files: List[str], params, inference: bool):
  for path in files:
    try:
      for rec in tfrecord.read_tfrecords(path):
        ex = data_lib.parse_example_bytes(rec, inference=inference)
        rows = data_lib.format_rows(ex['subreads'], params)
        label = ex.get('label')
        if label is not None and params.remove_label_gaps:
          label = data_lib.remove_internal_gaps_and_shift(label)
        yield rows, label
    except Exception as e:
      raise IOError(
          f'{path}: not a readable tfrecord of examples (glob matched a '
          f'non-dataset file?): {e}'
      ) from e


def example_stream(
    file_patterns,
    params,
    batch_size: int,
    shuffle_buffer: int = 0,
    seed: int = 1,
    repeat: bool = True,
    inference: bool = False,
    drop_remainder: bool = True,
    host_id: int = 0,
    num_hosts: int = 1,
) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
  """Yields (rows [b,H,W,1], label [b,W]) batches.

  num_hosts > 1 gives each host a disjoint round-robin slice of the
  tfrecord file list (the per-host input pipelines of a multi-host
  data-parallel job; SURVEY.md §2.11).
  """
  files = create_glob_list(file_patterns)
  if not files:
    raise FileNotFoundError(f'no tfrecord files match {file_patterns!r}')
  if num_hosts > 1:
    sharded = files[host_id::num_hosts]
    # Fall back to all files when there are fewer shards than hosts (the
    # batch axis still splits across chips).
    files = sharded or files
  rng = np.random.default_rng(seed + host_id)

  def epoch_stream():
    it = _iter_parsed(files, params, inference)
    if shuffle_buffer > 1:
      buf = []
      for item in it:
        if len(buf) < shuffle_buffer:
          buf.append(item)
        else:
          k = rng.integers(0, len(buf))
          yield buf[k]
          buf[k] = item
      rng.shuffle(buf)
      yield from buf
    else:
      yield from it

  def batches():
    while True:
      rows_buf, label_buf = [], []
      for rows, label in epoch_stream():
        rows_buf.append(rows)
        label_buf.append(label)
        if len(rows_buf) == batch_size:
          labels = (
              np.stack(label_buf) if label_buf[0] is not None else None
          )
          yield np.stack(rows_buf), labels
          rows_buf, label_buf = [], []
      if rows_buf and not drop_remainder:
        labels = np.stack(label_buf) if label_buf[0] is not None else None
        yield np.stack(rows_buf), labels
      if not repeat:
        return

  return batches()


class Prefetcher:
  """Background-thread batch prefetch (the reference relies on tf.data
  AUTOTUNE prefetch; here a single producer thread + queue suffices)."""

  def __init__(self, iterator, depth: int = 4):
    self._q = queue.Queue(maxsize=depth)
    self._done = object()
    self._iterator = iterator

    def worker():
      try:
        for item in iterator:
          self._q.put(item)
      finally:
        self._q.put(self._done)

    self._thread = threading.Thread(target=worker, daemon=True)
    self._thread.start()

  def __iter__(self):
    return self

  def __next__(self):
    item = self._q.get()
    if item is self._done:
      raise StopIteration
    return item
