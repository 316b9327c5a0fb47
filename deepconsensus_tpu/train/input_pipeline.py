"""Training input pipeline: tfrecord shards -> shuffled fixed-shape batches.

numpy replacement for the reference's tf.data pipeline
(`reference: models/data_providers.py:307-425`): glob TFRecord shards,
parse+format examples, shuffle, emit (rows, label) batches, repeat forever.

Two execution modes:
* serial (num_workers=0): one generator, per-example parse + reservoir
  shuffle — fine for small runs and tests.
* parallel (num_workers>0): the reference's num_parallel_calls equivalent.
  A thread pool loads whole tfrecord files: gzip inflate (zlib, GIL-free)
  then ONE native call per file (dc_tfexample_parse_batch: GIL-released,
  internally threaded C++ that walks the TFRecord framing and the
  tf.train.Example wire format, memcpy-ing every float blob straight into
  batch arrays), then one vectorized numpy format pass (models/data.py).
  Batches are assembled with a deterministic chunked shuffle (accumulate
  >= shuffle_buffer examples, permute, emit). No pickling/IPC, no
  subprocess page-table warmup — threads share the process's memory.

Either mode, a Prefetcher thread keeps batches ready so the accelerator
never waits on the host.
"""

import collections
import concurrent.futures
import glob as glob_lib
import itertools
import os
import queue
import threading
from typing import Iterator, List, Optional, Tuple

import numpy as np

from deepconsensus_tpu.io import tfrecord
from deepconsensus_tpu.models import data as data_lib

_SNAPSHOT_FIELDS = (
    'max_passes',
    'use_ccs_bq',
    'PW_MAX',
    'IP_MAX',
    'SN_MAX',
    'total_rows',
    'remove_label_gaps',
)


class _ParamsView:
  """Picklable attribute view of the few params fields workers need."""

  def __init__(self, fields: dict):
    self.__dict__.update(fields)


def _snapshot_params(params) -> dict:
  return {k: params[k] for k in _SNAPSHOT_FIELDS}


def _parse_format_chunk(records, pfields: dict, inference: bool):
  """Worker: decode+format one chunk of raw records (vectorized numpy).

  Returns (rows (n, total_rows, L, 1), labels (n, L) or None).
  """
  params = _ParamsView(pfields)
  subs, labels = [], []
  for rec in records:
    ex = data_lib.parse_example_bytes(rec, inference=inference)
    subs.append(ex['subreads'])
    if not inference:
      labels.append(ex['label'])
  rows = data_lib.format_rows_batch(np.stack(subs), params)
  lab = None
  if labels:
    lab = np.stack(labels)
    if params.remove_label_gaps:
      lab = data_lib.remove_internal_gaps_and_shift_batch(lab)
    else:
      lab = lab.reshape(lab.shape[0], -1)
  return rows, lab


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


def _host_shard(file_patterns, host_id: int, num_hosts: int) -> List[str]:
  files = create_glob_list(file_patterns)
  if not files:
    raise FileNotFoundError(f'no tfrecord files match {file_patterns!r}')
  if num_hosts > 1:
    sharded = files[host_id::num_hosts]
    if not sharded:
      # multihost_stream owns the fewer-files-than-hosts case (it slices
      # the full stream); a silent fall-back to ALL files here would
      # duplicate data across hosts with uneven per-host epochs.
      raise ValueError(
          f'host {host_id}/{num_hosts} has no input files '
          f'({len(files)} total match {file_patterns!r}); use '
          'multihost_stream for fewer files than hosts'
      )
    files = sharded
  return files


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
    num_workers: int = 0,
    chunk_records: int = 256,
) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
  """Yields (rows [b,H,W,1], label [b,W]) batches.

  num_hosts > 1 gives each host a disjoint round-robin slice of the
  tfrecord file list (the per-host input pipelines of a multi-host
  data-parallel job; SURVEY.md §2.11). num_workers > 0 parses record
  chunks in a process pool (deterministic for a fixed seed; the chunked
  shuffle differs from the serial reservoir order but draws from the same
  example multiset per epoch — equivalence-tested).
  """
  if num_workers > 0:
    return _parallel_stream(
        file_patterns, params, batch_size, shuffle_buffer, seed, repeat,
        inference, drop_remainder, host_id, num_hosts, num_workers,
        chunk_records,
    )
  files = _host_shard(file_patterns, host_id, num_hosts)
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
      yielded = False
      n_seen = 0
      for rows, label in epoch_stream():
        n_seen += 1
        rows_buf.append(rows)
        label_buf.append(label)
        if len(rows_buf) == batch_size:
          labels = (
              np.stack(label_buf) if label_buf[0] is not None else None
          )
          yield np.stack(rows_buf), labels
          yielded = True
          rows_buf, label_buf = [], []
      if rows_buf and not drop_remainder:
        labels = np.stack(label_buf) if label_buf[0] is not None else None
        yield np.stack(rows_buf), labels
        yielded = True
      if not repeat:
        return
      if not yielded:
        # With drop_remainder + repeat, a source smaller than one batch
        # would loop forever without producing anything — on a multi-host
        # job that silently hangs the whole pod in the first all-reduce
        # (one starving host never reaches it). Fail loudly instead.
        raise ValueError(
            f'input {file_patterns!r} yields only {n_seen} examples per '
            f'epoch — fewer than batch_size {batch_size} with '
            'drop_remainder; for multi-host training this usually means '
            'a host file shard is smaller than the LOCAL batch size'
        )

  return batches()


def multihost_stream(
    file_patterns,
    params,
    global_batch_size: int,
    host_id: int,
    num_hosts: int,
    shuffle_buffer: int = 0,
    seed: int = 1,
    num_workers: int = 0,
) -> Iterator[Tuple[np.ndarray, Optional[np.ndarray]]]:
  """Per-host LOCAL batches (global_batch/num_hosts rows) of a global stream.

  The multi-host data-parallel input contract (SURVEY.md §2.11; the
  reference distributes its dataset via
  strategy.experimental_distribute_dataset, model_utils.py:488-490):

  * With >= num_hosts input files, each host reads a disjoint round-robin
    file shard at the local batch size — zero redundant IO, the
    production pod path.
  * With fewer files than hosts, every host deterministically reads the
    FULL stream at the global batch size and takes its row slice, so the
    assembled global batch is bit-identical to a single-host run (this is
    what makes multi-host gradients exactly equal to single-host in
    tests, and keeps small datasets correct instead of silently
    duplicating examples across hosts).
  """
  if global_batch_size % num_hosts != 0:
    raise ValueError(
        f'global batch {global_batch_size} not divisible by '
        f'{num_hosts} hosts'
    )
  local = global_batch_size // num_hosts
  if num_hosts == 1:
    return example_stream(
        file_patterns, params, global_batch_size,
        shuffle_buffer=shuffle_buffer, seed=seed, num_workers=num_workers,
    )
  files = create_glob_list(file_patterns)
  if not files:
    # Validate eagerly: deferring into the generator would surface a
    # mistyped path as a bare StopIteration from the Prefetcher worker
    # instead of this error.
    raise FileNotFoundError(f'no tfrecord files match {file_patterns!r}')
  import jax

  if jax.process_count() == num_hosts and num_hosts > 1:
    # The sharded-vs-sliced branch must be the SAME on every host (a
    # shared-FS listing lag could make hosts see different file counts;
    # both branches yield correctly-shaped local batches, so divergence
    # would silently duplicate/drop examples in the global batch).
    from jax.experimental import multihost_utils

    # Compare a digest of the sorted file NAMES, not just the count:
    # equal-sized but different listings (a,b vs a,c under listing lag)
    # would pass a count check and then silently drop/duplicate shards
    # in the round-robin assignment (review r5).
    import hashlib

    digest = hashlib.sha256(
        '\n'.join(sorted(files)).encode()
    ).digest()[:8]
    mine = np.frombuffer(digest, np.int64)
    digests = multihost_utils.process_allgather(mine)
    if not (digests == digests[0]).all():
      raise ValueError(
          f'hosts disagree on the input file LISTING for '
          f'{file_patterns!r} (digests {digests.ravel().tolist()}): '
          'shared storage not yet consistent?'
      )
  if len(files) >= num_hosts:
    # Pass the resolved listing down (single directory scan; the branch
    # decision and the shard assignment see the same files).
    return example_stream(
        files, params, local,
        shuffle_buffer=shuffle_buffer, seed=seed,
        host_id=host_id, num_hosts=num_hosts, num_workers=num_workers,
    )

  def sliced():
    stream = example_stream(
        files, params, global_batch_size,
        shuffle_buffer=shuffle_buffer, seed=seed, num_workers=num_workers,
    )
    for rows, labels in stream:
      yield (
          rows[host_id * local : (host_id + 1) * local],
          None
          if labels is None
          else labels[host_id * local : (host_id + 1) * local],
      )

  return sliced()


class _BlockCache:
  """LRU cache of decoded (rows, labels) file blocks across epochs.

  Epochs re-read the same shards; for datasets that fit in the budget the
  inflate+parse+format cost is paid once and later epochs stream from
  memory (the reference gets a weaker version of this from tf.data's
  .cache()). Keyed by (path, mtime, params snapshot, inference); cached
  arrays are frozen read-only — batch assembly copies via the shuffle
  permutation / np.concatenate, never mutates.
  """

  def __init__(self, cap_bytes: int):
    self.cap = cap_bytes
    self._d = collections.OrderedDict()
    self._bytes = 0
    self._lock = threading.Lock()

  @staticmethod
  def key(path, pfields, inference):
    try:
      mtime = os.path.getmtime(path)
    except OSError:
      mtime = 0.0
    return (path, mtime, tuple(sorted(pfields.items())), inference)

  def get(self, key):
    with self._lock:
      block = self._d.get(key)
      if block is not None:
        self._d.move_to_end(key)
      return block

  def put(self, key, block):
    rows, labels = block
    size = rows.nbytes + (labels.nbytes if labels is not None else 0)
    if size > self.cap:
      return
    with self._lock:
      if key in self._d:
        return
      while self._bytes + size > self.cap and self._d:
        _, (old_r, old_l) = self._d.popitem(last=False)
        self._bytes -= old_r.nbytes + (
            old_l.nbytes if old_l is not None else 0
        )
      rows.setflags(write=False)
      if labels is not None:
        labels.setflags(write=False)
      self._d[key] = block
      self._bytes += size


_block_cache = _BlockCache(
    int(os.environ.get('DC_TPU_INPUT_CACHE_MB', '2048')) * 1_000_000
)


def _load_file_block(
    path: str, pfields: dict, inference: bool, parse_threads: int
):
  """Loads+formats one whole tfrecord file into (rows, labels) arrays.

  Fast path: a single native call (dc_tfexample_parse_batch, GIL-released
  C++) copies every example's float blobs straight into batch arrays,
  then formatting clips PW/IP/SN in place when the on-disk layout already
  matches the model row contract (it always does for preprocess output).
  Falls back to the per-example Python parser on any schema deviation.
  Blocks are LRU-cached across epochs (DC_TPU_INPUT_CACHE_MB, 2048).
  """
  import gzip
  import struct

  from deepconsensus_tpu import native

  cache_key = _BlockCache.key(path, pfields, inference)
  cached = _block_cache.get(cache_key)
  if cached is not None:
    return cached

  params = _ParamsView(pfields)
  opener = gzip.open if path.endswith('.gz') else open
  with opener(path, 'rb') as f:
    payload = f.read()
  if len(payload) < 12:
    raise IOError(f'{path}: truncated tfrecord file')

  res = None
  want_labels = False
  try:
    # Probe the first record for the raw tensor shapes (fixed per dataset;
    # the native parser validates every record's blob length against them).
    (first_len,) = struct.unpack('<Q', payload[:8])
    first = data_lib.parse_example_bytes(
        bytes(payload[12 : 12 + first_len]), inference=inference
    )
    sub_shape = first['subreads'].shape
    want_labels = not inference and first.get('label') is not None
    lab_len = int(np.prod(first['label'].shape)) if want_labels else 0
    res = native.tfexample_parse_batch(
        payload, sub_shape, lab_len, want_labels, threads=parse_threads
    )
  except Exception:
    res = None

  if res is not None:
    sub, lab, _ = res
    if data_lib.format_rows_is_identity(sub.shape[1], params):
      rows = data_lib.format_rows_batch_inplace(sub, params)
    else:
      rows = data_lib.format_rows_batch(sub, params)
    labels = None
    if want_labels:
      labels = (
          data_lib.remove_internal_gaps_and_shift_batch(lab)
          if params.remove_label_gaps
          else lab
      )
    block = (rows, labels)
  else:
    # Python fallback: per-example parse of the in-memory payload.
    recs = []
    pos = 0
    while pos + 12 <= len(payload):
      (length,) = struct.unpack('<Q', payload[pos : pos + 8])
      recs.append(bytes(payload[pos + 12 : pos + 12 + length]))
      pos += 12 + length + 4
    block = _parse_format_chunk(recs, pfields, inference)
  _block_cache.put(cache_key, block)
  return block


def _parallel_stream(
    file_patterns,
    params,
    batch_size: int,
    shuffle_buffer: int,
    seed: int,
    repeat: bool,
    inference: bool,
    drop_remainder: bool,
    host_id: int,
    num_hosts: int,
    num_workers: int,
    chunk_records: int,
):
  """Thread pool of whole-file native loads + deterministic chunked shuffle.

  Threads (not processes): the hot work — gzip inflate (zlib) and the
  native example parser — releases the GIL, so file loads overlap without
  any pickling/IPC, and the process's warm page tables are shared (fresh
  page faults are pathologically slow on some VMs). chunk_records is
  unused here (whole files are the work unit) but kept for signature
  stability with the serial mode.
  """
  del chunk_records
  files = _host_shard(file_patterns, host_id, num_hosts)
  pfields = _snapshot_params(params)
  rng = np.random.default_rng(seed + host_id)
  # Chunked-shuffle window. Capped at 100k examples (~3.4 GB of rows at
  # production shapes) so a reference-style buffer_size of 1e6 doesn't
  # buffer the host into OOM; the window still far exceeds any correlation
  # length in preprocess output order.
  flush_at = min(max(shuffle_buffer, batch_size), 100_000)
  cpus = os.cpu_count() or 1
  parse_threads = max(1, cpus // num_workers)

  def gen():
    pool = concurrent.futures.ThreadPoolExecutor(max_workers=num_workers)
    try:
      while True:  # epochs
        order = (
            rng.permutation(len(files))
            if shuffle_buffer > 1
            else np.arange(len(files))
        )
        acc_rows: List[np.ndarray] = []
        acc_labels: List[Optional[np.ndarray]] = []
        acc_n = 0

        def flush(final: bool):
          nonlocal acc_rows, acc_labels, acc_n
          rows = (
              np.concatenate(acc_rows) if len(acc_rows) > 1 else acc_rows[0]
          )
          labels = None
          if acc_labels and acc_labels[0] is not None:
            labels = (
                np.concatenate(acc_labels)
                if len(acc_labels) > 1
                else acc_labels[0]
            )
          if shuffle_buffer > 1:
            perm = rng.permutation(rows.shape[0])
            rows = rows[perm]
            labels = labels[perm] if labels is not None else None
          n_full = rows.shape[0] // batch_size
          for i in range(n_full):
            sl = slice(i * batch_size, (i + 1) * batch_size)
            yield rows[sl], (labels[sl] if labels is not None else None)
          rem = rows[n_full * batch_size :]
          if final:
            acc_rows, acc_labels, acc_n = [], [], 0
            if rem.shape[0] and not drop_remainder:
              yield rem, (
                  labels[n_full * batch_size :]
                  if labels is not None
                  else None
              )
          else:
            acc_rows = [rem]
            acc_labels = [
                labels[n_full * batch_size :] if labels is not None else None
            ]
            acc_n = rem.shape[0]

        # Bounded in-flight whole-file loads, consumed in submission order
        # (deterministic for a fixed seed regardless of completion order).
        pending = collections.deque()
        max_inflight = num_workers + 1
        file_iter = iter(order)
        for fi in itertools.islice(file_iter, max_inflight):
          pending.append(
              pool.submit(
                  _load_file_block, files[fi], pfields, inference,
                  parse_threads,
              )
          )
        while pending:
          rows_b, labels_b = pending.popleft().result()
          fi = next(file_iter, None)
          if fi is not None:
            pending.append(
                pool.submit(
                    _load_file_block, files[fi], pfields, inference,
                    parse_threads,
                )
            )
          acc_rows.append(rows_b)
          acc_labels.append(labels_b)
          acc_n += rows_b.shape[0]
          if acc_n >= flush_at + batch_size:
            yield from flush(final=False)
        if acc_n:
          yield from flush(final=True)
        if not repeat:
          return
    finally:
      pool.shutdown(wait=False, cancel_futures=True)

  return gen()


class Prefetcher:
  """Background-thread batch prefetch (the reference relies on tf.data
  AUTOTUNE prefetch; here a single producer thread + queue suffices)."""

  def __init__(self, iterator, depth: int = 4):
    self._q = queue.Queue(maxsize=depth)
    self._done = object()
    self._iterator = iterator

    def worker():
      # Producer exceptions must reach the consumer AS themselves: a bare
      # `finally: put(done)` would reclassify e.g. a transient IOError as
      # StopIteration, silently ending the epoch and bypassing
      # train_with_retry's transient-error matching (review r5).
      try:
        for item in iterator:
          self._q.put(item)
        self._q.put(self._done)
      except BaseException as e:  # re-raised at the consumer
        self._q.put(e)

    self._thread = threading.Thread(target=worker, daemon=True)
    self._thread.start()

  def __iter__(self):
    return self

  def __next__(self):
    item = self._q.get()
    if item is self._done:
      raise StopIteration
    if isinstance(item, BaseException):
      raise item
    return item
