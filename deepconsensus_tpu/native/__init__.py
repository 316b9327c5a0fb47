"""ctypes bindings for the native IO fast path (libdcio.lib.so).

Builds on demand from bgzf_ext.cc (see build.sh); every entry point has a
pure-Python fallback in deepconsensus_tpu/io, so the package works without
a compiler — the native path just makes BAM decode and TFRecord framing
fast at production scale.
"""

import ctypes
import logging
import os
import subprocess
from typing import Optional

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, 'libdcio.lib.so')
_lib: Optional[ctypes.CDLL] = None
_tried = False
_rebuilt_once = False


def _build() -> bool:
  try:
    # Build to a temp path and rename so a reload after rebuild sees a new
    # inode (dlopen caches handles by dev/inode, not path).
    tmp = _LIB_PATH + '.tmp'
    subprocess.run(
        ['g++', '-O3', '-fPIC', '-shared', '-pthread', '-o', tmp,
         os.path.join(_DIR, 'bgzf_ext.cc'), '-lz'],
        check=True,
        capture_output=True,
        timeout=120,
    )
    os.replace(tmp, _LIB_PATH)
    return True
  except Exception as e:  # no compiler / no zlib headers: fall back
    logger.debug('native build failed: %s', e)
    return False


def get_lib() -> Optional[ctypes.CDLL]:
  """Loads (building if needed) the native library; None if unavailable."""
  global _lib, _tried
  if _lib is not None or _tried:
    return _lib
  _tried = True
  stale = True
  try:
    stale = os.path.getmtime(_LIB_PATH) < os.path.getmtime(
        os.path.join(_DIR, 'bgzf_ext.cc')
    )
  except OSError:
    pass  # missing library (or source): treat as stale
  if stale and not _build():
    # Never run a stale library against newer source expectations: a
    # behavior fix to an EXISTING symbol would load cleanly and silently
    # produce pre-fix native results (review r5). Pure-Python fallback
    # is slower but correct.
    logger.warning(
        'native source is newer than the built library and the rebuild '
        'failed; using the pure-Python fallback'
    )
    return None
  try:
    lib = ctypes.CDLL(_LIB_PATH)
  except OSError as e:
    logger.debug('native load failed: %s', e)
    return None
  c = ctypes.c_longlong
  u8p = ctypes.POINTER(ctypes.c_uint8)
  lib.dc_bgzf_decompressed_size.restype = c
  lib.dc_bgzf_decompressed_size.argtypes = [u8p, c]
  lib.dc_bgzf_decompress.restype = c
  lib.dc_bgzf_decompress.argtypes = [u8p, c, u8p, c]
  lib.dc_bgzf_compress.restype = c
  lib.dc_bgzf_compress.argtypes = [u8p, c, u8p, c, ctypes.c_int]
  lib.dc_crc32c.restype = ctypes.c_uint32
  lib.dc_crc32c.argtypes = [u8p, c, ctypes.c_uint32]
  i32p = ctypes.POINTER(ctypes.c_int32)
  llp = ctypes.POINTER(ctypes.c_longlong)
  lib.dc_bam_scan.restype = c
  lib.dc_bam_scan.argtypes = [u8p, c, c, c, llp, i32p, i32p, i32p, i32p,
                              i32p, i32p, i32p, i32p]
  u16p = ctypes.POINTER(ctypes.c_uint16)
  u32p = ctypes.POINTER(ctypes.c_uint32)
  i64p = ctypes.POINTER(ctypes.c_int64)
  f32p = ctypes.POINTER(ctypes.c_float)
  parse_sig = [
      u8p, c, llp, i32p, llp, llp, llp,        # buf, n, offsets, sizes, starts
      u8p, u8p, u8p, u32p, u8p,                # seq, qual, qual_missing, cigar, name
      u16p, i32p, u16p, i32p, f32p,            # pw, pw_len, ip, ip_len, sn
      i64p, f32p, i32p, f32p, u16p,            # zm, ec, np, rq, present
  ]
  try:
    lib.dc_bam_parse_batch.restype = c
    lib.dc_bam_parse_batch.argtypes = parse_sig
    lib.dc_bam_parse_batch_mt.restype = c
    lib.dc_bam_parse_batch_mt.argtypes = parse_sig + [ctypes.c_int]
    lib.dc_bgzf_decompress_mt.restype = c
    lib.dc_bgzf_decompress_mt.argtypes = [u8p, c, u8p, c, ctypes.c_int]
    lib.dc_tfrecord_count.restype = c
    lib.dc_tfrecord_count.argtypes = [u8p, c]
    lib.dc_tfexample_parse_batch.restype = c
    lib.dc_tfexample_parse_batch.argtypes = [
        u8p, c, c, c, u8p, u8p, i32p, c, ctypes.c_int,
    ]
    lib.dc_spaced_columns.restype = c
    lib.dc_spaced_columns.argtypes = [u8p, llp, c, i32p, llp]
    lib.dc_scatter_windows.restype = c
    lib.dc_scatter_windows.argtypes = [
        i32p, llp, c, u8p, u8p, u8p, u8p, c, u8p, u8p, u8p,
    ]
  except AttributeError:
    # Library built from an older source revision: rebuild ONCE (the
    # guard prevents unbounded recursive g++ runs when the on-disk
    # source itself lacks the symbol, review r5).
    del lib
    _lib = None
    global _rebuilt_once
    if not _rebuilt_once and _build():
      _rebuilt_once = True
      _tried = False
      return get_lib()
    logger.warning(
        'native library lacks required symbols after rebuild; using the '
        'pure-Python fallback'
    )
    return None
  _lib = lib
  return _lib


def _ro_u8p(buf):
  """Zero-copy read-only uint8 pointer into a bytes object.

  The C side treats it as const; keep `buf` alive for the call duration.
  """
  import numpy as np

  arr = np.frombuffer(buf, dtype=np.uint8)
  return ctypes.cast(arr.ctypes.data, ctypes.POINTER(ctypes.c_uint8))


def bgzf_decompress_all(raw: bytes) -> Optional[bytes]:
  """Inflates a whole BGZF byte string; None if native path unavailable."""
  arr = bgzf_decompress_into(raw)
  if arr is None:
    return None
  return arr.tobytes()


_MALLOC_TUNED = False


def tune_allocator() -> bool:
  """Keeps large transient allocations on the warm glibc heap.

  glibc serves allocations above M_MMAP_THRESHOLD (128 KB default) with
  fresh mmaps that are returned to the OS on free, so every round's large
  numpy temporaries (flat transport arrays, wire buffers, inflate scratch)
  pay first-touch page faults again — pathologically slow in this VM
  (~2 orders of magnitude vs warm memory). Raising the mmap threshold to
  its 32 MB max and disabling heap trimming makes those pages stay
  resident and get reused warm. Opt out with DC_TPU_NO_MALLOPT=1.
  """
  global _MALLOC_TUNED
  if _MALLOC_TUNED or os.environ.get('DC_TPU_NO_MALLOPT'):
    return _MALLOC_TUNED
  try:
    libc = ctypes.CDLL(None)
    M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
    libc.mallopt(M_MMAP_THRESHOLD, 32 * 1024 * 1024)
    libc.mallopt(M_TRIM_THRESHOLD, 1 << 30)
    _MALLOC_TUNED = True
  except (OSError, AttributeError):
    pass
  return _MALLOC_TUNED


# Recycling pool for large transient buffers. Fresh page faults in this VM
# run ~2 orders of magnitude slower than warm memory until the pages have
# been touched once, which made each round's ~34 MB inflate output cost
# 110-170 ms of faults on top of ~40 ms of actual (4-thread) inflate.
# A buffer is reusable exactly when nothing outside the pool references it
# (sys.getrefcount == pool + loop local + getrefcount arg); BAM record views
# keep their base buffer referenced, so reuse can never alias live data.
import threading as _threading

# Created at import: a lazy check-then-assign raced (two threads could
# each create their own Lock and both enter the pool scan, review r5).
_POOL_LOCK = _threading.Lock()
_BUF_POOL: list = []
_POOL_MAX = 8


def take_pooled_buffer(nbytes: int):
  """A uint8 array view of length nbytes over a recycled (warm) buffer."""
  import sys

  import numpy as np

  with _POOL_LOCK:
    for b in _BUF_POOL:
      if b.nbytes >= nbytes and sys.getrefcount(b) == 3:
        return b[:nbytes]
    buf = np.empty(max(nbytes, 1 << 20), np.uint8)
    _BUF_POOL.append(buf)
    if len(_BUF_POOL) > _POOL_MAX:
      # Drop the smallest retired buffer (live ones stay referenced by
      # their views regardless of pool membership).
      _BUF_POOL.remove(min(_BUF_POOL, key=lambda a: a.nbytes))
    return buf[:nbytes]


def bgzf_decompress_into(raw, head: bytes = b'',
                         threads: Optional[int] = None):
  """Threaded BGZF inflate into a pooled numpy uint8 array.

  Returns `head + inflate(raw)` as one array with no intermediate copies,
  or None if the native path is unavailable. BGZF members are inflated in
  parallel (they are independent deflate streams with known output sizes).
  `raw` may be bytes or a uint8 array (e.g. a pooled read buffer).
  """
  lib = get_lib()
  if lib is None or not hasattr(lib, 'dc_bgzf_decompress_mt'):
    return None
  import numpy as np

  src = _ro_u8p(raw)
  size = lib.dc_bgzf_decompressed_size(src, len(raw))
  if size < 0:
    return None
  if threads is None:
    threads = min(8, os.cpu_count() or 1)
  out = take_pooled_buffer(len(head) + size)
  if head:
    out[: len(head)] = np.frombuffer(head, np.uint8)
  dst = ctypes.cast(
      out.ctypes.data + len(head), ctypes.POINTER(ctypes.c_uint8)
  )
  n = lib.dc_bgzf_decompress_mt(src, len(raw), dst, size, threads)
  if n != size:
    return None
  return out


def bgzf_compress(data: bytes, level: int = 6) -> Optional[bytes]:
  """Deflates bytes into BGZF members (without the EOF member)."""
  lib = get_lib()
  if lib is None:
    return None
  cap = len(data) + (len(data) // 0xFF00 + 2) * 1024 + 1024
  dst = ctypes.create_string_buffer(cap)
  # _ro_u8p: the C side takes const uint8*; from_buffer_copy would pay a
  # full redundant memcpy of the payload per call on the TFRecord-write
  # hot path (review r5). `data` stays alive for the call.
  n = lib.dc_bgzf_compress(
      _ro_u8p(data), len(data),
      ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), cap, level,
  )
  if n < 0:
    return None
  return dst.raw[:n]


def crc32c(data: bytes, crc: int = 0) -> Optional[int]:
  lib = get_lib()
  if lib is None:
    return None
  return int(lib.dc_crc32c(_ro_u8p(data), len(data), crc))


def bam_parse_batch(buf: bytes, scan: dict):
  """Decodes all scanned records into columnar arrays in one native pass.

  `scan` is the dict returned by bam_scan. Returns a dict of numpy arrays
  (see keys below) or None if the native path is unavailable/fails. Element
  layouts: seq/qual/pw/ip indexed by seq_starts, cigar by cigar_starts,
  names by name_starts; sn is (n, 4); `present` is the per-record tag
  bitmask (1=zm 2=pw 4=ip 8=sn 16=ec 32=np 64=rq).
  """
  lib = get_lib()
  if lib is None or not hasattr(lib, 'dc_bam_parse_batch'):
    return None
  import numpy as np

  n = len(scan['offsets'])
  l_seqs = scan['l_seqs'].astype(np.int64)
  n_cigars = scan['n_cigars'].astype(np.int64)
  # Scan fields come straight from the (untrusted) file; validate before
  # they size allocations so corrupt records fall back to the Python
  # parser instead of raising out of the cumsum/empty calls below.
  if n and (
      int(scan['name_lens'].min()) < 1
      or int(l_seqs.min()) < 0
      or int(n_cigars.min()) < 0
  ):
    return None
  name_lens = scan['name_lens'].astype(np.int64) - 1  # drop trailing NUL
  seq_starts = np.concatenate([[0], np.cumsum(l_seqs)])
  cigar_starts = np.concatenate([[0], np.cumsum(n_cigars)])
  name_starts = np.concatenate([[0], np.cumsum(name_lens)])

  out = {
      'seq': np.empty(int(seq_starts[-1]), np.uint8),
      'qual': np.empty(int(seq_starts[-1]), np.uint8),
      'qual_missing': np.zeros(n, np.uint8),
      'cigar': np.empty(int(cigar_starts[-1]), np.dtype('<u4')),
      'name': np.empty(int(name_starts[-1]), np.uint8),
      # pw/ip are np.empty, not zeros: only the written prefix of each
      # record's slot (pw_len/ip_len elements) is ever exposed.
      'pw': np.empty(int(seq_starts[-1]), np.uint16),
      'pw_len': np.zeros(n, np.int32),
      'ip': np.empty(int(seq_starts[-1]), np.uint16),
      'ip_len': np.zeros(n, np.int32),
      'sn': np.zeros((n, 4), np.float32),
      'zm': np.zeros(n, np.int64),
      'ec': np.zeros(n, np.float32),
      'np': np.zeros(n, np.int32),
      'rq': np.zeros(n, np.float32),
      'present': np.zeros(n, np.uint16),
  }

  def ptr(a, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))

  offsets = np.ascontiguousarray(scan['offsets'], dtype=np.int64)
  sizes = np.ascontiguousarray(scan['sizes'], dtype=np.int32)
  rc = lib.dc_bam_parse_batch_mt(
      _ro_u8p(buf), n,
      ptr(offsets, ctypes.c_longlong), ptr(sizes, ctypes.c_int32),
      ptr(seq_starts, ctypes.c_longlong),
      ptr(cigar_starts, ctypes.c_longlong),
      ptr(name_starts, ctypes.c_longlong),
      ptr(out['seq'], ctypes.c_uint8), ptr(out['qual'], ctypes.c_uint8),
      ptr(out['qual_missing'], ctypes.c_uint8),
      ptr(out['cigar'], ctypes.c_uint32), ptr(out['name'], ctypes.c_uint8),
      ptr(out['pw'], ctypes.c_uint16), ptr(out['pw_len'], ctypes.c_int32),
      ptr(out['ip'], ctypes.c_uint16), ptr(out['ip_len'], ctypes.c_int32),
      ptr(out['sn'], ctypes.c_float), ptr(out['zm'], ctypes.c_int64),
      ptr(out['ec'], ctypes.c_float), ptr(out['np'], ctypes.c_int32),
      ptr(out['rq'], ctypes.c_float), ptr(out['present'], ctypes.c_uint16),
      min(8, os.cpu_count() or 1),
  )
  if rc != 0:
    return None
  out['seq_starts'] = seq_starts
  out['cigar_starts'] = cigar_starts
  out['name_starts'] = name_starts
  return out


def tfexample_parse_batch(
    payload,
    sub_shape,
    lab_len: int,
    want_labels: bool,
    threads: Optional[int] = None,
):
  """Parses ALL examples of an inflated TFRecord stream in one native call.

  `payload` is the whole (decompressed) file contents; sub_shape the
  per-example subreads tensor shape (from the first example's
  subreads/shape); lab_len the label length (ignored when want_labels is
  False). Returns (subreads (n, *sub_shape) f32, labels (n, lab_len) f32
  or None, num_passes (n,) i32), or None when the native path is
  unavailable or any record deviates from the schema (caller falls back
  to the per-example Python parser).
  """
  lib = get_lib()
  if lib is None or not hasattr(lib, 'dc_tfexample_parse_batch'):
    return None
  import numpy as np

  src = _ro_u8p(payload)
  cnt = lib.dc_tfrecord_count(src, len(payload))
  if cnt <= 0:
    return None
  sub_bytes = int(np.prod(sub_shape)) * 4
  lab_bytes = lab_len * 4 if want_labels else 0
  sub = np.empty((cnt,) + tuple(sub_shape), np.float32)
  lab = np.empty((cnt, lab_len), np.float32) if want_labels else None
  npass = np.zeros(cnt, np.int32)
  if threads is None:
    threads = min(8, os.cpu_count() or 1)
  rc = lib.dc_tfexample_parse_batch(
      src, len(payload), sub_bytes, lab_bytes,
      sub.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
      lab.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
      if lab is not None
      else None,
      npass.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
      cnt, threads,
  )
  if rc != cnt:
    return None
  return sub, lab, npass


def bam_scan(buf: bytes, start: int):
  """Scans record offsets/fields; returns dict of numpy arrays or None."""
  lib = get_lib()
  if lib is None:
    return None
  import numpy as np

  field_names = (
      'sizes', 'ref_ids', 'positions', 'flags', 'l_seqs', 'mapqs',
      'name_lens', 'n_cigars',
  )
  max_records = max(16, len(buf) // 40)
  while True:
    offsets = np.zeros(max_records, np.int64)
    fields = {name: np.zeros(max_records, np.int32) for name in field_names}
    n = lib.dc_bam_scan(
        _ro_u8p(buf),
        len(buf),
        start,
        max_records,
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
        *[
            fields[k].ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
            for k in field_names
        ],
    )
    if n < 0:
      return None
    # The scan stops at max_records; verify it consumed the whole record
    # region. Records can legally be far smaller than the 40-byte sizing
    # heuristic (empty seq/cigar, short names) — rescan with more capacity
    # rather than silently dropping the tail.
    consumed = int(offsets[n - 1] + fields['sizes'][n - 1]) if n else start
    if consumed == len(buf):
      break
    if n == max_records:
      max_records *= 2
      continue
    return None  # partial/corrupt trailing record: use the Python parser
  out = {'offsets': offsets[:n]}
  out.update({k: v[:n] for k, v in fields.items()})
  return out


def spaced_columns(cig_cat, offs):
  """Native spacing geometry: (col int32, finals int64) or None.

  cig_cat: concatenated per-position cigar ops (uint8); offs: int64 read
  boundaries (n+1). Inference reads only (no labels). Bit-equal to
  spacing.spaced_columns' numpy math (tests/test_native_featurize.py).
  """
  lib = get_lib()
  if lib is None:
    return None
  import numpy as np

  n = len(offs) - 1
  col = np.empty(int(offs[-1]), np.int32)
  finals = np.empty(n, np.int64)

  def ptr(a, ct):
    return ctypes.cast(a.ctypes.data, ctypes.POINTER(ct))

  cig_cat = np.ascontiguousarray(cig_cat)
  offs = np.ascontiguousarray(offs, dtype=np.int64)
  rc = lib.dc_spaced_columns(
      ptr(cig_cat, ctypes.c_uint8), ptr(offs, ctypes.c_longlong), n,
      ptr(col, ctypes.c_int32), ptr(finals, ctypes.c_longlong),
  )
  if rc != 0:
    return None
  return col, finals


def scatter_windows(col, offs, bases_cat, pw_cat, ip_cat, base_to_id,
                    out_bases, out_pw, out_ip) -> bool:
  """Native window scatter into zeroed (k, W) uint8 arrays; False = no lib."""
  lib = get_lib()
  if lib is None:
    return False
  import numpy as np

  k = out_bases.shape[0]
  w = out_bases.shape[1]

  def ptr(a, ct):
    return ctypes.cast(a.ctypes.data, ctypes.POINTER(ct))

  col = np.ascontiguousarray(col, dtype=np.int32)
  offs = np.ascontiguousarray(offs, dtype=np.int64)
  lib.dc_scatter_windows(
      ptr(col, ctypes.c_int32), ptr(offs, ctypes.c_longlong), k,
      ptr(bases_cat, ctypes.c_uint8), ptr(pw_cat, ctypes.c_uint8),
      ptr(ip_cat, ctypes.c_uint8), ptr(base_to_id, ctypes.c_uint8), w,
      ptr(out_bases, ctypes.c_uint8), ptr(out_pw, ctypes.c_uint8),
      ptr(out_ip, ctypes.c_uint8),
  )
  return True
