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


def _build() -> bool:
  try:
    subprocess.run(
        ['g++', '-O3', '-fPIC', '-shared', '-o', _LIB_PATH,
         os.path.join(_DIR, 'bgzf_ext.cc'), '-lz'],
        check=True,
        capture_output=True,
        timeout=120,
    )
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
  if not os.path.exists(_LIB_PATH) and not _build():
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
  _lib = lib
  return _lib


def _as_u8p(buf) -> 'ctypes.POINTER(ctypes.c_uint8)':
  return ctypes.cast(
      (ctypes.c_uint8 * len(buf)).from_buffer_copy(buf),
      ctypes.POINTER(ctypes.c_uint8),
  )


def bgzf_decompress_all(raw: bytes) -> Optional[bytes]:
  """Inflates a whole BGZF byte string; None if native path unavailable."""
  lib = get_lib()
  if lib is None:
    return None
  src = _as_u8p(raw)
  size = lib.dc_bgzf_decompressed_size(src, len(raw))
  if size < 0:
    return None
  dst = ctypes.create_string_buffer(size)
  n = lib.dc_bgzf_decompress(
      src, len(raw), ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), size
  )
  if n != size:
    return None
  return dst.raw


def bgzf_compress(data: bytes, level: int = 6) -> Optional[bytes]:
  """Deflates bytes into BGZF members (without the EOF member)."""
  lib = get_lib()
  if lib is None:
    return None
  cap = len(data) + (len(data) // 0xFF00 + 2) * 1024 + 1024
  dst = ctypes.create_string_buffer(cap)
  n = lib.dc_bgzf_compress(
      _as_u8p(data), len(data),
      ctypes.cast(dst, ctypes.POINTER(ctypes.c_uint8)), cap, level,
  )
  if n < 0:
    return None
  return dst.raw[:n]


def crc32c(data: bytes, crc: int = 0) -> Optional[int]:
  lib = get_lib()
  if lib is None:
    return None
  return int(lib.dc_crc32c(_as_u8p(data), len(data), crc))


def bam_scan(buf: bytes, start: int):
  """Scans record offsets/fields; returns dict of numpy arrays or None."""
  lib = get_lib()
  if lib is None:
    return None
  import numpy as np

  max_records = max(16, len(buf) // 40)
  offsets = np.zeros(max_records, np.int64)
  fields = {
      name: np.zeros(max_records, np.int32)
      for name in (
          'sizes', 'ref_ids', 'positions', 'flags', 'l_seqs', 'mapqs',
          'name_lens', 'n_cigars',
      )
  }
  n = lib.dc_bam_scan(
      _as_u8p(buf),
      len(buf),
      start,
      max_records,
      offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_longlong)),
      *[
          fields[k].ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
          for k in (
              'sizes', 'ref_ids', 'positions', 'flags', 'l_seqs', 'mapqs',
              'name_lens', 'n_cigars',
          )
      ],
  )
  if n < 0:
    return None
  out = {'offsets': offsets[:n]}
  out.update({k: v[:n] for k, v in fields.items()})
  return out
