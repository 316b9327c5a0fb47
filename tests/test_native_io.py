"""Native IO fast-path (libdcio.so) equivalence tests.

Skipped cleanly when no compiler is available (pure-Python fallbacks cover
every entry point).
"""

import struct
import zlib

import pytest

from deepconsensus_tpu import native
from deepconsensus_tpu.io import bam, tfrecord
from tests.conftest import HUMAN_1M

pytestmark = pytest.mark.skipif(
    native.get_lib() is None, reason='native lib not built'
)


def _py_inflate(raw):
  off = 0
  chunks = []
  while off + 28 <= len(raw):
    xlen = struct.unpack('<H', raw[off + 10 : off + 12])[0]
    i = off + 12
    bsize = None
    while i < off + 12 + xlen:
      si1, si2 = raw[i], raw[i + 1]
      slen = struct.unpack('<H', raw[i + 2 : i + 4])[0]
      if si1 == 66 and si2 == 67:
        bsize = struct.unpack('<H', raw[i + 4 : i + 6])[0] + 1
      i += 4 + slen
    chunks.append(zlib.decompress(raw[off + 12 + xlen : off + bsize - 8], -15))
    off += bsize
  return b''.join(chunks)


def test_native_inflate_matches_python():
  raw = open(f'{HUMAN_1M}/subreads_to_ccs.bam', 'rb').read()
  assert native.bgzf_decompress_all(raw) == _py_inflate(raw)


def test_native_compress_roundtrip():
  data = b'the quick brown fox' * 5000
  comp = native.bgzf_compress(data)
  assert comp is not None
  assert _py_inflate(comp) == data


def test_native_crc32c_matches_table():
  data = b'tfrecord framing bytes' * 999
  table_crc = 0 ^ 0xFFFFFFFF
  for b in data:
    table_crc = (table_crc >> 8) ^ int(
        tfrecord._CRC_TABLE[(table_crc ^ b) & 0xFF]
    )
  assert native.crc32c(data) == table_crc ^ 0xFFFFFFFF


def test_eager_and_streaming_readers_agree():
  eager = list(bam.BamReader(f'{HUMAN_1M}/ccs.bam', eager=True))
  stream = list(bam.BamReader(f'{HUMAN_1M}/ccs.bam', eager=False))
  assert len(eager) == len(stream) == 10
  for a, b in zip(eager, stream):
    assert a.qname == b.qname and a.seq == b.seq


def test_native_bam_scan_offsets():
  raw = open(f'{HUMAN_1M}/ccs.bam', 'rb').read()
  buf = native.bgzf_decompress_all(raw)
  # Skip header: magic, text, refs.
  (l_text,) = struct.unpack_from('<i', buf, 4)
  off = 8 + l_text
  (n_ref,) = struct.unpack_from('<i', buf, off)
  off += 4
  for _ in range(n_ref):
    (l_name,) = struct.unpack_from('<i', buf, off)
    off += 4 + l_name + 4
  scan = native.bam_scan(buf, off)
  assert scan is not None
  assert len(scan['offsets']) == 10
  recs = list(bam.BamReader(f'{HUMAN_1M}/ccs.bam'))
  for i, rec in enumerate(recs):
    assert scan['l_seqs'][i] == len(rec.seq)
    assert scan['flags'][i] == rec.flag
    assert scan['positions'][i] == rec.pos


def test_corrupt_bgzf_returns_none_not_crash():
  raw = bytearray(open(f'{HUMAN_1M}/ccs.bam', 'rb').read())
  # Shrink the first member's BSIZE so clen = bsize-12-xlen-8 goes negative;
  # the header scan must reject the member instead of wrapping the length.
  xlen = struct.unpack('<H', bytes(raw[10:12]))[0]
  struct.pack_into('<H', raw, 16, 12 + xlen + 8 - 2 - 1)
  assert native.bgzf_decompress_all(bytes(raw)) is None
  # Truncated file (member claims more bytes than the buffer holds).
  raw2 = open(f'{HUMAN_1M}/ccs.bam', 'rb').read()[:100]
  assert native.bgzf_decompress_all(raw2) is None


def test_bam_scan_tiny_records_not_truncated():
  # Records far below the 40-byte sizing heuristic (empty seq/cigar, 1-char
  # names): the scan must grow its capacity, not silently drop the tail.
  rec = struct.pack('<iiiBBHHHiiii', 32 + 2, -1, -1, 2, 0, 4680, 0, 0, 0, -1,
                    -1, 0) + b'q\x00'
  buf = rec * 500
  scan = native.bam_scan(buf, 0)
  assert scan is not None
  assert len(scan['offsets']) == 500
  batch = native.bam_parse_batch(buf, scan)
  assert batch is not None
  assert bytes(batch['name']) == b'q' * 500


def test_parse_batch_rejects_corrupt_scan_fields():
  import numpy as np

  rec = struct.pack('<iiiBBHHHiiii', 32 + 2, -1, -1, 2, 0, 4680, 0, 0, 0, -1,
                    -1, 0) + b'q\x00'
  scan = native.bam_scan(rec, 0)
  assert scan is not None
  bad = dict(scan)
  bad['name_lens'] = scan['name_lens'] - 2  # l_read_name < 1
  assert native.bam_parse_batch(rec, bad) is None
  bad = dict(scan)
  bad['l_seqs'] = scan['l_seqs'] - 5  # negative sequence length
  assert native.bam_parse_batch(rec, bad) is None
