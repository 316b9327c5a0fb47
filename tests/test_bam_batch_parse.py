"""Native columnar BAM batch parser == pure-Python per-record parser.

The libdcio dc_bam_parse_batch path decodes every record's fields (names,
cigar, 4-bit seq, quals) and the hot PacBio tags (zm/pw/ip/sn/ec/np/rq) in
one threaded C pass; these tests pin it record-for-record and tag-for-tag
against the pure-Python parser on all bundled BAMs (reference:
preprocess/pre_lib.py:50-91 relies on pysam/htslib for the same decode).
"""

import numpy as np
import pytest

from deepconsensus_tpu.io import bam

TESTDATA = '/root/reference/deepconsensus/testdata/human_1m'
BAMS = ['subreads_to_ccs.bam', 'ccs.bam', 'truth_to_ccs.bam']


def _native_available() -> bool:
  from deepconsensus_tpu import native

  lib = native.get_lib()
  return lib is not None and hasattr(lib, 'dc_bam_parse_batch_mt')


pytestmark = pytest.mark.skipif(
    not _native_available(), reason='libdcio not built'
)


@pytest.mark.parametrize('name', BAMS)
def test_batch_parse_matches_python(name):
  path = f'{TESTDATA}/{name}'
  fast = bam.BamReader(path, native=True)
  slow = bam.BamReader(path, native=False)
  assert fast._fast_records is not None, 'native batch parse did not engage'
  n = 0
  for a, b in zip(fast, slow):
    n += 1
    assert a.qname == b.qname
    assert a.flag == b.flag
    assert a.ref_id == b.ref_id
    assert a.pos == b.pos
    assert a.mapq == b.mapq
    assert a.cigartuples == b.cigartuples
    assert a.seq == b.seq
    assert (a.qual is None) == (b.qual is None)
    if a.qual is not None:
      assert np.array_equal(a.qual, b.qual)
    ta, tb = dict(a.tags), dict(b.tags)
    assert set(ta) == set(tb)
    for k in tb:
      va, vb = ta[k], tb[k]
      if isinstance(vb, np.ndarray):
        assert np.array_equal(
            np.asarray(va, np.float64), np.asarray(vb, np.float64)
        ), (name, a.qname, k)
      else:
        assert va == vb, (name, a.qname, k)
  # Both readers exhausted together.
  assert next(iter(slow), None) is None
  assert n > 0


def test_fast_tag_miss_is_authoritative():
  """A fast-set tag absent from the record answers without a blob parse."""
  path = f'{TESTDATA}/truth_to_ccs.bam'
  rec = next(bam.BamReader(path, native=True))
  # Truth alignments carry no pw/ip: the miss must be answered from the
  # completeness flag, and get_tag must raise.
  assert rec._fast_tags is not None
  if rec._fast_complete:
    assert not rec.has_tag('pw')
    with pytest.raises(KeyError):
      rec.get_tag('pw')
  # Non-fast tags still resolve through the blob parser.
  assert isinstance(dict(rec.tags), dict)


def test_set_tag_before_and_after_full_parse():
  path = f'{TESTDATA}/subreads_to_ccs.bam'
  rec = next(bam.BamReader(path, native=True))
  orig_pw = np.asarray(rec.get_tag('pw')).copy()
  # Pre-parse set_tag lands in the fast dict and survives the full parse.
  rec.set_tag('pw', orig_pw[:5])
  assert len(rec.get_tag('pw')) == 5
  full = rec.tags  # triggers blob parse + merge
  assert len(full['pw']) == 5
  # Post-parse set_tag mutates the merged dict.
  rec.set_tag('pw', orig_pw[:3])
  assert len(rec.get_tag('pw')) == 3


def test_writer_roundtrip_from_fast_records(tmp_path):
  """Records built by the batch parser can be re-serialized (memoryview
  tag blobs included) and re-read identically."""
  src = f'{TESTDATA}/ccs.bam'
  reader = bam.BamReader(src, native=True)
  out = str(tmp_path / 'roundtrip.bam')
  with bam.BamWriter(out, reader.header) as w:
    records = list(reader)
    for rec in records:
      w.write_record(rec)
  back = list(bam.BamReader(out, native=False))
  assert len(back) == len(records)
  for a, b in zip(records, back):
    assert a.qname == b.qname
    assert a.seq == b.seq
    assert set(dict(a.tags)) == set(dict(b.tags))
