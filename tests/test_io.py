"""IO layer tests: BGZF, BAM, TFRecord, tf.train.Example codec."""

import os
import tempfile

import numpy as np
import pytest

from deepconsensus_tpu.io import bam, bgzf, example_pb, tfrecord
from tests.conftest import HUMAN_1M


def test_bgzf_roundtrip():
  data = os.urandom(300_000) + b'tail'
  path = tempfile.mktemp(suffix='.gz')
  with bgzf.BgzfWriter(path) as w:
    w.write(data)
  with bgzf.BgzfReader(path) as r:
    assert r.read_all() == data
  # Array form (threaded native inflate) yields identical bytes.
  with bgzf.BgzfReader(path) as r:
    arr = r.read_all(as_array=True)
    assert bytes(arr) == data
  os.unlink(path)


def test_bgzf_many_members_threaded_inflate():
  """>8 BGZF members takes the parallel-inflate path (one per thread)."""
  rng = np.random.default_rng(7)
  # Compressible + incompressible mix across ~23 members (64KB chunks).
  data = (
      rng.integers(0, 4, 700_000, dtype=np.uint8).tobytes()
      + os.urandom(800_000)
  )
  path = tempfile.mktemp(suffix='.gz')
  with bgzf.BgzfWriter(path) as w:
    w.write(data)
  with bgzf.BgzfReader(path) as r:
    assert r.read_all() == data
  with bgzf.BgzfReader(path) as r:
    arr = r.read_all(as_array=True)
    assert bytes(arr) == data
  os.unlink(path)


def test_bam_reader_bundled_counts():
  header, recs = bam.read_all(f'{HUMAN_1M}/subreads_to_ccs.bam')
  assert len(recs) == 93
  assert len(header.references) == 10
  zmws = {r.get_tag('zm') for r in recs}
  assert len(zmws) == 10
  r = recs[0]
  assert len(r.seq) == 7185
  # The native batch parser widens pw/ip to uint16 (B,S subtype support);
  # values are identical either way and downstream astype(uint8) agrees.
  pw = r.get_tag('pw')
  assert pw.dtype in (np.uint8, np.uint16)
  assert int(pw.max()) <= 255
  assert r.get_tag('sn').shape == (4,)


def test_bam_roundtrip():
  header, recs = bam.read_all(f'{HUMAN_1M}/ccs.bam')
  path = tempfile.mktemp(suffix='.bam')
  with bam.BamWriter(path, header) as w:
    for r in recs:
      w.write_record(r)
  header2, recs2 = bam.read_all(path)
  assert header2.text == header.text
  assert [r.qname for r in recs2] == [r.qname for r in recs]
  for a, b in zip(recs, recs2):
    assert a.seq == b.seq
    assert np.array_equal(a.qual, b.qual)
    assert a.cigartuples == b.cigartuples
    assert a.get_tag('RG') == b.get_tag('RG')
    assert a.get_tag('np') == b.get_tag('np')
  os.unlink(path)


def test_bam_reader_rejects_garbage():
  with pytest.raises(bgzf.BgzfError):
    bam.BamReader(f'{HUMAN_1M}/truth.bed')


def test_example_codec_roundtrip():
  arr = np.arange(12, dtype=np.float32)
  feats = {
      'subreads/encoded': ('bytes', [arr.tobytes()]),
      'subreads/shape': ('int64', [3, 4, 1]),
      'name': ('bytes', [b'movie/1/ccs']),
      'floats': ('float', [1.5, -2.25]),
  }
  buf = example_pb.encode_example(feats)
  out = example_pb.decode_example(buf)
  assert out['subreads/shape'][1] == [3, 4, 1]
  assert out['name'][1] == [b'movie/1/ccs']
  assert np.array_equal(
      np.frombuffer(out['subreads/encoded'][1][0], np.float32), arr
  )
  assert out['floats'][1] == [1.5, -2.25]


def test_example_codec_reads_reference_goldens():
  path = f'{HUMAN_1M}/tf_examples/train/train.tfrecord.gz'
  recs = list(tfrecord.read_tfrecords(path, verify=True))
  assert len(recs) == 1239
  ex = example_pb.decode_example(recs[0])
  assert ex['subreads/shape'][1] == [85, 100, 1]
  assert len(ex['ccs_base_quality_scores'][1]) == 100


def test_tfrecord_roundtrip():
  path = tempfile.mktemp(suffix='.tfrecord.gz')
  payloads = [b'alpha', b'beta' * 1000, b'']
  with tfrecord.TFRecordWriter(path) as w:
    for p in payloads:
      w.write(p)
  got = list(tfrecord.read_tfrecords(path, verify=True))
  assert got == payloads
  os.unlink(path)
