"""Failure-path robustness: corrupt/truncated/empty inputs fail loudly."""

import gzip
import struct

import numpy as np
import pytest

from deepconsensus_tpu.io import bam, bgzf, tfrecord
from deepconsensus_tpu.preprocess import feeder, windows
from tests.conftest import HUMAN_1M


def test_truncated_bam_record_raises(tmp_path):
  header, recs = bam.read_all(f'{HUMAN_1M}/ccs.bam')
  path = str(tmp_path / 'trunc.bam')
  with bam.BamWriter(path, header) as w:
    w.write_record(recs[0])
  raw = open(path, 'rb').read()
  # Rewrite without the BGZF EOF marker and with the last block cut short:
  # inflate then re-frame a truncated byte stream.
  with bgzf.BgzfReader(path) as r:
    data = r.read_all()
  cut = str(tmp_path / 'cut.bam')
  with bgzf.BgzfWriter(cut) as w:
    w.write(data[: len(data) - 37])
  with pytest.raises(IOError):
    list(bam.BamReader(cut))
  del raw


def test_tfrecord_crc_violation_detected(tmp_path):
  path = str(tmp_path / 'x.tfrecord.gz')
  with tfrecord.TFRecordWriter(path) as w:
    w.write(b'payload-bytes-here')
  blob = bytearray(gzip.decompress(open(path, 'rb').read()))
  blob[12 + 5] ^= 0xFF  # flip a payload byte
  with open(path, 'wb') as f:
    f.write(gzip.compress(bytes(blob)))
  with pytest.raises(IOError, match='CRC'):
    list(tfrecord.read_tfrecords(path, verify=True))
  # Without verification the corrupted payload is surfaced as-is.
  recs = list(tfrecord.read_tfrecords(path, verify=False))
  assert len(recs) == 1 and recs[0] != b'payload-bytes-here'


def test_empty_bam_yields_no_zmws(tmp_path):
  header, _ = bam.read_all(f'{HUMAN_1M}/subreads_to_ccs.bam')
  empty = str(tmp_path / 'empty.bam')
  with bam.BamWriter(empty, header):
    pass
  dc = windows.DcConfig(20, 100, False)
  proc, counter = feeder.create_proc_feeder(
      subreads_to_ccs=empty, ccs_bam=f'{HUMAN_1M}/ccs.bam', dc_config=dc
  )
  assert list(proc()) == []
  assert counter['n_zmw_pass'] == 0


def test_unmapped_only_bam_yields_no_zmws(tmp_path):
  header, recs = bam.read_all(f'{HUMAN_1M}/subreads_to_ccs.bam')
  path = str(tmp_path / 'unmapped.bam')
  with bam.BamWriter(path, header) as w:
    for rec in recs[:5]:
      rec.flag |= bam.FLAG_UNMAPPED
      w.write_record(rec)
  dc = windows.DcConfig(20, 100, False)
  proc, counter = feeder.create_proc_feeder(
      subreads_to_ccs=path, ccs_bam=f'{HUMAN_1M}/ccs.bam', dc_config=dc
  )
  assert list(proc()) == []


def test_missing_ccs_read_skips_zmw(tmp_path):
  # Subreads referencing a CCS name absent from ccs.bam: the reference
  # kills the whole shard (pre_lib.py:1324-1326); owning the BAM layer we
  # instead skip+count that ZMW and keep processing the rest.
  header, subs = bam.read_all(f'{HUMAN_1M}/subreads_to_ccs.bam')
  ccs_header, ccs = bam.read_all(f'{HUMAN_1M}/ccs.bam')
  short_ccs = str(tmp_path / 'short_ccs.bam')
  with bam.BamWriter(short_ccs, ccs_header) as w:
    for rec in ccs[:1]:
      w.write_record(rec)
  dc = windows.DcConfig(20, 100, False)
  proc, counter = feeder.create_proc_feeder(
      subreads_to_ccs=f'{HUMAN_1M}/subreads_to_ccs.bam',
      ccs_bam=short_ccs,
      dc_config=dc,
  )
  yielded = [zmw for _, zmw, _, _, _ in proc()]
  assert yielded == [ccs[0].qname]
  assert counter['n_zmw_missing_ccs_record'] == len(ccs) - 1
  assert counter['n_zmw_pass'] == 1


def test_out_of_order_ccs_bam_resyncs(tmp_path):
  # A ccs.bam whose record order diverges from subreads_to_ccs: records
  # scanned past are parked and found later, so every ZMW still pairs up
  # (the reference would raise after exhausting its forward scan).
  ccs_header, ccs = bam.read_all(f'{HUMAN_1M}/ccs.bam')
  shuffled = str(tmp_path / 'shuffled_ccs.bam')
  with bam.BamWriter(shuffled, ccs_header) as w:
    for rec in reversed(ccs):
      w.write_record(rec)
  dc = windows.DcConfig(20, 100, False)
  proc, counter = feeder.create_proc_feeder(
      subreads_to_ccs=f'{HUMAN_1M}/subreads_to_ccs.bam',
      ccs_bam=shuffled,
      dc_config=dc,
  )
  yielded = [zmw for _, zmw, _, _, _ in proc()]
  assert sorted(yielded) == sorted(r.qname for r in ccs)
  assert counter['n_zmw_missing_ccs_record'] == 0
  assert counter['n_zmw_pass'] == len(ccs)


def test_malformed_window_values_do_not_nan(tmp_path):
  """Out-of-range feature ids clamp in the embedding gather (mode='clip')."""
  import jax

  from deepconsensus_tpu.models import configs, model as model_lib

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.num_hidden_layers = 1
    params.filter_size = 32
    params.transformer_input_size = 16
  configs.finalize_params(params)
  m = model_lib.get_model(params)
  v = model_lib.init_params(m, params)
  rows = np.full((1, params.total_rows, 100, 1), 7.0, np.float32)  # strand=7!
  out = m.apply(v, rows, deterministic=True)
  assert bool(np.isfinite(np.asarray(out)).all())


def test_partial_size_field_is_truncation_not_eof(tmp_path):
  """1-3 trailing bytes after the last record (a size field cut
  mid-write) must raise IOError, not parse as a clean EOF."""
  from deepconsensus_tpu.io import bam, bgzf

  td = '/root/reference/deepconsensus/testdata/human_1m'
  with bam.BamReader(f'{td}/ccs.bam') as r:
    header = r.header
    recs = list(r)
  path = str(tmp_path / 'cut.bam')
  with bam.BamWriter(path, header) as w:
    w.write_record(recs[0])
  # Append a partial size field inside a fresh BGZF member.
  with open(path, 'rb') as f:
    payload = f.read()
  with open(path, 'wb') as f:
    f.write(payload[: len(payload) - len(bgzf._BGZF_EOF)])
    w2 = bgzf.BgzfWriter(f)
    w2.write(b'\x01\x02')  # 2 of 4 size-field bytes
    w2.close()
  with pytest.raises(IOError, match='size field'):
    with bam.BamReader(path) as r:
      list(r)


def test_set_tag_survives_write_record(tmp_path):
  """set_tag modifications must reach the output BAM (the writer used to
  serialize the stale raw tag blob)."""
  import numpy as np

  from deepconsensus_tpu.io import bam

  td = '/root/reference/deepconsensus/testdata/human_1m'
  with bam.BamReader(f'{td}/subreads_to_ccs.bam') as r:
    header = r.header
    rec = next(iter(r))
  rec.set_tag('pw', np.asarray(rec.get_tag('pw'))[:5])
  rec.set_tag('zz', 42)
  path = str(tmp_path / 'tagged.bam')
  with bam.BamWriter(path, header) as w:
    w.write_record(rec)
  with bam.BamReader(path) as r:
    out = next(iter(r))
  assert len(np.asarray(out.get_tag('pw'))) == 5
  assert out.get_tag('zz') == 42


def test_int_array_tags_encode_at_narrowest_width():
  """Integer 'B' tags encode at the narrowest width their VALUES fit, so
  re-encoded bytes don't depend on which parser (native uint16 fast path
  vs pure-Python stored-subtype path) produced the in-memory array."""
  import numpy as np

  from deepconsensus_tpu.io import bam

  assert bam.encode_tag('pw', [10, 12, 9])[2:4] == b'BC'
  assert bam.encode_tag('pw', np.asarray([10, 300], np.uint16))[2:4] == b'BS'
  # Same VALUES in different dtypes -> identical bytes.
  assert bam.encode_tag('pw', np.asarray([1, 2], np.uint16)) == bam.encode_tag(
      'pw', np.asarray([1, 2], np.uint8)
  )
  assert bam.encode_tag('xx', [-3, 200])[2:4] == b'Bs'
  with pytest.raises(ValueError, match='32-bit'):
    bam.encode_tag('pw', np.asarray([2**40]))


def test_dirty_reencode_preserves_unmodified_tag_bytes(tmp_path):
  """set_tag on one tag must not corrupt the encodings of the others.

  Regression (advisor r4): a uint32 'I' tag >= 2**31 used to re-encode as
  'i' and raise struct.error; 'A' and 'H' tags silently normalized to 'Z'.
  The splice re-encode keeps unmodified tags' original bytes verbatim.
  """
  import struct

  from deepconsensus_tpu.io import bam

  header = bam.BamHeader(text='@HD\tVN:1.5\n', references=[])
  rec = bam.parse_record(
      bam.build_record_blob(
          'm/1/ccs',
          4,
          'ACGT',
          None,
          tags=(
              b'xaA' + b'Q'                       # 'A' single char
              + b'xbI' + struct.pack('<I', 2**31 + 7)  # uint32 > int31
              + b'xcH' + b'1AFF\x00'              # hex byte string
              + b'xdi' + struct.pack('<i', -3)
          ),
      )
  )
  assert rec.get_tag('xb') == 2**31 + 7
  rec.set_tag('xd', 99)           # modify one tag
  rec.set_tag('xe', 2**31 + 1)    # new tag needing the 'I' code
  path = str(tmp_path / 'types.bam')
  with bam.BamWriter(path, header) as w:
    w.write_record(rec)
  with bam.BamReader(path) as r:
    out = next(iter(r))
  blob = bytes(out._tag_blob)  # pylint: disable=protected-access
  spans = {name: blob[s + 2 : s + 3] for name, s, _ in bam._iter_tag_spans(blob)}  # pylint: disable=protected-access
  assert spans['xa'] == b'A' and spans['xc'] == b'H'
  assert spans['xb'] == b'I' and out.get_tag('xb') == 2**31 + 7
  assert out.get_tag('xd') == 99
  assert spans['xe'] == b'I' and out.get_tag('xe') == 2**31 + 1


def test_failed_run_preserves_existing_output(tmp_path):
  """A run that dies during setup must not truncate a pre-existing file
  at --output (review r5: the background weight upload defers some
  errors past writer construction, so the sink opens lazily)."""
  from deepconsensus_tpu.inference import engine
  from deepconsensus_tpu.postprocess import stitch

  out = tmp_path / 'precious.fastq'
  out.write_text('@keep\nACGT\n+\nIIII\n')
  td = '/root/reference/deepconsensus/testdata/human_1m'
  w = engine.OutputWriter(str(out), f'{td}/ccs.bam')
  # Failure path: close without materializing — file untouched.
  w.close(materialize=False)
  assert out.read_text() == '@keep\nACGT\n+\nIIII\n'

  # Success path with zero reads: the (empty) file IS created.
  w2 = engine.OutputWriter(str(out), f'{td}/ccs.bam')
  w2.close()
  assert out.read_text() == ''

  # Writes still work through the lazy open.
  w3 = engine.OutputWriter(str(out), f'{td}/ccs.bam')
  pred = stitch.DCModelOutput(
      molecule_name='m/1/ccs', window_pos=0, sequence='ACGT',
      quality_string='IIII',
  )
  w3.write('@m/1/ccs\nACGT\n+\nIIII\n', pred)
  w3.close()
  assert out.read_text().startswith('@m/1/ccs')


def test_run_eval_rejects_oversubscribed_devices(tmp_path):
  from deepconsensus_tpu.train import evaluate

  with pytest.raises(ValueError, match='available'):
    evaluate.run_eval(
        '/root/repo/models_out/toy_model', str(tmp_path), limit=8,
        batch_size=4, num_devices=512,
    )
