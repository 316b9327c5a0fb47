"""CCS smart-window tests: variable window widths from the `wl` BAM tag.

The bundled testdata lacks `wl` tags, so a tagged copy of ccs.bam is
synthesized with this framework's own BAM writer
(reference behavior: pre_lib.py:625-650,1330-1331).
"""

import numpy as np
import pytest

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import bam
from deepconsensus_tpu.preprocess import feeder, windows
from tests.conftest import HUMAN_1M


@pytest.fixture(scope='module')
def wl_tagged_ccs(tmp_path_factory):
  """Copies ccs.bam adding per-read wl window widths (chunks of 90)."""
  path = str(tmp_path_factory.mktemp('wl') / 'ccs_wl.bam')
  header, recs = bam.read_all(f'{HUMAN_1M}/ccs.bam')
  with bam.BamWriter(path, header) as w:
    for rec in recs:
      n = len(rec.seq)
      widths = [90] * (n // 90)
      if n % 90:
        widths.append(n % 90)
      extra = bam.encode_tag('wl', np.array(widths, dtype=np.int32), 'B')
      w.write_record(rec, tags=bytes(rec._tag_blob) + extra)
  return path


def test_smart_windows_cover_all_bases(wl_tagged_ccs):
  dc = windows.DcConfig(20, 100, False)
  proc, counter = feeder.create_proc_feeder(
      subreads_to_ccs=f'{HUMAN_1M}/subreads_to_ccs.bam',
      ccs_bam=wl_tagged_ccs,
      dc_config=dc,
      ins_trim=5,
      use_ccs_smart_windows=True,
      limit=3,
  )
  n_windows = 0
  for reads, name, cfg, split, ww in proc():
    assert ww is not None and ww.sum() > 0
    stack = windows.subreads_to_zmw_stack(reads, name, cfg, ww)
    widths = stack.calculate_windows()
    # Spaced widths cover exactly the non-trailing-gap CCS span.
    assert sum(widths) == stack.ccs_width
    # Each spaced window must contain its wl-many CCS bases.
    start = 0
    gap = ord(constants.GAP)
    for ccs_bases, w in zip(ww, widths):
      window = stack.ccs.bases[start : start + w]
      assert int((window != gap).sum()) == ccs_bases
      start += w
    seen_bases = set()
    for wf in stack.iter_windows():
      n_windows += 1
      # window_pos values must be unique, in increasing order per ZMW.
      assert wf.window_pos not in seen_bases
      seen_bases.add(wf.window_pos)
  assert n_windows > 0


def test_smart_windows_overflow_emitted_for_inference(wl_tagged_ccs):
  """Spaced smart windows wider than max_length become overflow windows."""
  dc = windows.DcConfig(20, 100, False)
  proc, _ = feeder.create_proc_feeder(
      subreads_to_ccs=f'{HUMAN_1M}/subreads_to_ccs.bam',
      ccs_bam=wl_tagged_ccs,
      dc_config=dc,
      ins_trim=5,
      use_ccs_smart_windows=True,
      limit=5,
  )
  saw_overflow = False
  for reads, name, cfg, split, ww in proc():
    stack = windows.subreads_to_zmw_stack(reads, name, cfg, ww)
    for wf in stack.iter_windows():
      if wf.overflow:
        saw_overflow = True
        assert wf.subreads.shape[1] > 100
      else:
        assert wf.subreads.shape[1] == 100
  # With 90-base windows plus insertions, some spaced widths exceed 100.
  assert saw_overflow
