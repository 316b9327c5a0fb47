"""expand_clip_indent unit tests, ported from the reference's parameterized
cases (reference: preprocess/pre_lib_test.py:175-435)."""

import numpy as np
import pytest

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import bam
from deepconsensus_tpu.preprocess import reads as reads_lib

M, I, D, N, S, H, EQ, X = (
    constants.CMATCH,
    constants.CINS,
    constants.CDEL,
    constants.CREF_SKIP,
    constants.CSOFT_CLIP,
    constants.CHARD_CLIP,
    constants.CEQUAL,
    constants.CDIFF,
)


def make_record(
    bases, cigar, ip=None, pw=None, reference_start=0, is_reverse=False
):
  """Builds a BamRecord like the reference's create_segment helper."""
  rec = bam.BamRecord()
  rec.qname = 'movie/100/0_%d' % len(bases)
  rec.seq = bases
  rec.pos = reference_start
  rec.flag = bam.FLAG_REVERSE if is_reverse else 0
  rec.ref_id = 0
  # Parse cigar string like '4M4I4M'.
  tuples = []
  num = ''
  for c in cigar:
    if c.isdigit():
      num += c
    else:
      tuples.append((constants.CIGAR_OPS[c], int(num)))
      num = ''
  rec.cigartuples = tuples
  tags = {}
  tags['ip'] = np.asarray(ip if ip is not None else [0] * len(bases))
  tags['pw'] = np.asarray(pw if pw is not None else [0] * len(bases))
  tags['sn'] = np.array([1.0, 2.0, 3.0, 4.0])
  tags['zm'] = 100
  rec._tags = tags
  return rec


CASES = [
    # (kwargs, expected_bases, expected_cigar, expected_ip, expected_pw,
    #  expected_strand)
    (dict(bases='ATCG', cigar='4M'), 'ATCG', [M] * 4, None, None, None),
    (
        dict(bases='AAAATTTTAAAA', cigar='4M4I4M', ip=[1] * 12, pw=[2] * 12),
        'AAAATTTTAAAA', [M] * 4 + [I] * 4 + [M] * 4, [1] * 12, [2] * 12, None,
    ),
    (
        dict(bases='AAAAAAAA', cigar='4M4D4M', ip=[1] * 8, pw=[2] * 4 + [0] * 4),
        'AAAA    AAAA', [M] * 4 + [D] * 4 + [M] * 4,
        [1] * 4 + [0] * 4 + [1] * 4, [2] * 4 + [0] * 4 + [0] * 4, None,
    ),
    (
        dict(bases='AAAAAAAA', cigar='4N8M', ip=[1] * 8, pw=[2] * 8),
        '    AAAAAAAA', [N] * 4 + [M] * 8, [0] * 4 + [1] * 8,
        [0] * 4 + [2] * 8, None,
    ),
    (
        dict(bases='TTTTCGGAAC', cigar='5M5D5M', ip=[1] * 10, pw=[2] * 10),
        'TTTTC     GGAAC', [M] * 5 + [D] * 5 + [M] * 5,
        [1] * 5 + [0] * 5 + [1] * 5, [2] * 5 + [0] * 5 + [2] * 5, None,
    ),
    (
        dict(
            bases='TTTTCGGAACTTGGGAAGGG', cigar='5M5D5M5I5M',
            ip=[1] * 20, pw=[2] * 20,
        ),
        'TTTTC     GGAACTTGGGAAGGG',
        [M] * 5 + [D] * 5 + [M] * 5 + [I] * 5 + [M] * 5,
        [1] * 5 + [0] * 5 + [1] * 15, [2] * 5 + [0] * 5 + [2] * 15, None,
    ),
    (
        dict(
            bases='AAAATTTTAAAA', cigar='4S4M4S',
            ip=[0] * 4 + [1] * 4 + [0] * 4, pw=[0] * 4 + [2] * 4 + [0] * 4,
        ),
        'TTTT', [M] * 4, [1] * 4, [2] * 4, None,
    ),
    (
        dict(bases='TTTT', cigar='4H4M4H', ip=[1] * 4, pw=[2] * 4),
        'TTTT', [M] * 4, [1] * 4, [2] * 4, None,
    ),
    (
        dict(bases='AAAATTTTAAAA', cigar='4=4X4=', ip=[1] * 12, pw=[2] * 12),
        'AAAATTTTAAAA', [EQ] * 4 + [X] * 4 + [EQ] * 4, [1] * 12, [2] * 12,
        None,
    ),
    (
        dict(bases='TTTT', cigar='4M', reference_start=4, ip=[1] * 4,
             pw=[2] * 4),
        '    TTTT', [N] * 4 + [M] * 4, [0] * 4 + [1] * 4, [0] * 4 + [2] * 4,
        None,
    ),
    (
        dict(
            bases='AAAATTTT', cigar='4S4M', reference_start=4, ip=[1] * 8,
            pw=[2] * 8,
        ),
        '    TTTT', [N] * 4 + [M] * 4, [0] * 4 + [1] * 4, [0] * 4 + [2] * 4,
        None,
    ),
    (
        dict(bases='AAAA', cigar='4M', is_reverse=False),
        'AAAA', [M] * 4, None, None, constants.Strand.FORWARD,
    ),
    (
        dict(bases='AAAA', cigar='4M', is_reverse=True),
        'AAAA', [M] * 4, None, None, constants.Strand.REVERSE,
    ),
    (
        dict(bases='AAAA', cigar='4M', ip=[1, 2, 3, 4], pw=[1, 2, 3, 4],
             is_reverse=True),
        'AAAA', [M] * 4, [4, 3, 2, 1], [4, 3, 2, 1], constants.Strand.REVERSE,
    ),
    (
        dict(bases='AAAA', cigar='4M', ip=[1, 2, 3, 4], pw=[1, 2, 3, 4],
             is_reverse=False),
        'AAAA', [M] * 4, [1, 2, 3, 4], [1, 2, 3, 4], constants.Strand.FORWARD,
    ),
    (
        dict(bases='AAAA', cigar='4M', ip=[1, 2, 3, 4], pw=[1, 2, 3, 4],
             is_reverse=True, reference_start=2),
        '  AAAA', [N] * 2 + [M] * 4, [0, 0, 4, 3, 2, 1], [0, 0, 4, 3, 2, 1],
        constants.Strand.REVERSE,
    ),
    (
        dict(bases='AAAA', cigar='4M', ip=[1, 2, 3, 4], pw=[1, 2, 3, 4],
             is_reverse=False, reference_start=2),
        '  AAAA', [N] * 2 + [M] * 4, [0, 0, 1, 2, 3, 4], [0, 0, 1, 2, 3, 4],
        constants.Strand.FORWARD,
    ),
]


@pytest.mark.parametrize('case', CASES)
def test_expand_clip_indent(case):
  kwargs, exp_bases, exp_cigar, exp_ip, exp_pw, exp_strand = case
  rec = make_record(**kwargs)
  read = reads_lib.expand_clip_indent(rec)
  keep = read.cigar != constants.CHARD_CLIP
  assert read.bases[keep].tobytes().decode('ascii') == exp_bases
  assert read.cigar.tolist() == exp_cigar
  if exp_ip is not None:
    assert read.ip[keep].tolist() == exp_ip
    assert len(read.bases) == len(read.ip)
  if exp_pw is not None:
    assert read.pw[keep].tolist() == exp_pw
  if exp_strand is not None:
    assert read.strand == int(exp_strand)


def test_trim_insertions_removes_long_inserts():
  # (reference: pre_lib_test.py TestTrimInsertions semantics)
  rec = make_record(
      bases='AAAA' + 'TTTTTTTT' + 'CCCC',
      cigar='4M8I4M',
      ip=list(range(16)),
      pw=list(range(16)),
  )
  out = reads_lib.trim_insertions(rec, ins_trim=5)
  assert out.seq == 'AAAACCCC'
  assert out.cigartuples == [(M, 4), (M, 4)]
  assert list(out.get_tag('ip')) == list(range(4)) + list(range(12, 16))


def test_trim_insertions_reverse_strand_mask():
  rec = make_record(
      bases='AAAA' + 'TTTTTTTT' + 'CCCC',
      cigar='4M8I4M',
      ip=list(range(16)),
      pw=list(range(16)),
      is_reverse=True,
  )
  out = reads_lib.trim_insertions(rec, ins_trim=5)
  assert out.seq == 'AAAACCCC'
  # Reverse strand: the query-space mask applies reversed to the raw tag.
  assert list(out.get_tag('ip')) == list(range(0, 4)) + list(range(12, 16))


def test_trim_insertions_keeps_short():
  rec = make_record(
      bases='AAAATTCCCC', cigar='4M2I4M', ip=[1] * 10, pw=[1] * 10
  )
  out = reads_lib.trim_insertions(rec, ins_trim=5)
  assert out.seq == 'AAAATTCCCC'
  assert out.cigartuples == [(M, 4), (I, 2), (M, 4)]


def test_uint16_pw_ip_tags_wrap_like_reference():
  """PacBio 'B,S' (uint16) pw/ip arrays are legal; values > 255 WRAP
  modulo 256 — exactly what the reference does (pre_lib.py:1165-1186
  assigns the raw tag array into a uint8 buffer; numpy assignment wraps
  300 -> 44), before the model-input PW_MAX clip ever sees the values.
  Pinned so a well-meaning clip "fix" can't silently break featurization
  bit-parity for wide kinetics tags (review r5 caught exactly that)."""
  rec = make_record(
      'ACGT', '4M',
      pw=np.asarray([1, 300, 255, 1000], np.uint16),
      ip=np.asarray([700, 2, 256, 65535], np.uint16),
  )
  out = reads_lib.expand_clip_indent(rec)
  np.testing.assert_array_equal(out.pw, np.asarray([1, 300, 255, 1000]).astype(np.uint8))
  np.testing.assert_array_equal(out.ip, np.asarray([700, 2, 256, 65535]).astype(np.uint8))
