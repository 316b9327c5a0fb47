"""Synthesizes an N-fold replicated shard from the bundled 10-ZMW testdata.

Each copy renames ZMWs (qname + zm tag) and remaps subread ref_ids to a
correspondingly renamed CCS reference, producing a structurally valid
larger shard for throughput measurement. Usage:

    python tools/make_big_shard.py OUT_DIR COPIES
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from deepconsensus_tpu.io import bam

TESTDATA = os.environ.get(
    'DC_TPU_TESTDATA', '/root/reference/deepconsensus/testdata/human_1m'
)
ZMW_STRIDE = 10_000_000


def rename(qname: str, copy: int) -> str:
  movie, zmw, rest = qname.split('/', 2)
  return f'{movie}/{int(zmw) + copy * ZMW_STRIDE}/{rest}'


def retag(rec: bam.BamRecord, copy: int) -> bytes:
  """Re-encodes the aux blob with an updated zm tag."""
  parts = []
  for name, value in rec.tags.items():
    if name == 'zm':
      value = int(value) + copy * ZMW_STRIDE
    if isinstance(value, float):
      hint = 'f'
    elif isinstance(value, (int, np.integer)):
      hint = 'i'
    elif isinstance(value, str):
      hint = 'Z'
    else:
      hint = 'B'
    parts.append(bam.encode_tag(name, value, hint))
  return b''.join(parts)


def main(out_dir: str, copies: int) -> None:
  os.makedirs(out_dir, exist_ok=True)
  sub_header, sub_recs = bam.read_all(f'{TESTDATA}/subreads_to_ccs.bam')
  ccs_header, ccs_recs = bam.read_all(f'{TESTDATA}/ccs.bam')

  new_refs = []
  for c in range(copies):
    for name, length in sub_header.references:
      new_refs.append((rename(name, c), length))
  big_header = bam.BamHeader(sub_header.text, new_refs)
  n_refs = len(sub_header.references)

  with bam.BamWriter(f'{out_dir}/subreads_to_ccs.bam', big_header) as w:
    for c in range(copies):
      for rec in sub_recs:
        blob = bam.build_record_blob(
            qname=rename(rec.qname, c),
            flag=rec.flag,
            seq=rec.seq,
            qual=rec.qual,
            tags=retag(rec, c),
            ref_id=rec.ref_id + c * n_refs,
            pos=rec.pos,
            mapq=rec.mapq,
            cigartuples=rec.cigartuples,
        )
        w.write_blob(blob)

  ccs_big_header = bam.BamHeader(ccs_header.text, new_refs)
  with bam.BamWriter(f'{out_dir}/ccs.bam', ccs_big_header) as w:
    for c in range(copies):
      for rec in ccs_recs:
        blob = bam.build_record_blob(
            qname=rename(rec.qname, c),
            flag=rec.flag,
            seq=rec.seq,
            qual=rec.qual,
            tags=retag(rec, c),
            ref_id=-1,
            pos=-1,
            mapq=rec.mapq,
            cigartuples=rec.cigartuples,
        )
        w.write_blob(blob)
  print(f'wrote {copies * len(ccs_recs)}-ZMW shard to {out_dir}')


if __name__ == '__main__':
  main(sys.argv[1], int(sys.argv[2]))
