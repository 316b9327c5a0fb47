"""Minimal, dependency-free BAM reader/writer (SAM spec v1.6 §4).

Replaces the reference's pysam/htslib usage (`reference:
preprocess/pre_lib.py:50-91`, `inference/quick_inference.py:894-897`) with a
pure-Python + numpy implementation covering the slice of BAM this framework
needs: sequential streaming, the aux tags used by PacBio CCS polishing
(zm/pw/ip/sn/ec/np/rq/RG/wl), CIGAR access, qualities, and unmapped-record
output. A C++ fast path can replace the inner record parser without changing
this interface.
"""

import struct
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

from deepconsensus_tpu import constants
from deepconsensus_tpu.io import bgzf

_BAM_MAGIC = b'BAM\x01'

# 4-bit encoded sequence alphabet.
_SEQ_NIBBLE = '=ACMGRSVTWYHKDBN'
_NIBBLE_TO_CHAR = np.frombuffer(_SEQ_NIBBLE.encode(), dtype=np.uint8)
_CHAR_TO_NIBBLE = np.zeros(256, dtype=np.uint8)
for _i, _c in enumerate(_SEQ_NIBBLE):
  _CHAR_TO_NIBBLE[ord(_c)] = _i
  _CHAR_TO_NIBBLE[ord(_c.lower())] = _i

_TAG_FMT = {
    ord('c'): ('b', 1),
    ord('C'): ('B', 1),
    ord('s'): ('h', 2),
    ord('S'): ('H', 2),
    ord('i'): ('i', 4),
    ord('I'): ('I', 4),
    ord('f'): ('f', 4),
    ord('A'): ('c', 1),
}
_ARRAY_DTYPES = {
    ord('c'): np.int8,
    ord('C'): np.uint8,
    ord('s'): np.int16,
    ord('S'): np.uint16,
    ord('i'): np.int32,
    ord('I'): np.uint32,
    ord('f'): np.float32,
}

FLAG_UNMAPPED = 0x4
FLAG_REVERSE = 0x10
FLAG_SECONDARY = 0x100
FLAG_SUPPLEMENTARY = 0x800

# Tags the native batch parser (libdcio dc_bam_parse_batch) pre-extracts.
_FAST_TAG_NAMES = frozenset(('zm', 'pw', 'ip', 'sn', 'ec', 'np', 'rq'))


class BamHeader:
  """BAM header: SAM text + reference dictionary."""

  def __init__(self, text: str, references: List[Tuple[str, int]]):
    self.text = text
    self.references = references
    self.ref_names = [r[0] for r in references]
    self._name_to_id = {n: i for i, n in enumerate(self.ref_names)}

  def ref_id(self, name: str) -> int:
    return self._name_to_id.get(name, -1)

  def ref_name(self, rid: int) -> Optional[str]:
    if 0 <= rid < len(self.ref_names):
      return self.ref_names[rid]
    return None


class BamRecord:
  """One BAM alignment record with decoded fields.

  Attributes mirror (a subset of) the pysam AlignedSegment surface the
  reference relies on, so preprocessing code reads naturally.
  """

  __slots__ = (
      'qname',
      'flag',
      'ref_id',
      'pos',
      'mapq',
      'next_ref_id',
      'next_pos',
      'tlen',
      '_cigar_raw',
      '_cigartuples',
      'qual',
      '_seq_packed',
      '_l_seq',
      '_seq_bytes',
      '_seq_str',
      '_tag_blob',
      '_tags',
      '_fast_tags',
      '_fast_complete',
      '_tags_dirty',
      '_tags_modified',
      'header',
  )

  def __init__(self):
    self.qname = ''
    self.flag = 0
    self.ref_id = -1
    self.pos = -1
    self.mapq = 0
    # Mate-pair fields: not used by the CCS pipeline itself but preserved
    # through read->write round trips (review r5: they were silently
    # zeroed for arbitrary mapped records).
    self.next_ref_id = -1
    self.next_pos = -1
    self.tlen = 0
    self._cigar_raw: Optional[np.ndarray] = None  # raw u32 op words
    self._cigartuples: Optional[List[Tuple[int, int]]] = None
    self.qual: Optional[np.ndarray] = None
    self._seq_packed: Optional[bytes] = None
    self._l_seq = 0
    self._seq_bytes: Optional[np.ndarray] = None
    self._seq_str: Optional[str] = None
    self._tag_blob: bytes = b''
    self._tags_dirty = False
    self._tags_modified: Optional[set] = None
    self._tags: Optional[Dict[str, Any]] = None
    # Tags pre-extracted by the native batch parser (zm/pw/ip/sn/ec/np/rq).
    # Takes precedence over the blob; merged into _tags on full parse.
    # _fast_complete=True means the native parser saw every fast-name tag,
    # so a miss in _fast_tags proves absence without parsing the blob.
    self._fast_tags: Optional[Dict[str, Any]] = None
    self._fast_complete = False
    self.header: Optional[BamHeader] = None

  # -- cigar access (lazy decode from raw u32 words) ----------------------
  @property
  def cigar_ops(self) -> np.ndarray:
    if self._cigar_raw is not None:
      return (self._cigar_raw & 0xF).astype(np.uint8)
    return np.array([op for op, _ in self.cigartuples], dtype=np.uint8)

  @property
  def cigar_lens(self) -> np.ndarray:
    if self._cigar_raw is not None:
      return (self._cigar_raw >> 4).astype(np.int64)
    return np.array([l for _, l in self.cigartuples], dtype=np.int64)

  @property
  def cigartuples(self) -> List[Tuple[int, int]]:
    if self._cigartuples is None:
      if self._cigar_raw is None:
        self._cigartuples = []
      else:
        raw = self._cigar_raw
        self._cigartuples = list(
            zip((raw & 0xF).tolist(), (raw >> 4).tolist())
        )
    return self._cigartuples

  @cigartuples.setter
  def cigartuples(self, value: List[Tuple[int, int]]) -> None:
    self._cigartuples = value
    self._cigar_raw = None

  # -- sequence access (lazy 4-bit decode) -------------------------------
  @property
  def seq_bytes(self) -> np.ndarray:
    """Sequence as uint8 ASCII codes (decoded from 4-bit lazily, cached)."""
    if self._seq_bytes is None:
      if self._seq_str is not None:
        self._seq_bytes = np.frombuffer(
            self._seq_str.encode('ascii'), dtype=np.uint8
        )
      elif self._seq_packed is not None:
        raw = np.frombuffer(self._seq_packed, dtype=np.uint8)
        nibbles = np.empty(len(raw) * 2, dtype=np.uint8)
        nibbles[0::2] = raw >> 4
        nibbles[1::2] = raw & 0x0F
        self._seq_bytes = _NIBBLE_TO_CHAR[nibbles[: self._l_seq]]
      else:
        self._seq_bytes = np.empty(0, dtype=np.uint8)
    return self._seq_bytes

  @property
  def seq_len(self) -> int:
    if self._seq_str is not None:
      return len(self._seq_str)
    if self._seq_bytes is not None:
      return len(self._seq_bytes)
    return self._l_seq

  @property
  def seq(self) -> str:
    if self._seq_str is None:
      self._seq_str = self.seq_bytes.tobytes().decode('ascii')
    return self._seq_str

  @seq.setter
  def seq(self, value: str) -> None:
    self._seq_str = value
    self._seq_bytes = None
    self._seq_packed = None

  def set_seq_bytes(self, value: np.ndarray) -> None:
    """Replaces the sequence from uint8 ASCII codes without a str round trip."""
    self._seq_bytes = value
    self._seq_str = None
    self._seq_packed = None

  def set_cigar_arrays(self, ops: np.ndarray, lens: np.ndarray) -> None:
    """Replaces the cigar from (ops, lens) arrays without building tuples."""
    self._cigar_raw = (
        lens.astype(np.uint32) << 4 | ops.astype(np.uint32)
    )
    self._cigartuples = None

  # -- pysam-compatible conveniences -------------------------------------
  @property
  def is_unmapped(self) -> bool:
    return bool(self.flag & FLAG_UNMAPPED)

  @property
  def is_reverse(self) -> bool:
    return bool(self.flag & FLAG_REVERSE)

  @property
  def is_supplementary(self) -> bool:
    return bool(self.flag & FLAG_SUPPLEMENTARY)

  @property
  def reference_name(self) -> Optional[str]:
    if self.header is None:
      return None
    return self.header.ref_name(self.ref_id)

  @property
  def query_qualities(self) -> Optional[np.ndarray]:
    return self.qual

  @property
  def query_sequence(self) -> str:
    return self.seq

  @property
  def tags(self) -> Dict[str, Any]:
    if self._tags is None:
      blob = self._tag_blob
      if not isinstance(blob, (bytes, bytearray)):
        blob = bytes(blob)
      self._tags = _parse_tags(blob)
      if self._fast_tags:
        # Fast-path values win: set_tag may have updated them pre-parse.
        self._tags.update(self._fast_tags)
      self._fast_tags = None
    return self._tags

  def get_tag(self, name: str) -> Any:
    if self._fast_tags is not None:
      if name in self._fast_tags:
        return self._fast_tags[name]
      if self._fast_complete and name in _FAST_TAG_NAMES:
        raise KeyError(f'tag {name!r} not present on {self.qname}')
    try:
      return self.tags[name]
    except KeyError:
      raise KeyError(f'tag {name!r} not present on {self.qname}') from None

  def has_tag(self, name: str) -> bool:
    if self._fast_tags is not None:
      if name in self._fast_tags:
        return True
      if self._fast_complete and name in _FAST_TAG_NAMES:
        return False
    return name in self.tags

  def set_tag(self, name: str, value: Any) -> None:
    self._tags_dirty = True
    if self._tags_modified is None:
      self._tags_modified = set()
    self._tags_modified.add(name)
    if self._tags is None and self._fast_tags is not None:
      self._fast_tags[name] = value
    else:
      self.tags[name] = value

  @property
  def query_alignment_start(self) -> int:
    """Query index of the first non-clipped base."""
    qstart = 0
    ops = self.cigar_ops
    lens = self.cigar_lens
    for i in range(len(ops)):
      if ops[i] == constants.CSOFT_CLIP:
        qstart += int(lens[i])
      elif ops[i] != constants.CHARD_CLIP:
        break
    return qstart

  @property
  def query_alignment_end(self) -> int:
    """Query index one past the last non-clipped base."""
    qend = self.seq_len
    ops = self.cigar_ops
    lens = self.cigar_lens
    for i in range(len(ops) - 1, -1, -1):
      if ops[i] == constants.CSOFT_CLIP:
        qend -= int(lens[i])
      elif ops[i] != constants.CHARD_CLIP:
        break
    return qend

  def expanded_cigar(self) -> np.ndarray:
    """Per-position cigar op codes (uint8), hard clips included."""
    return np.repeat(self.cigar_ops, self.cigar_lens)

  @property
  def cigar(self) -> List[Tuple[int, int]]:
    """pysam alias for cigartuples (reference pre_lib.py:1229)."""
    return self.cigartuples

  def get_aligned_pairs(self) -> List[Tuple[Optional[int], Optional[int]]]:
    """(query_pos, ref_pos) per alignment column, pysam semantics.

    M/=/X consume both; I and S consume query only (ref None); D and N
    consume reference only (query None); H and P emit nothing. Reference
    positions are absolute (offset by `pos`), matching
    pysam.AlignedSegment.get_aligned_pairs with default arguments — the
    contract reference pre_lib.py:1198-1204 (expand_clip_indent) relies on.
    """
    pairs: List[Tuple[Optional[int], Optional[int]]] = []
    qpos = 0
    rpos = self.pos
    for op, ln in zip(self.cigar_ops.tolist(), self.cigar_lens.tolist()):
      if op in (constants.CMATCH, constants.CEQUAL, constants.CDIFF):
        pairs.extend((qpos + i, rpos + i) for i in range(ln))
        qpos += ln
        rpos += ln
      elif op in (constants.CINS, constants.CSOFT_CLIP):
        pairs.extend((qpos + i, None) for i in range(ln))
        qpos += ln
      elif op in (constants.CDEL, constants.CREF_SKIP):
        pairs.extend((None, rpos + i) for i in range(ln))
        rpos += ln
    return pairs

  def __repr__(self):
    return (
        f'BamRecord({self.qname}, flag={self.flag}, ref={self.ref_id}, '
        f'pos={self.pos}, len={self.seq_len})'
    )


def _iter_tag_spans(blob: bytes):
  """Yields (name, start, end) byte spans for each aux tag in the blob."""
  off = 0
  n = len(blob)
  while off + 3 <= n:
    start = off
    name = blob[off : off + 2].decode('ascii')
    typ = blob[off + 2]
    off += 3
    if typ in _TAG_FMT:
      off += _TAG_FMT[typ][1]
    elif typ in (ord('Z'), ord('H')):
      off = blob.index(b'\x00', off) + 1
    elif typ == ord('B'):
      subtype = blob[off]
      (count,) = struct.unpack_from('<i', blob, off + 1)
      itemsize = np.dtype(_ARRAY_DTYPES[subtype]).itemsize
      off += 5 + count * itemsize
    else:
      raise ValueError(f'unsupported BAM tag type {chr(typ)!r}')
    yield name, start, off


def _parse_tags(blob: bytes) -> Dict[str, Any]:
  """Decodes the aux-tag region of a BAM record."""
  tags: Dict[str, Any] = {}
  for name, start, end in _iter_tag_spans(blob):
    typ = blob[start + 2]
    off = start + 3
    if typ in _TAG_FMT:
      fmt, _ = _TAG_FMT[typ]
      (val,) = struct.unpack_from('<' + fmt, blob, off)
      if typ == ord('A'):
        val = val.decode('ascii')
      tags[name] = val
    elif typ in (ord('Z'), ord('H')):
      tags[name] = blob[off : end - 1].decode('ascii')
    elif typ == ord('B'):
      dtype = _ARRAY_DTYPES[blob[off]]
      tags[name] = np.frombuffer(blob[off + 5 : end], dtype=dtype)
  return tags


def encode_seq(seq: str) -> bytes:
  """Packs an ASCII base string into BAM 4-bit encoding."""
  chars = np.frombuffer(seq.encode('ascii'), dtype=np.uint8)
  nibbles = _CHAR_TO_NIBBLE[chars]
  if len(nibbles) % 2:
    nibbles = np.concatenate([nibbles, np.zeros(1, dtype=np.uint8)])
  packed = (nibbles[0::2] << 4) | nibbles[1::2]
  return packed.tobytes()


def parse_record(blob: bytes, header: Optional[BamHeader] = None) -> BamRecord:
  """Parses one BAM record body (without the leading block_size int32)."""
  rec = BamRecord()
  rec.header = header
  (
      ref_id,
      pos,
      l_read_name,
      mapq,
      _bin,
      n_cigar_op,
      flag,
      l_seq,
      next_ref_id,
      next_pos,
      tlen,
  ) = struct.unpack_from('<iiBBHHHiiii', blob, 0)
  rec.ref_id = ref_id
  rec.pos = pos
  rec.mapq = mapq
  rec.flag = flag
  rec.next_ref_id = next_ref_id
  rec.next_pos = next_pos
  rec.tlen = tlen
  off = 32
  rec.qname = blob[off : off + l_read_name - 1].decode('ascii')
  off += l_read_name
  rec._cigar_raw = np.frombuffer(  # pylint: disable=protected-access
      blob[off : off + 4 * n_cigar_op], dtype='<u4'
  )
  off += 4 * n_cigar_op
  n_seq_bytes = (l_seq + 1) // 2
  rec._seq_packed = blob[off : off + n_seq_bytes]  # decoded lazily
  rec._l_seq = l_seq
  off += n_seq_bytes
  qual = np.frombuffer(blob[off : off + l_seq], dtype=np.uint8)
  rec.qual = None if (l_seq and qual.size and qual[0] == 0xFF) else qual.copy()
  off += l_seq
  rec._tag_blob = blob[off:]  # pylint: disable=protected-access
  return rec


def _records_from_batch(
    buf: bytes, header: Optional[BamHeader]
) -> Optional[List[BamRecord]]:
  """Builds all records from one native columnar parse (htslib-class speed).

  Field arrays are decoded in a single C pass (seq nibbles, quals, cigar
  words, names, and the hot PacBio tags); records hold zero-copy views into
  the columnar buffers. Returns None when libdcio is unavailable so the
  caller falls back to the per-record Python parser.
  """
  try:
    from deepconsensus_tpu import native
  except ImportError:
    return None
  scan = native.bam_scan(buf, 0)
  if scan is None:
    return None
  batch = native.bam_parse_batch(buf, scan)
  if batch is None:
    return None

  n = len(scan['offsets'])
  offsets = scan['offsets'].tolist()
  sizes = scan['sizes'].tolist()
  ref_ids = scan['ref_ids'].tolist()
  positions = scan['positions'].tolist()
  flags = scan['flags'].tolist()
  l_seqs = scan['l_seqs'].tolist()
  mapqs = scan['mapqs'].tolist()
  name_lens = scan['name_lens'].tolist()
  n_cigars = scan['n_cigars'].tolist()
  seq_starts = batch['seq_starts'].tolist()
  cigar_starts = batch['cigar_starts'].tolist()
  name_starts = batch['name_starts'].tolist()
  qual_missing = batch['qual_missing'].tolist()
  pw_lens = batch['pw_len'].tolist()
  ip_lens = batch['ip_len'].tolist()
  zms = batch['zm'].tolist()
  ecs = batch['ec'].tolist()
  nps = batch['np'].tolist()
  rqs = batch['rq'].tolist()
  presents = batch['present'].tolist()
  seq_arr = batch['seq']
  qual_arr = batch['qual']
  cigar_arr = batch['cigar']
  pw_arr = batch['pw']
  ip_arr = batch['ip']
  sn_arr = batch['sn']
  all_names = batch['name'].tobytes().decode('ascii')
  blob_view = memoryview(buf)

  records: List[BamRecord] = []
  for i in range(n):
    rec = BamRecord()
    rec.header = header
    rec.ref_id = ref_ids[i]
    rec.pos = positions[i]
    rec.mapq = mapqs[i]
    rec.flag = flags[i]
    rec.qname = all_names[name_starts[i] : name_starts[i + 1]]
    rec.next_ref_id, rec.next_pos, rec.tlen = struct.unpack_from(
        '<iii', buf, offsets[i] + 20
    )
    rec._cigar_raw = cigar_arr[cigar_starts[i] : cigar_starts[i + 1]]
    s0, s1 = seq_starts[i], seq_starts[i + 1]
    rec._seq_bytes = seq_arr[s0:s1]
    rec._l_seq = l_seqs[i]
    rec.qual = None if qual_missing[i] else qual_arr[s0:s1]
    tag_off = (
        offsets[i] + 32 + name_lens[i] + 4 * n_cigars[i]
        + (l_seqs[i] + 1) // 2 + l_seqs[i]
    )
    rec._tag_blob = blob_view[tag_off : offsets[i] + sizes[i]]
    m = presents[i]
    ft = {}
    if m & 1:
      ft['zm'] = zms[i]
    if m & 2:
      ft['pw'] = pw_arr[s0 : s0 + pw_lens[i]]
    if m & 4:
      ft['ip'] = ip_arr[s0 : s0 + ip_lens[i]]
    if m & 8:
      ft['sn'] = sn_arr[i]
    if m & 16:
      ft['ec'] = ecs[i]
    if m & 32:
      ft['np'] = nps[i]
    if m & 64:
      ft['rq'] = rqs[i]
    rec._fast_tags = ft
    rec._fast_complete = not (m & 0x8000)
    records.append(rec)
  return records


class BamReader:
  """Sequential BAM reader.

  eager=True (default) inflates the whole file up front — through the
  native zlib fast path when libdcio is built — then parses records via a
  single native columnar pass (falling back to per-record Python parsing);
  per-shard BAMs fit easily. eager=False streams BGZF blocks (bounded
  memory for arbitrarily large inputs).
  """

  def __init__(self, path: str, eager: bool = True, native: bool = True):
    self._r = bgzf.BgzfReader(path)
    self._buf: Optional[bytes] = None
    self._fast_records: Optional[List[BamRecord]] = None
    self._pos = 0
    magic = self._r.read(4)
    if magic != _BAM_MAGIC:
      raise IOError(f'{path}: not a BAM file')
    (l_text,) = struct.unpack('<i', self._r.read(4))
    text = self._r.read(l_text).decode('ascii', errors='replace').rstrip('\x00')
    (n_ref,) = struct.unpack('<i', self._r.read(4))
    refs = []
    for _ in range(n_ref):
      (l_name,) = struct.unpack('<i', self._r.read(4))
      name = self._r.read(l_name)[:-1].decode('ascii')
      (l_ref,) = struct.unpack('<i', self._r.read(4))
      refs.append((name, l_ref))
    self.header = BamHeader(text, refs)
    if eager:
      # Array form feeds the native columnar parser without extra copies.
      self._buf = self._r.read_all(as_array=native)
      self._r.close()
      if native:
        self._fast_records = _records_from_batch(self._buf, self.header)
        if self._fast_records is None and not isinstance(self._buf, bytes):
          self._buf = self._buf.tobytes()  # per-record fallback needs bytes

  def __iter__(self) -> Iterator[BamRecord]:
    return self

  def __next__(self) -> BamRecord:
    if self._fast_records is not None:
      if self._pos >= len(self._fast_records):
        raise StopIteration
      rec = self._fast_records[self._pos]
      self._pos += 1
      return rec
    if self._buf is not None:
      if self._pos == len(self._buf):
        raise StopIteration
      if self._pos + 4 > len(self._buf):
        # 1-3 trailing bytes: a record size field was cut mid-write.
        raise IOError('truncated BAM record size field')
      (block_size,) = struct.unpack_from('<i', self._buf, self._pos)
      start = self._pos + 4
      if block_size < 0 or start + block_size > len(self._buf):
        # A negative size (corrupt bytes read as signed int32) would move
        # the cursor backwards and mis-slice; fail like truncation.
        raise IOError('truncated BAM record')
      self._pos = start + block_size
      return parse_record(self._buf[start : start + block_size], self.header)
    size_bytes = self._r.read(4)
    if not size_bytes:
      raise StopIteration
    if len(size_bytes) < 4:
      raise IOError('truncated BAM record size field')
    (block_size,) = struct.unpack('<i', size_bytes)
    if block_size < 0:
      raise IOError('truncated BAM record')
    blob = self._r.read(block_size)
    if len(blob) < block_size:
      raise IOError('truncated BAM record')
    return parse_record(blob, self.header)

  def close(self) -> None:
    if self._buf is None:
      self._r.close()

  def __enter__(self) -> 'BamReader':
    return self

  def __exit__(self, *exc) -> None:
    self.close()


def encode_tag(name: str, value: Any, type_hint: Optional[str] = None) -> bytes:
  """Encodes one aux tag. type_hint: one of 'i','f','Z','A', or None (infer)."""
  tag = name.encode('ascii')
  if type_hint is None:
    if isinstance(value, float):
      type_hint = 'f'
    elif isinstance(value, (int, np.integer)):
      type_hint = 'i'
    elif isinstance(value, str):
      type_hint = 'Z'
    elif isinstance(value, (np.ndarray, list, tuple)):
      type_hint = 'B'
    else:
      raise ValueError(f'cannot infer tag type for {value!r}')
  if type_hint == 'i':
    v = int(value)
    # BAM stores signed and unsigned 32-bit ints under distinct codes;
    # a uint32 value >= 2**31 must re-encode as 'I' or struct.pack('<i')
    # raises. Pick the narrowest standard 32-bit code that fits.
    if -(2**31) <= v < 2**31:
      return tag + b'i' + struct.pack('<i', v)
    if 0 <= v < 2**32:
      return tag + b'I' + struct.pack('<I', v)
    raise ValueError(f'tag {name!r}: value {v} exceeds 32-bit BAM int range')
  if type_hint == 'f':
    return tag + b'f' + struct.pack('<f', float(value))
  if type_hint == 'Z':
    return tag + b'Z' + value.encode('ascii') + b'\x00'
  if type_hint == 'A':
    return tag + b'A' + value.encode('ascii')
  if type_hint == 'B':
    arr = np.asarray(value)
    if arr.dtype == np.float32 or arr.dtype == np.float64:
      arr = arr.astype(np.float32)
      sub = b'f'
    else:
      # Integer arrays encode at the NARROWEST width their VALUES fit —
      # not the in-memory dtype: the native batch parser hands pw/ip back
      # as uint16 while the pure-Python parser keeps the stored subtype,
      # and value-determined widths keep re-encoded bytes identical
      # regardless of which parser produced the record. BAM 'B' subtypes
      # stop at 32 bits; fail clearly beyond that.
      if arr.size == 0:
        lo = hi = 0
      else:
        lo, hi = int(arr.min()), int(arr.max())
      if lo >= 0:
        if hi < 2**8:
          arr, sub = arr.astype(np.uint8), b'C'
        elif hi < 2**16:
          arr, sub = arr.astype(np.uint16), b'S'
        elif hi < 2**32:
          arr, sub = arr.astype(np.uint32), b'I'
        else:
          raise ValueError(
              f'tag {name!r}: values exceed 32-bit BAM array range'
          )
      else:
        if -(2**7) <= lo and hi < 2**7:
          arr, sub = arr.astype(np.int8), b'c'
        elif -(2**15) <= lo and hi < 2**15:
          arr, sub = arr.astype(np.int16), b's'
        elif -(2**31) <= lo and hi < 2**31:
          arr, sub = arr.astype(np.int32), b'i'
        else:
          raise ValueError(
              f'tag {name!r}: values exceed 32-bit BAM array range'
          )
    return (
        tag + b'B' + sub + struct.pack('<i', arr.size) + arr.tobytes()
    )
  raise ValueError(f'unsupported tag type {type_hint!r}')


def build_record_blob(
    qname: str,
    flag: int,
    seq: str,
    qual: Optional[np.ndarray],
    tags: bytes = b'',
    ref_id: int = -1,
    pos: int = -1,
    mapq: int = 255,
    cigartuples: Optional[List[Tuple[int, int]]] = None,
    next_ref_id: int = -1,
    next_pos: int = -1,
    tlen: int = 0,
) -> bytes:
  """Serializes a BAM record body (without the leading block_size)."""
  name_b = qname.encode('ascii') + b'\x00'
  cigartuples = cigartuples or []
  cigar_b = b''.join(
      struct.pack('<I', (length << 4) | op) for op, length in cigartuples
  )
  seq_b = encode_seq(seq)
  l_seq = len(seq)
  if qual is None:
    qual_b = b'\xff' * l_seq
  else:
    qual_b = np.asarray(qual, dtype=np.uint8).tobytes()
  fixed = struct.pack(
      '<iiBBHHHiiii',
      ref_id,
      pos,
      len(name_b),
      mapq,
      0,  # bin: unused by downstream consumers for unmapped records.
      len(cigartuples),
      flag,
      l_seq,
      next_ref_id,
      next_pos,
      tlen,
  )
  return fixed + name_b + cigar_b + seq_b + qual_b + tags


class BamWriter:
  """Sequential BAM writer (used for unmapped FASTQ-equivalent output)."""

  def __init__(self, path: str, header: BamHeader):
    self._w = bgzf.BgzfWriter(path)
    self.header = header
    text_b = header.text.encode('ascii')
    out = [_BAM_MAGIC, struct.pack('<i', len(text_b)), text_b]
    out.append(struct.pack('<i', len(header.references)))
    for name, length in header.references:
      name_b = name.encode('ascii') + b'\x00'
      out.append(struct.pack('<i', len(name_b)))
      out.append(name_b)
      out.append(struct.pack('<i', length))
    self._w.write(b''.join(out))

  def write_blob(self, blob: bytes) -> None:
    self._w.write(struct.pack('<i', len(blob)) + blob)

  def write_record(self, rec: BamRecord, tags: Optional[bytes] = None) -> None:
    if tags is None:
      if rec._tags_dirty:  # pylint: disable=protected-access
        # set_tag landed in the parsed dict, not the raw blob; writing
        # the blob would silently discard the modification. Splice: tags
        # untouched by set_tag keep their original bytes (preserving 'A',
        # 'H', and exact int width codes); only modified/new tags are
        # re-encoded, with new tags appended after the originals.
        modified = rec._tags_modified or set()  # pylint: disable=protected-access
        blob = bytes(rec._tag_blob)  # pylint: disable=protected-access
        parts = []
        seen = set()
        for name, start, end in _iter_tag_spans(blob):
          seen.add(name)
          if name in modified:
            parts.append(encode_tag(name, rec.tags[name]))
          else:
            parts.append(blob[start:end])
        for name, value in rec.tags.items():
          if name not in seen:
            parts.append(encode_tag(name, value))
        tags = b''.join(parts)
      else:
        tags = bytes(rec._tag_blob)  # pylint: disable=protected-access
    self.write_blob(
        build_record_blob(
            rec.qname,
            rec.flag,
            rec.seq,
            rec.qual,
            tags,
            ref_id=rec.ref_id,
            pos=rec.pos,
            mapq=rec.mapq,
            cigartuples=rec.cigartuples,
            next_ref_id=rec.next_ref_id,
            next_pos=rec.next_pos,
            tlen=rec.tlen,
        )
    )

  def close(self) -> None:
    self._w.close()

  def __enter__(self) -> 'BamWriter':
    return self

  def __exit__(self, *exc) -> None:
    self.close()


def read_all(path: str) -> Tuple[BamHeader, List[BamRecord]]:
  """Reads an entire BAM into memory (small-file convenience)."""
  with BamReader(path) as r:
    return r.header, list(r)


def index_by_reference(
    path: str, primary_only: bool = False
) -> Tuple[BamHeader, Dict[str, List[BamRecord]]]:
  """Groups all records of a BAM by reference name.

  Replaces the reference's indexed `truth_to_ccs.fetch(ccs_seqname)` pattern
  (`reference: preprocess/pre_lib.py:1001-1014`) with a one-pass scan, which
  sidesteps the .bai requirement for the per-shard file sizes this pipeline
  uses.
  """
  header, records = read_all(path)
  by_ref: Dict[str, List[BamRecord]] = {}
  for rec in records:
    if rec.is_unmapped:
      continue
    if primary_only and (rec.flag & (FLAG_SECONDARY | FLAG_SUPPLEMENTARY)):
      continue
    name = rec.reference_name
    if name is not None:
      by_ref.setdefault(name, []).append(rec)
  return header, by_ref
