"""Pure-Python readers for TF checkpoints (TensorBundle) and SavedModels.

The reference release ships model weights in two TF formats that users may
hold (reference: inference/quick_inference.py:797-800 auto-detects which):

  1. a `tf.train.Checkpoint` prefix (``<dir>/checkpoint-N`` → ``.index`` +
     ``.data-00000-of-00001`` TensorBundle files), and
  2. a SavedModel directory (``saved_model.pb`` + ``variables/variables``
     TensorBundle), produced by models/convert_to_saved_model.py:67-105.

This module reads both without importing TensorFlow, so the core package
can ingest reference artifacts in TF-free deployments:

  * ``TensorBundleReader`` parses the TensorBundle ``.index`` file — a
    LevelDB-format SSTable whose values are BundleEntryProto records —
    and serves raw little-endian tensor bytes from the data shards.
  * ``SavedModelVariableIndex`` parses the SavedObjectGraph inside
    ``saved_model.pb`` to translate trackable object-graph paths (e.g.
    ``encoder_stack/layers/0/0/layer/query_dense_layer/kernel``, the same
    paths models/checkpoint.tf_name_map uses) into the SavedModel
    checkpoint's positional keys (``variables/<i>/.ATTRIBUTES/…``).

Formats implemented from their public specifications:
  - LevelDB table: block entries with shared-prefix key compression +
    restart array, 5-byte block trailer (compression type + crc32c),
    48-byte footer with metaindex/index BlockHandles and the table magic.
  - tensorflow/core/protobuf/tensor_bundle.proto (BundleEntryProto),
    saved_model.proto / meta_graph.proto / saved_object_graph.proto
    (only the handful of field numbers needed, decoded with a minimal
    wire-format scanner — same approach as io/example_pb.py).

Both readers are verified against TF's own ``tf.train.load_checkpoint``
in tests/test_saved_model_interop.py.
"""

import os
import struct
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

_TABLE_MAGIC = 0xDB4775248B80FB57

# TF DataType enum values (tensorflow/core/framework/types.proto) for the
# numeric dtypes a weight checkpoint can contain.
_DTYPES = {
    1: np.float32,
    2: np.float64,
    3: np.int32,
    4: np.uint8,
    5: np.int16,
    6: np.int8,
    9: np.int64,
    10: np.bool_,
    14: None,  # bfloat16: decoded via uint16 view (numpy has no bf16)
    17: np.uint16,
    19: np.float16,
    22: np.uint32,
    23: np.uint64,
}
_DT_STRING = 7
_DT_BFLOAT16 = 14


# ---------------------------------------------------------------------------
# Protobuf wire-format scanning (no generated code)
# ---------------------------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
  v = 0
  shift = 0
  while True:
    b = buf[i]
    i += 1
    v |= (b & 0x7F) << shift
    if not b & 0x80:
      return v, i
    shift += 7


def scan_fields(buf: bytes) -> Iterator[Tuple[int, int, Any]]:
  """Yields (field_number, wire_type, value) over a serialized message."""
  i, n = 0, len(buf)
  while i < n:
    tag, i = _read_varint(buf, i)
    field, wt = tag >> 3, tag & 7
    if wt == 0:
      v, i = _read_varint(buf, i)
      yield field, wt, v
    elif wt == 2:
      ln, i = _read_varint(buf, i)
      yield field, wt, buf[i : i + ln]
      i += ln
    elif wt == 5:
      yield field, wt, buf[i : i + 4]
      i += 4
    elif wt == 1:
      yield field, wt, buf[i : i + 8]
      i += 8
    else:
      raise ValueError(f'unsupported protobuf wire type {wt}')


def _first(buf: bytes, field: int) -> Optional[Any]:
  for f, _, v in scan_fields(buf):
    if f == field:
      return v
  return None


def _all(buf: bytes, field: int) -> List[Any]:
  return [v for f, _, v in scan_fields(buf) if f == field]


# ---------------------------------------------------------------------------
# LevelDB-format SSTable (the TensorBundle .index file)
# ---------------------------------------------------------------------------


def _snappy_decompress(buf: bytes) -> bytes:
  """Raw snappy block decompression (pure Python).

  Snappy framing per the public format description: a varint uncompressed
  length, then a tag stream — literals (tag&3 == 0, length in the tag or
  in 1-4 trailing bytes) and back-references with 1/2/4-byte offsets.
  Table blocks are small (~4-16 KB), so a byte loop is fast enough.
  """
  total, i = _read_varint(buf, 0)
  out = bytearray()
  n = len(buf)
  while i < n:
    tag = buf[i]
    i += 1
    kind = tag & 3
    if kind == 0:  # literal
      length = tag >> 2
      if length >= 60:
        extra = length - 59
        length = int.from_bytes(buf[i : i + extra], 'little')
        i += extra
      length += 1
      out += buf[i : i + length]
      i += length
      continue
    if kind == 1:  # copy, 1-byte offset
      length = ((tag >> 2) & 0x7) + 4
      offset = ((tag >> 5) << 8) | buf[i]
      i += 1
    elif kind == 2:  # copy, 2-byte offset
      length = (tag >> 2) + 1
      offset = int.from_bytes(buf[i : i + 2], 'little')
      i += 2
    else:  # copy, 4-byte offset
      length = (tag >> 2) + 1
      offset = int.from_bytes(buf[i : i + 4], 'little')
      i += 4
    if offset == 0 or offset > len(out):
      raise IOError('corrupt snappy stream: bad copy offset')
    # Copies may overlap their own output (run-length behavior).
    start = len(out) - offset
    for k in range(length):
      out.append(out[start + k])
  if len(out) != total:
    raise IOError(
        f'corrupt snappy stream: got {len(out)} bytes, expected {total}'
    )
  return bytes(out)


def _block_handle(buf: bytes, i: int = 0) -> Tuple[int, int, int]:
  """Decodes a BlockHandle (two varint64s) → (offset, size, next_index)."""
  off, i = _read_varint(buf, i)
  size, i = _read_varint(buf, i)
  return off, size, i


def _block_entries(block: bytes) -> Iterator[Tuple[bytes, bytes]]:
  """Iterates (key, value) pairs of one table block.

  Entries use shared-prefix compression: each stores how many leading key
  bytes to reuse from the previous entry. The restart array at the tail
  (num_restarts uint32s + trailing count) only aids binary search — a
  linear scan can ignore it beyond locating the data end.
  """
  (num_restarts,) = struct.unpack_from('<I', block, len(block) - 4)
  data_end = len(block) - 4 * (num_restarts + 1)
  i = 0
  key = b''
  while i < data_end:
    shared, i = _read_varint(block, i)
    unshared, i = _read_varint(block, i)
    value_len, i = _read_varint(block, i)
    key = key[:shared] + block[i : i + unshared]
    i += unshared
    yield key, block[i : i + value_len]
    i += value_len


class _SSTable:
  """Reads every (key, value) of a LevelDB-format table file.

  Corruption anywhere — bad footer, out-of-range BlockHandles, truncated
  varints or restart arrays — surfaces as IOError with the file path
  (the low-level parsers raise IndexError/struct.error, converted here).
  """

  def __init__(self, path: str):
    self._path = path
    with open(path, 'rb') as f:
      self._raw = f.read()
    if len(self._raw) < 48:
      raise IOError(f'{path}: too small for an SSTable footer')
    footer = self._raw[-48:]
    (magic,) = struct.unpack('<Q', footer[40:48])
    if magic != _TABLE_MAGIC:
      raise IOError(f'{path}: bad table magic {magic:#x}')
    with self._reraise('footer block handles'):
      _, _, i = _block_handle(footer)  # metaindex (unused)
      index_off, index_size, _ = _block_handle(footer, i)
      self._index = self._load_block(index_off, index_size)

  def _reraise(self, what: str):
    import contextlib

    @contextlib.contextmanager
    def ctx():
      try:
        yield
      except (IndexError, struct.error, ValueError) as e:
        raise IOError(f'{self._path}: corrupt table ({what}): {e}') from e

    return ctx()

  def _load_block(self, offset: int, size: int) -> bytes:
    if offset + size >= len(self._raw):
      raise IOError(
          f'{self._path}: block handle ({offset}, {size}) past EOF'
      )
    block = self._raw[offset : offset + size]
    compression = self._raw[offset + size]  # 1-byte trailer before crc32c
    if compression == 0:
      return block
    if compression == 1:
      return _snappy_decompress(block)
    raise IOError(f'unknown block compression type {compression}')

  def items(self) -> Iterator[Tuple[bytes, bytes]]:
    with self._reraise('index block'):
      index_entries = list(_block_entries(self._index))
    for _, handle in index_entries:
      with self._reraise('data block'):
        off, size, _ = _block_handle(handle)
        entries = list(_block_entries(self._load_block(off, size)))
      yield from entries


# ---------------------------------------------------------------------------
# TensorBundle reader
# ---------------------------------------------------------------------------


class TensorBundleReader:
  """Reads tensors from a TF TensorBundle checkpoint (pure Python).

  Drop-in for the slice of `tf.train.load_checkpoint` reader API that
  checkpoint translation uses: `has_tensor`, `get_tensor`, plus
  `list_variables` mirroring `tf.train.list_variables`.
  """

  def __init__(self, prefix: str):
    self._prefix = prefix
    index_path = prefix + '.index'
    if not os.path.exists(index_path):
      raise FileNotFoundError(index_path)
    self._entries: Dict[str, Dict[str, Any]] = {}
    num_shards = 1
    for key, value in _SSTable(index_path).items():
      if not key:
        # BundleHeaderProto under the empty key: num_shards=1, ...
        num_shards = _first(value, 1) or 1
        continue
      self._entries[key.decode('utf-8')] = self._parse_entry(value)
    self._num_shards = num_shards
    self._shard_cache: Dict[int, Any] = {}

  @staticmethod
  def _parse_entry(buf: bytes) -> Dict[str, Any]:
    """BundleEntryProto: dtype=1 shape=2 shard_id=3 offset=4 size=5."""
    entry = {'dtype': 0, 'shape': (), 'shard_id': 0, 'offset': 0, 'size': 0}
    dims: List[int] = []
    for f, _, v in scan_fields(buf):
      if f == 1:
        entry['dtype'] = v
      elif f == 2:
        # TensorShapeProto: repeated Dim dim=2 {int64 size=1}
        dims = [_first(d, 1) or 0 for d in _all(v, 2)]
      elif f == 3:
        entry['shard_id'] = v
      elif f == 4:
        entry['offset'] = v
      elif f == 5:
        entry['size'] = v
    entry['shape'] = tuple(dims)
    return entry

  def _shard(self, shard_id: int):
    if shard_id not in self._shard_cache:
      import mmap

      path = (
          f'{self._prefix}.data-{shard_id:05d}-of-{self._num_shards:05d}'
      )
      # mmap so fetching one tensor touches only its pages (this VM's
      # fresh-page faults are slow, so avoid reading the whole shard for
      # a single get_tensor).
      f = open(path, 'rb')
      self._shard_cache[shard_id] = memoryview(
          mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
      )
      f.close()
    return self._shard_cache[shard_id]

  # -- reader API ----------------------------------------------------------
  def list_variables(self) -> List[Tuple[str, List[int]]]:
    return sorted(
        (name, list(e['shape'])) for name, e in self._entries.items()
    )

  def has_tensor(self, name: str) -> bool:
    return name in self._entries

  def variable_dtype(self, name: str) -> int:
    return self._entries[name]['dtype']

  def get_tensor(self, name: str) -> np.ndarray:
    e = self._entries[name]
    raw = self._shard(e['shard_id'])[e['offset'] : e['offset'] + e['size']]
    if e['dtype'] == _DT_STRING:
      raise NotImplementedError(
          f'{name}: string tensors (e.g. the checkpoint object graph) are '
          'not needed for weight translation'
      )
    np_dtype = _DTYPES.get(e['dtype'])
    if e['dtype'] == _DT_BFLOAT16:
      # Widen via the uint16 bit pattern placed in the top half of f32.
      bits = np.frombuffer(raw, dtype=np.uint16).astype(np.uint32) << 16
      return bits.view(np.float32).reshape(e['shape'])
    if np_dtype is None:
      raise NotImplementedError(f'{name}: unsupported dtype {e["dtype"]}')
    return np.frombuffer(raw, dtype=np_dtype).reshape(e['shape']).copy()


# ---------------------------------------------------------------------------
# SavedModel object graph
# ---------------------------------------------------------------------------


def is_saved_model_dir(path: str) -> bool:
  """True when `path` is a SavedModel directory (the reference's detection
  rule, quick_inference.py:797-800: a `saved_model.pb` inside)."""
  return os.path.isdir(path) and os.path.exists(
      os.path.join(path, 'saved_model.pb')
  )


class SavedModelVariableIndex:
  """Maps trackable object-graph paths to SavedModel checkpoint keys.

  `tf.saved_model.save` checkpoints variables under positional keys
  (``variables/<i>/.ATTRIBUTES/VARIABLE_VALUE`` in creation order), not
  under the descriptive attribute paths a training checkpoint uses. The
  SavedObjectGraph proto in ``saved_model.pb`` retains the full trackable
  graph — each node's children carry local attribute names — so walking
  ``bases_embedding_layer/embeddings`` from the root reaches the same
  node id the root's ``variables`` list holds at some index i.
  """

  def __init__(self, saved_model_dir: str):
    pb_path = os.path.join(saved_model_dir, 'saved_model.pb')
    with open(pb_path, 'rb') as f:
      pb = f.read()
    meta_graphs = _all(pb, 2)  # SavedModel.meta_graphs
    if not meta_graphs:
      raise IOError(f'{pb_path}: no MetaGraphDef')
    object_graph = _first(meta_graphs[0], 7)  # MetaGraphDef.object_graph_def
    if object_graph is None:
      raise IOError(f'{pb_path}: no SavedObjectGraph (TF1-style SavedModel?)')
    self._nodes: List[bytes] = _all(object_graph, 1)  # SavedObjectGraph.nodes
    self._children_cache: Dict[int, Dict[str, int]] = {}
    variables_node = self._children(0).get('variables')
    if variables_node is None:
      raise IOError(f'{pb_path}: root object has no `variables` list')
    # node id -> position in the root `variables` list == checkpoint key.
    self._variable_slot = {
        node_id: int(local_name)
        for local_name, node_id in self._children(variables_node).items()
    }

  def _children(self, node_id: int) -> Dict[str, int]:
    if node_id not in self._children_cache:
      out: Dict[str, int] = {}
      # SavedObject.children = 1: ObjectReference {node_id=1, local_name=2}
      for ref in _all(self._nodes[node_id], 1):
        child_id = _first(ref, 1) or 0
        name = _first(ref, 2)
        out[name.decode('utf-8') if name is not None else ''] = child_id
      self._children_cache[node_id] = out
    return self._children_cache[node_id]

  def resolve(self, object_path: str) -> Optional[int]:
    """Object-graph path (slash-separated local names) → node id."""
    node_id = 0
    for part in object_path.split('/'):
      node_id = self._children(node_id).get(part)
      if node_id is None:
        return None
    return node_id

  def checkpoint_key(self, object_path: str) -> str:
    """Object-graph path → the SavedModel variables-checkpoint key."""
    node_id = self.resolve(object_path)
    if node_id is None:
      raise KeyError(f'object path {object_path!r} not in SavedObjectGraph')
    slot = self._variable_slot.get(node_id)
    if slot is None:
      raise KeyError(
          f'object path {object_path!r} resolves to node {node_id}, which '
          'is not a tracked variable'
      )
    return f'variables/{slot}/.ATTRIBUTES/VARIABLE_VALUE'


class SavedModelCheckpointReader:
  """Reader over a SavedModel dir keyed by *training-checkpoint* names.

  Presents the SavedModel's positional variables checkpoint under the
  ``model/<object path>/.ATTRIBUTES/VARIABLE_VALUE`` names that
  models/checkpoint.tf_name_map produces, so checkpoint translation code
  works unchanged against either artifact kind.
  """

  _PREFIX = 'model/'
  _SUFFIX = '/.ATTRIBUTES/VARIABLE_VALUE'

  def __init__(self, saved_model_dir: str):
    self._index = SavedModelVariableIndex(saved_model_dir)
    self._bundle = TensorBundleReader(
        os.path.join(saved_model_dir, 'variables', 'variables')
    )

  def _translate(self, name: str) -> Optional[str]:
    if not (name.startswith(self._PREFIX) and name.endswith(self._SUFFIX)):
      return None
    object_path = name[len(self._PREFIX) : -len(self._SUFFIX)]
    try:
      return self._index.checkpoint_key(object_path)
    except KeyError:
      return None

  def has_tensor(self, name: str) -> bool:
    key = self._translate(name)
    return key is not None and self._bundle.has_tensor(key)

  def get_tensor(self, name: str) -> np.ndarray:
    key = self._translate(name)
    if key is None:
      raise KeyError(name)
    return self._bundle.get_tensor(key)
