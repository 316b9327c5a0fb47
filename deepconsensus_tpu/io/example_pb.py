"""Minimal hand-rolled tf.train.Example protobuf encode/decode.

The on-disk training-example format of the reference is TFRecord-framed
tf.train.Example protos (reference: preprocess/pre_lib.py:764-787,
models/data_providers.py:41-58). This module implements just that message
shape with no TensorFlow/protobuf dependency:

    Example{1: Features{1: map<string, Feature>}}
    Feature{1: BytesList | 2: FloatList | 3: Int64List}
"""

import struct
from typing import Dict, List, Union

import numpy as np

FeatureValue = Union[List[bytes], List[int], List[float]]


def _varint(n: int) -> bytes:
  out = bytearray()
  while True:
    b = n & 0x7F
    n >>= 7
    if n:
      out.append(b | 0x80)
    else:
      out.append(b)
      return bytes(out)


def _read_varint(buf: bytes, off: int):
  shift = 0
  val = 0
  while True:
    b = buf[off]
    off += 1
    val |= (b & 0x7F) << shift
    if not b & 0x80:
      return val, off
    shift += 7


def _len_delim(field: int, payload: bytes) -> bytes:
  return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _encode_feature(values: FeatureValue, kind: str) -> bytes:
  if kind == 'bytes':
    inner = b''.join(_len_delim(1, v) for v in values)
    return _len_delim(1, inner)
  if kind == 'float':
    payload = struct.pack(f'<{len(values)}f', *values)
    inner = _len_delim(1, payload)  # packed floats
    return _len_delim(2, inner)
  if kind == 'int64':
    payload = _varints_int64(values)
    inner = _len_delim(1, payload)  # packed varints
    return _len_delim(3, inner)
  raise ValueError(kind)


# An int64 in [-128, -1] varint-encodes as one value-dependent byte then
# this fixed 9-byte tail (bits 7..63 of the two's complement are all ones:
# eight full 0x7F groups continued, then the 0x01 terminator).
_NEG_TAIL = bytes([0xFF] * 8 + [0x01])


def _varints_int64(values) -> bytes:
  """Packed varint encoding of an int64 list, vectorized for small values.

  Values in [0, 128) encode as their own single byte and values in
  [-128, -1] as one byte plus a fixed 9-byte tail — together these cover
  every quality-score list (the hot path: one 100-long list per example).
  Anything else falls back to the general per-value encoder.
  """
  if len(values) < 16:  # numpy setup outweighs the loop for tiny lists
    return b''.join(_varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in values)
  arr = np.asarray(values, dtype=np.int64)
  small = (arr >= 0) & (arr < 128)
  neg = (arr < 0) & (arr >= -128)
  if not bool(np.all(small | neg)):
    return b''.join(_varint(int(v) & 0xFFFFFFFFFFFFFFFF) for v in arr)
  if not neg.any():
    return arr.astype(np.uint8).tobytes()
  lens = np.where(neg, 10, 1)
  out = np.zeros(int(lens.sum()), np.uint8)
  starts = np.cumsum(lens) - lens
  out[starts] = np.where(neg, (arr & 0x7F) | 0x80, arr).astype(np.uint8)
  tail = np.frombuffer(_NEG_TAIL, np.uint8)
  neg_starts = starts[neg]
  out[(neg_starts[:, None] + np.arange(1, 10)[None, :]).ravel()] = np.tile(
      tail, neg_starts.size
  )
  return out.tobytes()


def encode_example(features: Dict[str, tuple]) -> bytes:
  """Serializes {name: (kind, values)} to a tf.train.Example proto.

  kind is one of 'bytes' | 'float' | 'int64'.
  """
  entries = []
  for name, (kind, values) in features.items():
    feat = _encode_feature(values, kind)
    entry = _len_delim(1, name.encode()) + _len_delim(2, feat)
    entries.append(_len_delim(1, entry))
  features_msg = b''.join(entries)
  return _len_delim(1, features_msg)


def _decode_feature(buf: bytes):
  """Decodes a Feature message -> (kind, values)."""
  off = 0
  while off < len(buf):
    key, off = _read_varint(buf, off)
    field = key >> 3
    ln, off = _read_varint(buf, off)
    payload = buf[off : off + ln]
    off += ln
    if field == 1:  # BytesList
      vals = []
      o = 0
      while o < len(payload):
        k, o = _read_varint(payload, o)
        assert k >> 3 == 1
        l, o = _read_varint(payload, o)
        vals.append(payload[o : o + l])
        o += l
      return 'bytes', vals
    if field == 2:  # FloatList
      vals = []
      o = 0
      while o < len(payload):
        k, o = _read_varint(payload, o)
        assert k >> 3 == 1
        wire = k & 7
        if wire == 2:  # packed
          l, o = _read_varint(payload, o)
          vals.extend(struct.unpack(f'<{l // 4}f', payload[o : o + l]))
          o += l
        else:  # unpacked fixed32
          vals.append(struct.unpack('<f', payload[o : o + 4])[0])
          o += 4
      return 'float', vals
    if field == 3:  # Int64List
      vals = []
      o = 0
      while o < len(payload):
        k, o = _read_varint(payload, o)
        assert k >> 3 == 1
        wire = k & 7
        if wire == 2:  # packed
          l, o = _read_varint(payload, o)
          end = o + l
          while o < end:
            v, o = _read_varint(payload, o)
            if v >= 1 << 63:
              v -= 1 << 64
            vals.append(v)
        else:  # unpacked varint
          v, o = _read_varint(payload, o)
          if v >= 1 << 63:
            v -= 1 << 64
          vals.append(v)
      return 'int64', vals
  return 'bytes', []


def decode_example(buf: bytes) -> Dict[str, tuple]:
  """Parses a tf.train.Example proto -> {name: (kind, values)}."""
  out: Dict[str, tuple] = {}
  off = 0
  while off < len(buf):
    key, off = _read_varint(buf, off)
    assert key >> 3 == 1, 'expected Example.features'
    ln, off = _read_varint(buf, off)
    features_msg = buf[off : off + ln]
    off += ln
    o = 0
    while o < len(features_msg):
      k, o = _read_varint(features_msg, o)
      assert k >> 3 == 1, 'expected map entry'
      l, o = _read_varint(features_msg, o)
      entry = features_msg[o : o + l]
      o += l
      name = None
      feat = None
      e = 0
      while e < len(entry):
        ek, e = _read_varint(entry, e)
        el, e = _read_varint(entry, e)
        payload = entry[e : e + el]
        e += el
        if ek >> 3 == 1:
          name = payload.decode()
        elif ek >> 3 == 2:
          feat = payload
      if name is not None and feat is not None:
        out[name] = _decode_feature(feat)
  return out
