"""Streaming inference engine: BAM -> windows -> jit forward -> FASTQ/BAM.

TPU-native redesign of the reference's quick_inference
(`reference: inference/quick_inference.py`): the device work is a single
jitted forward over fixed-shape batches (partial batches are padded, so one
compilation serves the whole run), the device->host transfer is just the
argmax ids and max-probabilities rather than full softmax tensors, and the
host side is the vectorized featurizer. Multi-chip scaling shards the batch
axis over a jax Mesh (see deepconsensus_tpu/parallel/mesh.py).
"""

import collections
import concurrent.futures
import csv
import dataclasses
import json
import logging
import os
import time
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


from deepconsensus_tpu import constants
from deepconsensus_tpu.calibration import calibration as calibration_lib
from deepconsensus_tpu.io import bam, fastq
from deepconsensus_tpu.models import checkpoint as ckpt_lib
from deepconsensus_tpu.models import configs, data
from deepconsensus_tpu.models import model as model_lib
from deepconsensus_tpu.postprocess import stitch
from deepconsensus_tpu.preprocess import feeder, windows
from deepconsensus_tpu.utils import phred

logger = logging.getLogger(__name__)

# Debug stages for runtime measurement (reference: quick_inference.py:68-76).
DEBUG_STAGES = ('dc_input', 'tf_examples', 'run_model', 'full')

_CACHE_ENABLED = False


def enable_compilation_cache() -> None:
  """Persistent XLA compilation cache: repeat runs skip the 20-40s compile."""
  global _CACHE_ENABLED
  if _CACHE_ENABLED:
    return
  cache_dir = os.environ.get(
      'DC_TPU_COMPILE_CACHE', os.path.expanduser('~/.cache/dctpu_xla')
  )
  try:
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
  except Exception:  # cache is an optimization, never fatal
    logger.warning('could not enable persistent compilation cache')
  _CACHE_ENABLED = True


@dataclasses.dataclass
class InferenceOptions:
  """Inference-wide options (reference: quick_inference.py:238-275)."""

  max_length: int
  example_height: int
  max_passes: int
  min_quality: int = 20
  min_length: int = 0
  batch_size: int = 1024
  use_ccs_bq: bool = False
  cpus: int = 0
  skip_windows_above: int = 45
  max_base_quality: int = 93
  dc_calibration_values: calibration_lib.QualityCalibrationValues = (
      dataclasses.field(
          default_factory=lambda: calibration_lib.parse_calibration_string(
              'skip'
          )
      )
  )
  ccs_calibration_values: calibration_lib.QualityCalibrationValues = (
      dataclasses.field(
          default_factory=lambda: calibration_lib.parse_calibration_string(
              'skip'
          )
      )
  )


class Timing:
  """Per-stage runtime log -> {output}.runtime.csv (quick_inference.py:278-299)."""

  def __init__(self):
    self.rows: List[Dict[str, Any]] = []

  def log(self, stage, item, before, num_examples=None, num_subreads=None,
          num_zmws=None):
    self.rows.append({
        'item': item,
        'stage': stage,
        'runtime': time.time() - before,
        'num_zmws': num_zmws,
        'num_examples': num_examples,
        'num_subreads': num_subreads,
    })

  def save(self, path: str) -> None:
    if not self.rows:
      return
    with open(path, 'w', newline='') as f:
      writer = csv.DictWriter(f, fieldnames=list(self.rows[0]))
      writer.writeheader()
      writer.writerows(self.rows)


def unpack_nibbles(packed, length: int):
  """Inverse of data.pack_nibbles: (…, ceil(L/2)) uint8 -> (…, L) ids."""
  lo = packed & jnp.uint8(0xF)
  hi = packed >> 4
  ids = jnp.stack([lo, hi], axis=-1).reshape(
      packed.shape[:-1] + (2 * packed.shape[-1],)
  )
  return ids[..., :length]


def unpack_crumbs(packed, length: int):
  """Inverse of data.pack_crumbs: (…, ceil(L/4)) uint8 -> (…, L) 2-bit ids."""
  vals = [(packed >> (2 * i)) & jnp.uint8(3) for i in range(4)]
  out = jnp.stack(vals, axis=-1).reshape(
      packed.shape[:-1] + (4 * packed.shape[-1],)
  )
  return out[..., :length]


def unpack_base3(packed, length: int):
  """Inverse of data.pack_base3: (…, ceil(L/3)) uint8 -> (…, L) ids < 5."""
  v0 = packed % jnp.uint8(5)
  v1 = (packed // jnp.uint8(5)) % jnp.uint8(5)
  v2 = packed // jnp.uint8(25)
  ids = jnp.stack([v0, v1, v2], axis=-1).reshape(
      packed.shape[:-1] + (3 * packed.shape[-1],)
  )
  return ids[..., :length]


def unpack_base12(packed, length: int):
  """Inverse of data.pack_base12: (…, 3k) uint8 -> (…, L) ids < 5."""
  b = packed.reshape(packed.shape[:-1] + (-1, 3)).astype(jnp.uint16)
  g0 = b[..., 0] | ((b[..., 1] & 0xF) << 8)
  g1 = (b[..., 1] >> 4) | (b[..., 2] << 4)
  lanes = []
  for g in (g0, g1):
    lanes.extend([g % 5, (g // 5) % 5, (g // 25) % 5, (g // 125) % 5,
                  g // 625])
  # lanes order: g0's 5 ids then g1's 5 ids per 3-byte group.
  ids = jnp.stack(lanes, axis=-1).reshape(packed.shape[:-1] + (-1,))
  return ids[..., :length].astype(jnp.uint8)


def _inclusive_count(mask_flat):
  """Inclusive running count of True over a flat bool array.

  A two-level prefix sum — per 4096-wide chunk plus chunk offsets — because
  a single giant 1-D cumsum lowers to a slow sequential scan on TPU
  (~67 ms at 4M elements vs ~2 ms this way).
  """
  n = mask_flat.shape[0]
  chunk = 4096
  pad = (-n) % chunk
  m = jnp.pad(mask_flat, (0, pad)).reshape(-1, chunk)
  within = jnp.cumsum(m.astype(jnp.int32), axis=1)  # inclusive
  offs = jnp.cumsum(within[:, -1]) - within[:, -1]  # exclusive chunks
  return (within + offs[:, None]).reshape(-1)[:n]


def decode_nibble_escape(codes_packed, esc):
  """Inverse of data.nibble_escape_encode on device.

  4-bit codes; 15 = take the next value from the escape stream (flat
  row-major order).
  """
  codes = unpack_nibbles(codes_packed, 2 * codes_packed.shape[-1])
  rows, lc = codes.shape
  flat = codes.reshape(-1)
  mask = flat == jnp.uint8(data.PWIP_ESC_CODE)
  pos = _inclusive_count(mask) - 1
  esc_v = jnp.take(esc, jnp.clip(pos, 0, esc.shape[0] - 1))
  return jnp.where(mask, esc_v, flat).reshape(rows, lc)


def unpack_bitcodes(packed, w: int):
  """Device inverse of data.pack_bitcodes: 1-D bytes -> 1-D w-bit codes."""
  if w == 4:
    return unpack_nibbles(packed, 2 * packed.shape[-1])
  if w == 6:
    b = packed.reshape(-1, 3)
    v0 = b[:, 0] & 63
    v1 = (b[:, 0] >> 6) | ((b[:, 1] & 15) << 2)
    v2 = (b[:, 1] >> 4) | ((b[:, 2] & 3) << 4)
    v3 = b[:, 2] >> 2
    return jnp.stack([v0, v1, v2, v3], -1).reshape(-1)
  assert w == 5, w
  b = packed.reshape(-1, 5)
  v0 = b[:, 0] & 31
  v1 = (b[:, 0] >> 5) | ((b[:, 1] & 3) << 3)
  v2 = (b[:, 1] >> 2) & 31
  v3 = (b[:, 1] >> 7) | ((b[:, 2] & 15) << 1)
  v4 = (b[:, 2] >> 4) | ((b[:, 3] & 1) << 4)
  v5 = (b[:, 3] >> 1) & 31
  v6 = (b[:, 3] >> 6) | ((b[:, 4] & 7) << 2)
  v7 = b[:, 4] >> 3
  return jnp.stack([v0, v1, v2, v3, v4, v5, v6, v7], -1).reshape(-1)


def decode_dense_pwip(flat_base_ids, codes_packed, esc, w: int = 4):
  """Gap-elided pw/ip decode (inverse of data.dense_pwip_encode).

  The dense stream holds w-bit+escape codes for the non-gap positions of
  the flat (cap_rows, L) layout in row-major order; gap positions (base id
  0) are exactly 0 — the encoder verified that invariant, so the scatter
  through the base-gap mask reconstructs the spaced values bit-exactly.
  """
  mask = flat_base_ids != 0
  flatm = mask.reshape(-1)
  idx = _inclusive_count(flatm) - 1  # dense-stream index per position
  codes = unpack_bitcodes(codes_packed, w)
  emask = codes == jnp.uint8((1 << w) - 1)
  eidx = _inclusive_count(emask) - 1
  esc_v = jnp.take(esc, jnp.clip(eidx, 0, esc.shape[0] - 1))
  dense = jnp.where(emask, esc_v, codes)
  vals = jnp.take(dense, jnp.clip(idx, 0, dense.shape[0] - 1))
  out = jnp.where(flatm, vals, jnp.uint8(0))
  return out.reshape(mask.shape)


def _dense_transport_entry(t, prefix: str):
  """(codes, esc, width) for a gap-elided feature in transport t, or None."""
  for w in data.DENSE_WIDTHS:
    suf = data.dense_key_suffix(w)
    if f'{prefix}_codes{suf}' in t:
      return t[f'{prefix}_codes{suf}'], t[f'{prefix}_esc{suf}'], w
  return None


def unpack_wire(buf, layout):
  """Device-side inverse of data.wire_pack: flat uint8 -> transport dict.

  `layout` is the static tuple from data.wire_layout; every slice offset and
  shape is a Python int, so this traces to static slices + reshapes that XLA
  fuses into the downstream decode. Multi-byte dtypes are rebuilt with
  little-endian byte arithmetic (matching numpy's .view on the host) rather
  than a raw bitcast, so the result is platform-independent; the final
  uint->int reinterpretation is a same-width bitcast (layout-free).
  """
  out = {}
  for k, dt, shape, off in layout:
    itemsize = np.dtype(dt).itemsize
    n = int(np.prod(shape, dtype=np.int64))
    raw = jax.lax.slice(buf, (off,), (off + n * itemsize,))
    if itemsize == 1:
      v = raw
    else:
      b = raw.reshape(n, itemsize)
      u = jnp.uint16 if itemsize == 2 else jnp.uint32
      v = b[:, 0].astype(u)
      for i in range(1, itemsize):
        v = v | (b[:, i].astype(u) << (8 * i))
      if dt in ('int16', 'int32'):
        v = jax.lax.bitcast_convert_type(
            v, jnp.int16 if itemsize == 2 else jnp.int32
        )
    out[k] = v.reshape(shape)
  return out


def reconstruct_compact(t, length: int, max_passes: Optional[int] = None):
  """Device-side ragged-transport decode -> compact feature dict.

  Rebuilds the (B, max_passes, L) padded feature layout from the
  minimum-byte flat transport (data.ragged_from_rows /
  data.RaggedBatchBuilder): one gather per feature; flat row 0 is the
  zeros sentinel, so padding slots reconstruct exactly the all-zero rows
  of the dense layout. pw/ip arrive nibble+escape encoded (decoded before
  the row gather) unless the batch overflowed the escape capacity.

  max_passes is only needed for transports whose strand ships 2-bit packed
  ('strand2', 4 ids/byte) — the packed width alone can't recover it.
  """
  if 'strand2' in t:
    if max_passes is None:
      # 4*packed_width only recovers multiples of 4; guessing would
      # silently reshape e.g. max_passes=30 into 32.
      raise ValueError(
          'max_passes is required to decode 2-bit packed strand (strand2)'
      )
    strand = unpack_crumbs(t['strand2'], int(max_passes))
    mp = int(max_passes)
  else:
    strand = t['strand']
    mp = strand.shape[-1]
  if 'passes' in t:
    # Flat rows are window-major contiguous, so the gather-index matrix
    # expands from one uint8 pass count per window (row 0 = sentinel).
    # The cumsum spans only the batch size (<= 4096) — cheap even as a
    # sequential scan.
    p = t['passes'].astype(jnp.int32)
    off = jnp.cumsum(p) - p
    j = jnp.arange(mp, dtype=jnp.int32)
    idx = jnp.where(
        j[None, :] < p[:, None], 1 + off[:, None] + j[None, :], 0
    )
  else:
    idx = t['row_index']  # legacy/synthetic transports
  if 'flat_bases12' in t:  # 12-bit packing (5 ids / 12 bits)
    bases_key, ccs_key, unpack_bases = 'flat_bases12', 'ccs12', unpack_base12
  else:  # legacy 3-ids-per-byte packing
    bases_key, ccs_key, unpack_bases = 'flat_bases', 'ccs', unpack_base3
  pw_entry = _dense_transport_entry(t, 'pwd')
  if pw_entry is not None:
    ip_entry = _dense_transport_entry(t, 'ipd')
    flat_base_ids = unpack_bases(t[bases_key], length)
    flat_pw = decode_dense_pwip(flat_base_ids, *pw_entry)
    flat_ip = decode_dense_pwip(flat_base_ids, *ip_entry)
  elif 'pw_codes' in t:
    flat_pw = decode_nibble_escape(t['pw_codes'], t['pw_esc'])[:, :length]
    flat_ip = decode_nibble_escape(t['ip_codes'], t['ip_esc'])[:, :length]
  else:
    flat_pw, flat_ip = t['flat_pw'], t['flat_ip']
  compact = {
      'bases': unpack_bases(jnp.take(t[bases_key], idx, axis=0), length),
      'pw': jnp.take(flat_pw, idx, axis=0),
      'ip': jnp.take(flat_ip, idx, axis=0),
      'strand': strand,
      'ccs': unpack_bases(t[ccs_key], length),
      'sn': t['sn'],
  }
  if 'ccs_bq' in t:
    compact['ccs_bq'] = t['ccs_bq']
  return compact


def _start_d2h(result) -> None:
  """Kicks off device->host copies for every array of a jit result.

  The transfer then overlaps later rounds' compute — behind the remote
  link D2H is a large fraction of round latency. Shared by every
  predict_*_async variant (and mirrored by the sharded runner).
  """
  for arr in result:
    try:
      arr.copy_to_host_async()
    except (AttributeError, RuntimeError):
      break


def _on_tpu() -> bool:
  try:
    return jax.devices()[0].platform in ('tpu', 'axon')
  except Exception:
    return False


class AsyncWeightUpload:
  """Background, leaf-chunked host->device weight transfer.

  device_put of a whole 34 MB pytree can block the calling thread in
  transfer backpressure behind a slow remote-TPU link, serializing the
  upload in front of round 0 (reference anchor: model init precedes
  streaming, quick_inference.py:485-532 — but nothing there overlaps it
  either). Uploading leaf by leaf on a daemon thread lets the host keep
  ingesting/featurizing, bounds each blocking call to one tensor, and
  records the wall time for the runtime diagnostics. Consumers block in
  `get()` only at first dispatch.

  Already-device-resident inputs (bench's shared-runner path) make every
  device_put a no-op and `get()` returns almost immediately.
  """

  def __init__(self, variables, sharding=None):
    import threading

    self._done = threading.Event()
    self._result = None
    self._error: Optional[BaseException] = None
    self.seconds: Optional[float] = None
    self._thread = threading.Thread(
        target=self._run, args=(variables, sharding), daemon=True
    )
    self._thread.start()

  def _run(self, variables, sharding):
    t0 = time.time()
    try:
      leaves, treedef = jax.tree_util.tree_flatten(variables)
      out = []
      for leaf in leaves:
        out.append(
            jax.device_put(leaf, sharding)
            if sharding is not None
            else jax.device_put(leaf)
        )
      jax.block_until_ready(out)
      self._result = jax.tree_util.tree_unflatten(treedef, out)
      # Only a COMPLETED upload records a wall time; a failed transfer's
      # elapsed time must not masquerade as an upload measurement in the
      # bench diagnostics (weights_upload_s).
      self.seconds = round(time.time() - t0, 2)
    except BaseException as e:  # re-raised at the consumer
      self._error = e
    finally:
      self._done.set()

  def get(self):
    self._done.wait()
    if self._error is not None:
      raise RuntimeError('weight upload failed') from self._error
    return self._result


class ModelRunner:
  """Owns the jitted forward pass over fixed-shape batches.

  Host->device transport uses the compact de-duplicated feature encoding
  (models/data.compact_from_rows; ~5.5x less data than the dense f32 tile —
  critical when the chip sits behind a network link). Device output is
  (argmax ids int8, max probability f32) per position — the minimal tensors
  the Q-score math needs — or (ids int8, quality uint8) after
  enable_device_q, which quantizes the Q chain on device bit-exactly
  (phred_bin_boundaries) for 4x fewer result bytes.
  """

  def __init__(self, params, variables, batch_size: int, dtype=jnp.float32):
    self.params = params
    self.batch_size = batch_size
    self.model = model_lib.get_model(params, dtype=dtype)
    enable_compilation_cache()
    # Pin weights on device once; every forward reuses them. The upload
    # runs on a background thread, leaf by leaf, so (a) the constructor
    # returns immediately and BAM ingest/featurize of the first rounds
    # overlaps the ~34 MB transfer, and (b) a tunnel stall mid-upload
    # blocks only that thread, not the host pipeline (BENCH_r04 measured
    # a serial 291 s upload in a bad phase).
    self._weights = AsyncWeightUpload(variables)
    # One-hot MXU embedding lookups on TPU (bit-identical to gathers and
    # ~4x faster there; CPU keeps gathers — the one-hot would materialize).
    embed_matmul = _on_tpu()

    use_fused = bool(params.get('use_pallas_fused_encoder', False))
    # Device-side quality quantization (enable_device_q): when set, the
    # forward returns (ids int8, quality uint8) instead of (ids, maxp f32)
    # — 4x fewer result bytes over the link, bit-exact vs the host chain
    # by construction (see phred_bin_boundaries).
    self._q_boundaries: Optional[np.ndarray] = None
    self.device_q = False

    def forward(variables, compact):
      if use_fused:
        # Embeddings via the flax module, then the fused Pallas encoder
        # stack + functional LayerNorm/logits tail.
        from deepconsensus_tpu.ops import fused_encoder as fe

        h = self.model.apply(
            variables,
            compact['bases'],
            compact['pw'],
            compact['ip'],
            compact['strand'],
            compact['ccs'],
            compact['sn'],
            compact.get('ccs_bq'),
            embed_matmul=embed_matmul,
            method='compact_embed',
        )
        logits = fe.fused_logits(
            variables['params'], h, params.num_hidden_layers,
            params.attn_win_size,
        )
      else:
        outputs = self.model.apply(
            variables,
            compact['bases'],
            compact['pw'],
            compact['ip'],
            compact['strand'],
            compact['ccs'],
            compact['sn'],
            compact.get('ccs_bq'),
            deterministic=True,
            embed_matmul=embed_matmul,
            method='compact_outputs',
        )
        logits = outputs['logits']
      probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
      ids = jnp.argmax(probs, axis=-1).astype(jnp.int8)
      conf = jnp.max(probs, axis=-1)
      if self._q_boundaries is not None:
        conf = quantize_conf(conf, self._q_boundaries)
      return ids, conf

    L = int(params.max_length)
    mp = int(params.max_passes)

    def forward_ragged(variables, t):
      return forward(variables, reconstruct_compact(t, L, mp))

    self._forward_ragged_fn = forward_ragged
    self._forward_compact_fn = forward
    self.transport = 'ragged'
    # Fused wire buffer: ship each ragged batch as ONE uint8 array (one
    # host->device transfer instead of ~9 — per-transfer overhead dominates
    # behind a network link). Bit-identical: unpack_wire is exact.
    self.wire_transport = bool(params.get('wire_transport', True))
    # Round-fused upload: one device_put for a whole round of wire batches
    # (see predict_round_async).
    self.round_upload = bool(params.get('round_upload', True))
    self._rebuild_jits()

  @property
  def variables(self):
    """Device-resident weights; blocks until the async upload completes."""
    return self._weights.get()

  @property
  def weights_upload_seconds(self) -> Optional[float]:
    """Wall time of the background upload (None while in flight)."""
    return self._weights.seconds

  def _rebuild_jits(self) -> None:
    """(Re)creates every jitted wrapper from the closure functions.

    Called at init and again by enable_device_q so no executable traced
    with the maxp-returning graph survives the switch. Each wrapper is a
    FRESH closure: jax.jit shares its trace cache by underlying-function
    identity, so re-jitting the same function object would silently reuse
    the stale executable (pinned by
    tests/test_device_quality.py::test_enable_device_q_invalidates...).
    """
    fwd, ragged = self._forward_compact_fn, self._forward_ragged_fn

    def forward(variables, compact):
      return fwd(variables, compact)

    def forward_ragged(variables, t):
      return ragged(variables, t)

    # Keep the original jit names: the persistent compilation cache keys
    # include them, and a rename would recompile every cached executable.
    self._forward = jax.jit(forward)
    self._forward_ragged = jax.jit(forward_ragged)
    self._wire_jits: Dict[Any, Any] = {}

  def enable_device_q(self, options: InferenceOptions) -> bool:
    """Switches the forward to return device-quantized uint8 qualities.

    Bit-exact vs quality_scores_from_probs for every float32 maxp (see
    phred_bin_boundaries); returns False (and changes nothing) when the
    calibration makes the host chain non-monotone. Must be called before
    the first dispatch — it re-creates the jitted wrappers so no
    executable traced with the maxp-returning graph survives.
    """
    return _enable_device_q(self, options)

  def _wire_fn(self, layout):
    """Per-layout compiled forward over a fused wire buffer (cached).

    Mirrored (with a shard_map wrapper) by
    parallel.dp_inference.ShardedModelRunner._dispatch_ragged — keep
    behavioral fixes in sync.
    """
    fn = self._wire_jits.get(layout)
    if fn is None:
      L = int(self.params.max_length)
      mp = int(self.params.max_passes)
      fwd = self._forward_compact_fn

      def wire_forward(variables, buf):
        t = unpack_wire(buf, layout)
        return fwd(variables, reconstruct_compact(t, L, mp))

      fn = jax.jit(wire_forward)
      self._wire_jits[layout] = fn
    return fn

  def _dispatch_ragged(self, ragged: Dict[str, np.ndarray]):
    """Runs the jitted forward on a ragged transport batch (maybe fused)."""
    if not self.wire_transport:
      return self._forward_ragged(self.variables, ragged)
    buf, layout = data.wire_pack(ragged)
    return self._wire_fn(layout)(self.variables, buf)

  # Granularity the fused round buffer pads to: coarse enough to keep the
  # number of distinct compiled (layout, round-size) pairs tiny, small
  # enough (<2% of a typical 13 MB round) not to waste link bytes.
  ROUND_PAD = 256 * 1024

  def predict_round_async(self, transports):
    """Enqueues a whole round of wire batches behind ONE host->device put.

    transports: [(ragged_dict, n_windows)]. The per-batch wire buffers
    concatenate into a single padded uint8 buffer uploaded once; each
    batch's span is carved out with a bare dynamic_slice (a tiny primitive
    compile per round-size/span pair) and fed to the SAME per-layout
    compiled forward the per-batch path uses — so the expensive executable
    never depends on the round size. Behind a high-latency link this turns
    4 upload RPCs per round into 1.
    """
    # Size pass first, then pack each batch straight into the round
    # buffer (wire_pack(out=...)): one host copy of the ~13 MB round
    # instead of per-batch buffers memcpy'd a second time.
    layouts = [data.wire_layout(t) for t, _ in transports]
    total = sum(nbytes for _, nbytes in layouts)
    padded = -(-total // self.ROUND_PAD) * self.ROUND_PAD
    round_buf = np.zeros(padded, np.uint8)
    offsets = []
    packed = []
    off = 0
    for (t, _), lt in zip(transports, layouts):
      packed.append(data.wire_pack(t, out=round_buf, offset=off, layout_total=lt))
      offsets.append(off)
      off += lt[1]
    dev_buf = jax.device_put(round_buf)
    out = []
    for (buf, layout), (_, n), off in zip(packed, transports, offsets):
      bslice = jax.lax.dynamic_slice(
          dev_buf, (np.int32(off),), (buf.nbytes,)
      )
      res = self._wire_fn(layout)(self.variables, bslice)
      _start_d2h(res)
      out.append((res, n))
    return out

  def predict_async(self, rows: np.ndarray, pass_limit=None,
                    num_passes=None):
    """Enqueues the forward without blocking; returns (handle, n).

    JAX dispatch is asynchronous: enqueueing all batches before collecting
    pipelines host->device transfer with device compute, which matters
    enormously when the chip sits behind a high-latency link. With
    num_passes (the engine path), the ragged minimum-byte transport ships
    only real subread rows; otherwise the pass-bucketed compact transport
    is used (pass_limit ships only that many subread rows; jit
    specializes per bucket shape).
    """
    n = rows.shape[0]
    padded = data.pad_batch(rows, self.batch_size)
    if num_passes is not None:
      ragged = data.ragged_from_rows(padded, num_passes, self.params)
      out = self._dispatch_ragged(ragged)
      _start_d2h(out)
      return out, n
    compact = data.compact_from_rows(padded, self.params, pass_limit)
    out = self._forward(self.variables, compact)
    _start_d2h(out)
    return out, n

  def predict_ragged_async(self, ragged: Dict[str, np.ndarray], n: int):
    """Enqueues a prebuilt ragged transport batch (block featurize path)."""
    out = self._dispatch_ragged(ragged)
    _start_d2h(out)
    return out, n

  def collect(self, handle_n) -> Tuple[np.ndarray, np.ndarray]:
    (ids, maxp), n = handle_n
    ids, maxp = jax.device_get((ids, maxp))
    return ids[:n], maxp[:n]

  def predict(self, rows: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Runs the forward on a (possibly partial) batch; pads to static shape."""
    return self.collect(self.predict_async(rows))


def quality_scores_from_probs(
    maxp: np.ndarray, options: InferenceOptions
) -> np.ndarray:
  """Softmax max-prob -> calibrated, clipped, rounded phred ints.

  Exactly the reference op sequence (quick_inference.py:377-389).
  """
  error_prob = 1.0 - maxp
  with np.errstate(divide='ignore'):
    quality_scores = -10.0 * np.log10(error_prob)
  if options.dc_calibration_values.enabled:
    quality_scores = calibration_lib.calibrate_quality_scores(
        quality_scores, options.dc_calibration_values
    )
  quality_scores = np.minimum(quality_scores, options.max_base_quality)
  quality_scores = np.round(quality_scores, decimals=0)
  quality_scores = quality_scores.astype(np.int32)
  return np.maximum(quality_scores, 0)


def quantize_conf(conf, boundaries):
  """uint8 quality bins from f32 max-probability, on device.

  Bit-exact vs quality_scores_from_probs for every float32 input by
  construction of the boundaries (phred_bin_boundaries): the quality is
  the count of per-bin lower boundaries at or below the probability.
  Shared by ModelRunner and parallel.dp_inference.ShardedModelRunner so
  the bit-exactness-critical expression exists once.
  """
  return jnp.sum(conf[..., None] >= boundaries, axis=-1).astype(jnp.uint8)


def _enable_device_q(runner, options: InferenceOptions) -> bool:
  """Common enable_device_q body for both runner classes.

  Computes the boundaries (declining non-monotone calibrations), installs
  them, and rebuilds EVERY jitted wrapper via the runner's _rebuild_jits
  so no executable traced with the maxp-returning graph survives.
  """
  boundaries = phred_bin_boundaries(options)
  if boundaries is None:
    return False
  runner._q_boundaries = boundaries
  runner._rebuild_jits()
  runner.device_q = True
  return True


def phred_bin_boundaries(options: InferenceOptions) -> Optional[np.ndarray]:
  """Exact f32 max-prob lower boundary of every quality bin, or None.

  quality_scores_from_probs is a monotone nondecreasing step function of
  maxp whenever the calibration is 'skip' or a threshold-0 linear
  transform with positive slope (the shipped v1.2 string "0,1.197654,
  -0.99781" qualifies; a threshold>0 calibration is piecewise and can
  step DOWN at the threshold, so it returns None and callers keep the
  host chain). The device can then reproduce the host chain BIT-EXACTLY
  for every possible float32 input as
      q(x) = #{k : x >= boundaries[k]}
  boundaries[k] is the smallest float32 in [0, 1] whose host-chain
  quality exceeds k, found by binary search over the float bit space
  evaluating the real host chain — so log10, calibration, rounding mode
  and clipping are captured by construction, not re-derived.
  """
  cal = options.dc_calibration_values
  if cal.enabled and (cal.threshold != 0 or cal.w <= 0):
    return None
  qmax = int(options.max_base_quality)

  def q_of(bits: int) -> int:
    x = np.uint32(bits).view(np.float32)
    return int(quality_scores_from_probs(np.asarray([x]), options)[0])

  one_bits = int(np.float32(1.0).view(np.uint32))
  q_top = q_of(one_bits)  # maxp == 1.0 -> +inf quality -> qmax clip
  boundaries = np.full(qmax, np.inf, np.float32)
  lo_floor = 0
  for k in range(qmax):
    if q_top <= k:
      break  # calibration caps quality below k+1: bins stay +inf
    lo, hi = lo_floor, one_bits  # invariant: q(lo) <= k < q(hi)
    if q_of(lo) > k:
      boundaries[k] = np.uint32(lo).view(np.float32)
      continue
    while hi - lo > 1:
      mid = (lo + hi) // 2
      if q_of(mid) > k:
        hi = mid
      else:
        lo = mid
    boundaries[k] = np.uint32(hi).view(np.float32)
    lo_floor = lo  # monotone: later bins start no lower
  return boundaries


def run_model_on_examples(
    feature_dicts: List[Dict[str, Any]],
    runner: ModelRunner,
    options: InferenceOptions,
) -> List[stitch.DCModelOutput]:
  """Batches windows through the model (quick_inference.py:341-415).

  All batches are enqueued asynchronously before any result is collected,
  so uploads, device compute, and downloads pipeline.
  """
  predictions = []
  batches = [
      b
      for b in data.batch_feature_dicts(
          feature_dicts, runner.params, options.batch_size, bucket_passes=True
      )
      if len(b['rows'])
  ]
  handles = [
      runner.predict_async(np.asarray(b['rows']), b.get('pass_limit'))
      for b in batches
  ]
  for batch, handle in zip(batches, handles):
    ids, conf = runner.collect(handle)
    if getattr(runner, 'device_q', False):
      quality_scores = conf.astype(np.int32)
    else:
      quality_scores = quality_scores_from_probs(conf, options)
    for y_pred, qs, window_pos, name, ec, np_, rq, rg in zip(
        ids,
        quality_scores,
        batch['window_pos'],
        batch['name'],
        batch['ec'],
        batch['np_num_passes'],
        batch['rq'],
        batch['rg'],
    ):
      predictions.append(
          stitch.DCModelOutput(
              window_pos=window_pos,
              molecule_name=name,
              ec=ec,
              np_num_passes=np_,
              rq=rq,
              rg=rg,
              sequence=phred.encoded_sequence_to_string(y_pred),
              quality_string=phred.quality_scores_to_string(qs),
          )
      )
  return predictions


def process_skipped_window(
    feature_dict: Dict[str, Any], options: InferenceOptions
) -> stitch.DCModelOutput:
  """Adopts the CCS sequence + qualities for a window skipped by triage.

  (reference: quick_inference.py:567-594)
  """
  rows = feature_dict['subreads']
  ccs_idx = configs.get_indices(options.max_passes, options.use_ccs_bq)[4]
  ccs = rows[ccs_idx[0], :, 0]
  ccs_seq = phred.encoded_sequence_to_string(ccs.astype(np.int64))
  ccs_quality_scores = feature_dict['ccs_base_quality_scores']
  if options.ccs_calibration_values.enabled:
    ccs_quality_scores = calibration_lib.calibrate_quality_scores(
        ccs_quality_scores, options.ccs_calibration_values
    )
  ccs_quality_scores = np.minimum(ccs_quality_scores, options.max_base_quality)
  ccs_quality_scores = ccs_quality_scores.astype(np.int32)
  return stitch.DCModelOutput(
      window_pos=feature_dict['window_pos'],
      molecule_name=feature_dict['name'],
      sequence=ccs_seq,
      quality_string=phred.quality_scores_to_string(ccs_quality_scores),
      ec=feature_dict['ec'],
      np_num_passes=feature_dict['np_num_passes'],
      rq=feature_dict['rq'],
      rg=feature_dict['rg'],
  )


def clip_maxima(params) -> Tuple[Any, Any, Any]:
  """(pw_max, ip_max, sn_max) for the transport featurizer; None = no clip."""
  return (
      params.PW_MAX or None,
      params.IP_MAX or None,
      params.SN_MAX or None,
  )


def preprocess_one_zmw_block(one_zmw, clips=(255, 255, 500)):
  """Featurizes one ZMW straight into transport layout (pool worker entry)."""
  reads, zmw, dc_config, window_widths = one_zmw
  assert window_widths is None, 'smart windows use the feature-dict path'
  return windows.zmw_window_block(reads, zmw, dc_config, *clips)


def featurize_round_blocks(
    inputs, batch_name, stats_counter, timing, clips, pool=None
):
  """featurize_round in transport layout: returns WindowBlocks per ZMW."""
  before = time.time()
  if pool is None:
    outputs = [preprocess_one_zmw_block(z, clips) for z in inputs]
  else:
    import functools

    outputs = list(
        pool.map(functools.partial(preprocess_one_zmw_block, clips=clips),
                 inputs)
    )
  blocks, counters = zip(*outputs)
  for c in counters:
    stats_counter.update(c)
  n_examples = sum(b.n_windows for b in blocks)
  n_subreads = sum(len(reads) for reads, *_ in inputs)
  timing.log('preprocess', batch_name, before, n_examples, n_subreads,
             len(inputs))
  return blocks, n_examples, n_subreads


def _skipped_output_from_block(
    block, i: int, options: InferenceOptions
) -> stitch.DCModelOutput:
  """process_skipped_window from WindowBlock arrays (same op sequence)."""
  ccs_seq = phred.encoded_sequence_to_string(block.ccs[i].astype(np.int64))
  qs = block.bq[i]
  if options.ccs_calibration_values.enabled:
    qs = calibration_lib.calibrate_quality_scores(
        qs, options.ccs_calibration_values
    )
  qs = np.minimum(qs, options.max_base_quality).astype(np.int32)
  return stitch.DCModelOutput(
      window_pos=int(block.window_pos[i]),
      molecule_name=block.name,
      sequence=ccs_seq,
      quality_string=phred.quality_scores_to_string(qs),
      ec=block.ec,
      np_num_passes=block.np_num_passes,
      rq=block.rq,
      rg=block.rg,
  )


def enqueue_round_blocks(
    blocks,
    runner: 'ModelRunner',
    options: InferenceOptions,
    batch_name: str,
    n_examples: int,
    n_subreads: int,
) -> '_RoundState':
  """Triage + ragged dispatch straight from WindowBlocks.

  The dense f32 tiles never exist: triage is a vectorized avg-phred over
  each block's quality rows, skipped windows read their CCS row from the
  block, and model windows stream into RaggedBatchBuilder as array views.
  Window order (and so output order) matches the feature-dict path exactly.
  """
  params = runner.params
  skipped: List[stitch.DCModelOutput] = []
  batches: List[Dict[str, Any]] = []
  handles: List[Any] = []
  meta_keys = ('window_pos', 'name', 'ec', 'np_num_passes', 'rq', 'rg')
  num_shards = getattr(runner, 'num_shards', 1)
  builder = data.RaggedBatchBuilder(params, options.batch_size)
  meta: Dict[str, List[Any]] = {k: [] for k in meta_keys}
  # Round-fused upload: buffer the round's transports and ship them behind
  # a single device_put (single-device wire runners only).
  fuse_round = bool(
      getattr(runner, 'round_upload', False)
      and getattr(runner, 'wire_transport', False)
      and num_shards == 1
  )
  pending: List[Any] = []

  def flush():
    nonlocal builder, meta
    if not builder.n:
      return
    transport = builder.build(num_shards)
    batches.append(meta)
    if fuse_round:
      pending.append((transport, builder.n))
    else:
      handles.append(runner.predict_ragged_async(transport, builder.n))
    builder = data.RaggedBatchBuilder(params, options.batch_size)
    meta = {k: [] for k in meta_keys}

  for block in blocks:
    nw = block.n_windows
    if not nw:
      continue
    if options.skip_windows_above:
      skip = phred.avg_phred_rows(block.bq) > options.skip_windows_above
    else:
      skip = np.zeros(nw, bool)
    if skip.any():
      for i in np.nonzero(skip)[0]:
        skipped.append(_skipped_output_from_block(block, int(i), options))
      keep = np.nonzero(~skip)[0]
      if not keep.size:
        continue
      breaks = np.nonzero(np.diff(keep) > 1)[0]
      starts = np.concatenate([[0], breaks + 1])
      ends = np.concatenate([breaks, [keep.size - 1]])
      runs = [(int(keep[s]), int(keep[e]) + 1) for s, e in zip(starts, ends)]
    else:
      runs = [(0, nw)]
    for i0, i1 in runs:
      while i0 < i1:
        take = min(builder.room, i1 - i0)
        builder.add_segment(block, i0, i0 + take)
        meta['window_pos'].extend(
            int(x) for x in block.window_pos[i0 : i0 + take]
        )
        for key, val in (
            ('name', block.name),
            ('ec', block.ec),
            ('np_num_passes', block.np_num_passes),
            ('rq', block.rq),
            ('rg', block.rg),
        ):
          meta[key].extend([val] * take)
        i0 += take
        if not builder.room:
          flush()
  flush()
  if fuse_round and pending:
    handles.extend(runner.predict_round_async(pending))
  return _RoundState(
      batch_name=batch_name,
      batches=batches,
      handles=handles,
      skipped_predictions=skipped,
      n_examples=n_examples,
      n_subreads=n_subreads,
      num_zmws=len(blocks),
      enqueued_at=time.time(),
  )


def preprocess_one_zmw(one_zmw) -> Tuple[List[Dict[str, Any]], Any]:
  """Featurizes one ZMW into window feature dicts (pool worker entry)."""
  reads, zmw, dc_config, window_widths = one_zmw
  stack = windows.subreads_to_zmw_stack(
      subreads=reads,
      ccs_seqname=zmw,
      dc_config=dc_config,
      window_widths=window_widths,
  )
  feature_dicts = [wf.to_dict() for wf in stack.iter_windows()]
  return feature_dicts, stack.counter


def triage_windows(
    feature_dicts_for_zmws, options: InferenceOptions
) -> Tuple[List[Dict[str, Any]], List[stitch.DCModelOutput]]:
  """Splits windows into model inputs vs CCS-adopting skips.

  (reference: quick_inference.py:655-677)
  """
  for_model = []
  skipped = []
  for one_zmw in feature_dicts_for_zmws:
    for window in one_zmw:
      if window['overflow']:
        skipped.append(process_skipped_window(window, options))
        continue
      if options.skip_windows_above:
        avg_q = phred.avg_phred(window['ccs_base_quality_scores'])
        if avg_q > options.skip_windows_above:
          skipped.append(process_skipped_window(window, options))
          continue
      for_model.append(window)
  return for_model, skipped


class OutputWriter:
  """FASTQ or unmapped-BAM output sink (quick_inference.py:877-897,738-760).

  The output file opens LAZILY at the first write (or at close, so a
  zero-read run still leaves the empty file the reference would): name
  validation stays eager, but a run that dies during setup — e.g. a
  background weight upload failing on a wedged tunnel before any round
  completes — must not have already truncated a pre-existing file at the
  output path.
  """

  def __init__(self, output_fname: str, ccs_bam_path: str):
    self.is_bam = output_fname.endswith('.bam')
    if not (
        output_fname.endswith('.fq')
        or output_fname.endswith('.fastq')
        or self.is_bam
    ):
      raise NameError('Filename must end in .fq, .fastq, or .bam')
    out_dir = os.path.dirname(output_fname)
    if out_dir and not os.path.exists(out_dir):
      os.makedirs(out_dir, exist_ok=True)
    self._output_fname = output_fname
    self._ccs_bam_path = ccs_bam_path
    self._writer = None

  def _ensure_open(self):
    if self._writer is not None:
      return
    if self.is_bam:
      with bam.BamReader(self._ccs_bam_path) as reader:
        header = reader.header
      self._writer = bam.BamWriter(self._output_fname, header)
    else:
      self._writer = fastq.FastqWriter(self._output_fname)

  def write(self, fastq_string: str, first_pred: stitch.DCModelOutput) -> None:
    self._ensure_open()
    if not self.is_bam:
      self._writer.write_str(fastq_string)
      return
    name, seq, _, qual = fastq_string.splitlines()
    name = name[1:]
    qual_arr = np.frombuffer(qual.encode(), np.uint8) - 33
    tags = [
        # `ec` may legitimately be 0.0 — only None means "absent".
        bam.encode_tag(
            'ec', -1 if first_pred.ec is None else first_pred.ec, 'f'
        ),
        bam.encode_tag('np', first_pred.np_num_passes, 'i'),
        bam.encode_tag('rq', first_pred.rq, 'f'),
        bam.encode_tag('RG', first_pred.rg, 'Z'),
    ]
    try:
      # PacBio movie/zmw/ccs naming; non-PacBio names simply omit zm.
      tags.append(bam.encode_tag('zm', int(name.split('/')[1]), 'i'))
    except (IndexError, ValueError):
      pass
    tags = b''.join(tags)
    blob = bam.build_record_blob(
        qname=name, flag=4, seq=seq, qual=qual_arr, tags=tags, mapq=255
    )
    self._writer.write_blob(blob)

  def close(self, materialize: bool = True):
    """Closes the sink. materialize=True creates the (empty) file even if
    nothing was written — the reference leaves an empty output for a
    clean zero-read run; pass False on a FAILED run so a pre-existing
    file at the output path survives untouched."""
    if self._writer is None:
      if not materialize:
        return
      self._ensure_open()
    self._writer.close()


@dataclasses.dataclass
class _RoundState:
  """A ZMW round in flight: enqueued device work + host-side leftovers."""

  batch_name: str
  batches: List[Dict[str, Any]]
  handles: List[Any]
  skipped_predictions: List[stitch.DCModelOutput]
  n_examples: int
  n_subreads: int
  num_zmws: int
  enqueued_at: float


def featurize_round(
    inputs, batch_name, stats_counter, timing, pool=None
):
  """Host featurization for one ZMW round; returns per-ZMW window dicts."""
  before = time.time()
  if pool is None:
    outputs = [preprocess_one_zmw(z) for z in inputs]
  else:
    outputs = list(pool.map(preprocess_one_zmw, inputs))
  feature_dicts_for_zmws, counters = zip(*outputs)
  for c in counters:
    stats_counter.update(c)
  n_examples = sum(len(z) for z in feature_dicts_for_zmws)
  n_subreads = sum(len(reads) for reads, *_ in inputs)
  timing.log('preprocess', batch_name, before, n_examples, n_subreads,
             len(inputs))
  return feature_dicts_for_zmws, n_examples, n_subreads


def enqueue_round(
    feature_dicts_for_zmws,
    runner: 'ModelRunner',
    options: InferenceOptions,
    batch_name: str,
    n_examples: int,
    n_subreads: int,
) -> _RoundState:
  """Triage + asynchronous model dispatch (results collected later)."""
  for_model, skipped = triage_windows(feature_dicts_for_zmws, options)
  # Ragged-transport runners batch all windows together (full batches, no
  # per-bucket fragmentation); bucketed runners group by pass tier.
  ragged = getattr(runner, 'transport', 'compact') == 'ragged'
  batches = [
      b
      for b in data.batch_feature_dicts(
          for_model, runner.params, options.batch_size,
          bucket_passes=not ragged,
      )
      if len(b['rows'])
  ]
  handles = [
      runner.predict_async(
          np.asarray(b['rows']),
          b.get('pass_limit'),
          num_passes=b['num_passes'] if ragged else None,
      )
      for b in batches
  ]
  # finish_round reads only the per-window metadata; keeping the dense
  # f32 'rows' tiles (and labels) in the round state would pin ~35 MB per
  # full batch for every in-flight round until collection.
  meta_keys = ('window_pos', 'name', 'ec', 'np_num_passes', 'rq', 'rg')
  meta_batches = [{k: b[k] for k in meta_keys} for b in batches]
  return _RoundState(
      batch_name=batch_name,
      batches=meta_batches,
      handles=handles,
      skipped_predictions=skipped,
      n_examples=n_examples,
      n_subreads=n_subreads,
      num_zmws=len(feature_dicts_for_zmws),
      enqueued_at=time.time(),
  )


def threaded_iter(gen, maxsize: int = 512):
  """Runs a generator on a background thread with a bounded queue.

  Overlaps BAM ingest (the feeder generator) with featurization and
  dispatch on the consuming thread. Exceptions re-raise at the consumer.
  A consumer that stops early (generator .close(), e.g. --limit breaking
  out of the round loop, or GC of an abandoned iterator) stops the
  producer too: without that, the producer thread would fill the queue
  and block on q.put forever, pinning the buffered subread tuples and
  the open BAM readers for process lifetime.
  """
  import queue as queue_lib
  import threading

  q: 'queue_lib.Queue' = queue_lib.Queue(maxsize=maxsize)
  done = object()
  stop = threading.Event()

  def put_until_stopped(item) -> bool:
    """Bounded put that gives up once the consumer has detached."""
    while not stop.is_set():
      try:
        q.put(item, timeout=0.5)
        return True
      except queue_lib.Full:
        continue
    return False

  def run():
    try:
      for item in gen:
        if not put_until_stopped(item):
          return
      put_until_stopped(done)
    except BaseException as e:  # re-raised at the consumer
      put_until_stopped(e)
    finally:
      # Close the generator HERE, not via GC: its finally blocks release
      # open BAM readers promptly on any exit (incl. consumer detach).
      gen.close()

  t = threading.Thread(target=run, daemon=True)
  t.start()
  try:
    while True:
      item = q.get()
      if item is done:
        break
      if isinstance(item, BaseException):
        raise item
      yield item
  finally:
    stop.set()


class AsyncDispatcher:
  """Runs enqueue_round on a dedicated thread.

  jit dispatch is normally asynchronous, but when the host->device link
  saturates (the remote-TPU tunnel under load) dispatch blocks in
  transfer backpressure; a single dispatch thread lets the main thread
  keep ingesting/featurizing later rounds through that stall. One worker
  preserves round order and keeps all dispatch on one thread.
  """

  def __init__(self):
    self._ex = concurrent.futures.ThreadPoolExecutor(max_workers=1)

  def submit(self, fn, *args, **kwargs):
    """Runs fn(*args) (an enqueue_round variant) off-thread -> Future."""
    return self._ex.submit(fn, *args, **kwargs)

  def shutdown(self):
    self._ex.shutdown(wait=True)


def _predictions_from_batch(batch, ids, quality_scores):
  # One vectorized decode for the whole batch; per-window strings are row
  # slices of the decoded bytes.
  seq_bytes = constants.SEQ_VOCAB_BYTES[np.asarray(ids).astype(np.intp)]
  qual_bytes = (np.asarray(quality_scores) + 33).astype(np.uint8)
  out = []
  for i, (window_pos, name, ec, np_, rq, rg) in enumerate(zip(
      batch['window_pos'],
      batch['name'],
      batch['ec'],
      batch['np_num_passes'],
      batch['rq'],
      batch['rg'],
  )):
    out.append(
        stitch.DCModelOutput(
            window_pos=window_pos,
            molecule_name=name,
            ec=ec,
            np_num_passes=np_,
            rq=rq,
            rg=rg,
            sequence=seq_bytes[i].tobytes().decode('ascii'),
            quality_string=qual_bytes[i].tobytes().decode('ascii'),
        )
    )
  return out


def finish_round(
    state: _RoundState,
    runner: 'ModelRunner',
    output_writer: OutputWriter,
    options: InferenceOptions,
    outcome_counter: stitch.OutcomeCounter,
    timing: Timing,
) -> None:
  """Collects device results, stitches, writes output for one round."""
  predictions = []
  # One gathered device_get for the whole round: transfers for every batch
  # are issued together (and were already started at enqueue time), so the
  # tunnel round-trip is paid once per round, not once per batch.
  fetched = jax.device_get([h for h, _ in state.handles])
  device_q = getattr(runner, 'device_q', False)
  for batch, (handle_n, (ids, conf)) in zip(
      state.batches, zip(state.handles, fetched)
  ):
    n = handle_n[1]
    ids, conf = ids[:n], conf[:n]
    if device_q:
      quality_scores = conf.astype(np.int32)
    else:
      quality_scores = quality_scores_from_probs(conf, options)
    predictions.extend(_predictions_from_batch(batch, ids, quality_scores))
  predictions.extend(state.skipped_predictions)
  timing.log('run_model', state.batch_name, state.enqueued_at,
             state.n_examples, state.n_subreads, state.num_zmws)

  before = time.time()
  predictions.sort(key=lambda dc: (dc.molecule_name, dc.window_pos))
  import itertools

  for zmw, preds in itertools.groupby(
      predictions, lambda p: p.molecule_name
  ):
    preds = list(preds)
    fastq_string = stitch.stitch_to_fastq(
        molecule_name=zmw,
        predictions=preds,
        max_length=options.max_length,
        min_quality=options.min_quality,
        min_length=options.min_length,
        outcome_counter=outcome_counter,
    )
    if fastq_string:
      output_writer.write(fastq_string, preds[0])
  timing.log('stitch_and_write_fastq', state.batch_name, before,
             state.n_examples, state.n_subreads, state.num_zmws)


def inference_on_n_zmws(
    inputs: Sequence[Any],
    runner: Optional[ModelRunner],
    output_writer: OutputWriter,
    options: InferenceOptions,
    batch_name: str,
    outcome_counter: stitch.OutcomeCounter,
    stats_counter,
    timing: Timing,
    pool=None,
    end_after_stage: str = 'full',
) -> None:
  """Full pipeline for one batch of ZMWs (quick_inference.py:598-774)."""
  before_batch = time.time()
  if end_after_stage == 'dc_input':
    # Featurization is spacing+windowing; dc_input stops after spacing.
    for reads, zmw, dc_config, window_widths in inputs:
      windows.subreads_to_zmw_stack(reads, zmw, dc_config, window_widths)
    timing.log('preprocess', batch_name, before_batch, None,
               sum(len(r) for r, *_ in inputs), len(inputs))
    return
  feats, n_examples, n_subreads = featurize_round(
      inputs, batch_name, stats_counter, timing, pool
  )
  if end_after_stage == 'tf_examples':
    return
  state = enqueue_round(
      feats, runner, options, batch_name, n_examples, n_subreads
  )
  if end_after_stage == 'run_model':
    for batch, handle in zip(state.batches, state.handles):
      runner.collect(handle)
    timing.log('run_model', batch_name, state.enqueued_at, n_examples,
               n_subreads, len(inputs))
    return
  finish_round(state, runner, output_writer, options, outcome_counter, timing)
  logger.info(
      'Processed a batch of %d ZMWs in %0.3f seconds',
      len(inputs),
      time.time() - before_batch,
  )


def load_model_for_inference(
    checkpoint_path: str,
    batch_size: int,
    dtype=jnp.float32,
    num_devices: Optional[int] = None,
    param_overrides: Optional[Dict[str, Any]] = None,
    variables: Optional[Any] = None,
):
  """Loads params.json + weights; returns (runner, params).

  Accepts: an orbax checkpoint dir produced by this framework (contains
  params.json beside it), a reference TF checkpoint prefix (translated
  via models/checkpoint.load_tf_checkpoint), or a reference SavedModel
  directory (auto-detected by its saved_model.pb, mirroring the
  reference's dual-format detection at quick_inference.py:797-800 and
  load at :512-529). param_overrides patches
  non-weight-affecting params (e.g. use_pallas_attention). Passing
  `variables` (e.g. another runner's already device-resident weights)
  skips the checkpoint read AND the ~34 MB host->device re-upload — the
  one-upload path bench.py uses to build several runners per process.
  """
  params = configs.read_params_from_json(checkpoint_path)
  if param_overrides:
    with params.unlocked():
      for k, v in param_overrides.items():
        params[k] = v
  configs.finalize_params(params, is_training=False)
  if variables is not None:
    if num_devices is not None and num_devices > 1:
      from deepconsensus_tpu.parallel import dp_inference

      runner = dp_inference.ShardedModelRunner(
          params, variables, batch_size, num_devices=num_devices,
          dtype=dtype,
      )
    else:
      runner = ModelRunner(params, variables, batch_size, dtype=dtype)
    return runner, params
  model = model_lib.get_model(params)
  variables = model_lib.init_params(model, params)
  from deepconsensus_tpu.io import tf_bundle

  if tf_bundle.is_saved_model_dir(checkpoint_path):
    variables = ckpt_lib.load_saved_model(checkpoint_path, variables, params)
  elif os.path.isdir(checkpoint_path) and (
      os.path.exists(os.path.join(checkpoint_path, '_CHECKPOINT_METADATA'))
      or os.path.exists(os.path.join(checkpoint_path, 'd'))
      or os.path.exists(os.path.join(checkpoint_path, 'manifest.ocdbt'))
  ):
    payload = ckpt_lib.load_checkpoint(
        checkpoint_path, {'variables': jax.device_get(variables)}
    )
    variables = payload['variables']
  elif os.path.isdir(checkpoint_path):
    latest = ckpt_lib.latest_checkpoint(checkpoint_path)
    if latest is None:
      raise FileNotFoundError(f'no checkpoint under {checkpoint_path}')
    payload = ckpt_lib.load_checkpoint(
        latest, {'variables': jax.device_get(variables)}
    )
    variables = payload['variables']
  else:
    # TF checkpoint prefix (reference release format).
    variables = ckpt_lib.load_tf_checkpoint(checkpoint_path, variables, params)
  if num_devices is not None and num_devices > 1:
    from deepconsensus_tpu.parallel import dp_inference

    runner = dp_inference.ShardedModelRunner(
        params, variables, batch_size, num_devices=num_devices, dtype=dtype
    )
  else:
    runner = ModelRunner(params, variables, batch_size, dtype=dtype)
  return runner, params


def run_inference(
    subreads_to_ccs: str,
    ccs_bam: str,
    checkpoint_path: str,
    output: str,
    batch_size: int = 1024,
    batch_zmws: int = 100,
    skip_windows_above: int = 45,
    min_quality: int = 20,
    min_length: int = 0,
    ins_trim: int = 5,
    use_ccs_smart_windows: bool = False,
    cpus: int = 0,
    limit: Optional[int] = None,
    max_base_quality: int = 93,
    dc_calibration: Optional[str] = None,
    ccs_calibration: str = 'skip',
    dtype=jnp.float32,
    num_devices: Optional[int] = None,
    host_id: int = 0,
    num_hosts: int = 1,
    end_after_stage: str = 'full',
    use_pallas_attention: bool = False,
    use_fused_encoder: bool = False,
    matmul_precision: Optional[str] = None,
    lookahead: int = 2,
    device_quality: bool = True,
) -> stitch.OutcomeCounter:
  """End-to-end inference run (reference: quick_inference.run, :794-963).

  num_devices > 1 shards each window batch over a chip mesh; num_hosts > 1
  makes this process consume only its round-robin share of ZMWs (writing a
  partial output for deterministic merging). end_after_stage in
  DEBUG_STAGES stops each ZMW batch early for pipeline-prefix timing.
  lookahead bounds how many ZMW rounds may be in flight on the device at
  once (deeper pipelines absorb more tunnel-latency jitter at the cost of
  holding more round state on the host).
  """
  if end_after_stage not in DEBUG_STAGES:
    raise ValueError(f'end_after_stage must be one of {DEBUG_STAGES}')
  if matmul_precision:
    # 'highest' forces strict f32 matmuls (TPU default uses bf16 MXU
    # passes for f32 inputs — fine for throughput, not for bit parity).
    jax.config.update('jax_default_matmul_precision', matmul_precision)
  overrides = {}
  if use_pallas_attention:
    overrides['use_pallas_attention'] = True
  if use_fused_encoder:
    overrides['use_pallas_fused_encoder'] = True
  overrides = overrides or None
  if end_after_stage in ('dc_input', 'tf_examples'):
    # No model needed for featurization-only timing runs
    # (quick_inference.py:501-502).
    runner = None
    params = configs.read_params_from_json(checkpoint_path)
    configs.finalize_params(params, is_training=False)
  else:
    runner, params = load_model_for_inference(
        checkpoint_path, batch_size, dtype, num_devices=num_devices,
        param_overrides=overrides,
    )

  if dc_calibration is None:
    dc_calibration = params.get('dc_calibration', 'skip')
  dc_cal = calibration_lib.parse_calibration_string(dc_calibration)
  ccs_cal = calibration_lib.parse_calibration_string(ccs_calibration)

  dc_config = windows.DcConfig(
      params.max_passes, params.max_length, params.use_ccs_bq
  )
  # The sharded runner rounds its batch up to a device multiple; batches
  # must be BUILT at that size too, or RaggedBatchBuilder produces a
  # batch whose window count doesn't split across the mesh
  # (data._split_segments indexes shards[n] for the tail windows).
  effective_batch = getattr(runner, 'batch_size', batch_size)
  options = InferenceOptions(
      max_length=params.max_length,
      example_height=dc_config.tensor_height,
      max_passes=params.max_passes,
      min_quality=min_quality,
      min_length=min_length,
      batch_size=effective_batch,
      use_ccs_bq=params.use_ccs_bq,
      cpus=cpus,
      skip_windows_above=skip_windows_above,
      max_base_quality=max_base_quality,
      dc_calibration_values=dc_cal,
      ccs_calibration_values=ccs_cal,
  )

  # Device-side Q quantization: bit-exact vs the host chain (see
  # phred_bin_boundaries) and 4x fewer result bytes over the link; a
  # piecewise calibration falls back to the host chain automatically.
  if runner is not None and device_quality and hasattr(
      runner, 'enable_device_q'
  ):
    runner.enable_device_q(options)

  outcome_counter = stitch.OutcomeCounter()
  stats_counter = collections.Counter()
  timing = Timing()

  pool = None
  if cpus > 0:
    pool = concurrent.futures.ProcessPoolExecutor(max_workers=cpus)
  elif cpus < 0:
    raise ValueError('cpus must be >= 0')

  output_writer = OutputWriter(output, ccs_bam)

  proc_feeder, main_counter = feeder.create_proc_feeder(
      subreads_to_ccs=subreads_to_ccs,
      ccs_bam=ccs_bam,
      dc_config=dc_config,
      ins_trim=ins_trim,
      use_ccs_smart_windows=use_ccs_smart_windows,
  )

  before_all = time.time()
  stored = []
  zmw_counter = 0
  zmw_index = 0
  batch_count = 0
  # Round lookahead: while the device computes rounds k..k+lookahead-1, the
  # host featurizes the next one. Dispatch runs on the AsyncDispatcher
  # thread so even when it blocks (H2D backpressure on a saturated link)
  # the main thread keeps featurizing. Rounds finish strictly in order, so
  # output is deterministic at any depth.
  dispatcher = AsyncDispatcher()
  in_flight: List[Any] = []  # Futures[_RoundState], oldest first

  # The transport-native block path: featurize straight into the uint8
  # ragged transport (no f32 tiles). Applies to every ragged-transport
  # runner — ModelRunner AND ShardedModelRunner (both set
  # transport='ragged'; the sharded one is why batches must be built at
  # the runner's device-rounded batch size above); smart windows and
  # debug stages keep the feature-dict path.
  use_blocks = (
      end_after_stage == 'full'
      and runner is not None
      and getattr(runner, 'transport', 'compact') == 'ragged'
      and not use_ccs_smart_windows
  )
  clips = clip_maxima(params)

  def finish_oldest():
    finish_round(
        in_flight.pop(0).result(), runner, output_writer, options,
        outcome_counter, timing,
    )

  def process_round(round_inputs, name):
    if end_after_stage != 'full':
      inference_on_n_zmws(
          round_inputs, runner, output_writer, options, name,
          outcome_counter, stats_counter, timing, pool,
          end_after_stage=end_after_stage,
      )
      return
    if use_blocks:
      feats, n_examples, n_subreads = featurize_round_blocks(
          round_inputs, name, stats_counter, timing, clips, pool
      )
      in_flight.append(dispatcher.submit(
          enqueue_round_blocks, feats, runner, options, name, n_examples,
          n_subreads,
      ))
    else:
      feats, n_examples, n_subreads = featurize_round(
          round_inputs, name, stats_counter, timing, pool
      )
      in_flight.append(dispatcher.submit(
          enqueue_round, feats, runner, options, name, n_examples, n_subreads
      ))
    while len(in_flight) > max(1, lookahead):
      finish_oldest()

  # Ingest runs on a background thread so BAM decode of the next ZMWs
  # overlaps featurization/dispatch of the current round. The finally
  # releases every resource on ANY exit: without it, an exception
  # surfacing mid-run (a stitch error, a device failure) would leak the
  # process pool and dispatcher thread and never close output_writer —
  # losing buffered output and, for .bam, the BGZF EOF marker.
  run_ok = False
  try:
    ingest = threaded_iter(proc_feeder())
    for reads, zmw, cfg, split, window_widths in ingest:
      # --limit counts GLOBAL ZMW index (reference
      # quick_inference.py:905-911) so the union of per-host partials is
      # exactly `limit` ZMWs regardless of --num_hosts.
      if limit and zmw_index >= limit:
        ingest.close()  # stops the producer thread promptly
        break
      my_zmw = zmw_index % num_hosts == host_id
      zmw_index += 1
      if not my_zmw:
        continue
      zmw_counter += 1
      stored.append((reads, zmw, cfg, window_widths))
      if batch_zmws and len(stored) >= batch_zmws:
        process_round(stored, str(batch_count))
        batch_count += 1
        stored = []
        logger.info(
            'Processed %s ZMWs in %0.3f seconds',
            zmw_counter,
            time.time() - before_all,
        )
    if stored:
      process_round(stored, str(batch_count))
    while in_flight:
      finish_oldest()
    run_ok = True
  finally:
    dispatcher.shutdown()
    if pool:
      pool.shutdown(wait=True)
    # On failure, don't materialize a never-opened output: a run that
    # died during setup must leave a pre-existing file at --output alone.
    output_writer.close(materialize=run_ok)

  elapsed = time.time() - before_all
  logger.info('Processed %s ZMWs in %0.3f seconds', zmw_counter, elapsed)
  logger.info('Outcome counts: %s', outcome_counter)
  stats_counter.update(main_counter)
  timing.save(f'{output}.runtime.csv')
  with open(f'{output}.inference.json', 'w') as f:
    json.dump(dict(stats_counter), f, indent=True)
  return outcome_counter
