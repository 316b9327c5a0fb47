"""Data-parallel inference: shard the window batch across a chip mesh.

The reference runs inference on a single device and scales by running ~500
independent 16-CPU shard jobs (reference: docs/quick_start.md:83-99,
models/model_inference.py:94-96). The TPU-native equivalents, both here:

* **chip-level**: one host drives an N-chip mesh; each fixed-shape window
  batch is sharded on axis 0 (`jax.sharding`), weights replicated, XLA
  splits the forward with zero collectives (the model is per-window).
* **host-level**: each host consumes a disjoint ZMW SUBSET of the shard
  (round-robin by ZMW index — an interleave, not a contiguous range) and
  writes a partial FASTQ; `merge_fastq_partials` concatenates them in
  host order — deterministic for a fixed host count, same read multiset
  as a single-host run (the order regroups by host).
"""

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deepconsensus_tpu.models import data, model as model_lib
from deepconsensus_tpu.parallel import mesh as mesh_lib


class ShardedModelRunner:
  """Drop-in ModelRunner running batches sharded across a device mesh."""

  def __init__(
      self,
      params,
      variables,
      batch_size: int,
      num_devices: Optional[int] = None,
      dtype=jnp.float32,
  ):
    self.params = params
    self.mesh = mesh_lib.make_mesh(num_devices)
    n_dev = self.mesh.devices.size
    if batch_size % n_dev != 0:
      batch_size = ((batch_size + n_dev - 1) // n_dev) * n_dev
    self.batch_size = batch_size
    self.model = model_lib.get_model(params, dtype=dtype)
    repl = mesh_lib.replicated(self.mesh)
    shard = mesh_lib.batch_sharding(self.mesh)
    from deepconsensus_tpu.inference import engine as engine_lib

    # Background leaf-chunked replicated upload (see engine.AsyncWeightUpload).
    self._weights = engine_lib.AsyncWeightUpload(variables, sharding=repl)
    # One-hot MXU embedding lookups on TPU (bit-identical; see engine).
    embed_matmul = engine_lib._on_tpu()
    # Device-side quality quantization (enable_device_q; see
    # engine.phred_bin_boundaries): when set, forwards return
    # (ids int8, quality uint8) — bit-exact vs the host chain.
    self._q_boundaries = None
    self.device_q = False

    def forward(variables, compact):
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
      probs = jax.nn.softmax(outputs['logits'].astype(jnp.float32), axis=-1)
      ids = jnp.argmax(probs, axis=-1).astype(jnp.int8)
      conf = jnp.max(probs, axis=-1)
      if self._q_boundaries is not None:
        conf = engine_lib.quantize_conf(conf, self._q_boundaries)
      return ids, conf

    dense_in_shardings = (repl, {  # batch axis sharded per input
        k: shard
        for k in ('bases', 'pw', 'ip', 'strand', 'ccs', 'sn', 'ccs_bq')
    } if params.use_ccs_bq else {
        k: shard for k in ('bases', 'pw', 'ip', 'strand', 'ccs', 'sn')
    })

    # Ragged minimum-byte transport, sharded: the host builds one
    # independent flat transport per device (data.RaggedBatchBuilder
    # build(num_shards), stacked on a leading axis) and shard_map runs the
    # single-chip reconstruction + forward on each device's own shard —
    # the flat-array gather never crosses devices, so no collectives.
    from jax.sharding import PartitionSpec as P

    L = int(params.max_length)
    mp = int(params.max_passes)
    axis = mesh_lib.DATA_AXIS

    def forward_ragged_shard(variables, t):
      t1 = jax.tree_util.tree_map(lambda v: v[0], t)  # strip shard axis
      compact = engine_lib.reconstruct_compact(t1, L, mp)
      ids, maxp = forward(variables, compact)
      return ids[None], maxp[None]

    fr = mesh_lib.shard_map(
        forward_ragged_shard,
        mesh=self.mesh,
        in_specs=(P(), P(axis)),
        out_specs=P(axis),
    )

    def forward_ragged(variables, t):
      ids, maxp = fr(variables, t)
      return ids.reshape(-1, L), maxp.reshape(-1, L)

    self._forward_ragged_fn = forward_ragged

    def rebuild_jits():
      # Shared with enable_device_q: EVERY jitted wrapper (including the
      # sharded dense-rows _forward) is re-created so no executable
      # traced with the maxp-returning graph survives the switch. Fresh
      # closures each time: jax.jit shares its trace cache by
      # underlying-function identity (see engine.ModelRunner._rebuild_jits).
      fwd, ragged = forward, forward_ragged

      def forward_wrap(variables, compact):
        return fwd(variables, compact)

      def forward_ragged_wrap(variables, t):
        return ragged(variables, t)

      # __name__ matches the originals: the persistent compilation cache
      # keys include the jit name; a rename would recompile everything.
      forward_wrap.__name__ = 'forward'
      forward_ragged_wrap.__name__ = 'forward_ragged'
      self._forward = jax.jit(
          forward_wrap,
          in_shardings=dense_in_shardings,
          out_shardings=(shard, shard),
      )
      self._forward_ragged = jax.jit(forward_ragged_wrap)
      self._wire_jits = {}

    self._rebuild_jits = rebuild_jits
    rebuild_jits()
    self.transport = 'ragged'
    self.num_shards = n_dev
    # Fused wire transport (see engine.ModelRunner._dispatch_ragged): each
    # shard's transport packs to one flat uint8 buffer; the (n_dev, nbytes)
    # stack shards over the mesh and every device unpacks its own row.
    self.wire_transport = bool(params.get('wire_transport', True))
    self._mesh_axis = axis
    self._forward_compact_fn = forward

  @property
  def variables(self):
    """Replicated device weights; blocks until the async upload completes."""
    return self._weights.get()

  @property
  def weights_upload_seconds(self):
    return self._weights.seconds

  def enable_device_q(self, options) -> bool:
    """Device-quantized uint8 qualities (see engine.enable_device_q).

    Must be called before the first dispatch; re-creates every jitted
    wrapper (dense sharded, ragged, wire) via _rebuild_jits.
    """
    from deepconsensus_tpu.inference import engine as engine_lib

    return engine_lib._enable_device_q(self, options)

  def _dispatch_ragged(self, ragged):
    if not self.wire_transport:
      return self._forward_ragged(self.variables, ragged)
    from jax.sharding import PartitionSpec as P

    from deepconsensus_tpu.inference import engine as engine_lib

    subs = [
        {k: v[s] for k, v in ragged.items()} for s in range(self.num_shards)
    ]
    packed = [data.wire_pack(sub) for sub in subs]
    layout = packed[0][1]
    buf = np.stack([b for b, _ in packed])
    fn = self._wire_jits.get(layout)
    if fn is None:
      # Sharded sibling of engine.ModelRunner._wire_fn (same per-layout
      # cache contract: rebuild_jits resets self._wire_jits so no
      # executable traced with a stale forward survives enable_device_q).
      # A behavioral fix to either must be mirrored in the other; only
      # the shard_map wrapper + stacked buffer axis differ here.
      L = int(self.params.max_length)
      mp = int(self.params.max_passes)
      fwd = self._forward_compact_fn

      def wire_shard(variables, buf):
        t = engine_lib.unpack_wire(buf[0], layout)
        compact = engine_lib.reconstruct_compact(t, L, mp)
        ids, maxp = fwd(variables, compact)
        return ids[None], maxp[None]

      fw = mesh_lib.shard_map(
          wire_shard,
          mesh=self.mesh,
          in_specs=(P(), P(self._mesh_axis)),
          out_specs=P(self._mesh_axis),
      )

      def wire_forward(variables, buf):
        ids, maxp = fw(variables, buf)
        return ids.reshape(-1, L), maxp.reshape(-1, L)

      fn = jax.jit(wire_forward)
      self._wire_jits[layout] = fn
    return fn(self.variables, buf)

  def predict_ragged_async(self, ragged, n: int):
    """Enqueues a prebuilt per-shard-stacked ragged transport batch."""
    out = self._dispatch_ragged(ragged)
    for arr in out:
      try:
        arr.copy_to_host_async()
      except (AttributeError, RuntimeError):
        break
    return out, n

  def predict_async(self, rows: np.ndarray, pass_limit=None,
                    num_passes=None):
    # Dense-rows entry point (tests / legacy callers): the bucketed compact
    # transport. The engine's block path uses predict_ragged_async instead.
    del num_passes
    n = rows.shape[0]
    padded = data.pad_batch(rows, self.batch_size, multiple=self.mesh.devices.size)
    compact = data.compact_from_rows(padded, self.params, pass_limit)
    out = self._forward(self.variables, compact)
    # Start the D2H transfer immediately so it overlaps later batches'
    # compute (mirrors ModelRunner.predict_async; the remote link makes
    # the copy a large fraction of round latency).
    for arr in out:
      try:
        arr.copy_to_host_async()
      except (AttributeError, RuntimeError):
        break
    return out, n

  def collect(self, handle_n):
    (ids, maxp), n = handle_n
    ids, maxp = jax.device_get((ids, maxp))
    return ids[:n], maxp[:n]

  def predict(self, rows: np.ndarray):
    return self.collect(self.predict_async(rows))


def host_shard_filter(host_id: int, num_hosts: int):
  """Predicate assigning ZMW index -> this host (round-robin)."""

  def keep(zmw_index: int) -> bool:
    return zmw_index % num_hosts == host_id

  return keep


def merge_fastq_partials(partials: Sequence[str], output: str) -> int:
  """Deterministically merges per-host FASTQ partials (host-id order).

  ZMW assignments are disjoint across hosts (round-robin by ZMW index,
  engine `zmw_index % num_hosts == host_id`) and each partial preserves
  its own input order, so for a FIXED host count the merged bytes are
  deterministic. Note the read ORDER differs from a single-host run
  (host-0 reads, then host-1 reads — an interleave regrouped by host),
  while the read multiset is identical
  (tests/test_dp_inference.py pins both properties).

  A missing partial is an error: silently skipping it would drop that
  host's entire ZMW share from the merged output.
  """
  for path in partials:
    if not os.path.exists(path):
      raise FileNotFoundError(
          f'partial FASTQ {path!r} does not exist — refusing to merge an '
          'incomplete set (that host\'s reads would be silently lost)'
      )
  n = 0
  with open(output, 'w') as out:
    for path in partials:
      with open(path) as f:
        for line in f:
          out.write(line)
          n += 1
  return n // 4
