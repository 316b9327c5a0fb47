"""Device mesh + sharding helpers for data-parallel scale-out.

The reference scales with tf.distribute strategies (MirroredStrategy /
TPUStrategy, reference: models/model_train_custom_loop.py:333-347). The
TPU-native equivalent is a single `jax.sharding.Mesh` with a `data` axis
spanning all chips (ICI within a slice, DCN across hosts): parameters are
replicated, the batch is sharded on axis 0, and XLA inserts the all-reduces
(psum) for gradients — no hand-written collectives.

The model here is ~9M params with hidden size 280, so tensor/pipeline
parallelism would be pure overhead (SURVEY.md §2.11); the scaling dimension
is the embarrassingly parallel window batch.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def initialize_multihost(
    coordinator: str, num_hosts: int, host_id: int
) -> None:
  """Brings up jax.distributed for a multi-host (pod-scale) job.

  The reference gets multi-host for free from TPUStrategy
  (model_train_custom_loop.py:333-347); the JAX equivalent is
  jax.distributed.initialize, after which jax.devices() spans every
  host's chips (ICI within a slice, DCN across hosts) and the existing
  1-D data mesh + replicated-params shardings scale unchanged. On Cloud
  TPU pods the three arguments can also come from the environment, in
  which case initialize() discovers them itself.
  """
  jax.distributed.initialize(
      coordinator_address=coordinator,
      num_processes=num_hosts,
      process_id=host_id,
  )


def shard_map(f, *, mesh, in_specs, out_specs):
  """Version-proof shard_map with replication checking off.

  jax>=0.8 moved shard_map out of jax.experimental and renamed check_rep
  to check_vma; this shim targets whichever exists (the engine's per-shard
  transports are genuinely unreplicated, so the check must stay off).
  """
  if hasattr(jax, 'shard_map'):
    return jax.shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_vma=False,
    )
  from jax.experimental.shard_map import shard_map as _sm

  return _sm(
      f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
  )


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
  """Builds a 1-D data-parallel mesh over the first num_devices devices."""
  devices = jax.devices()
  if num_devices is not None:
    devices = devices[:num_devices]
  return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
  """Shards the leading (batch) axis over the data axis."""
  return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
  """Fully replicated sharding (for parameters and optimizer state)."""
  return NamedSharding(mesh, P())


def shard_params(variables, mesh: Mesh):
  """Places a parameter pytree replicated across the mesh."""
  sharding = replicated(mesh)
  return jax.device_put(variables, sharding)


def shard_batch(batch, mesh: Mesh):
  """Places a host batch sharded along the data axis.

  Single-process: the full global batch is device_put sharded. Multi-host
  (jax.distributed initialized): each process passes only its LOCAL slice
  (global_batch / process_count rows) and the global array is assembled
  across hosts without any cross-host data movement.
  """
  sharding = batch_sharding(mesh)
  if jax.process_count() > 1:
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        batch,
    )
  return jax.tree_util.tree_map(
      lambda x: jax.device_put(x, sharding), batch
  )
