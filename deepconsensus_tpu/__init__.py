"""deepconsensus_tpu: a TPU-native (JAX/XLA/Pallas) CCS polishing framework.

A from-scratch rebuild of the capabilities of google/deepconsensus v1.2
(reference: /root/reference), designed TPU-first:

* streaming, vectorized host featurization (numpy) instead of per-base
  Python state machines (`reference: preprocess/pre_lib.py:1242-1276`),
* a pure-JAX encoder-only transformer with banded local attention under
  `jit`/`pjit` (`reference: models/networks.py,attention_layer.py`),
* data-parallel scaling over a `jax.sharding.Mesh` (ICI/DCN) instead of
  tf.distribute strategies (`reference: models/model_train_custom_loop.py`).
"""

__version__ = '1.2.0+tpu.0.1'

# Large numpy temporaries dominate the host hot path; keep them on the warm
# glibc heap instead of re-faulting fresh mmaps every round (no-op outside
# glibc; opt out with DC_TPU_NO_MALLOPT=1). See native.tune_allocator.
from deepconsensus_tpu import native as _native  # noqa: E402

_native.tune_allocator()
del _native
