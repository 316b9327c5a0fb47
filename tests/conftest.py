"""Test configuration: force CPU JAX with an 8-device virtual mesh.

The sandbox's sitecustomize registers a remote-TPU ('axon') PJRT plugin in
every interpreter and sets jax_platforms to prefer it; tests must run on
local CPU, so we re-override the platform after importing jax.
"""

import os
import sys

os.environ['JAX_PLATFORMS'] = 'cpu'
_flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in _flags:
  os.environ['XLA_FLAGS'] = (
      _flags + ' --xla_force_host_platform_device_count=8'
  ).strip()

# Re-verify builder-path transport invariants in every test (off in
# benches): a featurizer regression fails loudly instead of corrupting
# output (models/data.py:_dense_streams).
os.environ.setdefault('DC_TPU_CHECK_INVARIANTS', '1')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.devices()[0].platform == 'cpu', jax.devices()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = '/root/reference/deepconsensus/testdata'
HUMAN_1M = f'{TESTDATA}/human_1m'
