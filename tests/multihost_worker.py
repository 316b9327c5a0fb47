"""Worker process for the multi-host training test (not collected by pytest).

Each instance plays one host of a pod-scale training job: it brings up
jax.distributed over a local coordinator (4 virtual CPU devices per
process), then runs the real `loop.train` entry the CLI would run. The
parent test launches two of these against a shared out_dir and compares
the result to a single-process 8-device run — the multi-host contract is
that gradients (and therefore losses and final params) are bit-identical.

Usage: python multihost_worker.py HOST_ID NUM_HOSTS PORT OUT_DIR
"""

import os
import sys


def main():
  host_id, num_hosts, port, out_dir = (
      int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4]
  )
  os.environ['JAX_PLATFORMS'] = 'cpu'
  os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
  os.environ.setdefault('DC_TPU_CHECK_INVARIANTS', '1')
  import jax

  jax.config.update('jax_platforms', 'cpu')

  from deepconsensus_tpu.parallel import mesh as mesh_lib

  mesh_lib.initialize_multihost(f'127.0.0.1:{port}', num_hosts, host_id)
  assert jax.process_count() == num_hosts
  assert len(jax.devices()) == 4 * num_hosts

  from deepconsensus_tpu.models import configs
  from deepconsensus_tpu.train import loop

  params = configs.get_config('transformer_learn_values+test')
  with params.unlocked():
    params.batch_size = 8
    params.limit = 8
    params.num_epochs = 1
    params.buffer_size = 10
    params.num_hidden_layers = 2
    params.filter_size = 128
    params.transformer_input_size = 64
  metrics = loop.train(out_dir, params, log_train_steps=1)
  print(f'host {host_id} done: eval/loss={metrics["eval/loss"]}', flush=True)


if __name__ == '__main__':
  main()
