#!/bin/bash
# TPU work queue for when the tunnel recovers. Run ONE job at a time,
# under timeout, with >=2-3 min gaps between jobs (CLAUDE.md tunnel rules).
#
#   bash tools/tpu_queue.sh probe      # tiny claim check (120s timeout)
#   bash tools/tpu_queue.sh ab         # transport A/B at 2048/4096
#   bash tools/tpu_queue.sh bench      # full bench.py
#   bash tools/tpu_queue.sh train      # warm-start toy model (~15 min)
set -u
cd "$(dirname "$0")/.."
case "${1:-probe}" in
  probe)
    timeout 120 python -c "import jax,time; t=time.time(); print(jax.devices(), round(time.time()-t,1))"
    ;;
  ab)
    AB_ROUNDS="${AB_ROUNDS:-6}" AB_BATCHES="${AB_BATCHES:-2048,4096}" \
      timeout 560 python tools/bench_transport_ab.py
    ;;
  bench)
    timeout 560 python bench.py
    ;;
  train-bench)
    # XLA-encoder training only (the Pallas training backward was deleted
    # in round 5 — slower than autodiff; ops/fused_encoder.py).
    DC_TRAIN_BENCH_TOTAL_S="${DC_TRAIN_BENCH_TOTAL_S:-600}" \
      timeout 650 python tools/train_bench.py
    ;;
  train)
    timeout 1800 python - <<'EOF'
from deepconsensus_tpu.train import loop
from deepconsensus_tpu.models import configs
params = configs.get_config('transformer_learn_values+test')
configs.finalize_params(params)
with params.unlocked():
  params.num_epochs = 400
  params.num_epochs_for_decay = 400
  params.initial_learning_rate = 1.5e-4
  params.end_learning_rate = 1e-6
  params.batch_size = 64
  # The config's 16000-step warmup would swallow a short warm-start run.
  params.warmup_steps = 50
loop.train('/tmp/toy_warm', params,
           initial_checkpoint='models_out/toy_model/checkpoint-1200')
EOF
    ;;
esac
