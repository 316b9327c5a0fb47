#!/bin/bash
# Usage: bash install.sh [--tpu]
#
# Installs deepconsensus_tpu on a fresh Ubuntu 22.04+ host (Cloud TPU VM or
# CPU worker). Mirrors the role of the reference's install.sh (pip deps +
# runtime) with the TPU-native stack: jax[tpu] instead of TensorFlow, plus
# the optional native IO fast path.
#
# The external PacBio binaries (pbindex, ccs, actc, pbmm2, samtools, ...)
# that produce the per-shard input BAMs are NOT installed here — use the
# Dockerfile's bio_tools stage or bioconda (docs/install.md).
set -euo pipefail

note() { echo "========== [$(date)] ${1}"; }

TPU=0
[[ "${1:-}" == "--tpu" ]] && TPU=1

note "apt: python + native toolchain"
sudo apt-get -qq -y update
sudo apt-get -y install python3-dev python3-pip g++ zlib1g-dev

note "pip: package install"
python3 -m pip install --upgrade pip
if [[ "$TPU" == 1 ]]; then
  # jax[tpu] pulls libtpu; on a TPU VM jax.devices() then shows the chips.
  python3 -m pip install --user ".[tpu]"
else
  python3 -m pip install --user "."
fi

note "native IO fast path (optional; pure-Python fallback exists)"
sh deepconsensus_tpu/native/build.sh || \
  echo "native build failed — continuing with the Python IO path"

note "smoke check"
python3 - <<'EOF'
import jax
import deepconsensus_tpu
from deepconsensus_tpu import native
print('deepconsensus_tpu', deepconsensus_tpu.__version__)
print('jax backend:', jax.default_backend(), jax.devices())
print('native IO:', 'loaded' if native.get_lib() else 'python fallback')
EOF

note "done — run 'deepconsensus_tpu --help'"
