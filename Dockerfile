# deepconsensus_tpu container image.
#
# Build (CPU / external-pipeline image):
#   docker build -t deepconsensus_tpu .
#
# The image bundles the same external PacBio tool contract as the reference
# pipeline (reference: Dockerfile:10-35 — pbccs/pbmm2/actc/samtools/...) so a
# single container can run the full shard pipeline:
#   subreads.bam -> pbindex/ccs/actc -> deepconsensus_tpu run -> FASTQ.
#
# TPU note: on Cloud TPU VMs the idiomatic deployment is a direct
# `pip install .[tpu]` on the VM (see install.sh / docs/install.md) — the
# TPU runtime (libtpu) ships with jax[tpu] and needs /dev/accel* device
# access; if you do containerize on a TPU VM, run with `--privileged
# --net=host` so the PJRT runtime can reach the chips.

FROM mambaorg/micromamba:1.5.8 AS bio_tools
# External pipeline binaries (the upstream contract, not part of this repo):
# produce ccs.bam + subreads_to_ccs.bam per shard, plus truth alignment
# tools for training data generation (docs/quick_start.md).
RUN micromamba create -y -n bio -c conda-forge -c bioconda \
    python=3.11 \
    pbcore pbbam pbccs pbmm2 \
    samtools seqtk bedtools minimap2 \
    parallel jq \
    && micromamba clean -a -y
ADD --chmod=755 \
    https://github.com/PacificBiosciences/align-clr-to-ccs/releases/download/0.2.0/actc \
    /opt/conda/envs/bio/bin/actc

FROM python:3.11-slim AS runtime
COPY --from=bio_tools /opt/conda/envs/bio /opt/bio
ENV PATH=/opt/bio/bin:$PATH

# Toolchain for the native IO fast path (threaded BGZF inflate + columnar
# BAM batch parser, deepconsensus_tpu/native/bgzf_ext.cc). The package
# falls back to pure Python if the shared library is absent, so this stage
# is an optimization, not a requirement.
RUN apt-get update -qq && apt-get install -y -qq --no-install-recommends \
    g++ zlib1g-dev && rm -rf /var/lib/apt/lists/*

COPY . /opt/deepconsensus_tpu
WORKDIR /opt/deepconsensus_tpu
RUN sh deepconsensus_tpu/native/build.sh && pip install --no-cache-dir .

# Default: CPU jax. For TPU VMs prefer the bare-metal install; for GPU-less
# CPU shards this image reproduces the reference's n1-standard-16 shape.
CMD ["deepconsensus_tpu", "--help"]
