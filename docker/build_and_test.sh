#!/usr/bin/env bash
# Build the image and run the containerized suite (the reference's
# docker/build_image.sh + run_container_github.sh flow).
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -t slide-slam-tpu -f docker/Dockerfile .
docker run --rm slide-slam-tpu
# multi-chip dry run on the virtual mesh
docker run --rm -e XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    slide-slam-tpu python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"
