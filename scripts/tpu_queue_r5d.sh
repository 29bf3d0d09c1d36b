#!/bin/bash
# Round-5d TPU queue: HEAD pipeline wall-clock x2 (captures voxelize with
# the lattice-shell kNN 5cd9dfe in — r4 verdict next #4 asked for <=15 s
# ex-warm in a good window; two runs because tunnel windows vary ~50x,
# docs/DESIGN.md) + a dryrun_multichip gate at HEAD.
# Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5d.sh > /tmp/tpu_r5d/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5d
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

run pipeline-1 python scripts/bench_pipeline.py --frames 3
run pipeline-2 python scripts/bench_pipeline.py --frames 3

run dryrun env PYTHONPATH= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python -c "import __graft_entry__ as g; g.dryrun_multichip(8); print('DRYRUN OK')"

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
