#!/bin/bash
# Round-5b TPU queue: measure the round-5 changes.
#  1. recon field-step phase profile (r4 verdict weak #2)
#  2. realscene 20-frame with the composed resort, A/B vs legacy resort and
#     vs a 2e-4 clamp-tolerance skip policy (r4 verdict weak #1)
#  3. pipeline with warm_dispatch wiring + device lattice DBSCAN
#  4. voxel-query variance probe (reconcile 136/160/228 ms readings)
# Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5b.sh > /tmp/tpu_r5b/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5b
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

run recon-profile python scripts/bench_recon_train.py --profile-step

run realscene-composed python scripts/bench_realscene.py --frames 20
run realscene-legacy env PIXIE_COMPOSED_RESORT=0 python scripts/bench_realscene.py --frames 20
run realscene-tol env PIXIE_RESORT_TOL=2e-4 python scripts/bench_realscene.py --frames 20

rm -rf /tmp/pixie_bench_pipeline
run pipeline-r5 python scripts/bench_pipeline.py --frames 3

run query-variance python scripts/probe_query_variance.py

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
