#!/bin/bash
# Round-4g TPU queue: measure the packed one-dispatch voxel query
# (d2d9793) in the production pipeline.  Serial, idle-CPU (docs/DESIGN.md
# trap #4).  Two back-to-back pipeline runs to sample the tunnel window
# (r4d/r4e measured ~3x spread at identical code).
# Usage: nohup bash scripts/tpu_queue_r4g.sh > /tmp/tpu_r4g/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
OUT=/tmp/tpu_r4g
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

# 1+2. pipeline wall-clock, fresh artifacts, packed voxel query (run 1
# pays the scan's remote compile; run 2 is the warm number)
rm -rf /tmp/pixie_bench_pipeline
run pipeline-packed-cold python scripts/bench_pipeline.py --frames 3
rm -rf /tmp/pixie_bench_pipeline
run pipeline-packed-warm python scripts/bench_pipeline.py --frames 3

# 3. packed-off control in the same tunnel window (isolates dispatch tax
# from window luck)
rm -rf /tmp/pixie_bench_pipeline
run pipeline-loop-control env PIXIE_VOX_PACKED=0 python scripts/bench_pipeline.py --frames 3

echo "=== done $(date +%H:%M:%S) rc=0 ==="
