#!/bin/bash
# Round-4 clean TPU bench queue: serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r4b.sh > /tmp/tpu_r4b/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
OUT=/tmp/tpu_r4b
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

# 1. pipeline wall-clock, fresh artifacts (sparse-fetch voxelize)
rm -rf /tmp/pixie_bench_pipeline
run pipeline python scripts/bench_pipeline.py --frames 3

# 2. render-sim: host-input vs device-input vs no-fetch split at default opts
run render-default python scripts/bench_render_sim.py --gaussians 100000 --frames 8

# 3. render-sim fan-out A/B (sim splats are small; candidate sort is 36N keys)
run render-mts3 python scripts/bench_render_sim.py --gaussians 100000 --frames 8 --max-tiles-side 3
run render-mts2 python scripts/bench_render_sim.py --gaussians 100000 --frames 8 --max-tiles-side 2
run render-mts3-cap256 python scripts/bench_render_sim.py --gaussians 100000 --frames 8 --max-tiles-side 3 --tile-cap 256

# 4. driver-contract rehearsal (all stages incl. new render stage)
run bench-full python bench.py

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
