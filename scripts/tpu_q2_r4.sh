#!/bin/bash
# Round-4 TPU queue 2: device-resident render path + instrumented voxelize.
set -u
cd /root/repo
mkdir -p /tmp/tpu_r4
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

run() {
  local name="$1"; shift
  echo "=== $name : $* $(date +%T) ===" | tee -a /tmp/tpu_r4/q2.log
  "$@" >> /tmp/tpu_r4/q2.log 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a /tmp/tpu_r4/q2.log
}

# fire #1: render path with cov6_precomp + on-device transforms + uint8 out
run render-sim-dev python scripts/bench_render_sim.py --gaussians 100000 --frames 8

# fire #2: full pipeline with the instrumented voxelizer (breakdown printed)
run pipeline python scripts/bench_pipeline.py --frames 3

echo "Q2 ALL DONE $(date +%T)" | tee -a /tmp/tpu_r4/q2.log
