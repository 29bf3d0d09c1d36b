#!/bin/bash
# Round-3 TPU A/B queue: fused / slab / box MPM flags + in-loop sim render.
# Runs sequentially on the one real chip; logs to /tmp/tpu_ab/.
set -u
cd /root/repo
mkdir -p /tmp/tpu_ab
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

run() {
  local name="$1"; shift
  echo "=== $name : $* $(date +%T) ===" | tee -a /tmp/tpu_ab/queue.log
  "$@" >> /tmp/tpu_ab/queue.log 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a /tmp/tpu_ab/queue.log
}

# --- 100k / n_grid=50 (dense: box is a full cube, so box A/B is a no-op) ---
run mpm100k-baseline env PIXIE_FUSED=0 PIXIE_BOX=0 \
    python scripts/ab_mpm.py --label 100k-2kernel
run mpm100k-fused env PIXIE_FUSED=1 PIXIE_BOX=0 \
    python scripts/ab_mpm.py --label 100k-fused
run mpm100k-fused-slab env PIXIE_FUSED=1 PIXIE_BOX=0 PIXIE_SLAB=1 \
    python scripts/ab_mpm.py --label 100k-fused-slab

# --- in-loop GS sim render per-frame cost (VERDICT #1 number) ---
run render-sim python scripts/bench_render_sim.py --gaussians 100000 --frames 8

# --- 500k / n_grid=120 realscene (sparse: box + slab matter here) ---
run rs-default env PIXIE_FUSED=1 PIXIE_BOX=1 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_ab/rs_default
run rs-slab env PIXIE_FUSED=1 PIXIE_BOX=1 PIXIE_SLAB=1 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_ab/rs_slab
run rs-nobox env PIXIE_FUSED=1 PIXIE_BOX=0 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_ab/rs_nobox
run rs-2kernel env PIXIE_FUSED=0 PIXIE_BOX=1 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_ab/rs_2kernel

echo "ALL DONE $(date +%T)" | tee -a /tmp/tpu_ab/queue.log
