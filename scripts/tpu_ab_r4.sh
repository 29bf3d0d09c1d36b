#!/bin/bash
# Round-4 TPU measurement queue (VERDICT r3 items #1-#3):
#   1. in-loop sim render under the JITTED path (r3's 14,935 ms/frame was
#      measured on the pre-jit eager path; HEAD renders in one dispatch)
#   2. fresh realscene FUSED x BOX A/B at 500k/n_grid=120 (resolves the
#      13.58-vs-17.6 discrepancy and measures fused at realscene scale for
#      the first time — it crashed SMEM at r3, fixed in d360d7a)
#   3. 100k fused/2kernel re-check (cache-warm confirmation)
# Runs sequentially on the one real chip; logs to /tmp/tpu_r4/.
set -u
cd /root/repo
mkdir -p /tmp/tpu_r4
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache

run() {
  local name="$1"; shift
  echo "=== $name : $* $(date +%T) ===" | tee -a /tmp/tpu_r4/queue.log
  "$@" >> /tmp/tpu_r4/queue.log 2>&1
  echo "=== $name done rc=$? $(date +%T) ===" | tee -a /tmp/tpu_r4/queue.log
}

# --- fire #1: jitted in-loop GS sim render ---
run render-sim-jit python scripts/bench_render_sim.py --gaussians 100000 --frames 8

# --- realscene FUSED x BOX grid (500k / n_grid=120, 3 frames each) ---
run rs-f1b1 env PIXIE_FUSED=1 PIXIE_BOX=1 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_r4/rs_f1b1
run rs-f0b1 env PIXIE_FUSED=0 PIXIE_BOX=1 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_r4/rs_f0b1
run rs-f1b0 env PIXIE_FUSED=1 PIXIE_BOX=0 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_r4/rs_f1b0
run rs-f0b0 env PIXIE_FUSED=0 PIXIE_BOX=0 \
    python scripts/bench_realscene.py --frames 3 --out /tmp/tpu_r4/rs_f0b0

# --- 100k re-check (compile caches warm from r3) ---
run mpm100k-2kernel env PIXIE_FUSED=0 PIXIE_BOX=0 \
    python scripts/ab_mpm.py --label 100k-2kernel
run mpm100k-fused env PIXIE_FUSED=1 PIXIE_BOX=0 \
    python scripts/ab_mpm.py --label 100k-fused

echo "ALL DONE $(date +%T)" | tee -a /tmp/tpu_r4/queue.log
