#!/bin/bash
# Round-5c TPU queue: production-budget recon wall-clocks (r4 verdict
# weak #2: "commit production-budget wall-clocks — 5k-iter field train,
# 10k-iter 3DGS train") + the round-end gates.
# Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5c.sh > /tmp/tpu_r5c/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5c
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

# re-profile first: direct step-time comparison vs the r5b 252.5 ms
# record (one-hot feature select + detached sampling + encode layout in)
run recon-profile python scripts/bench_recon_train.py --profile-step

run field-5k python scripts/bench_recon_train.py --field-iters 5000
run gs-10k python scripts/bench_recon_train.py --gs-iters 10000

run compile-smoke python scripts/compile_smoke.py
run bench-full python bench.py

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
