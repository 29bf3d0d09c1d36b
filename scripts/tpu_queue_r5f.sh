#!/bin/bash
# Round-5f TPU queue: the production-budget recon-training wall-clocks the
# r4 verdict (next #3) asks for, at the post-r5e defaults (911d3d9):
#   1. confirm the 250 ms field-step record reproduces at the flipped
#      defaults with NO env vars (r5e measured all-off via env toggles);
#   2. 5000-iter field training wall-clock (the pipeline budget,
#      config/training_3d/default.yaml) per-step vs PIXIE_FIELD_SCAN=50
#      (the dispatch-floor lever from the r5b stage-A profile);
#   3. 10000-iter 3DGS step-loop wall-clock at 800^2/100k (the reference
#      gaussian-splatting train.py --iterations 10000 analog).
# Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5f.sh > /tmp/tpu_r5f/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5f
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

run confirm-step python scripts/bench_recon_train.py --only-step --reps 8
run field-5000-perstep python scripts/bench_recon_train.py --field-iters 5000
run field-5000-scan50 env PIXIE_FIELD_SCAN=50 \
  python scripts/bench_recon_train.py --field-iters 5000
run gs-10000 python scripts/bench_recon_train.py --gs-iters 10000

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
