#!/bin/bash
# Round-5h TPU queue.
#  1) The two measurements orphaned when the r5g queue was killed
#     (stuck on the pathological strat-alone compile, see DESIGN.md):
#     a subtraction profile at the new default config (PDF_DENSE on)
#     to re-attribute stage B, and field-1000-warm x2 (second run is
#     fully compile-cached -> scan-50 steady state per-iter).
#  2) A/B the scan-chunked 3DGS trainer loop (PIXIE_GS_SCAN,
#     train_gaussians.py) at 800^2/100k — the per-step loop blocks on a
#     (capacity,) screen-grad fetch every iteration (~60 ms/iter
#     measured r5f: 104.3 ms median device step vs ~168 ms/iter wall).
#  3) Round-end validation pair (compile smoke + full bench) at HEAD.
# Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5h.sh > /tmp/tpu_r5h/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5h
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

run profile-default python scripts/bench_recon_train.py --profile-step --reps 8

run field-1000-warm-a python scripts/bench_recon_train.py --field-iters 1000
run field-1000-warm-b python scripts/bench_recon_train.py --field-iters 1000

run gs-train-2000-perstep env PIXIE_GS_SCAN=0 \
  python scripts/bench_recon_train.py --gs-train-iters 2000
run gs-train-2000-scan100 env PIXIE_GS_SCAN=100 \
  python scripts/bench_recon_train.py --gs-train-iters 2000

run compile-smoke python scripts/compile_smoke.py
run bench python bench.py

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
