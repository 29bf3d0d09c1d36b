#!/bin/bash
# Round-5g TPU queue: A/B the gather-free inverse-CDF levers (a6329e9)
# against the 249.9 ms r5f baseline step:
#   PIXIE_PDF_DENSE=1  one-hot contraction instead of 6 take_along_axis
#                      sites (bit-exact; kills serial gathers + bwd
#                      scatter-adds);
#   PIXIE_PDF_STRAT=1  stratified sorted u, drops the jnp.sort (+ its
#                      gather-by-permutation backward).
# Then a subtraction profile at the winning config to re-attribute
# stage B (59.6 ms in the r5b profile).
# Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5g.sh > /tmp/tpu_r5g/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5g
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

run dense env PIXIE_PDF_DENSE=1 \
  python scripts/bench_recon_train.py --only-step --reps 8
run dense-strat env PIXIE_PDF_DENSE=1 PIXIE_PDF_STRAT=1 \
  python scripts/bench_recon_train.py --only-step --reps 8
run strat env PIXIE_PDF_STRAT=1 \
  python scripts/bench_recon_train.py --only-step --reps 8
run profile-dense-strat env PIXIE_PDF_DENSE=1 PIXIE_PDF_STRAT=1 \
  python scripts/bench_recon_train.py --profile-step --reps 8
# steady-state attribution: scan-50 is now the default and its chunk
# program is compile-cached from the r5f 5000-iter run, so this 1000-iter
# wall clock isolates the per-iter cost without the one-off compile that
# r5f's 368.8 ms/iter number carries.
run field-1000-warm python scripts/bench_recon_train.py --field-iters 1000

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
