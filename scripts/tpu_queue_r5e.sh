#!/bin/bash
# Round-5e TPU queue: attribute the field-step bwd regression the r5c
# profile exposed (E 252.5 -> 302.8 ms, bwd+adam 129 -> 198 ms) by
# toggling each r5c lever off one at a time, then measure the winning
# combination.  Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5e.sh > /tmp/tpu_r5e/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5e
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

P="python scripts/bench_recon_train.py --only-step --reps 8"

run all-on $P
run no-detach env PIXIE_DETACH_SAMPLES=0 $P
run no-onehot env PIXIE_FEAT_ONEHOT=0 $P
run no-bf16sel env PIXIE_SELECT_BF16=0 $P
run lohi-128-32 env PIXIE_FEAT_LOHI=128,32 $P
# r5b baseline reconstruction: every lever off
run all-off env PIXIE_DETACH_SAMPLES=0 PIXIE_FEAT_ONEHOT=0 \
  PIXIE_SELECT_BF16=0 PIXIE_FEAT_LOHI=128,32 $P

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
