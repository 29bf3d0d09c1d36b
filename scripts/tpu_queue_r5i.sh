#!/bin/bash
# Round-5i TPU queue: clean re-measurement of the r5h GS scan A/B and the
# field-1000 warm steady state, with the per-log-boundary elapsed marks the
# bench script now surfaces (scripts/bench_recon_train.py logging.basicConfig)
# so loop time separates from setup/upload/compile under tunnel-window
# variance.  The r5h arms were polluted: gs-perstep overlapped a host-side
# CPU compile (and predates the marks), field-1000-warm-a/b disagreed 510.7
# vs 734.9 s with no attribution.  Waits for the r5h queue to finish first.
# Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5i.sh > /tmp/tpu_r5i/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5i
mkdir -p "$OUT"

# wait for the r5h queue (if still running) — poll its pid file
if [ -f /tmp/tpu_r5h/queue.pid ]; then
  while kill -0 "$(cat /tmp/tpu_r5h/queue.pid)" 2>/dev/null; do sleep 30; done
fi

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

run field-1000-marked-a python scripts/bench_recon_train.py --field-iters 1000
run field-1000-marked-b python scripts/bench_recon_train.py --field-iters 1000

run gs-train-2000-perstep env PIXIE_GS_SCAN=0 \
  python scripts/bench_recon_train.py --gs-train-iters 2000
run gs-train-2000-scan100 env PIXIE_GS_SCAN=100 \
  python scripts/bench_recon_train.py --gs-train-iters 2000

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
