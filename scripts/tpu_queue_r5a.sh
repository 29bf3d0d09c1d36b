#!/bin/bash
# Round-5a TPU queue: the HEAD evidence record the r4 verdict demands —
# pipeline x2 + bench.py + compile_smoke at/after commits 564718e (async
# warm_transfer) and d2d9793 (one-scan voxel query), plus a 20-frame
# realscene run with per-frame resort instrumentation as the round-5
# resort-tax baseline.  Serial, idle-CPU (docs/DESIGN.md trap #4).
# Usage: nohup bash scripts/tpu_queue_r5a.sh > /tmp/tpu_r5a/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_r5a
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

rm -rf /tmp/pixie_bench_pipeline
run pipeline-head-1 python scripts/bench_pipeline.py --frames 3
rm -rf /tmp/pixie_bench_pipeline
run pipeline-head-2 python scripts/bench_pipeline.py --frames 3

run bench-full python bench.py
run compile-smoke python scripts/compile_smoke.py

run realscene-20f python scripts/bench_realscene.py --frames 20

echo "QUEUE ALL DONE $(date +%H:%M:%S)"
