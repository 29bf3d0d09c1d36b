#!/bin/bash
# Round-4h TPU queue: validate the first-fetch handshake fix
# (utils/device.py warm_transfer, wired into voxelize/driver/bench) in
# the production pipeline, then probe whether the 60 s can hide behind
# compile traffic on a background thread.  Serial, idle CPU.
# Usage: nohup bash scripts/tpu_queue_r4h.sh > /tmp/tpu_r4h/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
OUT=/tmp/tpu_r4h
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

# 1+2. pipeline wall-clock with the warm-transfer fix (two runs: r4d/r4e
# measured ~3x tunnel-window spread at identical code; quote both)
rm -rf /tmp/pixie_bench_pipeline
run pipeline-warmfix-1 python scripts/bench_pipeline.py --frames 3
rm -rf /tmp/pixie_bench_pipeline
run pipeline-warmfix-2 python scripts/bench_pipeline.py --frames 3

# 3. can the handshake hide behind a fresh compile on a daemon thread?
run warm-overlap python scripts/probe_warm_overlap.py

echo "=== done $(date +%H:%M:%S) rc=0 ==="
