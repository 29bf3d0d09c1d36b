#!/bin/bash
# Round-4i TPU queue: validate the ASYNC warm_transfer (copy_to_host_async
# first transfer — zero-stall handshake bypass, probe_warm_variants.py)
# in the production pipeline.  Serial, idle CPU.
# Usage: nohup bash scripts/tpu_queue_r4i.sh > /tmp/tpu_r4i/queue.log 2>&1 &
set -u
export JAX_COMPILATION_CACHE_DIR=/root/.jax_cache
cd /root/repo
OUT=/tmp/tpu_r4i
mkdir -p "$OUT"

run() {
  local label="$1"; shift
  echo "=== $label : $* $(date +%H:%M:%S) ==="
  "$@"
  echo "=== $label done rc=$? $(date +%H:%M:%S) ==="
}

rm -rf /tmp/pixie_bench_pipeline
run pipeline-asyncwarm-1 python scripts/bench_pipeline.py --frames 3
rm -rf /tmp/pixie_bench_pipeline
run pipeline-asyncwarm-2 python scripts/bench_pipeline.py --frames 3

echo "=== done $(date +%H:%M:%S) rc=0 ==="
