#!/bin/bash
# Round-5 CPU queue: rebuild the synthetic GGUF fixtures (the driver wiped
# .cache between sessions). Pure host work — no TPU touch (JAX_PLATFORMS=cpu,
# compile cache off to avoid contention with the concurrent chip queue).
set -u
cd /root/repo
export JAX_PLATFORMS=cpu
export CRABML_JAX_CACHE=off
mkdir -p .cache benchmarks/r5/logs

build() {  # build <model> ; atomic rename so the TPU queue can wait on -f
  local m=$1 out=.cache/synth-$1-q4_k-v2.gguf
  [ -f "$out" ] && { echo "$out exists"; return 0; }
  echo "=== building $m ($(date +%T)) ==="
  timeout 3600 python -m crabml_tpu.tools.synth_gguf "$out.tmp" --model "$m" --quant q4_k \
    >> benchmarks/r5/logs/cpu_queue.log 2>&1 && mv "$out.tmp" "$out" \
    || { echo "BUILD FAILED: $m"; rm -f "$out.tmp"; return 1; }
}

build 7b
build mixtral
build 13b
echo "cpu queue done $(date +%T)"
