#!/bin/bash
# Round-5 TPU queue, part 2: the jobs the first queue never reached (its
# session died mid-13B-compile). Strictly sequential on the one chip,
# priority = VERDICT r4 order: the two "built but never produced their
# number" deliverables first (13B prefill, SLO sweep), then the paged
# fused-spec same-process 3-arm A/B, the long-context serving row, and
# the B=32 ablation re-run from committed code.
#
# The whole queue self-terminates at the global deadline (see the outer
# `timeout` in the launcher) so it can never contend with the driver's
# end-of-round bench run.
set -u
cd /root/repo
mkdir -p benchmarks/r5/logs
L=benchmarks/r5/logs

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%T) ==="
  timeout "$to" "$@" > "$L/$tag.log" 2>&1
  local rc=$?
  echo "=== $tag rc=$rc $(date +%T) ==="
  return $rc
}

# --- 1. 13B prefill (VERDICT r4 missing-#2; r4+r5a artifacts were 0 bytes).
# The base plane cache is warm; this run pays the ~20 min W8 augment once
# and saves the +w8b6 entry, leaving ~100 min for the server-side build.
run prefill_13b 7200 python bench.py --mode prefill --model 13b
grep -h '"metric"' $L/prefill_13b.log | tail -1 > benchmarks/r5/prefill_13b.json

# --- 2. SLO sweep (VERDICT r4 missing-#3): dense engine over the knob grid
run slo_sweep 6600 \
  python -m crabml_tpu.tools.serving_bench --engines dense \
    --sweep 8:1,8:8,16:4,16:8,32:1,32:8,64:8
grep -h '"metric"' $L/slo_sweep.log > benchmarks/r5/slo_sweep.json

# --- 3. paged fused-vs-single spec A/B, SAME process (VERDICT r4 next-#3),
# after the round-5 pool-out-of-scan + fused stacked-cache fixes
run spec_ab_paged_3arm 5400 \
  python -m crabml_tpu.tools.serving_bench \
    --engines paged,spec-paged-fused,spec-paged-single \
    --slots 16 --speculative 4
grep -h '"metric"' $L/spec_ab_paged_3arm.log > benchmarks/r5/spec_ab_paged_3arm.json

# --- 4. long-context serving row (VERDICT r4 next-#8): live 2-2.5k contexts
run serving_longctx 5400 \
  python -m crabml_tpu.tools.serving_bench --engines dense,paged --slots 8 \
    --requests 16 --prompt 2048 --max-tokens 512 --seq-len 4096 --tick 8
grep -h '"metric"' $L/serving_longctx.log > benchmarks/r5/serving_longctx.json

# --- 5. B=32 glue ablation re-run from committed code (next-#1 evidence)
run b32_ablation 4800 \
  python -m crabml_tpu.tools.b32_ablation --gguf auto \
    --out benchmarks/r5/b32_ablation.json

echo "tpu queue2 done $(date +%T)"
