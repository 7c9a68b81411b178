#!/bin/bash
# Round-5 TPU queue: one chip, strictly sequential jobs, VERDICT-r4 priority
# order. Each job logs to benchmarks/r5/logs/<tag>.log and drops its JSON
# artifact in benchmarks/r5/. Jobs that need a synthetic GGUF wait for the
# concurrent cpu_queue.sh build (atomic rename, so -f is reliable).
set -u
cd /root/repo
mkdir -p .cache benchmarks/r5/logs
L=benchmarks/r5/logs
C=.cache
REF260=/root/reference/testdata/tinyllamas-stories-260k-f32.gguf

run() {  # run <tag> <timeout_s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%T) ==="
  timeout "$to" "$@" > "$L/$tag.log" 2>&1
  local rc=$?
  echo "=== $tag rc=$rc $(date +%T) ==="
  return $rc
}

waitfor() { while [ ! -f "$1" ]; do sleep 20; done; }

# --- 1. corpora (chip-sampled from the 260k fixture; .cache was wiped) ---
[ -f $C/corpus_train.txt ] || run corpus_train 4800 \
  python -m crabml_tpu.eval.make_corpus $REF260 --tokens 3000000 --batch 64 \
    --seed 0 --out $C/corpus_train.txt
[ -f $C/eval_heldout.txt ] || run corpus_heldout 1800 \
  python -m crabml_tpu.eval.make_corpus $REF260 --tokens 160000 --batch 64 \
    --seed 7 --out $C/eval_heldout.txt

# --- 2. trained fixtures (draft 2.75M defaults; target 6.8M k=512) ---
[ -f $C/trained-draft.gguf ] || run train_draft 3600 \
  python -m crabml_tpu.tools.train_fixture $C/corpus_train.txt \
    $C/trained-draft.gguf --steps 1200
[ -f $C/trained-512.gguf ] || run train_512 4800 \
  python -m crabml_tpu.tools.train_fixture $C/corpus_train.txt \
    $C/trained-512.gguf --steps 1500 --dim 512 --hidden 1536 --layers 2 \
    --heads 8 --kv-heads 4

# --- 3. the acceptance campaign (VERDICT r4 next-#2) ---
run spec_accept_lookup 3600 \
  python -m crabml_tpu.tools.spec_accept_bench $C/trained-512.gguf \
    --text $C/eval_heldout.txt --drafts 4,8
grep -h '"metric"' $L/spec_accept_lookup.log | tail -1 > benchmarks/r5/spec_accept_lookup.json
run spec_accept_twomodel 3600 \
  python -m crabml_tpu.tools.spec_accept_bench $C/trained-512.gguf \
    --text $C/eval_heldout.txt --drafts 4,8 --draft-gguf $C/trained-draft.gguf
grep -h '"metric"' $L/spec_accept_twomodel.log | tail -1 > benchmarks/r5/spec_accept_twomodel.json

# --- 4. MoE grouped-vs-all prefill A/B (VERDICT r4 next-#5) ---
waitfor $C/synth-mixtral-q4_k-v2.gguf
run moe_prefill_ab 5400 \
  python -m crabml_tpu.tools.moe_prefill_ab --gguf auto \
    --out benchmarks/r5/moe_prefill_ab.json

# --- 5. 13B prefill (VERDICT r4 next-#4a; r4 artifact was 0 bytes) ---
waitfor $C/synth-13b-q4_k-v2.gguf
run prefill_13b 5400 python bench.py --mode prefill --model 13b
grep -h '"metric"' $L/prefill_13b.log | tail -1 > benchmarks/r5/prefill_13b.json

# --- 6. paged fused-spec A/B after the pool-out-of-scan fix (next-#3) ---
waitfor $C/synth-7b-q4_k-v2.gguf
run spec_ab_paged_fused_on 5400 \
  python -m crabml_tpu.tools.serving_bench --engines paged,spec-paged \
    --slots 16 --spec-fused on
grep -h '"metric"' $L/spec_ab_paged_fused_on.log > benchmarks/r5/spec_ab_paged_fused_on.json
run spec_ab_paged_fused_off 5400 \
  python -m crabml_tpu.tools.serving_bench --engines paged,spec-paged \
    --slots 16 --spec-fused off
grep -h '"metric"' $L/spec_ab_paged_fused_off.log > benchmarks/r5/spec_ab_paged_fused_off.json

# --- 7. long-context serving row (VERDICT r4 next-#8) ---
run serving_longctx 5400 \
  python -m crabml_tpu.tools.serving_bench --engines dense,paged --slots 8 \
    --requests 16 --prompt 2048 --max-tokens 512 --seq-len 4096 --tick 8
grep -h '"metric"' $L/serving_longctx.log > benchmarks/r5/serving_longctx.json

# --- 8. SLO sweep (VERDICT r4 next-#4b) ---
run slo_sweep 7200 \
  python -m crabml_tpu.tools.serving_bench --engines dense \
    --sweep 8:1,8:4,8:8,16:8,32:1,32:4,32:8,64:8
grep -h '"metric"' $L/slo_sweep.log > benchmarks/r5/slo_sweep.json

# --- 9. B=32 glue ablation re-run from committed code (next-#1 evidence) ---
run b32_ablation 5400 \
  python -m crabml_tpu.tools.b32_ablation --gguf auto \
    --out benchmarks/r5/b32_ablation.json

echo "tpu queue done $(date +%T)"
