"""Paged-vs-dense serving benchmark on one chip.

VERDICT r2 #4's done-criterion measurement: paged-int8 serving throughput
>= dense-int8 at B=16 through the round-3 paged path (scale-aware int8
pool kernel reading through the block table + direct-to-page prefill),
replacing the stale round-1 numbers (bf16 kernels, XLA gather fallback:
304 paged vs 317 dense).

Unlike `bench.py --mode serving` (a raw decode_loop over a full batch —
the kernel-limit number), this drives the REAL engines end to end:
admission, chunked prefill, page allocation, per-slot sampling,
finish/free, multi-token ticks. Byte-level paged==dense output parity is
pinned separately by tests/test_paged_serving.py; this tool measures the
throughput side of the same comparison.

Usage:
    python -m crabml_tpu.tools.serving_bench --gguf auto
        [--engines dense,paged,spec] [--speculative 7]
        [--slots 16] [--prompt 512] [--max-tokens 192] [--tick 8]

Prints one JSON line per engine plus `paged_vs_dense` / `spec_vs_dense`
summary lines when both sides of a pair ran.

Caveat on the 'spec' engine kind (dense engine + prompt-lookup
speculative ticks, draft length ``--speculative``): the synthetic
prompts are uniform-random tokens, on which n-gram prompt-lookup
acceptance is unrepresentative of real text — near zero against the
prompt itself, or artificially high once an untrained model's greedy
output turns repetitive. Interpret `spec_vs_dense` together with the
emitted `spec_tokens_per_tick` (accepted+1 per verify tick): at ~1.0
the run mostly measured verify overhead; real-text acceptance needs a
trained model + natural prompts (see bench.py --mode speculative).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def _mk_prompts(n_requests: int, prompt_len: int, vocab: int, seed: int):
    """Fixed-length synthetic token prompts (bypasses the tokenizer so both
    engines see byte-identical admission work)."""
    rng = np.random.default_rng(seed)
    return [
        [1] + rng.integers(2, vocab, prompt_len - 1).tolist()
        for _ in range(n_requests)
    ]


def run_workload(make_engine, prompts, max_tokens: int, tick: int) -> dict:
    """Admit all prompts, drain with run_forever's tick policy (fused
    multi-token ticks while no admission is pending), wall-clock the whole
    thing. Engines fetch sampled tokens to host every tick, so the timing
    is self-synchronizing (no reliance on block_until_ready)."""
    from ..serving.engine import Request

    eng = make_engine()
    reqs = []
    for toks in prompts:
        r = Request(prompt="", max_tokens=max_tokens, temperature=0.0)
        r.prompt_tokens = list(toks)
        reqs.append(r)
        eng.submit(r)
    t0 = time.perf_counter()
    while any(eng.slots) or not eng.pending.empty():
        idle_admission = eng.pending.empty() and not eng._prefilling
        eng.step(tick if idle_admission else 1)
    dt = time.perf_counter() - t0
    assert all(r.done for r in reqs)
    out_toks = sum(len(r.output_tokens) for r in reqs)
    cache = eng.cache
    pool_bytes = sum(
        a.size * a.dtype.itemsize
        for a in (cache.k, cache.v,
                  getattr(cache, "k_scale", None), getattr(cache, "v_scale", None))
        if a is not None
    )
    out = {
        "completion_tokens": out_toks,
        "seconds": round(dt, 2),
        "tok_s": round(out_toks / dt, 2),
        "dispatched_tok_s": round(eng.tokens_generated / dt, 2),
        "kv_pool_bytes": int(pool_bytes),
        "finish_reasons": sorted({r.finish_reason for r in reqs}),
    }
    if getattr(eng, "spec_ticks", 0):
        out["spec_ticks"] = eng.spec_ticks
        out["spec_tokens"] = eng.spec_tokens
        out["spec_tokens_per_tick"] = round(eng.spec_tokens / eng.spec_ticks, 2)
    # per-request SLO percentiles (VERDICT r3 #8): TTFT includes queueing
    # (all requests submitted up front — the under-load view a deployer
    # sees); ITL = steady inter-token latency after the first token
    ttfts = [r._t_first - r._t_submit for r in reqs if r._t_first]
    itls = [(r._t_finish - r._t_first) / (len(r.output_tokens) - 1)
            for r in reqs
            if r._t_first and r._t_finish and len(r.output_tokens) > 1]

    def pct(a, q):
        return round(float(np.percentile(a, q)), 4) if a else None

    out.update(ttft_p50_s=pct(ttfts, 50), ttft_p99_s=pct(ttfts, 99),
               itl_p50_s=pct(itls, 50), itl_p99_s=pct(itls, 99))
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(prog="crabml-tpu-serving-bench")
    ap.add_argument("--gguf", default="auto",
                    help="GGUF path; 'auto' = bench.py's cached synthetic 7B")
    ap.add_argument("--model", default="7b", help="synth model for --gguf auto")
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--backend", default="w4a8",
                    choices=["auto", "xla", "pallas", "w4a8"])
    ap.add_argument("--engines", default="dense,paged",
                    help="comma list of dense,paged,spec,spec-paged "
                         "('spec' = dense engine with speculative ticks; "
                         "'spec-paged' = paged engine with them). A spec "
                         "kind may carry a '-fused' or '-single' suffix to "
                         "force the fused multi-round scan on/off for THAT "
                         "arm only — e.g. 'paged,spec-paged-fused,"
                         "spec-paged-single' is a same-process 3-arm A/B")
    ap.add_argument("--speculative", type=int, default=7,
                    help="draft length K for the spec engine kinds")
    ap.add_argument("--spec-fused", default="default",
                    choices=["default", "on", "off"],
                    help="override the engines' fused multi-round spec-scan "
                         "default (A/B the fused scan vs single-dispatch "
                         "verify ticks in one process)")
    ap.add_argument("--draft-gguf", default=None, metavar="GGUF",
                    help="small draft model for the spec kinds: two-model "
                         "speculation instead of prompt lookup")
    ap.add_argument("--slots", type=int, default=16)
    ap.add_argument("--requests", type=int, default=32)
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--max-tokens", type=int, default=192)
    ap.add_argument("--tick", type=int, default=8)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--kv-dtype", default="int8", choices=["int8", "bf16"])
    ap.add_argument("--compute-dtype", default="bf16",
                    choices=["bf16", "f32"],
                    help="f32 for CPU smoke runs (XLA:CPU lacks bf16 dots)")
    ap.add_argument("--warmup", action="store_true", default=True)
    ap.add_argument("--no-warmup", dest="warmup", action="store_false")
    ap.add_argument("--sweep", default=None, metavar="S:T,...",
                    help="SLO sweep (VERDICT r3 #8): comma list of "
                         "slots:tick configs (e.g. 8:1,8:8,32:1,32:8); "
                         "runs the FIRST --engines kind per config with "
                         "requests=2*slots and prints one JSON line each "
                         "with tok/s + p50/p99 TTFT and inter-token "
                         "latency (instead of the normal engine loop)")
    args = ap.parse_args(argv)

    kinds = args.engines.split(",")
    valid = ("dense", "paged", "spec", "spec-paged")

    def base_kind(kind):
        return kind.removesuffix("-fused").removesuffix("-single")

    bad = [k for k in kinds if base_kind(k) not in valid
           or (k != base_kind(k) and not k.startswith("spec"))]
    if bad:
        ap.error(f"unknown engine kind(s) {bad}; valid: {', '.join(valid)}"
                 " (spec kinds may add a -fused/-single suffix)")

    # fail BEFORE the multi-GB weight load: every request's positions must
    # stay >= tick below the seq_len edge so the fused-scan length (and
    # its executable) never varies mid-run; a 'spec' engine additionally
    # needs speculative+1 headroom per verify tick or it silently falls
    # back to plain ticks near the edge (engine returns None), quietly
    # diluting the spec_vs_dense measurement
    worst_tick = max(args.tick,
                     args.speculative + 1
                     if any(k.startswith("spec") for k in kinds) else 0)
    if args.prompt + args.max_tokens + worst_tick >= args.seq_len:
        ap.error(f"prompt({args.prompt}) + max_tokens({args.max_tokens}) + "
                 f"{worst_tick} (tick/speculative headroom) must stay under "
                 f"seq_len({args.seq_len}): the workload would clamp the "
                 f"fused/speculative tick at the seq_len edge")

    import jax.numpy as jnp

    from ..ops import matmul as matmul_mod
    from ..utils import enable_compilation_cache

    matmul_mod.set_backend(args.backend)
    enable_compilation_cache()

    # weight loading: the same real mmap->repack->cache->device path as
    # bench.py (import from the repo root)
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from bench import default_synth_gguf, load_gguf_weights

    path = (default_synth_gguf(args.model, args.quant)
            if args.gguf == "auto" else args.gguf)
    weights, cfg, load_t = load_gguf_weights(path, matmul_mod._BACKEND)
    print(f"loaded {path}: {load_t}", file=sys.stderr)

    kv_dtype = jnp.int8 if args.kv_dtype == "int8" else jnp.bfloat16
    seq_len = args.seq_len

    from ..ops.pallas.decode_attention import BK as PAGE
    from ..serving.engine import ServingEngine
    from ..serving.paged import PagedServingEngine

    def pages_for(slots, tick):
        per_seq = -(-(args.prompt + args.max_tokens + tick) // PAGE)
        return slots * per_seq + 8 + 1  # + slack + scratch page

    n_pages = pages_for(args.slots, args.tick)

    compute = jnp.bfloat16 if args.compute_dtype == "bf16" else jnp.float32
    draft_runner = None
    if args.draft_gguf:
        # two-model speculation: the engines only need weights/cfg/dtypes
        # off the draft handle (serving.engine reads exactly these)
        from types import SimpleNamespace

        d_weights, d_cfg, d_load = load_gguf_weights(
            args.draft_gguf, matmul_mod._BACKEND)
        print(f"draft {args.draft_gguf}: {d_load}", file=sys.stderr)
        draft_runner = SimpleNamespace(weights=d_weights, cfg=d_cfg,
                                       compute_dtype=compute,
                                       kv_dtype=kv_dtype)

    def mk(kind, slots=None, tick=None):
        slots = slots or args.slots
        tick = tick or args.tick
        common = dict(weights=weights, cfg=cfg, tokenizer=None,
                      n_slots=slots, seq_len=seq_len,
                      compute_dtype=compute, kv_dtype=kv_dtype,
                      tick_tokens=tick)
        # greedy workload (temperature=0.0 in run_workload) so the
        # speculative tick engages on every slot
        spec = dict(speculative=args.speculative, draft_runner=draft_runner)
        if args.spec_fused != "default":
            spec["spec_fused"] = args.spec_fused == "on"
        # per-arm suffix beats the process-wide flag: lets one process run
        # fused and single-dispatch arms side by side (chip-health variance
        # removed — the r4 lesson that separate-process A/Bs mislead)
        if kind.endswith("-fused"):
            spec["spec_fused"] = True
        elif kind.endswith("-single"):
            spec["spec_fused"] = False
        np_ = pages_for(slots, tick)
        kind = base_kind(kind)
        if kind == "dense":
            return lambda: ServingEngine(**common)
        if kind == "spec":
            return lambda: ServingEngine(**spec, **common)
        if kind == "spec-paged":
            return lambda: PagedServingEngine(n_pages=np_, **spec, **common)
        return lambda: PagedServingEngine(n_pages=np_, **common)

    if args.sweep:
        kind = kinds[0]
        out = []
        for part in args.sweep.split(","):
            s_, t_ = (int(x) for x in part.split(":"))
            prompts = _mk_prompts(2 * s_, args.prompt, cfg.vocab_size, seed=0)
            if args.warmup:
                run_workload(mk(kind, s_, t_), prompts[:s_],
                             args.max_tokens, t_)
            res = run_workload(mk(kind, s_, t_), prompts, args.max_tokens, t_)
            res.update(metric="serving_slo", engine=kind, slots=s_, tick=t_,
                       requests=2 * s_, prompt_tokens=args.prompt,
                       max_tokens=args.max_tokens, kv_dtype=args.kv_dtype,
                       backend=matmul_mod._BACKEND)
            out.append(res)
            print(json.dumps(res))
        return out

    results = {}
    for kind in kinds:
        prompts = _mk_prompts(args.requests, args.prompt, cfg.vocab_size,
                              seed=0)
        if args.warmup:
            # identical shapes on a fresh engine: compiles prefill chunks,
            # the fused scan, single ticks, and every attention window the
            # timed run will touch
            run_workload(mk(kind), prompts[: args.slots], args.max_tokens,
                         args.tick)
        res = run_workload(mk(kind), prompts, args.max_tokens, args.tick)
        res.update({
            "metric": f"serving_engine_{kind}_tok_s",
            "engine": kind,
            "slots": args.slots,
            "requests": args.requests,
            "prompt_tokens": args.prompt,
            "max_tokens": args.max_tokens,
            "tick": args.tick,
            "kv_dtype": args.kv_dtype,
            "backend": matmul_mod._BACKEND,
        })
        if base_kind(kind) in ("paged", "spec-paged"):
            res["page_size"] = PAGE
            res["n_pages"] = n_pages
        if base_kind(kind) in ("spec", "spec-paged"):
            res["speculative"] = args.speculative
            res["draft"] = "model" if draft_runner is not None else "lookup"
        results[kind] = res
        print(json.dumps(res))
    # pair every spec arm (incl. -fused/-single suffixed ones) against its
    # plain engine from the same process
    for kind, res in results.items():
        bk = base_kind(kind)
        plain = "paged" if bk == "spec-paged" else "dense"
        if bk.startswith("spec") and plain in results:
            print(json.dumps({
                "metric": f"{kind.replace('-', '_')}_vs_{plain}",
                "value": round(res["tok_s"] / results[plain]["tok_s"], 4),
                "speculative": args.speculative,
                # interpretation key: ~1.0 tokens/tick means the
                # random-prompt workload measured verify overhead, not
                # realistic acceptance
                "spec_tokens_per_tick": res.get("spec_tokens_per_tick"),
            }))
    if "dense" in results and "paged" in results:
        print(json.dumps({
            "metric": "paged_vs_dense",
            "value": round(results["paged"]["tok_s"]
                           / results["dense"]["tok_s"], 4),
            "kv_pool_ratio": round(results["paged"]["kv_pool_bytes"]
                                   / results["dense"]["kv_pool_bytes"], 4),
        }))
    return results


if __name__ == "__main__":
    main()
