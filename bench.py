#!/usr/bin/env python
"""Headline benchmark: single-chip decode throughput at 7B Q4_K.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "tokens/sec/chip", "vs_baseline": N}

vs_baseline is the fraction of the HBM-bandwidth roofline achieved (the
BASELINE.json target is > 0.8): roofline tok/s = HBM_BW / bytes-read-per-token
where bytes/token = total planar-quantized weight bytes touched per decode
step. The reference publishes no absolute numbers (BASELINE.md) — roofline
fraction is the driver-defined metric.

Usage: python bench.py [--model 7b|1b|tiny] [--steps N] [--batch B] [--quant q4_k|q8_0]
"""

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_weights_fast(cfg, typ, backend="xla", prefill_w8=False):
    """Random planar weights directly on device (no slow host encode)."""
    from crabml_tpu.quant.planar import QTensor, random_planar
    from crabml_tpu.ops.pallas.gemm_quant import augment_w8, random_repacked

    rng = np.random.default_rng(0)
    D, HD, V, L, kv = (
        cfg.embedding_dim,
        cfg.hidden_dim,
        cfg.vocab_size,
        cfg.n_layers,
        cfg.kv_dim,
    )

    # bf16 scales: lossless under bf16 compute, ~15% fewer Q4_K bytes
    if backend in ("pallas", "w4a8"):
        def make(typ, shape, rng):
            qt = random_repacked(typ, shape, rng, scale_dtype="bf16")
            # augment BEFORE the layer broadcast: one host requant, L views
            return augment_w8(qt) if prefill_w8 else qt
    else:
        make = random_planar

    def stacked(m, k):
        one = make(typ, (m, k), rng)
        planes = {
            n: jax.device_put(np.broadcast_to(p, (L,) + p.shape)) for n, p in one.planes.items()
        }
        return QTensor(typ, (L, m, k), planes)

    def single(m, k):
        qt = make(typ, (m, k), rng)
        return QTensor(qt.kind, qt.shape, {n: jax.device_put(p) for n, p in qt.planes.items()})

    layers = {
        # load-time fused layouts, as models.weights.fuse_weights produces
        "wqkv": stacked(D + 2 * kv, D),
        "wo": stacked(D, D),
        "attn_norm": jax.device_put(np.ones((L, D), np.float32)),
        "ffn_norm": jax.device_put(np.ones((L, D), np.float32)),
    }
    if cfg.n_experts:  # mixtral-shaped: stacked expert planes (L, E*HD, D)
        E = cfg.n_experts
        layers["ffn_gate_inp"] = jax.device_put(
            (np.random.default_rng(1).standard_normal((L, E, D)) * 0.02
             ).astype(np.float32))
        layers["ffn_gate_exps"] = stacked(E * HD, D)
        layers["ffn_up_exps"] = stacked(E * HD, D)
        layers["ffn_down_exps"] = stacked(E * D, HD)
    else:
        layers["wgu"] = stacked(2 * HD, D)
        layers["ffn_down"] = stacked(D, HD)
    # embedding stays canonical planar — the gather path dequantizes rows and
    # only matmul weights go through the kernels
    emb = random_planar(typ, (V, D), rng)
    token_embed = QTensor(
        emb.kind, emb.shape, {n: jax.device_put(p) for n, p in emb.planes.items()}
    )
    return {
        "token_embed": token_embed,
        "final_norm": jax.device_put(np.ones(D, np.float32)),
        "final_norm_b": None,
        "output": single(V, D),
        "layers": layers,
    }


def weight_bytes_per_token(weights, cfg=None):
    """Actual bytes streamed from HBM per decode step: every matmul-weight
    plane read once (embedding gather negligible). MoE expert planes count
    at K/E: B=1 decode gathers only the top-k experts' tiles
    (models.forward.moe_ffn)."""
    from crabml_tpu.quant.planar import QTensor

    frac_moe = 1.0
    if cfg is not None and cfg.n_experts:
        frac_moe = cfg.n_experts_used / cfg.n_experts
    total = 0.0
    items = list(weights["layers"].items()) + [("output", weights["output"])]
    for name, val in items:
        if isinstance(val, QTensor):
            frac = frac_moe if name.endswith("_exps") else 1.0
            for pn, p in val.planes.items():
                if pn in ("w8", "dw"):
                    continue  # prefill-only planes, never read at decode
                total += int(np.prod(p.shape)) * p.dtype.itemsize * frac
    return int(total)


HBM_BW_SPEC = {
    "TPU v5 lite": 819e9,  # v5e: ~819 GB/s
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
}


def spec_bw():
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW_SPEC.items():
        if kind.startswith(k):
            return v
    return 819e9


def measured_bw(mb=512, iters=20):
    """Achievable HBM streaming bandwidth on THIS chip (u8 reduce in a
    compiled loop). The axon-tunneled v5e delivers well under the 819 GB/s
    spec; the roofline fraction is reported against what the chip can
    actually stream so it reflects kernel quality, with the spec number in
    `detail`."""
    n = mb * 1024 * 1024
    x = jnp.ones((n // 1024, 1024), jnp.uint8)

    @jax.jit
    def loop(x, z):
        def body(i, acc):
            return acc + (x.astype(jnp.int32) + acc).sum()
        return jax.lax.fori_loop(0, iters, body, z)

    _ = np.asarray(loop(x, jnp.int32(0)))
    t0 = time.perf_counter()
    _ = np.asarray(loop(x, jnp.int32(0)))
    dt = (time.perf_counter() - t0) / iters
    return x.nbytes / dt


def load_gguf_weights(path, backend, prefill_w8=False):
    """The REAL model path: mmap -> native repack [-> disk plane cache]
    -> planar pytree -> device. Returns (weights, cfg, phase timings)."""
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.models.weights import (augment_w8_weights, fuse_weights,
                                           load_weights, repack_weights)
    from crabml_tpu.runtime import weight_cache as _wc

    t = {}
    t0 = time.perf_counter()
    gf = GGUFFile(path)
    cfg = config_from_gguf(gf.metadata)
    t["open_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    kern = backend in ("pallas", "w4a8")
    layout = "kernel" if kern else "planar"
    # same disk plane cache the Runner uses: warm bench runs skip the repack
    wc_root = _wc.default_root()
    wc_key = _wc.cache_key(path, layout, "bf16" if kern else "float32")
    # W8-augmented planes cache under their own key (same scheme as the
    # Runner: partial budgets quantize to GiB so the key is run-stable) —
    # a warm `--mode prefill --model 13b` skips the ~20 min host augment,
    # not just the repack
    budget = None
    w8_tag = ""
    if prefill_w8 and kern:
        from crabml_tpu.runtime.runner import _auto_w8_budget

        budget = _auto_w8_budget(gf, cfg, 1, 1024, None)
        w8_tag = ("" if budget is None
                  else ("+w8" if budget == -1 else f"+w8b{budget >> 30}"))
        t["w8_budget"] = ("full" if budget == -1
                          else "off" if budget is None
                          else f"{budget / 2**30:.1f}GiB")
    host = None
    if w8_tag:
        host = _wc.load(wc_root, _wc.cache_key(path, layout + w8_tag, "bf16"))
        t["w8_cache_hit"] = host is not None
    if host is None:
        host = _wc.load(wc_root, wc_key)
        t["cache_hit"] = host is not None
        if host is None:
            host = load_weights(gf, cfg, layout, "bf16" if kern else np.float32)
            host = fuse_weights(host, cfg)
            if kern:
                host = repack_weights(host, cfg)
            _wc.save(wc_root, wc_key, host)
        if budget is not None:
            tw = time.perf_counter()
            host = augment_w8_weights(
                host, None if budget == -1 else budget)
            t["w8_augment_s"] = round(time.perf_counter() - tw, 2)
            _wc.save(wc_root, _wc.cache_key(path, layout + w8_tag, "bf16"),
                     host)
    t["repack_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    weights = jax.tree.map(jax.device_put, host)
    jax.block_until_ready(weights)
    t["device_put_s"] = round(time.perf_counter() - t0, 2)
    return weights, cfg, t


def default_synth_gguf(model, quant):
    """Build (once) and return the cached full-size synthetic GGUF."""
    import os

    # v2: the 7b shape changed to Mistral-style GQA (BASELINE's config)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        ".cache", f"synth-{model}-{quant}-v2.gguf")
    if not os.path.exists(path):
        from crabml_tpu.gguf.constants import GGMLType
        from crabml_tpu.tools.synth_gguf import build_synth_gguf

        os.makedirs(os.path.dirname(path), exist_ok=True)
        print(f"building {path} (one-time)...", file=sys.stderr)
        build_synth_gguf(path, model, GGMLType[quant.upper()], verbose=False)
    return path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b",
                    choices=["7b", "7b-mha", "13b", "1b", "tiny", "mixtral"])
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prefill", type=int, default=64)
    # w4a8 is the headline config: int8 activations × int weights on the
    # MXU — the same integer-dot design the reference's hot loop uses
    # (matmul_vec.rs:37-40) — and the kernels hit the chip's achievable
    # HBM rate (260 GB/s vs 189 for bf16 dequant; ~53 vs ~40 tok/s at 7B).
    # "pallas" = exact-bf16 dequant kernels; "xla" = composed dequant.
    ap.add_argument("--backend", default="w4a8",
                    choices=["auto", "xla", "pallas", "w4a8"])
    ap.add_argument("--mode", default="decode",
                    choices=["decode", "serving", "prefill", "coldstart",
                             "speculative"],
                    help="decode: B=1 latency (headline); serving: aggregate "
                         "slot-batch throughput; prefill: prompt tokens/sec; "
                         "coldstart: full real-GGUF start -> first token; "
                         "speculative: B=1 prompt-lookup draft+verify decode "
                         "(effective tok/s can beat the B=1 weight-streaming "
                         "roofline; acceptance-rate-dependent)")
    ap.add_argument("--draft", type=int, default=7,
                    help="speculative mode: draft length per verify step")
    ap.add_argument("--gguf", default="auto",
                    help="GGUF file to benchmark (default 'auto': build/use "
                         "the cached full-size synthetic file, so every "
                         "number rides the real mmap->repack->device path; "
                         "'none' = synthetic device arrays, layout-faithful "
                         "but skipping the file path)")
    ap.add_argument("--prefill-w8", action="store_true", default=None,
                    help="attach W8 prefill planes (int8 storage, unpack-"
                         "free prefill tiles; +8 bits/weight HBM). Default: "
                         "on for --mode prefill, off otherwise")
    ap.add_argument("--no-prefill-w8", dest="prefill_w8",
                    action="store_false",
                    help="force W8 prefill planes OFF (bf16-dequant prefill "
                         "tiles), e.g. to isolate the W8 kernel from a "
                         "prefill measurement")
    args = ap.parse_args()

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import llama7b_config, tiny_config
    from crabml_tpu.runtime.generate import decode_loop
    from crabml_tpu.ops import matmul as matmul_mod

    matmul_mod.set_backend(args.backend)
    if args.backend == "auto":
        args.backend = matmul_mod._BACKEND  # resolve "auto"

    from crabml_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    if args.mode == "coldstart":
        # the whole user journey on a real multi-GB file, phase by phase:
        # process start -> mmap/parse -> repack -> device -> compile ->
        # first generated token. Persistent compilation cache on (warm
        # restarts skip XLA; the first-ever run pays it once).
        from crabml_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        path = args.gguf or default_synth_gguf(args.model, args.quant)
        t_start = time.perf_counter()
        from crabml_tpu.runtime.runner import Runner

        runner = Runner(path, seq_len=1024, compute_dtype=jnp.bfloat16,
                        backend=args.backend)
        t_load = time.perf_counter() - t_start
        t0 = time.perf_counter()
        _, _, tok = runner.prefill("Once upon a time", bos=True)
        ttft = time.perf_counter() - t0
        gen_t0 = time.perf_counter()
        n = 0
        for _ in runner.generate(tok, steps=17):
            n += 1
        gen_s = time.perf_counter() - gen_t0
        # split the conflated first-TTFT (VERDICT r3 #9): the same prefill
        # executable re-run on a reset cache is the engine's WARM prompt
        # latency; the delta is one-time compile + (on the tunneled axon
        # backend) the server-side first-execution kernel build — both
        # environmental, neither paid per request
        runner.reset()
        t1 = time.perf_counter()
        runner.prefill("Once upon a time", bos=True)
        warm_prefill = time.perf_counter() - t1
        import os

        result = {
            "metric": f"coldstart_to_first_token_{args.model}_{args.quant}",
            "value": round(t_load + ttft, 2),
            "unit": "seconds",
            # target from VERDICT r1: warm cold-start < 60s
            "vs_baseline": round(60.0 / max(t_load + ttft, 1e-9), 3),
            "detail": {
                "gguf_gb": round(os.path.getsize(path) / 1e9, 2),
                "load_s": round(t_load, 2),
                "load_repack_s": round(runner.metrics.times_ns.get("load.repack", 0) / 1e9, 2),
                "load_cache_read_s": round(runner.metrics.times_ns.get("load.cache_read", 0) / 1e9, 2),
                "load_cache_write_s": round(runner.metrics.times_ns.get("load.cache_write", 0) / 1e9, 2),
                "load_device_put_s": round(runner.metrics.times_ns.get("load.device_put", 0) / 1e9, 2),
                # auto-W8 prefill planes (one-time host requant; cached)
                "load_w8_augment_s": round(runner.metrics.times_ns.get("load.w8_augment", 0) / 1e9, 2),
                "prefill_w8": runner.prefill_w8,
                "prefill_plus_compile_s": round(ttft, 2),
                # the engine's steady-state prompt latency (same executable,
                # reset cache); first-run minus this = one-time compile +
                # server-side backend build (environmental)
                "prefill_warm_s": round(warm_prefill, 2),
                "compile_plus_backend_build_s": round(ttft - warm_prefill, 2),
                "decode_tok_s_dispatched": round(n / gen_s, 1),
                "device": jax.devices()[0].device_kind,
            },
        }
        print(json.dumps(result))
        return

    typ = GGMLType[args.quant.upper()]
    if args.model == "7b":
        cfg = llama7b_config()
    elif args.model == "13b":
        cfg = llama7b_config(
            embedding_dim=5120, hidden_dim=13824, n_layers=40, n_heads=40,
            n_kv_heads=40, vocab_size=32000, model_name="synthetic-13b",
        )
    elif args.model == "1b":
        cfg = llama7b_config(
            embedding_dim=2048, hidden_dim=5632, n_layers=22, n_heads=32,
            n_kv_heads=4, vocab_size=32000, model_name="synthetic-1b",
        )
    elif args.model == "mixtral":
        # mixtral-shaped MoE sized for one 16 GB chip at Q4_K (~2.6 GB):
        # 8 experts, top-2 — decode reads top-2's planes only (the gather
        # path), so the dense-vs-gather traffic ratio E/K is measurable
        cfg = llama7b_config(
            embedding_dim=2048, hidden_dim=5632, n_layers=16, n_heads=16,
            n_kv_heads=8, vocab_size=32000, model_name="synthetic-mixtral",
            n_experts=8, n_experts_used=2,
        )
    else:
        cfg = tiny_config()

    B = args.batch
    if args.prefill_w8 is None:
        args.prefill_w8 = args.mode == "prefill"
    use_w8 = args.prefill_w8 and args.backend in ("pallas", "w4a8")
    if args.gguf and args.gguf != "none":
        path = (default_synth_gguf(args.model, args.quant)
                if args.gguf == "auto" else args.gguf)
        weights, cfg, load_t = load_gguf_weights(path, args.backend,
                                                 prefill_w8=use_w8)
        print(f"loaded {path}: {load_t}", file=sys.stderr)
    else:
        weights = build_weights_fast(cfg, typ, backend=args.backend,
                                     prefill_w8=use_w8)
    cache = KVCache.create(cfg, B, 1024, jnp.bfloat16)
    compute = jnp.bfloat16

    from crabml_tpu.utils import bucket as _shared_bucket

    def bucket(n):
        return min(_shared_bucket(n, 128), 1024)

    step = jax.jit(
        lambda w, c, t, p: forward(w, c, t, p, cfg, compute),
        donate_argnames=("c",),
    )

    if args.mode == "serving":
        B = max(B, 32)
        cache = KVCache.create(cfg, B, 512, jnp.bfloat16)
    if args.mode == "prefill":
        # prefill throughput: time a T-token prompt step, median of 3
        T = max(args.prefill, 512)
        if T > cache.seq_len:
            cache = KVCache.create(cfg, B, T, jnp.bfloat16)
        tokens = jnp.ones((B, T), jnp.int32)
        pos0 = jnp.zeros(B, jnp.int32)
        ts = []
        for rep in range(4):
            t0 = time.perf_counter()
            logits, cache = step(weights, cache, tokens, pos0)
            _ = np.asarray(logits[:1, :1, :1])
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts[1:])[1]  # median of the 3 post-compile reps
        tok_s = B * T / dt
        D, HD, V, L, kv = (cfg.embedding_dim, cfg.hidden_dim, cfg.vocab_size,
                           cfg.n_layers, cfg.kv_dim)
        matmul_params = L * (D * (D + 2 * kv) + D * D + 3 * HD * D) + V * D
        mxu_flops = 2 * matmul_params * B * T
        mxu_peak = 197e12 if "v5 lite" in jax.devices()[0].device_kind else 275e12
        result = {
            "metric": f"prefill_tokens_per_sec_{args.model}_{args.quant}",
            "value": round(tok_s, 1),
            "unit": "tokens/sec/chip",
            # fraction of the chip's bf16 MXU peak (prefill is compute-bound)
            "vs_baseline": round(mxu_flops / dt / mxu_peak, 4),
            "detail": {
                "prompt_tokens": T,
                "batch": B,
                "step_ms": round(dt * 1e3, 1),
                "approx_mxu_tflops": round(mxu_flops / dt / 1e12, 1),
                "device": jax.devices()[0].device_kind,
            },
        }
        print(json.dumps(result))
        return

    if args.mode == "speculative":
        # B=1 prompt-lookup speculative decode (runtime.speculative): the
        # verify pass streams the same weight bytes as one decode step, so
        # effective tok/s = plain-decode rate × tokens-per-round. Greedy on
        # a synthetic-weights model settles into repetitive output, which
        # the n-gram draft predicts well — report the acceptance rate so
        # the number can be discounted for less repetitive text.
        from crabml_tpu.runtime.speculative import speculative_loop

        draft = args.draft
        S = cache.seq_len
        rng = np.random.default_rng(0)
        # varied prompt with one repeated block so matching has signal
        block = rng.integers(1, cfg.vocab_size, 32, dtype=np.int32)
        prompt = np.concatenate([block, block])[: args.prefill]
        tokens = jnp.asarray(prompt[None, :])
        pos0_i = len(prompt)
        logits, cache = step(weights, cache, tokens, jnp.zeros(1, jnp.int32))
        tok0 = int(np.asarray(jnp.argmax(logits[0, -1])))
        hist = np.zeros(S, np.int32)
        hist[:pos0_i] = prompt
        r1, r2 = 8, 40
        win = bucket(pos0_i + r2 * (draft + 1))

        def timed_spec(rounds, reps=3):
            nonlocal cache
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                outs, counts, cache, _, _, _ = speculative_loop(
                    weights, cache, jnp.asarray(hist), jnp.int32(tok0),
                    jnp.int32(pos0_i), rounds, draft, cfg, compute,
                    attn_window=win,
                )
                n_tok = int(np.asarray(counts).sum())
                dt = time.perf_counter() - t0
                best = (dt, n_tok) if best is None else min(best, (dt, n_tok))
            return best

        timed_spec(r1, reps=1)  # compile
        timed_spec(r2, reps=1)
        t1, k1 = timed_spec(r1)
        t2, k2 = timed_spec(r2)
        per = max((t2 - t1) / max(k2 - k1, 1), 1e-9)
        tok_s = 1.0 / per
        bpt = weight_bytes_per_token(weights, cfg)
        bw = measured_bw()
        roofline = bw / bpt
        result = {
            "metric": f"speculative_decode_tokens_per_sec_{args.model}_{args.quant}",
            "value": round(tok_s, 2),
            "unit": "tokens/sec/chip",
            # >1 means speculation beat the B=1 weight-streaming roofline
            "vs_baseline": round(tok_s / roofline, 4),
            "detail": {
                "draft": draft,
                "rounds": [r1, r2],
                "tokens_emitted": [k1, k2],
                "accept_tokens_per_round": round((k2 - k1) / (r2 - r1), 2),
                "hbm_roofline_tok_s": round(roofline, 1),
                "measured_hbm_bw_gbps": round(bw / 1e9, 1),
                "device": jax.devices()[0].device_kind,
            },
        }
        print(json.dumps(result))
        return

    # prefill
    tokens = jnp.ones((B, args.prefill), jnp.int32)
    pos = jnp.zeros(B, jnp.int32)
    t0 = time.perf_counter()
    logits, cache = step(weights, cache, tokens, pos)
    _ = np.asarray(logits[:1, :1, :1])
    prefill_compile_s = time.perf_counter() - t0
    # split the conflated first call (VERDICT r4 #6): the same executable
    # re-run is the engine's WARM prompt latency; the delta is one-time
    # XLA compile + the tunneled backend's server-side first-execution
    # kernel build — environmental, paid once, not per request
    t0 = time.perf_counter()
    logits, cache = step(weights, cache, tokens, jnp.zeros(B, jnp.int32))
    _ = np.asarray(logits[:1, :1, :1])
    prefill_warm_s = time.perf_counter() - t0

    key = jax.random.PRNGKey(0)
    tok = jnp.ones(B, jnp.int32)
    pos = jnp.zeros(B, jnp.int32) + args.prefill

    # decode: warmup/compile, then two-point measurement (N and 5N steps)
    # cancels the per-jit-call round-trip floor (~20-30 ms on the tunneled
    # axon chip), which would otherwise dominate at small step counts.
    # median-of-3 per point to tame tunnel jitter.
    n1, n2 = args.steps, args.steps * 5

    def timed(steps, reps=3):
        # pos stays fixed across reps (slots re-written in place) so the
        # attention window — and therefore the compiled executable — is
        # identical for every rep of a variant.
        nonlocal cache, key
        win = bucket(int(np.asarray(pos).max()) + steps)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            toks, cache, key = decode_loop(
                weights, cache, tok, pos, key, steps, cfg, compute,
                attn_window=win,
            )
            _ = np.asarray(toks[:1])
            ts.append(time.perf_counter() - t0)
        return sorted(ts)[len(ts) // 2]

    timed(n1, reps=1)  # compile n1 variant
    timed(n2, reps=1)  # compile n2 variant
    t1 = timed(n1)
    t2 = timed(n2)

    per_step = max((t2 - t1) / (n2 - n1), 1e-9)
    tok_s = B / per_step
    metric_name = f"decode_tokens_per_sec_{args.model}_{args.quant}"
    if args.mode == "serving":
        metric_name = f"serving_tokens_per_sec_{args.model}_{args.quant}"
    bpt = weight_bytes_per_token(weights, cfg)
    bw = measured_bw()
    roofline = bw / bpt
    spec_roofline = spec_bw() / bpt
    result = {
        "metric": metric_name,
        "value": round(tok_s, 2),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(tok_s / roofline, 4),
        "detail": {
            "batch": B,
            "steps": [n1, n2],
            "weight_bytes_per_token": bpt,
            "measured_hbm_bw_gbps": round(bw / 1e9, 1),
            "hbm_roofline_tok_s": round(roofline, 1),
            "spec_roofline_tok_s": round(spec_roofline, 1),
            "vs_spec_roofline": round(tok_s / spec_roofline, 4),
            "prefill_plus_compile_s": round(prefill_compile_s, 2),
            "prefill_warm_s": round(prefill_warm_s, 2),
            "compile_plus_backend_build_s": round(
                prefill_compile_s - prefill_warm_s, 2),
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
