"""MoE grouped-vs-all-experts prefill A/B (VERDICT r4 next-#5).

The grouped Pallas kernel's value proposition is compute & weight traffic
proportional to K/E (top-k of n_experts) instead of reading/computing
every expert for every row. The r4 mixtral prefill row (7,133 tok/s,
"11.7 TFLOP/s") was a single uncompared number — and its TFLOP/s figure
used bench.py's DENSE formula, which counts ONE expert's FFN (K=2 means
the real per-token compute is higher; see `moe_flops_per_token`).

This tool runs both arms in ONE process (chip-health variance cancels):

  grouped       the served path (`_moe_grouped`, rows >= 64)
  all_experts   forced via CRABML_MOE_PREFILL=all — every expert's three
                matmuls run in fused calls and rows mix by routing weight

at two shapes: the r4 bench shape (B=1, T=512 — 512 rows over 16 layers:
~128 rows/expert, a single row-tile per expert, dispatch/tile-bound) and
a bigger-batch shape (B=8 — 4096 rows, ~1024 rows/expert) where the
grouped kernel has real tiles to chew.

The env flag is read at TRACE time inside models.forward.moe_ffn, so each
arm gets its own fresh jit instance.

Usage:
    python -m crabml_tpu.tools.moe_prefill_ab --gguf auto
        [--prompt 512] [--batches 1,8] [--out f.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def moe_flops_per_token(cfg) -> dict:
    """Matmul FLOPs per token: attention + router + K (or E) experts."""
    D, HD, kv = cfg.embedding_dim, cfg.hidden_dim, cfg.kv_dim
    L, V, E, K = cfg.n_layers, cfg.vocab_size, cfg.n_experts, cfg.n_experts_used
    attn = L * (D * D + 2 * D * kv + D * D)
    router = L * E * D
    ffn_one = 3 * HD * D
    head = V * D
    return {
        "grouped": 2 * (attn + router + L * K * ffn_one + head),
        "all_experts": 2 * (attn + router + L * E * ffn_one + head),
        # what bench.py's dense formula reports (one expert, no router)
        "dense_formula": 2 * (attn + L * ffn_one + head),
    }


def main(argv=None):
    ap = argparse.ArgumentParser(prog="crabml-tpu-moe-prefill-ab")
    ap.add_argument("--gguf", default="auto")
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--backend", default="w4a8")
    ap.add_argument("--prompt", type=int, default=512)
    ap.add_argument("--batches", default="1,8")
    ap.add_argument("--no-w8", dest="w8", action="store_false", default=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    sys.path.insert(0, ".")
    from bench import default_synth_gguf, load_gguf_weights

    from ..models.forward import KVCache, forward
    from ..ops import matmul as matmul_mod
    from ..utils import enable_compilation_cache

    matmul_mod.set_backend(args.backend)
    enable_compilation_cache()

    path = (default_synth_gguf("mixtral", args.quant)
            if args.gguf == "auto" else args.gguf)
    weights, cfg, load_t = load_gguf_weights(path, args.backend,
                                             prefill_w8=args.w8)
    print(f"loaded {path}: {load_t}", file=sys.stderr)
    assert cfg.n_experts, "not a MoE model"

    T = args.prompt
    compute = jnp.bfloat16
    fl = moe_flops_per_token(cfg)
    mxu_peak = 197e12 if "v5 lite" in jax.devices()[0].device_kind else 275e12
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    def time_arm(B: int, arm: str) -> dict:
        if arm == "all_experts":
            os.environ["CRABML_MOE_PREFILL"] = "all"
        else:
            os.environ.pop("CRABML_MOE_PREFILL", None)
        step = jax.jit(
            lambda w, c, t, p: forward(w, c, t, p, cfg, compute),
            donate_argnames=("c",),
        )
        tokens = jnp.ones((B, T), jnp.int32)
        pos0 = jnp.zeros(B, jnp.int32)
        ts = []
        for _ in range(4):
            cache = KVCache.create(cfg, B, T, jnp.bfloat16)
            t0 = time.perf_counter()
            logits, cache = step(weights, cache, tokens, pos0)
            np.asarray(logits[:1, :1, :1])
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts[1:])[1]  # median of 3 post-compile reps
        flops = fl[arm if arm in fl else "grouped"] * B * T
        return {
            "tag": f"{arm}_b{B}", "batch": B, "prompt_tokens": T,
            "rows": B * T, "rows_per_expert_avg":
                round(B * T * cfg.n_experts_used / cfg.n_experts),
            "step_ms": round(dt * 1e3, 1),
            "tok_s": round(B * T / dt, 1),
            "tflops": round(flops / dt / 1e12, 1),
            "mxu_frac": round(flops / dt / mxu_peak, 4),
        }

    out = {"metric": "moe_prefill_grouped_vs_all", "model": cfg.model_name,
           "quant": args.quant, "E": cfg.n_experts, "K": cfg.n_experts_used,
           "flops_per_token": fl,
           "device": jax.devices()[0].device_kind}
    for B in (int(b) for b in args.batches.split(",")):
        g = time_arm(B, "grouped")
        a = time_arm(B, "all_experts")
        emit(g)
        emit(a)
        emit({"tag": f"summary_b{B}",
              "grouped_vs_all_walltime": round(a["step_ms"] / g["step_ms"], 3),
              "note": "wall-clock speedup of the served grouped path over "
                      "computing every expert (r3 criterion: >= 2x)"})
    out["rows"] = rows
    print(json.dumps(out), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
