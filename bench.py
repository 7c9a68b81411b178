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


def build_weights_fast(cfg, typ, backend="xla"):
    """Random planar weights directly on device (no slow host encode)."""
    from crabml_tpu.quant.planar import QTensor, random_planar
    from crabml_tpu.ops.pallas.gemm_quant import random_repacked

    rng = np.random.default_rng(0)
    D, HD, V, L, kv = (
        cfg.embedding_dim,
        cfg.hidden_dim,
        cfg.vocab_size,
        cfg.n_layers,
        cfg.kv_dim,
    )

    make = random_repacked if backend == "pallas" else random_planar

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
        "wq": stacked(D, D),
        "wk": stacked(kv, D),
        "wv": stacked(kv, D),
        "wo": stacked(D, D),
        "ffn_gate": stacked(HD, D),
        "ffn_up": stacked(HD, D),
        "ffn_down": stacked(D, HD),
        "attn_norm": jax.device_put(np.ones((L, D), np.float32)),
        "ffn_norm": jax.device_put(np.ones((L, D), np.float32)),
    }
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


def weight_bytes_per_token(weights):
    """Actual bytes streamed from HBM per decode step: every matmul-weight
    plane read once (embedding gather negligible)."""
    from crabml_tpu.quant.planar import QTensor

    total = 0
    items = list(weights["layers"].items()) + [("output", weights["output"])]
    for _, val in items:
        if isinstance(val, QTensor):
            for p in val.planes.values():
                total += int(np.prod(p.shape)) * p.dtype.itemsize
    return total


HBM_BW = {
    "TPU v5 lite": 819e9,  # v5e: ~819 GB/s
    "TPU v4": 1228e9,
    "TPU v6 lite": 1640e9,
}


def detect_bw():
    kind = jax.devices()[0].device_kind
    for k, v in HBM_BW.items():
        if kind.startswith(k):
            return v
    return 819e9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=["7b", "1b", "tiny"])
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--steps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--prefill", type=int, default=64)
    ap.add_argument("--backend", default=None, choices=[None, "xla", "pallas"])
    args = ap.parse_args()

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import llama7b_config, tiny_config
    from crabml_tpu.runtime.generate import decode_loop
    from crabml_tpu.ops import matmul as matmul_mod

    if args.backend:
        matmul_mod.set_backend(args.backend)

    typ = GGMLType[args.quant.upper()]
    if args.model == "7b":
        cfg = llama7b_config()
    elif args.model == "1b":
        cfg = llama7b_config(
            embedding_dim=2048, hidden_dim=5632, n_layers=22, n_heads=32,
            n_kv_heads=4, vocab_size=32000, model_name="synthetic-1b",
        )
    else:
        cfg = tiny_config()

    B = args.batch
    weights = build_weights_fast(cfg, typ, backend=args.backend or "xla")
    cache = KVCache.create(cfg, B, 1024, jnp.bfloat16)
    compute = jnp.bfloat16

    step = jax.jit(
        lambda w, c, t, p: forward(w, c, t, p, cfg, compute),
        donate_argnames=("c",),
    )

    # prefill
    tokens = jnp.ones((B, args.prefill), jnp.int32)
    pos = jnp.zeros(B, jnp.int32)
    t0 = time.perf_counter()
    logits, cache = step(weights, cache, tokens, pos)
    logits.block_until_ready()
    prefill_compile_s = time.perf_counter() - t0

    key = jax.random.PRNGKey(0)
    tok = jnp.ones(B, jnp.int32)
    pos = pos + args.prefill

    # decode: warmup/compile, then measure
    toks, cache, key = decode_loop(
        weights, cache, tok, pos, key, args.steps, cfg, compute
    )
    toks.block_until_ready()
    pos = pos + args.steps

    t0 = time.perf_counter()
    toks, cache, key = decode_loop(
        weights, cache, tok, pos, key, args.steps, cfg, compute
    )
    toks.block_until_ready()
    dt = time.perf_counter() - t0

    tok_s = args.steps * B / dt
    bpt = weight_bytes_per_token(weights)
    roofline = detect_bw() / bpt
    result = {
        "metric": f"decode_tokens_per_sec_{args.model}_{args.quant}",
        "value": round(tok_s, 2),
        "unit": "tokens/sec/chip",
        "vs_baseline": round(tok_s / roofline, 4),
        "detail": {
            "batch": B,
            "steps": args.steps,
            "weight_bytes_per_token": bpt,
            "hbm_roofline_tok_s": round(roofline, 1),
            "prefill_plus_compile_s": round(prefill_compile_s, 2),
            "device": jax.devices()[0].device_kind,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
