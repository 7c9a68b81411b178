"""B=32 serving-decode glue ablation (VERDICT r4 next-#1, reproducible).

The round-4 finding (`benchmarks/r4/b32_ablation.json`, produced ad hoc):
at B=32 the four fused quant-matmul chains cost 25.0 ms/pass — row-flat,
the same bytes as the B=1 weight stream — while the stock decode step
cost 46.6 ms. The ~20 ms delta was non-matmul glue, dominated by the KV
cache riding the layer scan as xs->ys (a full cache copy through HBM
every step). Round 5's fused stacked-cache attention keeps the cache out
of the scan (models/forward.py fused_kv path + one batched scatter after
the scan).

This tool re-runs that ablation from committed code so the artifact is
reproducible:

  stock          decode_loop as served (fused stacked-cache attention)
  unfused        the pre-r5 path, forced by gating the fused kernel off
                 (cache streams through the scan — the r4 regression)
  weights_only   the four fused matmul chains alone (wqkv / wo / wgu /
                 ffn_down over all layers): the row-flat lower bound

plus a cache-capacity sweep (stock at S in --seq-lens, fixed live
context) — flat step time across S is the direct evidence the cache no
longer streams per step.

All variants are two-point timed (N vs 5N steps, median of 3) in ONE
process so chip/tunnel health variance cancels within a row.

Usage:
    python -m crabml_tpu.tools.b32_ablation --gguf auto
        [--batch 32] [--steps 8] [--seq-lens 128,512,1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _two_point(run, n1: int, n2: int, reps: int = 3) -> float:
    """Seconds per step via the (n2-n1) delta, median of `reps`."""
    run(n1)  # compile
    run(n2)
    t1s, t2s = [], []
    for _ in range(reps):
        t0 = time.perf_counter()
        run(n1)
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(n2)
        t2s.append(time.perf_counter() - t0)
    t1 = sorted(t1s)[len(t1s) // 2]
    t2 = sorted(t2s)[len(t2s) // 2]
    return max((t2 - t1) / (n2 - n1), 1e-9)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="crabml-tpu-b32-ablation")
    ap.add_argument("--gguf", default="auto")
    ap.add_argument("--model", default="7b")
    ap.add_argument("--quant", default="q4_k")
    ap.add_argument("--backend", default="w4a8")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--seq-lens", default="128,512,1024")
    ap.add_argument("--live-ctx", type=int, default=100,
                    help="live context per slot at measurement (constant "
                         "across the S sweep so only capacity varies)")
    ap.add_argument("--out", default=None, help="write JSON lines here too")
    args = ap.parse_args(argv)

    sys.path.insert(0, ".")
    from bench import default_synth_gguf, load_gguf_weights

    from ..models.forward import KVCache, forward
    from ..ops import matmul as matmul_mod
    from ..ops.pallas import decode_attention as da
    from ..runtime.generate import decode_loop
    from ..utils import enable_compilation_cache

    matmul_mod.set_backend(args.backend)
    enable_compilation_cache()

    path = (default_synth_gguf(args.model, args.quant)
            if args.gguf == "auto" else args.gguf)
    weights, cfg, load_t = load_gguf_weights(path, args.backend)
    print(f"loaded {path}: {load_t}", file=sys.stderr)

    B = args.batch
    compute = jnp.bfloat16
    seq_lens = [int(s) for s in args.seq_lens.split(",")]
    n1, n2 = args.steps, args.steps * 5
    rows = []

    def emit(row):
        rows.append(row)
        print(json.dumps(row), flush=True)

    raw_loop = decode_loop.__wrapped__  # re-jit per variant: the fused
    # gate is read at TRACE time, so each variant needs its own jit cache

    def time_decode(S: int, fused: bool) -> float:
        loop = jax.jit(
            raw_loop,
            static_argnames=("steps", "cfg", "compute_dtype", "temperature",
                            "topp", "attn_window"),
            donate_argnames=("cache",),
        )
        orig = da.fused_decode_eligible
        if not fused:
            da.fused_decode_eligible = lambda *a, **k: False
        try:
            state = {
                "cache": KVCache.create(cfg, B, S, jnp.bfloat16),
                "key": jax.random.PRNGKey(0),
            }
            tok = jnp.ones(B, jnp.int32)
            pos = jnp.full((B,), args.live_ctx, jnp.int32)
            win = S  # constant window => executable identical across reps

            def run(steps):
                toks, state["cache"], state["key"] = loop(
                    weights, state["cache"], tok, pos, state["key"], steps,
                    cfg, compute, attn_window=win,
                )
                np.asarray(toks[:1])

            return _two_point(run, n1, n2)
        finally:
            da.fused_decode_eligible = orig

    # -- stock across cache capacities (flatness = no per-step cache copy)
    for S in seq_lens:
        per = time_decode(S, fused=True)
        emit({"tag": "stock", "seq_len": S, "batch": B,
              "ms_per_step": round(per * 1e3, 2),
              "tok_s": round(B / per, 1)})

    # -- the pre-r5 path at the headline capacity
    S0 = 512 if 512 in seq_lens else seq_lens[len(seq_lens) // 2]
    per = time_decode(S0, fused=False)
    emit({"tag": "unfused_scan_cache", "seq_len": S0, "batch": B,
          "ms_per_step": round(per * 1e3, 2), "tok_s": round(B / per, 1),
          "note": "cache rides the layer scan xs->ys (r4 path)"})

    # -- weights-only lower bound: the four fused matmul chains per layer,
    # chained through a scan so XLA can't elide any of them
    lw = weights["layers"]
    L = cfg.n_layers
    from ..models.forward import project_qkv

    def one_pass(h):
        def layer(h, l):
            q, k, v = project_qkv(lw, l, h, cfg, compute)
            o = matmul_mod.qmatmul(q, lw["wo"], compute, layer=l)
            if "wgu" in lw:
                gu = matmul_mod.qmatmul(o, lw["wgu"], compute, layer=l)
                gate, up = (gu[..., : cfg.hidden_dim],
                            gu[..., cfg.hidden_dim:])
            else:
                gate = matmul_mod.qmatmul(o, lw["ffn_gate"], compute, layer=l)
                up = matmul_mod.qmatmul(o, lw["ffn_up"], compute, layer=l)
            d = matmul_mod.qmatmul(jax.nn.silu(gate) * up, lw["ffn_down"],
                                   compute, layer=l)
            # fold k/v in so their kernels aren't dead code (a *0 term
            # could be algebraically elided; 1e-6 can't and is noise)
            h = d + jnp.sum(k + v, axis=-1, keepdims=True) * 1e-6
            return h.astype(compute), None
        h, _ = jax.lax.scan(layer, h, jnp.arange(L))
        return h

    @jax.jit
    def matmul_chain(h, steps_arr):
        def body(h, _):
            return one_pass(h), None
        h, _ = jax.lax.scan(body, h, steps_arr)
        return h

    h0 = jnp.ones((B, cfg.embedding_dim), compute)

    def run_mm(steps):
        np.asarray(matmul_chain(h0, jnp.zeros(steps))[:1, :1])

    per = _two_point(run_mm, n1, n2)
    emit({"tag": "weights_only_4matmuls", "batch": B,
          "ms_per_pass": round(per * 1e3, 2),
          "note": "fused wqkv/wo/wgu/ffn_down chain — row-flat weight-"
                  "stream bound (r4: 25.0 ms)"})

    if args.out:
        with open(args.out, "w") as f:
            for row in rows:
                f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
