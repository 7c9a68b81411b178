"""Speculative-decoding acceptance on REAL text (trained fixture).

The synthetic 7B bench (bench.py --mode speculative) measures speed at
whatever acceptance its untrained weights produce; the POLICY question —
"is prompt-lookup speculation worth turning on for real traffic?" — needs
accept_tokens_per_round on a model that actually continues natural text.
This tool runs the fused speculative loop (runtime.speculative) on a
TRAINED fixture (tools.train_fixture) over prompts cut from held-out
corpus text and reports acceptance per draft length, next to the plain
greedy path for exactness.

The fixture is tiny (~tens of M params), so tok/s here is dispatch-bound
and meaningless; acceptance transfers — n-gram lookup hits depend on the
text's repetitiveness and the model's greedy continuations, not on model
size. Read it together with the 7B overhead measurements: at 7B one
verify streams the same bytes as one decode step, so speculation pays
whenever accept_tokens_per_round clears ~1.05.

Usage:
    python -m crabml_tpu.tools.spec_accept_bench trained.gguf \
        --text heldout.txt [--drafts 4,8] [--prompts 8] [--prompt-tokens 192]
"""

from __future__ import annotations

import argparse
import json
import sys

import jax.numpy as jnp
import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser(prog="crabml-tpu-spec-accept")
    ap.add_argument("model")
    ap.add_argument("--text", required=True)
    ap.add_argument("--drafts", default="4,8")
    ap.add_argument("--prompts", type=int, default=8)
    ap.add_argument("--prompt-tokens", type=int, default=192)
    ap.add_argument("--gen-tokens", type=int, default=128)
    ap.add_argument("--seq-len", type=int, default=1024)
    ap.add_argument("--draft-gguf", default=None, metavar="GGUF",
                    help="small trained DRAFT model (same tokenizer "
                         "family): measures TWO-MODEL acceptance "
                         "(runtime.speculative.draft_model_loop) instead "
                         "of prompt lookup")
    args = ap.parse_args(argv)

    from ..models.forward import KVCache
    from ..runtime.runner import Runner
    from ..runtime.speculative import draft_model_loop, speculative_loop
    from ..utils import bucket as _bucket
    from ..utils import enable_compilation_cache

    enable_compilation_cache()
    text = open(args.text).read()
    r = Runner(args.model, seq_len=args.seq_len,
               compute_dtype=jnp.bfloat16, backend="pallas")
    rd = None
    if args.draft_gguf:
        rd = Runner(args.draft_gguf, seq_len=args.seq_len,
                    compute_dtype=jnp.bfloat16, backend="pallas")
    # encode per story: the greedy SPM merge is superlinear in string
    # length — one ~370 KB string takes tens of minutes, 2k small ones
    # take seconds (same workaround as tools.train_fixture)
    ids: list[int] = []
    for para in text.split("\n\n"):
        if para.strip():
            ids.extend(r.tokenizer.encode(para, bos=False))
    P, G = args.prompt_tokens, args.gen_tokens
    starts = np.linspace(0, max(len(ids) - P - 1, 1),
                         args.prompts).astype(int)
    results = {"metric": "spec_acceptance_real_text",
               "mode": "two_model" if rd else "prompt_lookup",
               "model": r.cfg.model_name, "prompts": args.prompts,
               "prompt_tokens": P, "gen_tokens": G, "per_draft": {}}
    if rd:
        results["draft_model"] = rd.cfg.model_name
    for K in (int(x) for x in args.drafts.split(",")):
        acc_tokens = 0
        n_rounds = 0
        for s in starts:
            prompt = [r.tokenizer.bos_token] + [int(t) for t in
                                                ids[s: s + P]]
            pos0 = len(prompt)
            win = min(_bucket(pos0 + G + K + 1, 128), args.seq_len)
            cache = KVCache.create(r.cfg, 1, args.seq_len, r.kv_dtype)
            logits, cache = r._step(
                r.weights, cache, jnp.asarray([prompt], jnp.int32),
                jnp.zeros(1, jnp.int32), attn_window=win)
            tok0 = int(np.asarray(jnp.argmax(logits[0, -1])))
            dcache = None
            if rd:  # the draft model prefills the same prompt
                dcache = KVCache.create(rd.cfg, 1, args.seq_len, rd.kv_dtype)
                _, dcache = rd._step(
                    rd.weights, dcache, jnp.asarray([prompt], jnp.int32),
                    jnp.zeros(1, jnp.int32), attn_window=win)
            hist = np.zeros(args.seq_len, np.int32)
            hist[:pos0] = prompt
            emitted = 0
            token, pos = jnp.int32(tok0), jnp.int32(pos0)
            hist_j = jnp.asarray(hist)
            while emitted < G:
                step_rounds = 16
                if rd:
                    outs, counts, cache, dcache, token, pos = (
                        draft_model_loop(
                            r.weights, cache, rd.weights, dcache, token,
                            pos, step_rounds, K, r.cfg, rd.cfg,
                            r.compute_dtype, attn_window=win))
                else:
                    outs, counts, cache, hist_j, token, pos = (
                        speculative_loop(
                            r.weights, cache, hist_j, token, pos,
                            step_rounds, K, r.cfg, r.compute_dtype,
                            attn_window=win))
                counts = np.asarray(counts)
                acc_tokens += int(counts.sum())
                n_rounds += len(counts)
                emitted += int(counts.sum())
        results["per_draft"][K] = {
            "accept_tokens_per_round": round(acc_tokens / n_rounds, 3),
            "rounds": n_rounds,
            "tokens": acc_tokens,
        }
    print(json.dumps(results))
    return results


if __name__ == "__main__":
    main()
