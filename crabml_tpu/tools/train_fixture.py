"""Train a small llama-family model and export it as a GGUF fixture.

Why a trainer inside an inference engine: the only committed real-weight
model (the reference's 260k tinystories fixture) has 64-wide rows — too
narrow for K-quant superblocks (256 elems) — so an honest END-TO-END
perplexity gate for Q2_K..Q6_K needs a model with k >= 256 whose weights
are REAL (learned), not random. This trains one on text sampled from the
260k model (eval.make_corpus) and writes a plain f32 GGUF that the whole
engine (and llama.cpp) can load.

    python -m crabml_tpu.tools.train_fixture corpus.txt out.gguf --steps 1500
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def init_params(key, V, D, HD, L, H, KV):
    hd = D // H
    kv_dim = KV * hd
    ks = jax.random.split(key, 2 + L)
    p = {
        "embed": jax.random.normal(ks[0], (V, D)) * 0.02,
        "final_norm": jnp.ones(D),
        "layers": [],
    }
    for l in range(L):
        k = jax.random.split(ks[2 + l], 7)
        s = 0.02
        p["layers"].append({
            "attn_norm": jnp.ones(D),
            "ffn_norm": jnp.ones(D),
            "wq": jax.random.normal(k[0], (D, D)) * s,
            "wk": jax.random.normal(k[1], (kv_dim, D)) * s,
            "wv": jax.random.normal(k[2], (kv_dim, D)) * s,
            "wo": jax.random.normal(k[3], (D, D)) * s,
            "wg": jax.random.normal(k[4], (HD, D)) * s,
            "wu": jax.random.normal(k[5], (HD, D)) * s,
            "wd": jax.random.normal(k[6], (D, HD)) * s,
        })
    return p


def forward_train(p, tokens, cfg):
    """Causal forward, llama semantics (rms norm, llama-mode rope, GQA,
    SiLU-gated FFN, tied output head). tokens: (B, T) -> logits (B, T, V)."""
    D, H, KV, HD = cfg["D"], cfg["H"], cfg["KV"], cfg["HD"]
    hd = D // H
    B, T = tokens.shape
    x = p["embed"][tokens]

    posn = jnp.arange(T)
    i = jnp.arange(hd // 2)
    inv = 10000.0 ** (-2.0 * i / hd)
    theta = posn[:, None] * inv[None, :]
    cos, sin = jnp.cos(theta), jnp.sin(theta)

    def rope(v):  # (B, T, h, hd) llama mode: adjacent pairs
        vr = v.reshape(*v.shape[:-1], hd // 2, 2)
        x0, x1 = vr[..., 0], vr[..., 1]
        c = cos[None, :, None, :]
        s = sin[None, :, None, :]
        return jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1).reshape(v.shape)

    def norm(v, w):
        return v / jnp.sqrt(jnp.mean(v * v, -1, keepdims=True) + 1e-5) * w

    mask = jnp.tril(jnp.ones((T, T), bool))
    for lw in p["layers"]:
        h = norm(x, lw["attn_norm"])
        q = (h @ lw["wq"].T).reshape(B, T, H, hd)
        k = (h @ lw["wk"].T).reshape(B, T, KV, hd)
        v = (h @ lw["wv"].T).reshape(B, T, KV, hd)
        q, k = rope(q), rope(k)
        G = H // KV
        qg = q.reshape(B, T, KV, G, hd)
        s = jnp.einsum("btkgh,bskh->bkgts", qg, k) / jnp.sqrt(hd)
        s = jnp.where(mask[None, None, None], s, -1e30)
        a = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("bkgts,bskh->btkgh", a, v).reshape(B, T, D)
        x = x + o @ lw["wo"].T
        h2 = norm(x, lw["ffn_norm"])
        g = h2 @ lw["wg"].T
        u = h2 @ lw["wu"].T
        x = x + (jax.nn.silu(g) * u) @ lw["wd"].T
    x = norm(x, p["final_norm"])
    return x @ p["embed"].T  # tied head


def train(corpus_ids: np.ndarray, cfg, steps: int, batch: int, T: int,
          lr: float = 1e-3, seed: int = 0):
    import optax

    key = jax.random.PRNGKey(seed)
    params = init_params(key, cfg["V"], cfg["D"], cfg["HD"], cfg["L"],
                         cfg["H"], cfg["KV"])
    warmup = min(50, max(1, steps // 10))
    sched = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps + warmup)
    opt = optax.adamw(sched, weight_decay=0.01)
    state = opt.init(params)

    def loss_fn(p, tok):
        logits = forward_train(p, tok[:, :-1], cfg)
        logp = jax.nn.log_softmax(logits, axis=-1)
        tgt = tok[:, 1:]
        return -jnp.take_along_axis(logp, tgt[..., None], -1).mean()

    @jax.jit
    def step(p, s, tok):
        l, g = jax.value_and_grad(loss_fn)(p, tok)
        up, s = opt.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    n = len(corpus_ids) - T - 1
    rng = np.random.default_rng(seed)
    t0 = time.perf_counter()
    for it in range(steps):
        starts = rng.integers(0, n, batch)
        tok = np.stack([corpus_ids[s : s + T + 1] for s in starts])
        params, state, l = step(params, state, jnp.asarray(tok))
        if it % 100 == 0 or it == steps - 1:
            print(f"  step {it}: loss {float(l):.3f} "
                  f"({(it + 1) * batch * T / (time.perf_counter() - t0):.0f} tok/s)",
                  file=sys.stderr, flush=True)
    return params


def export_gguf(params, cfg, tok_meta: dict, path: str):
    from ..gguf.constants import GGMLType
    from ..gguf.writer import GGUFWriter

    w = GGUFWriter()
    w.add_metadata("general.architecture", "llama")
    w.add_metadata("general.name", "crabml-trained-fixture")
    w.add_metadata("llama.context_length", cfg["T"])
    w.add_metadata("llama.embedding_length", cfg["D"])
    w.add_metadata("llama.feed_forward_length", cfg["HD"])
    w.add_metadata("llama.block_count", cfg["L"])
    w.add_metadata("llama.attention.head_count", cfg["H"])
    w.add_metadata("llama.attention.head_count_kv", cfg["KV"])
    w.add_metadata("llama.attention.layer_norm_rms_epsilon", 1e-5)
    w.add_metadata("llama.rope.dimension_count", cfg["D"] // cfg["H"])
    w.add_metadata("tokenizer.ggml.model", "llama")
    w.add_metadata("tokenizer.ggml.tokens", tok_meta["tokens"])
    w.add_metadata("tokenizer.ggml.scores", np.asarray(tok_meta["scores"], np.float32))
    w.add_metadata("tokenizer.ggml.bos_token_id", tok_meta["bos"])
    w.add_metadata("tokenizer.ggml.eos_token_id", tok_meta["eos"])

    def t(name, a):
        a = np.asarray(a, np.float32)
        w.add_tensor(name, GGMLType.F32, a.shape, a.tobytes())

    t("token_embd.weight", params["embed"])
    for l, lw in enumerate(params["layers"]):
        t(f"blk.{l}.attn_norm.weight", lw["attn_norm"])
        t(f"blk.{l}.ffn_norm.weight", lw["ffn_norm"])
        t(f"blk.{l}.attn_q.weight", lw["wq"])
        t(f"blk.{l}.attn_k.weight", lw["wk"])
        t(f"blk.{l}.attn_v.weight", lw["wv"])
        t(f"blk.{l}.attn_output.weight", lw["wo"])
        t(f"blk.{l}.ffn_gate.weight", lw["wg"])
        t(f"blk.{l}.ffn_up.weight", lw["wu"])
        t(f"blk.{l}.ffn_down.weight", lw["wd"])
    t("output_norm.weight", params["final_norm"])
    t("output.weight", params["embed"])  # tied, stored explicitly
    w.write(path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("corpus")
    ap.add_argument("out")
    ap.add_argument("--tokenizer-from",
                    default="/root/reference/testdata/tinyllamas-stories-260k-f32.gguf")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--hidden", type=int, default=512)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--heads", type=int, default=4)
    ap.add_argument("--kv-heads", type=int, default=2)
    ap.add_argument("--ctx", type=int, default=256)
    args = ap.parse_args(argv)

    from ..gguf.reader import GGUFFile
    from ..tokenizer import tokenizer_from_gguf

    gf = GGUFFile(args.tokenizer_from)
    tk = tokenizer_from_gguf(gf.metadata)
    md = gf.metadata
    tok_meta = {
        "tokens": list(md.get("tokenizer.ggml.tokens")),
        "scores": [float(s) for s in md.get("tokenizer.ggml.scores")],
        "bos": md.get_int("tokenizer.ggml.bos_token_id"),
        "eos": md.get_int("tokenizer.ggml.eos_token_id"),
    }
    if args.corpus.endswith(".npy"):  # pre-encoded token ids
        ids = np.load(args.corpus).astype(np.int32)
    else:
        with open(args.corpus) as f:
            text = f.read()
        # encode per story: the greedy SPM merge is superlinear in string
        # length — one ~1 MB string takes minutes, 2k small ones take seconds
        ids_list: list[int] = []
        for para in text.split("\n\n"):
            if para.strip():
                ids_list.extend(tk.encode(para, bos=True))
        ids = np.asarray(ids_list, np.int32)
    print(f"corpus: {len(ids)} tokens", file=sys.stderr, flush=True)

    cfg = dict(V=len(tok_meta["tokens"]), D=args.dim, HD=args.hidden,
               L=args.layers, H=args.heads, KV=args.kv_heads, T=args.ctx)
    params = train(ids, cfg, args.steps, args.batch, args.ctx)
    export_gguf(jax.tree.map(np.asarray, params), cfg, tok_meta, args.out)
    print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
