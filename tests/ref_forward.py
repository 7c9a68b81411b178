"""Independent numpy reference forward for differential testing.

Deliberately structured like the reference engine's per-token CPU loop
(crabml-llama2/src/llama2.rs:213-281 + 526-638): single token at a time,
growing python-list KV cache, llama-mode rope with iterative theta — so it
shares no code or structure with the jitted batched implementation it checks.
"""

import numpy as np

from crabml_tpu.gguf.reader import GGUFFile
from crabml_tpu.quant.codecs import dequantize


def load_dense(path):
    gf = GGUFFile(path)
    w = {}
    for info in gf.tensor_infos:
        w[info.name] = dequantize(info.typ, info.to_numpy(), info.n_elems).reshape(
            info.shape
        )
    md = gf.metadata
    cfg = dict(
        dim=md.get_int("llama.embedding_length"),
        n_layers=md.get_int("llama.block_count"),
        n_heads=md.get_int("llama.attention.head_count"),
        n_kv_heads=md.get_int("llama.attention.head_count_kv"),
        eps=md.get_float("llama.attention.layer_norm_rms_epsilon"),
        rope_dim=md.get_int("llama.rope.dimension_count"),
    )
    return w, cfg


def rms_norm(x, w, eps):
    return x / np.sqrt((x * x).mean() + eps) * w


def rope_llama_inplace(v, pos, head_dim, rope_dim):
    # iterative theta, adjacent pairs (rope.rs:47-63)
    theta_scale = np.float32(10000.0) ** np.float32(-2.0 / head_dim)
    for h in range(v.shape[0]):
        theta = np.float32(pos)
        for i in range(0, rope_dim, 2):
            c, s = np.cos(theta), np.sin(theta)
            theta = theta * theta_scale
            x0, x1 = v[h, i], v[h, i + 1]
            v[h, i] = x0 * c - x1 * s
            v[h, i + 1] = x0 * s + x1 * c


def softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def forward_one(w, cfg, k_caches, v_caches, token, pos):
    dim = cfg["dim"]
    H, KV = cfg["n_heads"], cfg["n_kv_heads"]
    hd = dim // H
    G = H // KV
    x = w["token_embd.weight"][token].astype(np.float32).copy()

    for l in range(cfg["n_layers"]):
        res = x.copy()
        h = rms_norm(x, w[f"blk.{l}.attn_norm.weight"], cfg["eps"])
        q = w[f"blk.{l}.attn_q.weight"] @ h
        k = w[f"blk.{l}.attn_k.weight"] @ h
        v = w[f"blk.{l}.attn_v.weight"] @ h
        q = q.reshape(H, hd)
        k = k.reshape(KV, hd)
        rope_llama_inplace(q, pos, hd, cfg["rope_dim"])
        rope_llama_inplace(k, pos, hd, cfg["rope_dim"])
        k_caches[l].append(k.copy())
        v_caches[l].append(v.reshape(KV, hd).copy())

        ks = np.stack(k_caches[l])  # (S, KV, hd)
        vs = np.stack(v_caches[l])
        out = np.zeros((H, hd), np.float32)
        for head in range(H):
            kv_head = head // G
            scores = ks[:, kv_head] @ q[head] / np.sqrt(hd)
            probs = softmax(scores)
            out[head] = probs @ vs[:, kv_head]
        attn = w[f"blk.{l}.attn_output.weight"] @ out.reshape(dim)
        x = res + attn

        res = x.copy()
        h = rms_norm(x, w[f"blk.{l}.ffn_norm.weight"], cfg["eps"])
        gate = w[f"blk.{l}.ffn_gate.weight"] @ h
        up = w[f"blk.{l}.ffn_up.weight"] @ h
        silu = gate / (1.0 + np.exp(-gate))
        x = res + w[f"blk.{l}.ffn_down.weight"] @ (silu * up)

    x = rms_norm(x, w["output_norm.weight"], cfg["eps"])
    return w["output.weight"] @ x


def run_tokens(path, tokens):
    """Returns final-token logits after feeding `tokens` sequentially."""
    w, cfg = load_dense(path)
    k_caches = [[] for _ in range(cfg["n_layers"])]
    v_caches = [[] for _ in range(cfg["n_layers"])]
    logits = None
    for pos, t in enumerate(tokens):
        logits = forward_one(w, cfg, k_caches, v_caches, t, pos)
    return logits
