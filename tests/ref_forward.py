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
    a = md.get_str("general.architecture")
    eps_key = (
        f"{a}.attention.layer_norm_epsilon"
        if a == "phi2"
        else f"{a}.attention.layer_norm_rms_epsilon"
    )
    cfg = dict(
        arch=a,
        dim=md.get_int(f"{a}.embedding_length"),
        n_layers=md.get_int(f"{a}.block_count"),
        n_heads=md.get_int(f"{a}.attention.head_count"),
        n_kv_heads=md.get_int(f"{a}.attention.head_count_kv"),
        eps=md.get_float(eps_key, 1e-5),
        rope_dim=md.get_int(f"{a}.rope.dimension_count"),
        head_dim=md.get_int(f"{a}.attention.key_length", 0) or None,
        rope_scaling_type=md.get_str(f"{a}.rope.scaling.type", ""),
        rope_scaling_factor=md.get_float(f"{a}.rope.scaling.factor", 0.0),
        rope_orig_ctx=md.get_int(f"{a}.rope.scaling.original_context_length", 0),
        ctx=md.get_int(f"{a}.context_length", 0),
        n_experts=md.get_int(f"{a}.expert_count", 0),
        n_experts_used=md.get_int(f"{a}.expert_used_count", 2),
        attn_softcap=md.get_float(f"{a}.attn_logit_softcapping", 0.0),
        final_softcap=md.get_float(f"{a}.final_logit_softcapping", 0.0),
        sliding_window=md.get_int(f"{a}.attention.sliding_window", 0),
    )
    return w, cfg


def rms_norm(x, w, eps):
    return x / np.sqrt((x * x).mean() + eps) * w


def rope_llama_inplace(v, pos, head_dim, rope_dim, freq_factors=None,
                       pos_scale=1.0, mscale=1.0):
    # adjacent pairs (rope.rs:47-63); optional per-frequency divisors
    # (llama3.1 rope_freqs) + linear position scaling
    for h in range(v.shape[0]):
        for j, i in enumerate(range(0, rope_dim, 2)):
            inv = np.float32(10000.0) ** np.float32(-2.0 * j / rope_dim)
            if freq_factors is not None:
                inv = inv / np.float32(freq_factors[j])
            theta = np.float32(pos) * np.float32(pos_scale) * inv
            c, s = np.cos(theta) * mscale, np.sin(theta) * mscale
            x0, x1 = v[h, i], v[h, i + 1]
            v[h, i] = x0 * c - x1 * s
            v[h, i + 1] = x0 * s + x1 * c


def rope_neox_inplace(v, pos, head_dim, rope_dim, freq_factors=None,
                      pos_scale=1.0, mscale=1.0):
    # split halves: pairs (i, i + rope_dim/2) (rope.rs:65-81); optional
    # per-frequency divisors (llama3.1 rope_freqs) + linear position scale
    half = rope_dim // 2
    for h in range(v.shape[0]):
        for i in range(half):
            inv = np.float32(10000.0) ** np.float32(-2.0 * i / rope_dim)
            if freq_factors is not None:
                inv = inv / np.float32(freq_factors[i])
            theta = np.float32(pos) * np.float32(pos_scale) * inv
            c, s = np.cos(theta) * mscale, np.sin(theta) * mscale
            x0, x1 = v[h, i], v[h, i + half]
            v[h, i] = x0 * c - x1 * s
            v[h, i + half] = x0 * s + x1 * c


def gelu(x):
    # tanh approximation — what gelu-arch checkpoints train with (HF
    # gelu_new / gelu_pytorch_tanh) and what ggml's GELU table computes
    return 0.5 * x * (1.0 + np.tanh(
        np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def softmax(x):
    e = np.exp(x - x.max())
    return e / e.sum()


def rms_norm_bias(x, wgt, bias, eps):
    # phi2: TRUE LayerNorm (mean-subtracting). The reference rms-norms
    # phi2 (llama2.rs:371-375) — a deviation from the checkpoint's
    # semantics we intentionally do not replicate (HF + llama.cpp both
    # mean-subtract; see ops/norm.py layer_norm)
    xc = x - x.mean()
    return xc / np.sqrt((xc * xc).mean() + eps) * wgt + bias


def forward_one(w, cfg, k_caches, v_caches, token, pos):
    """Mirrors the reference's four per-arch forwards
    (llama2.rs:213-281 llama, :283-352 qwen2, :354-446 phi2, :448-524 gemma)."""
    arch = cfg.get("arch", "llama")
    dim = cfg["dim"]
    H, KV = cfg["n_heads"], cfg["n_kv_heads"]
    hd = cfg.get("head_dim") or dim // H
    kv_dim = KV * hd
    G = H // KV
    rope = rope_llama_inplace if arch == "llama" else rope_neox_inplace
    freq_factors = w.get("rope_freqs.weight")
    pos_scale = 1.0
    mscale = 1.0
    if cfg.get("rope_scaling_type") == "linear" and cfg.get("rope_scaling_factor"):
        pos_scale = 1.0 / cfg["rope_scaling_factor"]
    elif cfg.get("rope_scaling_type") == "yarn" and cfg.get("rope_scaling_factor"):
        # YaRN NTK-by-parts: ramp between beta_fast/beta_slow correction
        # dims; divisor 1 (extrapolate) -> factor (interpolate)
        factor = cfg["rope_scaling_factor"]
        rd = cfg["rope_dim"] or hd
        orig = cfg.get("rope_orig_ctx") or cfg.get("ctx") or 2048
        base = 10000.0

        def corr(n_rot):
            return rd * np.log(orig / (n_rot * 2 * np.pi)) / (2 * np.log(base))

        low = max(np.floor(corr(32.0)), 0.0)
        high = min(np.ceil(corr(1.0)), rd - 1.0)
        # pair-index ramp (ggml compares corr dims against i0/2);
        # inv_freqs blend linearly between extrapolation and interpolation
        pair = np.arange(rd // 2, dtype=np.float32)
        ramp = np.clip((pair - low) / max(high - low, 1e-3), 0.0, 1.0)
        if freq_factors is None:
            freq_factors = (1.0 / ((1.0 - ramp) + ramp / factor)).astype(
                np.float32)
        mscale = 1.0 + 0.1 * np.log(factor)
    attn_cap = cfg.get("attn_softcap", 0.0)
    win = cfg.get("sliding_window", 0)
    x = w["token_embd.weight"][token].astype(np.float32).copy()
    if arch in ("gemma", "gemma2"):  # embed scaling (llama2.rs:464-466)
        x = x * np.sqrt(np.float32(dim))

    for l in range(cfg["n_layers"]):
        res = x.copy()
        if arch == "phi2":
            h = rms_norm_bias(
                x, w[f"blk.{l}.attn_norm.weight"], w[f"blk.{l}.attn_norm.bias"],
                cfg["eps"],
            )
            qkv = w[f"blk.{l}.attn_qkv.weight"] @ h + w[f"blk.{l}.attn_qkv.bias"]
            q, k, v = qkv[:dim], qkv[dim : dim + kv_dim], qkv[dim + kv_dim :]
        elif arch == "phi3":
            # fused qkv, NO bias (llama.cpp build_phi3)
            h = rms_norm(x, w[f"blk.{l}.attn_norm.weight"], cfg["eps"])
            qkv = w[f"blk.{l}.attn_qkv.weight"] @ h
            q, k, v = qkv[:dim], qkv[dim : dim + kv_dim], qkv[dim + kv_dim :]
        else:
            h = rms_norm(x, w[f"blk.{l}.attn_norm.weight"], cfg["eps"])
            q = w[f"blk.{l}.attn_q.weight"] @ h
            k = w[f"blk.{l}.attn_k.weight"] @ h
            v = w[f"blk.{l}.attn_v.weight"] @ h
            if arch == "qwen2":
                q = q + w[f"blk.{l}.attn_q.bias"]
                k = k + w[f"blk.{l}.attn_k.bias"]
                v = v + w[f"blk.{l}.attn_v.bias"]
        q = q.reshape(H, hd)
        k = k.reshape(KV, hd)
        if arch == "qwen3":  # per-head q/k RMS norms before rope
            for head in range(H):
                q[head] = rms_norm(q[head], w[f"blk.{l}.attn_q_norm.weight"], cfg["eps"])
            for head in range(KV):
                k[head] = rms_norm(k[head], w[f"blk.{l}.attn_k_norm.weight"], cfg["eps"])
        rope(q, pos, hd, cfg["rope_dim"] or hd, freq_factors, pos_scale, mscale)
        rope(k, pos, hd, cfg["rope_dim"] or hd, freq_factors, pos_scale, mscale)
        k_caches[l].append(k.copy())
        v_caches[l].append(v.reshape(KV, hd).copy())

        ks = np.stack(k_caches[l])  # (S, KV, hd)
        vs = np.stack(v_caches[l])
        S = ks.shape[0]
        is_local = win and (l % 2 == 0)  # gemma2: even layers sliding-window
        out = np.zeros((H, hd), np.float32)
        for head in range(H):
            kv_head = head // G
            scores = ks[:, kv_head] @ q[head] / np.sqrt(hd)
            if attn_cap:
                scores = attn_cap * np.tanh(scores / attn_cap)
            if is_local:
                cols = np.arange(S)
                scores = np.where(cols > pos - win, scores, -1e30)
            probs = softmax(scores)
            out[head] = probs @ vs[:, kv_head]
        attn = w[f"blk.{l}.attn_output.weight"] @ out.reshape(H * hd)
        if arch == "gemma2":
            attn = rms_norm(attn, w[f"blk.{l}.post_attention_norm.weight"], cfg["eps"])
        if arch == "phi2":
            attn = attn + w[f"blk.{l}.attn_output.bias"]
            # parallel residual: ffn reads the attn-normed input (llama2.rs:420-436)
            up = w[f"blk.{l}.ffn_up.weight"] @ h + w[f"blk.{l}.ffn_up.bias"]
            ffn = w[f"blk.{l}.ffn_down.weight"] @ gelu(up) + w[f"blk.{l}.ffn_down.bias"]
            x = res + attn + ffn
            continue
        x = res + attn

        res = x.copy()
        h = rms_norm(x, w[f"blk.{l}.ffn_norm.weight"], cfg["eps"])
        if cfg.get("n_experts"):
            E, K = cfg["n_experts"], cfg["n_experts_used"]
            r = w[f"blk.{l}.ffn_gate_inp.weight"] @ h  # (E,)
            top = np.argsort(-r)[:K]
            ws = np.exp(r[top] - r[top].max())
            ws = ws / ws.sum()
            down = np.zeros(dim, np.float32)
            ge = w[f"blk.{l}.ffn_gate_exps.weight"]  # (E, HD, D)
            ue = w[f"blk.{l}.ffn_up_exps.weight"]
            de = w[f"blk.{l}.ffn_down_exps.weight"]  # (E, D, HD)
            for wk, e in zip(ws, top):
                g = ge[e] @ h
                u = ue[e] @ h
                act = g / (1.0 + np.exp(-g))
                down = down + wk * (de[e] @ (act * u))
        elif arch == "phi3":
            # fused gate|up rows in ffn_up (SWIGLU: silu(first half)*second)
            gu = w[f"blk.{l}.ffn_up.weight"] @ h
            HD2 = gu.shape[0] // 2
            gate, up = gu[:HD2], gu[HD2:]
            act = gate / (1.0 + np.exp(-gate))
            down = w[f"blk.{l}.ffn_down.weight"] @ (act * up)
        else:
            gate = w[f"blk.{l}.ffn_gate.weight"] @ h
            up = w[f"blk.{l}.ffn_up.weight"] @ h
            act = gelu(gate) if arch in ("gemma", "gemma2") else gate / (1.0 + np.exp(-gate))
            down = w[f"blk.{l}.ffn_down.weight"] @ (act * up)
        if arch == "gemma2":
            down = rms_norm(down, w[f"blk.{l}.post_ffw_norm.weight"], cfg["eps"])
        x = res + down

    if arch == "phi2":
        x = rms_norm_bias(x, w["output_norm.weight"], w["output_norm.bias"], cfg["eps"])
    else:
        x = rms_norm(x, w["output_norm.weight"], cfg["eps"])
    out_w = w["output.weight"] if "output.weight" in w else w["token_embd.weight"]
    logits = out_w @ x
    if "output.bias" in w:  # phi2 lm_head bias
        logits = logits + w["output.bias"]
    fcap = cfg.get("final_softcap", 0.0)
    if fcap:
        logits = fcap * np.tanh(logits / fcap)
    return logits


def run_tokens(path, tokens):
    """Returns final-token logits after feeding `tokens` sequentially."""
    w, cfg = load_dense(path)
    k_caches = [[] for _ in range(cfg["n_layers"])]
    v_caches = [[] for _ in range(cfg["n_layers"])]
    logits = None
    for pos, t in enumerate(tokens):
        logits = forward_one(w, cfg, k_caches, v_caches, t, pos)
    return logits
