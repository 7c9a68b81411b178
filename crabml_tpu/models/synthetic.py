"""Synthetic model generation: random weights in any quant scheme.

Used by benchmarks, the driver entry points, and fixture generation — builds
the same weight pytree as models.weights.load_weights without a GGUF file,
or writes a real GGUF for end-to-end fixture tests.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.writer import GGUFWriter
from ..quant.codecs import quantize
from ..quant.planar import stack_qtensors, to_planar
from .config import ARCH_FEATURES, ModelConfig


def tiny_config(**kw) -> ModelConfig:
    base = dict(
        architecture="llama",
        model_name="synthetic-tiny",
        embedding_dim=256,
        hidden_dim=512,
        n_layers=4,
        n_heads=8,
        n_kv_heads=4,
        vocab_size=2048,
        seq_len=1024,
        rms_norm_eps=1e-5,
        rope_dim=None,
        **ARCH_FEATURES["llama"],
    )
    base.update(kw)
    return ModelConfig(**base)


def llama7b_config(**kw) -> ModelConfig:
    """Mistral-7B-like dims (the BASELINE.json perf config)."""
    base = dict(
        architecture="llama",
        model_name="synthetic-7b",
        embedding_dim=4096,
        hidden_dim=14336,
        n_layers=32,
        n_heads=32,
        n_kv_heads=8,
        vocab_size=32000,
        seq_len=4096,
        rms_norm_eps=1e-5,
        rope_dim=None,
        **ARCH_FEATURES["llama"],
    )
    base.update(kw)
    return ModelConfig(**base)


def _rand_q(rng, shape, typ: GGMLType, scale=0.02):
    x = (rng.standard_normal(shape) * scale).astype(np.float32)
    return to_planar(typ, quantize(typ, x), shape)


def make_weights(cfg: ModelConfig, typ: GGMLType, seed: int = 0) -> dict:
    """Random planar weight pytree matching the llama-family schema."""
    rng = np.random.default_rng(seed)
    D, HD, V, L = cfg.embedding_dim, cfg.hidden_dim, cfg.vocab_size, cfg.n_layers
    kv = cfg.kv_dim

    layers = {
        "wq": stack_qtensors([_rand_q(rng, (D, D), typ) for _ in range(L)]),
        "wk": stack_qtensors([_rand_q(rng, (kv, D), typ) for _ in range(L)]),
        "wv": stack_qtensors([_rand_q(rng, (kv, D), typ) for _ in range(L)]),
        "wo": stack_qtensors([_rand_q(rng, (D, D), typ) for _ in range(L)]),
        "ffn_gate": stack_qtensors([_rand_q(rng, (HD, D), typ) for _ in range(L)]),
        "ffn_up": stack_qtensors([_rand_q(rng, (HD, D), typ) for _ in range(L)]),
        "ffn_down": stack_qtensors([_rand_q(rng, (D, HD), typ) for _ in range(L)]),
        "attn_norm": np.ones((L, D), np.float32),
        "ffn_norm": np.ones((L, D), np.float32),
    }
    return {
        "token_embed": _rand_q(rng, (V, D), typ),
        "final_norm": np.ones(D, np.float32),
        "final_norm_b": None,
        "output": _rand_q(rng, (V, D), typ),
        "output_b": None,
        "layers": layers,
    }


def write_synthetic_gguf(
    path: str,
    cfg: ModelConfig,
    typ: GGMLType,
    seed: int = 0,
    tokens: list[str] | None = None,
):
    """Write a loadable GGUF with random weights — a committed-fixture
    generator in the reference's testdata spirit, built from scratch."""
    rng = np.random.default_rng(seed)
    D, HD, V, L = cfg.embedding_dim, cfg.hidden_dim, cfg.vocab_size, cfg.n_layers
    kv = cfg.kv_dim

    if tokens is None:
        tokens = ["<unk>", "<s>", "</s>"] + [f"<0x{i:02X}>" for i in range(256)]
        tokens += [f"tok{i}" for i in range(V - len(tokens))]
    scores = [0.0] * len(tokens)

    w = GGUFWriter()
    a = cfg.architecture
    w.add_metadata("general.architecture", a)
    w.add_metadata("general.name", cfg.model_name)
    w.add_metadata(f"{a}.embedding_length", D)
    w.add_metadata(f"{a}.feed_forward_length", HD)
    w.add_metadata(f"{a}.block_count", L)
    w.add_metadata(f"{a}.attention.head_count", cfg.n_heads)
    w.add_metadata(f"{a}.attention.head_count_kv", cfg.n_kv_heads)
    w.add_metadata(f"{a}.context_length", cfg.seq_len)
    eps_key = (
        f"{a}.attention.layer_norm_epsilon"
        if a == "phi2"
        else f"{a}.attention.layer_norm_rms_epsilon"
    )
    w.add_metadata(eps_key, cfg.rms_norm_eps)
    if cfg.n_experts:
        w.add_metadata(f"{a}.expert_count", cfg.n_experts)
        w.add_metadata(f"{a}.expert_used_count", cfg.n_experts_used)
    if cfg.rope_dim:
        w.add_metadata(f"{a}.rope.dimension_count", cfg.rope_dim)
    if cfg.head_dim_override:
        w.add_metadata(f"{a}.attention.key_length", cfg.head_dim_override)
        w.add_metadata(f"{a}.attention.value_length", cfg.head_dim_override)
    if cfg.rope_scaling_type == "linear":
        w.add_metadata(f"{a}.rope.scaling.type", "linear")
        w.add_metadata(f"{a}.rope.scaling.factor", cfg.rope_scaling_factor)
    elif cfg.rope_scaling_type == "yarn":
        w.add_metadata(f"{a}.rope.scaling.type", "yarn")
        w.add_metadata(f"{a}.rope.scaling.factor", cfg.rope_scaling_factor)
        if cfg.rope_scaling_orig_ctx:
            w.add_metadata(f"{a}.rope.scaling.original_context_length",
                           cfg.rope_scaling_orig_ctx)
    if cfg.attn_logit_softcap:
        w.add_metadata(f"{a}.attn_logit_softcapping", cfg.attn_logit_softcap)
    if cfg.final_logit_softcap:
        w.add_metadata(f"{a}.final_logit_softcapping", cfg.final_logit_softcap)
    if cfg.sliding_window:
        w.add_metadata(f"{a}.attention.sliding_window", cfg.sliding_window)
    w.add_metadata("tokenizer.ggml.model", "llama")
    w.add_metadata("tokenizer.ggml.tokens", tokens)
    w.add_metadata("tokenizer.ggml.scores", np.asarray(scores, np.float32))
    w.add_metadata("tokenizer.ggml.bos_token_id", 1)
    w.add_metadata("tokenizer.ggml.eos_token_id", 2)

    def t(name, shape, qt=typ, scale=0.02):
        x = (rng.standard_normal(shape) * scale).astype(np.float32)
        w.add_tensor(name, qt, shape, quantize(qt, x))

    t("token_embd.weight", (V, D))
    for l in range(L):
        if a == "phi3":  # fused qkv (no bias) + fused gate|up
            t(f"blk.{l}.attn_qkv.weight", (D + 2 * kv, D))
            t(f"blk.{l}.attn_output.weight", (D, D))
            t(f"blk.{l}.ffn_up.weight", (2 * HD, D))
            t(f"blk.{l}.ffn_down.weight", (D, HD))
            t(f"blk.{l}.attn_norm.weight", (D,), GGMLType.F32, 1.0)
            t(f"blk.{l}.ffn_norm.weight", (D,), GGMLType.F32, 1.0)
            continue
        if a == "phi2":  # fused qkv + biases (model.rs:356-415)
            t(f"blk.{l}.attn_qkv.weight", (D + 2 * kv, D))
            t(f"blk.{l}.attn_qkv.bias", (D + 2 * kv,), GGMLType.F32)
            t(f"blk.{l}.attn_output.weight", (D, D))
            t(f"blk.{l}.attn_output.bias", (D,), GGMLType.F32)
            t(f"blk.{l}.ffn_up.weight", (HD, D))
            t(f"blk.{l}.ffn_up.bias", (HD,), GGMLType.F32)
            t(f"blk.{l}.ffn_down.weight", (D, HD))
            t(f"blk.{l}.ffn_down.bias", (D,), GGMLType.F32)
            t(f"blk.{l}.attn_norm.weight", (D,), GGMLType.F32, 1.0)
            t(f"blk.{l}.attn_norm.bias", (D,), GGMLType.F32)
            continue
        hd = cfg.head_dim
        q_out = cfg.n_heads * hd  # == D unless head_dim decoupled (qwen3)
        t(f"blk.{l}.attn_q.weight", (q_out, D))
        t(f"blk.{l}.attn_k.weight", (kv, D))
        t(f"blk.{l}.attn_v.weight", (kv, D))
        if a == "qwen2":  # q/k/v biases (model.rs:285-355)
            t(f"blk.{l}.attn_q.bias", (q_out,), GGMLType.F32)
            t(f"blk.{l}.attn_k.bias", (kv,), GGMLType.F32)
            t(f"blk.{l}.attn_v.bias", (kv,), GGMLType.F32)
        if a == "qwen3":  # per-head q/k rms norms
            t(f"blk.{l}.attn_q_norm.weight", (hd,), GGMLType.F32, 1.0)
            t(f"blk.{l}.attn_k_norm.weight", (hd,), GGMLType.F32, 1.0)
        t(f"blk.{l}.attn_output.weight", (D, q_out))
        if cfg.n_experts:  # mixtral MoE: router + 3D expert tensors
            E = cfg.n_experts
            t(f"blk.{l}.ffn_gate_inp.weight", (E, D), GGMLType.F32)
            t(f"blk.{l}.ffn_gate_exps.weight", (E, HD, D))
            t(f"blk.{l}.ffn_up_exps.weight", (E, HD, D))
            t(f"blk.{l}.ffn_down_exps.weight", (E, D, HD))
        else:
            t(f"blk.{l}.ffn_gate.weight", (HD, D))
            t(f"blk.{l}.ffn_down.weight", (D, HD))
            t(f"blk.{l}.ffn_up.weight", (HD, D))
        t(f"blk.{l}.attn_norm.weight", (D,), GGMLType.F32, 1.0)
        t(f"blk.{l}.ffn_norm.weight", (D,), GGMLType.F32, 1.0)
        if a == "gemma2":
            t(f"blk.{l}.post_attention_norm.weight", (D,), GGMLType.F32, 1.0)
            t(f"blk.{l}.post_ffw_norm.weight", (D,), GGMLType.F32, 1.0)
    t("output_norm.weight", (D,), GGMLType.F32, 1.0)
    if a == "phi2":
        t("output_norm.bias", (D,), GGMLType.F32)
    if cfg.rope_scaling_type == "rope_freqs":
        # llama3.1-style per-frequency divisors (mild synthetic values)
        rd = cfg.effective_rope_dim
        factors = 1.0 + 0.5 * np.arange(rd // 2, dtype=np.float32) / (rd // 2)
        w.add_tensor("rope_freqs.weight", GGMLType.F32, (rd // 2,), factors)
    if a not in ("gemma", "gemma2"):  # gemma family: tied embeddings
        t("output.weight", (V, D))
    w.write(path)
