"""The transformer forward pass, TPU-first.

One pure function covers all four reference architectures
(forward_llama/qwen2/phi2/gemma, crabml-llama2/src/llama2.rs:213-524) via
ModelConfig feature flags. Key departures from the reference, by design:

- Fixed shapes everywhere: the KV cache is a pre-allocated
  (L, B, S, n_kv_heads, head_dim) array updated with dynamic_update_slice,
  instead of the reference's grow-by-concatenate strider trick
  (llama2.rs:65-86). XLA requires static shapes; masking handles validity.
- Batched prefill: the whole prompt goes through one jit'd call (the
  reference loops tokens one at a time, llama2.rs:126-129).
- lax.scan over stacked per-layer weights: one compiled layer body instead of
  L inlined copies — fast compiles at 7B/70B depth.
- GQA via reshape to (KV, G) head groups, no materialized head broadcast
  (reference: batch_matmul stride tricks, batch_matmul.rs:89-103).
- Everything lives in one jit; no per-op dispatch boundaries.

Attention softmax subtracts the running max and exponentiates in f32 (the
reference uses an f16 exp LUT, softmax.rs:44-52 — we use exact exp).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp

from ..ops.matmul import embedding_lookup, qmatmul
from ..ops.norm import rms_norm
from ..ops.rope import apply_rope
from ..quant.planar import QTensor
from .config import ModelConfig

NEG_INF = jnp.float32(-1e30)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v"],
    meta_fields=[],
)
@dataclass
class KVCache:
    """k, v: (L, B, S, n_kv_heads, head_dim)."""

    k: jnp.ndarray
    v: jnp.ndarray

    @staticmethod
    def create(cfg: ModelConfig, batch: int, seq_len: int | None = None, dtype=jnp.float32):
        s = seq_len or cfg.seq_len
        shape = (cfg.n_layers, batch, s, cfg.n_kv_heads, cfg.head_dim)
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def seq_len(self) -> int:
        return self.k.shape[2]


def _layer_qt(stacked: QTensor, planes: dict) -> QTensor:
    """Rebuild a single-layer QTensor from scan-sliced planes."""
    return QTensor(stacked.kind, tuple(stacked.shape[1:]), planes)


def _activation(x, kind: str):
    if kind == "silu":
        return x * jax.nn.sigmoid(x)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)
    raise ValueError(kind)


def attention(q, k_cache, v_cache, pos, t_new, scale, probe=None):
    """Masked GQA attention over the full cache.

    q: (B, T, H, hd); k_cache/v_cache: (B, S, KV, hd); pos: (B,) int32 —
    number of valid cache entries before this call's tokens.
    """
    B, T, H, hd = q.shape
    S, KV = k_cache.shape[1], k_cache.shape[2]
    G = H // KV
    qg = q.reshape(B, T, KV, G, hd)

    scores = jnp.einsum(
        "btkgh,bskh->bkgts", qg.astype(jnp.float32), k_cache.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision="highest",
    ) * scale

    # causal/validity mask: token t (absolute pos[b]+t) sees cache cols <= pos[b]+t
    col = jnp.arange(S)[None, None, :]  # (1, 1, S)
    row_abs = pos[:, None, None] + jnp.arange(T)[None, :, None]  # (B, T, 1)
    mask = col <= row_abs  # (B, T, S)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    scores = scores - scores.max(axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    if probe is not None:
        probe["attn_probs"] = probs

    out = jnp.einsum(
        "bkgts,bskh->btkgh", probs, v_cache.astype(jnp.float32),
        preferred_element_type=jnp.float32, precision="highest",
    )
    return out.reshape(B, T, H * hd)


def forward(
    weights: dict,
    cache: KVCache,
    tokens: jnp.ndarray,  # (B, T) int32
    pos: jnp.ndarray,  # (B,) int32 — valid cache length per sequence
    cfg: ModelConfig,
    compute_dtype=jnp.float32,
    probes: dict | None = None,
):
    """Returns (logits (B, T, vocab), updated KVCache)."""
    B, T = tokens.shape
    D = cfg.embedding_dim
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rope_dim = cfg.effective_rope_dim
    positions = pos[:, None] + jnp.arange(T, dtype=pos.dtype)[None, :]  # (B, T)

    x = embedding_lookup(weights["token_embed"], tokens, compute_dtype)  # (B,T,D)
    if cfg.scale_embedding:  # gemma (llama2.rs:464-466)
        x = x * jnp.sqrt(jnp.float32(D)).astype(compute_dtype)

    lw = weights["layers"]

    def layer_step(x, per_layer):
        planes, k_l, v_l = per_layer
        w = {
            name: _layer_qt(lw[name], p) if isinstance(lw[name], QTensor) else p
            for name, p in planes.items()
        }

        h = rms_norm(x, w["attn_norm"], cfg.rms_norm_eps, w.get("attn_norm_b"))

        q = qmatmul(h, w["wq"], compute_dtype)
        k = qmatmul(h, w["wk"], compute_dtype)
        v = qmatmul(h, w["wv"], compute_dtype)
        if "bq" in w:
            q = q + w["bq"].astype(compute_dtype)
            k = k + w["bk"].astype(compute_dtype)
            v = v + w["bv"].astype(compute_dtype)

        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, KV, hd)
        v = v.reshape(B, T, KV, hd)
        q = apply_rope(q, positions, rope_dim, cfg.rope_mode, cfg.rope_base)
        k = apply_rope(k, positions, rope_dim, cfg.rope_mode, cfg.rope_base)

        # write new k/v into the cache at each sequence's own offset
        def upd(cache_b, new_b, p):
            return jax.lax.dynamic_update_slice(cache_b, new_b, (p, 0, 0))

        k_l = jax.vmap(upd)(k_l, k.astype(k_l.dtype), pos)
        v_l = jax.vmap(upd)(v_l, v.astype(v_l.dtype), pos)

        scale = 1.0 / jnp.sqrt(jnp.float32(hd))
        attn = attention(q, k_l, v_l, pos, T, scale)
        attn_out = qmatmul(attn.astype(compute_dtype), w["wo"], compute_dtype)
        if "bo" in w:
            attn_out = attn_out + w["bo"].astype(compute_dtype)

        if cfg.parallel_residual:
            # phi2: ffn reads the *attention-normed* input; both add to residual
            # (llama2.rs:420-436)
            ffn_in = h
        else:
            x = x + attn_out
            ffn_in = rms_norm(x, w["ffn_norm"], cfg.rms_norm_eps)

        if cfg.no_ffn_gate:
            up = qmatmul(ffn_in, w["ffn_up"], compute_dtype)
            if "ffn_up_b" in w:
                up = up + w["ffn_up_b"].astype(compute_dtype)
            act = _activation(up, cfg.act)
            down = qmatmul(act, w["ffn_down"], compute_dtype)
            if "ffn_down_b" in w:
                down = down + w["ffn_down_b"].astype(compute_dtype)
        else:
            gate = qmatmul(ffn_in, w["ffn_gate"], compute_dtype)
            up = qmatmul(ffn_in, w["ffn_up"], compute_dtype)
            down = qmatmul(_activation(gate, cfg.act) * up, w["ffn_down"], compute_dtype)

        if cfg.parallel_residual:
            x = x + attn_out + down
        else:
            x = x + down
        return x, (k_l, v_l)

    # per-layer scan inputs: plane dicts for QTensors, arrays as-is
    scan_planes = {
        name: (val.planes if isinstance(val, QTensor) else val)
        for name, val in lw.items()
    }
    x, (k_new, v_new) = jax.lax.scan(layer_step, x, (scan_planes, cache.k, cache.v))

    x = rms_norm(x, weights["final_norm"], cfg.rms_norm_eps, weights.get("final_norm_b"))

    out_w = weights["output"] if weights["output"] is not None else weights["token_embed"]
    logits = qmatmul(x, out_w, compute_dtype)  # (B, T, vocab)
    return logits.astype(jnp.float32), KVCache(k_new, v_new)
