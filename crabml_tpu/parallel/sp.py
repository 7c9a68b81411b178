"""Sequence parallelism: contexts larger than one chip's HBM (SURVEY §5.7).

The reference's KV cache lives wholly on one device; its context bound is
one chip's memory. Here the cache's SEQUENCE axis is sharded over an "sp"
mesh axis:

- **Prefill** runs fully sequence-sharded: every per-token op (norms,
  projections, FFN, rope) computes on the device owning that token's cache
  slots, and attention is ring attention (parallel.ring_attention) — KV
  shards rotate over ICI while each device accumulates online-softmax
  partials for its query rows. Prompt tokens pad to the cache length so
  shards stay uniform (SPMD static shapes); causal masking makes the
  padding inert.
- **Decode** keeps the new token replicated: each device scores its own KV
  shard, and the shards' online-softmax partials merge with pmax/psum
  (a fixed 3-collective combine, no ring needed at T=1). The token's new
  KV is written only by the device owning cache slot `pos`.

`SequenceParallelRunner` is the public API: Runner-compatible
prefill/generate over a GGUF file, `--sp N` on the CLI.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.forward import (KVCache, _activation, layer_norm_in,
                              project_ffn, project_qkv)
from ..ops.matmul import embedding_lookup, qmatmul
from ..ops.norm import rms_norm
from ..ops.rope import apply_rope
from .ring_attention import ring_attention

NEG_INF = -1e30


def _layer_body(lw, l, x, positions, cfg, compute_dtype, attend, write_kv,
                k_l, v_l, rope_ff=None):
    """One transformer layer with attention/cache-write strategies injected
    (`attend(q, k_l, v_l)`, `write_kv(k_l, v_l, k_new, v_new)`) — the
    sp prefill and decode variants differ only there."""
    B, T = x.shape[0], x.shape[1]
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim

    h = layer_norm_in(lw, l, x, cfg)
    q, k, v = project_qkv(lw, l, h, cfg, compute_dtype)
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, KV, hd)
    v = v.reshape(B, T, KV, hd)
    if cfg.qk_norm:  # qwen3: per-head RMS norm before rope
        q = rms_norm(q, jnp.asarray(lw["q_norm"])[l], cfg.rms_norm_eps)
        k = rms_norm(k, jnp.asarray(lw["k_norm"])[l], cfg.rms_norm_eps)
    ps = (1.0 / cfg.rope_scaling_factor
          if cfg.rope_scaling_type == "linear" else 1.0)
    q = apply_rope(q, positions, cfg.effective_rope_dim, cfg.rope_mode,
                   cfg.rope_base, freq_factors=rope_ff, pos_scale=ps)
    k = apply_rope(k, positions, cfg.effective_rope_dim, cfg.rope_mode,
                   cfg.rope_base, freq_factors=rope_ff, pos_scale=ps)
    k_t = k.transpose(0, 2, 1, 3).astype(k_l.dtype)  # (B, KV, T, hd)
    v_t = v.transpose(0, 2, 1, 3).astype(v_l.dtype)
    k_l, v_l = write_kv(k_l, v_l, k_t, v_t)

    attn = attend(q, k_l, v_l)
    attn_out = qmatmul(attn.astype(compute_dtype), lw["wo"], compute_dtype, layer=l)
    if "bo" in lw:
        attn_out = attn_out + jnp.asarray(lw["bo"])[l].astype(compute_dtype)
    if cfg.parallel_residual:
        ffn_in = h
        down = project_ffn(lw, l, ffn_in, cfg, compute_dtype)
        return x + attn_out + down, k_l, v_l
    x = x + attn_out
    ffn_in = rms_norm(x, jnp.asarray(lw["ffn_norm"])[l], cfg.rms_norm_eps)
    down = project_ffn(lw, l, ffn_in, cfg, compute_dtype)
    return x + down, k_l, v_l


def _head(weights, x, cfg, compute_dtype):
    x = rms_norm(x, weights["final_norm"], cfg.rms_norm_eps,
                 weights.get("final_norm_b"))
    out_w = weights["output"] if weights["output"] is not None else weights["token_embed"]
    return qmatmul(x, out_w, compute_dtype).astype(jnp.float32)


def _sp_prefill_local(weights, cache: KVCache, tokens_l, cfg, compute_dtype,
                      last_row, axis):
    """Per-device prefill body (inside shard_map). tokens_l: (B, Sl) — this
    device's slice of the S-padded prompt. Writes the local cache shard,
    ring-attends, returns logits for global row `last_row` only."""
    p = jax.lax.axis_index(axis)
    B, Sl = tokens_l.shape
    scale = cfg.attn_scale

    positions = p * Sl + jnp.arange(Sl, dtype=jnp.int32)[None, :] + jnp.zeros(
        (B, 1), jnp.int32
    )
    x = embedding_lookup(weights["token_embed"], tokens_l, compute_dtype)
    if cfg.scale_embedding:
        x = x * jnp.sqrt(jnp.float32(cfg.embedding_dim)).astype(compute_dtype)
    lw = weights["layers"]

    def attend(q, k_l, v_l):
        out = ring_attention(q, k_l, v_l, axis_name=axis, scale=scale)
        B_, T, H, hd = out.shape
        return out.reshape(B_, T, H * hd)

    def write_kv(k_l, v_l, k_new, v_new):
        return k_new, v_new  # the shard IS this device's token range

    def layer_step(x, per):
        l, k_l, v_l = per
        x, k_l, v_l = _layer_body(lw, l, x, positions, cfg, compute_dtype,
                                  attend, write_kv, k_l, v_l,
                                  rope_ff=weights.get("rope_freqs"))
        return x, (k_l, v_l)

    idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    x, (k_new, v_new) = jax.lax.scan(layer_step, x, (idx, cache.k, cache.v))

    # logits for the last PROMPT row only: each device emits its candidate
    # (the row if it owns it, else its row 0) — caller selects the owner's.
    local = jnp.clip(last_row - p * Sl, 0, Sl - 1)
    xl = jax.lax.dynamic_slice_in_dim(x, local, 1, axis=1)  # (B, 1, D)
    logits = _head(weights, xl, cfg, compute_dtype)  # (B, 1, V)
    return logits, KVCache(k_new, v_new)


def _sp_decode_local(weights, cache: KVCache, token, pos, cfg, compute_dtype,
                     axis):
    """Per-device decode body: replicated activations, sharded cache.
    token/pos: (B,) replicated. Returns replicated logits (B, V)."""
    p = jax.lax.axis_index(axis)
    B = token.shape[0]
    Sl = cache.k.shape[3]
    scale = cfg.attn_scale
    positions = pos[:, None]
    x = embedding_lookup(weights["token_embed"], token[:, None], compute_dtype)
    if cfg.scale_embedding:
        x = x * jnp.sqrt(jnp.float32(cfg.embedding_dim)).astype(compute_dtype)
    lw = weights["layers"]
    col = p * Sl + jnp.arange(Sl)  # global ids of this shard's slots

    def write_kv(k_l, v_l, k_new, v_new):
        # only the device owning slot `pos` writes; others keep their shard
        def upd(cache_b, new_b, pb):
            owner = pb // Sl
            off = jnp.clip(pb - p * Sl, 0, Sl - 1)
            written = jax.lax.dynamic_update_slice(cache_b, new_b, (0, off, 0))
            return jnp.where(owner == p, written, cache_b)

        return (
            jax.vmap(upd)(k_l, k_new, pos),
            jax.vmap(upd)(v_l, v_new, pos),
        )

    def attend(q, k_l, v_l):
        # local online-softmax partials over this shard, then a fixed
        # pmax/psum merge across shards (T=1: no ring needed)
        B_, T, H, hd = q.shape
        KV = k_l.shape[1]
        G = H // KV
        qg = q.reshape(B_, T, KV, G, hd).astype(jnp.float32)
        s = jnp.einsum("btkgh,bksh->bkgts", qg, k_l.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        mask = col[None, :] <= pos[:, None]  # (B, Sl) valid causal cols
        s = jnp.where(mask[:, None, None, None, :], s, NEG_INF)
        m_loc = s.max(axis=-1, keepdims=True)
        p_blk = jnp.exp(s - m_loc)
        p_blk = jnp.where(mask[:, None, None, None, :], p_blk, 0.0)
        l_loc = p_blk.sum(axis=-1, keepdims=True)
        acc = jnp.einsum("bkgts,bksh->bkgth", p_blk, v_l.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        m_g = jax.lax.pmax(m_loc, axis)
        corr = jnp.exp(m_loc - m_g)
        l_g = jax.lax.psum(l_loc * corr, axis)
        acc_g = jax.lax.psum(acc * corr, axis)
        out = acc_g / jnp.maximum(l_g, 1e-30)
        return out.transpose(0, 3, 1, 2, 4).reshape(B_, T, H * hd).astype(q.dtype)

    def layer_step(x, per):
        l, k_l, v_l = per
        x, k_l, v_l = _layer_body(lw, l, x, positions, cfg, compute_dtype,
                                  attend, write_kv, k_l, v_l,
                                  rope_ff=weights.get("rope_freqs"))
        return x, (k_l, v_l)

    idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    x, (k_new, v_new) = jax.lax.scan(layer_step, x, (idx, cache.k, cache.v))
    logits = _head(weights, x, cfg, compute_dtype)[:, 0]  # (B, V)
    return logits, KVCache(k_new, v_new)


class SequenceParallelRunner:
    """Runner over an "sp" mesh: KV cache sequence-sharded across devices,
    so the max context is n_devices × one chip's cache budget.

    Public API parity with runtime.Runner: prefill / generate /
    prefill_and_generate (greedy; temperature via the sampler can be added
    the same way Runner does it).
    """

    def __init__(self, model, mesh: Mesh | None = None, *, sp: int | None = None,
                 seq_len: int | None = None, compute_dtype=jnp.float32,
                 axis: str = "sp"):
        from functools import partial as _partial

        from ..gguf.reader import GGUFFile
        from ..models.config import config_from_gguf
        from ..models.weights import load_weights
        from ..tokenizer import Utf8Buf, tokenizer_from_gguf
        from jax.experimental.shard_map import shard_map

        gf = GGUFFile(model) if not isinstance(model, GGUFFile) else model
        self.cfg = config_from_gguf(gf.metadata)
        # the sp layer body wires qk_norm/rope scaling but not the gemma2
        # block shape — fail loudly instead of generating wrong tokens
        if (self.cfg.post_norms or self.cfg.attn_logit_softcap
                or self.cfg.final_logit_softcap or self.cfg.sliding_window):
            from ..errors import UnsupportedError

            raise UnsupportedError(
                "sequence parallelism does not support gemma2-style "
                "post-norms/softcaps/sliding-window yet; use the dense Runner"
            )
        self.tokenizer = tokenizer_from_gguf(gf.metadata)
        if mesh is None:
            n = sp or jax.device_count()
            mesh = Mesh(np.asarray(jax.devices()[:n]), (axis,))
        self.mesh = mesh
        self.axis = axis
        n = mesh.shape[axis]
        self.seq_len = seq_len or self.cfg.seq_len
        assert self.seq_len % n == 0, f"seq_len {self.seq_len} % sp {n} != 0"
        self.compute_dtype = compute_dtype
        self._utf8 = Utf8Buf()

        host = load_weights(gf, self.cfg, layout="planar")
        rep = NamedSharding(mesh, P())
        self.weights = jax.tree.map(lambda a: jax.device_put(a, rep), host)
        self.cache = jax.device_put(
            KVCache.create(self.cfg, 1, self.seq_len, compute_dtype),
            NamedSharding(mesh, P(None, None, None, axis, None)),
        )
        self.pos = 0

        cfg, cdt, ax = self.cfg, compute_dtype, axis
        wspec = jax.tree.map(lambda _: P(), self.weights)
        cspec = KVCache(P(None, None, None, ax, None), P(None, None, None, ax, None))

        def prefill_fn(weights, cache, tokens, last_row):
            return _sp_prefill_local(weights, cache, tokens, cfg, cdt,
                                     last_row, ax)

        self._prefill = jax.jit(
            shard_map(
                prefill_fn, mesh=mesh,
                in_specs=(wspec, cspec, P(None, ax), P()),
                out_specs=(P(ax, None, None), cspec),
                check_rep=False,
            ),
            donate_argnames=("cache",),
        )

        def decode_fn(weights, cache, token, pos):
            return _sp_decode_local(weights, cache, token, pos, cfg, cdt, ax)

        self._decode = jax.jit(
            shard_map(
                decode_fn, mesh=mesh,
                in_specs=(wspec, cspec, P(), P()),
                out_specs=(P(), cspec),
                check_rep=False,
            ),
            donate_argnames=("cache",),
        )

    def prefill(self, prompt: str, bos: bool = True):
        """Whole-prompt sequence-parallel prefill (pads to seq_len; the
        padding is causally inert). Returns (pos, last_token, first_gen)."""
        toks = self.tokenizer.encode(prompt, bos=bos)
        limit = self.seq_len - 1
        if len(toks) > limit:
            toks = toks[-limit:]
        padded = np.zeros((1, self.seq_len), np.int32)
        padded[0, : len(toks)] = toks
        logits, self.cache = self._prefill(
            self.weights, self.cache, jnp.asarray(padded),
            jnp.int32(len(toks) - 1),
        )
        n = self.mesh.shape[self.axis]
        Sl = self.seq_len // n
        owner = (len(toks) - 1) // Sl
        self.pos = len(toks)
        tok = int(np.asarray(logits)[owner, 0].argmax())
        return self.pos, toks[-1], tok

    def generate(self, token: int, steps: int):
        """Greedy streaming decode (text pieces), reference-style."""
        yield self.tokenizer.decode(token, self._utf8)
        cur = token
        for _ in range(min(steps - 1, self.seq_len - self.pos - 1)):
            logits, self.cache = self._decode(
                self.weights, self.cache,
                jnp.asarray([cur], jnp.int32), jnp.asarray([self.pos], jnp.int32),
            )
            self.pos += 1
            cur = int(np.asarray(logits)[0].argmax())
            if cur == self.tokenizer.eos_token:
                return
            yield self.tokenizer.decode(cur, self._utf8)

    def prefill_and_generate(self, prompt: str, steps: int):
        _, _, tok = self.prefill(prompt, bos=True)
        return self.generate(tok, steps)
