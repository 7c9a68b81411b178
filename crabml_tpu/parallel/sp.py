"""Sequence parallelism: contexts larger than one chip's HBM (SURVEY §5.7).

The reference's KV cache lives wholly on one device; its context bound is
one chip's memory. Here the cache's SEQUENCE axis is sharded over an "sp"
mesh axis:

- **Prefill** runs fully sequence-sharded: every per-token op (norms,
  projections, FFN, rope) computes on the device owning that token's cache
  slots, and attention is ring attention (parallel.ring_attention) — KV
  shards rotate over ICI while each device accumulates online-softmax
  partials for its query rows. Prefill is CHUNKED: each sp*Cl-token chunk
  ring-attends over its own KV, psum-merges partials against the cache's
  earlier chunks, and all-gather-scatters its KV into the S-sharded cache
  — a prompt pays its own (bucketed) length, never the cache length.
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

from ..models.forward import (KVCache, _activation, apply_final_norm,
                              layer_norm_in,
                              project_ffn, project_qkv)
from ..ops.matmul import embedding_lookup, qmatmul
from ..ops.norm import rms_norm
from ..ops.rope import apply_rope
from .ring_attention import ring_attention

NEG_INF = -1e30


def _win_of(cfg, l):
    """Traced per-layer sliding window (None = no windowing configured;
    0 at runtime = this layer attends globally — gemma2 alternates)."""
    from ..models.forward import _window_eff

    return _window_eff(cfg.sliding_window,
                       (l % 2 == 0) if cfg.alternating_window else None)


def _layer_body(lw, l, x, positions, cfg, compute_dtype, attend, write_kv,
                k_l, v_l, rope_ff=None, tp_axis=None):
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
                   cfg.rope_base, freq_factors=rope_ff, pos_scale=ps, mscale=cfg.rope_mscale)
    k = apply_rope(k, positions, cfg.effective_rope_dim, cfg.rope_mode,
                   cfg.rope_base, freq_factors=rope_ff, pos_scale=ps, mscale=cfg.rope_mscale)
    k_t = k.transpose(0, 2, 1, 3).astype(k_l.dtype)  # (B, KV, T, hd)
    v_t = v.transpose(0, 2, 1, 3).astype(v_l.dtype)
    k_l, v_l = write_kv(k_l, v_l, k_t, v_t)

    attn = attend(q, k_l, v_l, l)
    attn_out = qmatmul(attn.astype(compute_dtype), lw["wo"], compute_dtype, layer=l)
    if tp_axis is not None:  # wo column-sharded over tp: partial sums
        attn_out = jax.lax.psum(attn_out, tp_axis)
    if "bo" in lw:
        attn_out = attn_out + jnp.asarray(lw["bo"])[l].astype(compute_dtype)
    if cfg.post_norms:  # gemma2: norm the block OUTPUT before residual
        attn_out = rms_norm(
            attn_out, jnp.asarray(lw["post_attn_norm"])[l], cfg.rms_norm_eps
        )

    def down_proj(h_act):
        d = qmatmul(h_act, lw["ffn_down"], compute_dtype, layer=l)
        if tp_axis is not None:
            d = jax.lax.psum(d, tp_axis)
        return d

    if cfg.parallel_residual:
        ffn_in = h
        down = project_ffn(lw, l, ffn_in, cfg, compute_dtype, down_proj=down_proj)
        return x + attn_out + down, k_l, v_l
    x = x + attn_out
    ffn_in = rms_norm(x, jnp.asarray(lw["ffn_norm"])[l], cfg.rms_norm_eps)
    down = project_ffn(lw, l, ffn_in, cfg, compute_dtype, down_proj=down_proj)
    if cfg.post_norms:
        down = rms_norm(
            down, jnp.asarray(lw["post_ffn_norm"])[l], cfg.rms_norm_eps
        )
    return x + down, k_l, v_l


def _head(weights, x, cfg, compute_dtype, tp_axis=None):
    x = apply_final_norm(weights, x, cfg)
    out_w = weights["output"] if weights["output"] is not None else weights["token_embed"]
    logits = qmatmul(x, out_w, compute_dtype).astype(jnp.float32)
    if weights.get("output_b") is not None:  # phi2 lm_head bias
        logits = logits + jnp.asarray(weights["output_b"], jnp.float32)
    if tp_axis is not None and weights["output"] is not None:
        # output head row-sharded over tp: gather the vocab shards
        logits = jax.lax.all_gather(logits, tp_axis, axis=-1, tiled=True)
    if cfg.final_logit_softcap:  # gemma2
        cap = jnp.float32(cfg.final_logit_softcap)
        logits = cap * jnp.tanh(logits / cap)
    return logits


def _sp_prefill_chunk_local(weights, cache: KVCache, tokens_l, t0, last_row,
                            cfg, compute_dtype, axis, tp_axis=None):
    """One CHUNK of sequence-parallel prefill (inside shard_map).

    tokens_l: (B, Cl) — this device's slice of a C = sp*Cl-token chunk
    whose global rows start at traced offset `t0`. A prompt pays only its
    own (chunk-padded) length, not the cache length (VERDICT r2 #7: the
    old path padded every prompt to seq_len).

    Attention per layer merges two online-softmax partials:
    - ring_attention over the chunk's own KV (global ids offset by t0);
    - this device's CACHE shard (earlier chunks, cols < t0), partials
      pmax/psum-combined across devices — the decode combine generalized
      to Cl query rows.
    The chunk's KV then all-gathers over the ring (C tokens — activation-
    sized) and each device folds the slice overlapping its own slot range
    into its cache shard, keeping decode's contiguous owner mapping.

    Returns (candidate logits (B, 1, V) for `last_row`, updated cache).
    """
    from .ring_attention import merge_partials

    p = jax.lax.axis_index(axis)
    n = jax.lax.psum(1, axis)
    B, Cl = tokens_l.shape
    Sl = cache.k.shape[3]
    scale = cfg.attn_scale

    positions = t0 + p * Cl + jnp.arange(Cl, dtype=jnp.int32)[None, :] + jnp.zeros(
        (B, 1), jnp.int32
    )
    x = embedding_lookup(weights["token_embed"], tokens_l, compute_dtype)
    if cfg.scale_embedding:
        x = x * jnp.sqrt(jnp.float32(cfg.embedding_dim)).astype(compute_dtype)
    lw = weights["layers"]
    shard_cols = p * Sl + jnp.arange(Sl)  # global ids of this cache shard

    def attend_and_write(q, k_c, v_c, k_shard, v_shard, l):
        """q/k_c/v_c: this device's chunk rows; k_shard/v_shard: local
        cache shard. Returns (attn_out, updated shard)."""
        B_, T, H, hd = q.shape
        KV = k_c.shape[1]
        G = H // KV
        softcap = cfg.attn_logit_softcap
        win = _win_of(cfg, l)

        # (a) intra-chunk: ring over the chunk's sequence-sharded KV
        ring = ring_attention(q, k_c, v_c, axis_name=axis, scale=scale,
                              row_offset=t0, col_offset=t0,
                              return_partials=True,
                              softcap=softcap, local_window=win)

        # (b) earlier chunks: local shard partials, combined across devices
        qg = q.reshape(B_, T, KV, G, hd).astype(jnp.float32)
        s = jnp.einsum("btkgh,bksh->bkgts", qg,
                       k_shard.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        if softcap:
            cap = jnp.float32(softcap)
            s = cap * jnp.tanh(s / cap)
        rows = t0 + p * Cl + jnp.arange(Cl)  # global row id per q row
        valid = jnp.broadcast_to(
            shard_cols[None, :] < jnp.broadcast_to(t0, (1, 1)), (Cl, Sl)
        )  # (Cl=T, Sl)
        if win is not None:  # gemma2 sliding window on global ids
            valid &= (win == 0) | (shard_cols[None, :] > rows[:, None] - win)
        valid = valid[None, None, None]  # (1, 1, 1, T, Sl)
        s = jnp.where(valid, s, NEG_INF)
        m2 = s.max(axis=-1, keepdims=True)
        p2 = jnp.exp(s - m2)
        p2 = jnp.where(valid, p2, 0.0)
        l2 = p2.sum(axis=-1, keepdims=True)
        a2 = jnp.einsum("bkgts,bksh->bkgth", p2,
                        v_shard.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        m2g = jax.lax.pmax(m2, axis)
        corr = jnp.exp(m2 - m2g)
        l2g = jax.lax.psum(l2 * corr, axis)
        a2g = jax.lax.psum(a2 * corr, axis)

        out = merge_partials([ring, (m2g, l2g, a2g)])
        out = out.transpose(0, 3, 1, 2, 4).reshape(B_, T, H * hd).astype(q.dtype)

        # cache write: gather the whole chunk's KV, fold the overlap with
        # this shard's slot range in (gather + where keeps shapes static
        # under a traced t0)
        k_full = jax.lax.all_gather(k_c, axis, axis=2, tiled=True)  # (B,KV,C,hd)
        v_full = jax.lax.all_gather(v_c, axis, axis=2, tiled=True)
        idx = shard_cols - t0  # chunk-local index of each shard slot
        C = Cl * n
        take = jnp.clip(idx, 0, C - 1)
        in_chunk = (idx >= 0) & (idx < C)  # (Sl,)
        k_upd = jnp.take(k_full, take, axis=2).astype(k_shard.dtype)
        v_upd = jnp.take(v_full, take, axis=2).astype(v_shard.dtype)
        sel = in_chunk[None, None, :, None]
        return out, (jnp.where(sel, k_upd, k_shard),
                     jnp.where(sel, v_upd, v_shard))

    def layer_step(x, per):
        l, k_l, v_l = per
        H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
        h = layer_norm_in(lw, l, x, cfg)
        q, k, v = project_qkv(lw, l, h, cfg, compute_dtype)
        q = q.reshape(B, Cl, H, hd)
        k = k.reshape(B, Cl, KV, hd)
        v = v.reshape(B, Cl, KV, hd)
        if cfg.qk_norm:
            q = rms_norm(q, jnp.asarray(lw["q_norm"])[l], cfg.rms_norm_eps)
            k = rms_norm(k, jnp.asarray(lw["k_norm"])[l], cfg.rms_norm_eps)
        ff = weights.get("rope_freqs")
        ps = (1.0 / cfg.rope_scaling_factor
              if cfg.rope_scaling_type == "linear" else 1.0)
        q = apply_rope(q, positions, cfg.effective_rope_dim, cfg.rope_mode,
                       cfg.rope_base, freq_factors=ff, pos_scale=ps, mscale=cfg.rope_mscale)
        k = apply_rope(k, positions, cfg.effective_rope_dim, cfg.rope_mode,
                       cfg.rope_base, freq_factors=ff, pos_scale=ps, mscale=cfg.rope_mscale)
        k_t = k.transpose(0, 2, 1, 3)  # (B, KV, Cl, hd)
        v_t = v.transpose(0, 2, 1, 3)

        attn, (k_l, v_l) = attend_and_write(q, k_t, v_t, k_l, v_l, l)
        attn_out = qmatmul(attn.astype(compute_dtype), lw["wo"],
                           compute_dtype, layer=l)
        if tp_axis is not None:
            attn_out = jax.lax.psum(attn_out, tp_axis)
        if "bo" in lw:
            attn_out = attn_out + jnp.asarray(lw["bo"])[l].astype(compute_dtype)
        if cfg.post_norms:  # gemma2: norm the block OUTPUT before residual
            attn_out = rms_norm(
                attn_out, jnp.asarray(lw["post_attn_norm"])[l], cfg.rms_norm_eps
            )

        def down_proj(h_act):
            d = qmatmul(h_act, lw["ffn_down"], compute_dtype, layer=l)
            if tp_axis is not None:
                d = jax.lax.psum(d, tp_axis)
            return d

        def post_ffn(d):
            if cfg.post_norms:
                d = rms_norm(d, jnp.asarray(lw["post_ffn_norm"])[l],
                             cfg.rms_norm_eps)
            return d

        if cfg.parallel_residual:
            x = x + attn_out + post_ffn(project_ffn(lw, l, h, cfg,
                                                    compute_dtype,
                                                    down_proj=down_proj))
        else:
            x = x + attn_out
            ffn_in = rms_norm(x, jnp.asarray(lw["ffn_norm"])[l], cfg.rms_norm_eps)
            x = x + post_ffn(project_ffn(lw, l, ffn_in, cfg, compute_dtype,
                                         down_proj=down_proj))
        return x, (k_l, v_l)

    idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    x, (k_new, v_new) = jax.lax.scan(layer_step, x, (idx, cache.k, cache.v))

    # candidate logits for the last PROMPT row (valid only on the chunk
    # containing it; the caller selects the owner device's candidate)
    local = jnp.clip(last_row - t0 - p * Cl, 0, Cl - 1)
    xl = jax.lax.dynamic_slice_in_dim(x, local, 1, axis=1)  # (B, 1, D)
    logits = _head(weights, xl, cfg, compute_dtype, tp_axis=tp_axis)  # (B, 1, V)
    return logits, KVCache(k_new, v_new)


def _sp_decode_local(weights, cache: KVCache, token, pos, cfg, compute_dtype,
                     axis, tp_axis=None):
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

    def attend(q, k_l, v_l, l):
        # local online-softmax partials over this shard, then a fixed
        # pmax/psum merge across shards (T=1: no ring needed)
        B_, T, H, hd = q.shape
        KV = k_l.shape[1]
        G = H // KV
        qg = q.reshape(B_, T, KV, G, hd).astype(jnp.float32)
        s = jnp.einsum("btkgh,bksh->bkgts", qg, k_l.astype(jnp.float32),
                       preferred_element_type=jnp.float32) * scale
        if cfg.attn_logit_softcap:
            cap = jnp.float32(cfg.attn_logit_softcap)
            s = cap * jnp.tanh(s / cap)
        mask = col[None, :] <= pos[:, None]  # (B, Sl) valid causal cols
        win = _win_of(cfg, l)
        if win is not None:  # gemma2 sliding window (global col ids)
            mask &= (win == 0) | (col[None, :] > pos[:, None] - win)
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
                                  rope_ff=weights.get("rope_freqs"),
                                  tp_axis=tp_axis)
        return x, (k_l, v_l)

    idx = jnp.arange(cfg.n_layers, dtype=jnp.int32)
    x, (k_new, v_new) = jax.lax.scan(layer_step, x, (idx, cache.k, cache.v))
    logits = _head(weights, x, cfg, compute_dtype, tp_axis=tp_axis)[:, 0]  # (B, V)
    return logits, KVCache(k_new, v_new)


class SequenceParallelRunner:
    """Runner over an "sp" mesh: KV cache sequence-sharded across devices,
    so the max context is n_devices × one chip's cache budget.

    Public API parity with runtime.Runner: prefill / generate /
    prefill_and_generate (greedy; temperature via the sampler can be added
    the same way Runner does it).
    """

    def __init__(self, model, mesh: Mesh | None = None, *, sp: int | None = None,
                 tp: int = 1, seq_len: int | None = None,
                 compute_dtype=jnp.float32, axis: str = "sp", sampler=None,
                 seed: int = 0):
        from functools import partial as _partial

        from ..gguf.reader import GGUFFile
        from ..models.config import config_from_gguf
        from ..models.weights import load_weights
        from ..tokenizer import Utf8Buf, tokenizer_from_gguf
        from jax.experimental.shard_map import shard_map

        gf = GGUFFile(model) if not isinstance(model, GGUFFile) else model
        self.cfg = config_from_gguf(gf.metadata)
        self.tokenizer = tokenizer_from_gguf(gf.metadata)
        if mesh is None:
            if tp > 1:
                n_sp = sp or (jax.device_count() // tp)
                devs = np.asarray(jax.devices()[: n_sp * tp]).reshape(n_sp, tp)
                mesh = Mesh(devs, (axis, "tp"))
            else:
                n_sp = sp or jax.device_count()
                mesh = Mesh(np.asarray(jax.devices()[:n_sp]), (axis,))
        self.mesh = mesh
        self.axis = axis
        self.tp = mesh.shape.get("tp", 1)
        tp_ax = "tp" if self.tp > 1 else None
        n = mesh.shape[axis]
        self.seq_len = seq_len or self.cfg.seq_len
        assert self.seq_len % n == 0, f"seq_len {self.seq_len} % sp {n} != 0"
        self.compute_dtype = compute_dtype
        self._utf8 = Utf8Buf()
        # sampler parity with runtime.Runner: None = greedy (the golden-test
        # path); a runtime.sampler.Sampler gives temperature/top-p/min-p
        self.sampler = sampler
        self._key = jax.random.PRNGKey(seed)

        host = load_weights(gf, self.cfg, layout="planar")
        if tp_ax is not None:
            # sp x tp: weights tp-sharded (Megatron row/col recipe from
            # parallel.tp), KV heads tp-local, cache sequence sp-sharded
            from . import tp as tpmod

            tpmod.validate_tp_strict(host, self.cfg, self.tp)
            specs = tpmod.weight_specs(host)
            self._local_template, lcfg = tpmod._localize(host, self.cfg, self.tp)
            self.weights = jax.tree.map(
                lambda a, sp_: jax.device_put(a, NamedSharding(mesh, sp_)),
                host, specs,
            )
            wspec = specs
            cache_p = P(None, None, "tp", axis, None)
        else:
            self._local_template, lcfg = None, self.cfg
            rep = NamedSharding(mesh, P())
            self.weights = jax.tree.map(lambda a: jax.device_put(a, rep), host)
            wspec = jax.tree.map(lambda _: P(), self.weights)
            cache_p = P(None, None, None, axis, None)

        self.cache = jax.device_put(
            KVCache.create(self.cfg, 1, self.seq_len, compute_dtype),
            NamedSharding(mesh, cache_p),
        )
        self.pos = 0

        cdt, ax = compute_dtype, axis
        local_template = self._local_template
        cspec = KVCache(cache_p, cache_p)

        def relocalize(weights):
            if local_template is None:
                return weights
            from .tp import localize_tree

            return localize_tree(weights, local_template)

        def prefill_chunk_fn(weights, cache, tokens, t0, last_row):
            return _sp_prefill_chunk_local(relocalize(weights), cache, tokens,
                                           t0, last_row, lcfg, cdt, ax,
                                           tp_axis=tp_ax)

        self._prefill_chunk = jax.jit(
            shard_map(
                prefill_chunk_fn, mesh=mesh,
                in_specs=(wspec, cspec, P(None, ax), P(), P()),
                out_specs=(P(ax, None, None), cspec),
                check_rep=False,
            ),
            donate_argnames=("cache",),
        )

        def decode_fn(weights, cache, token, pos):
            return _sp_decode_local(relocalize(weights), cache, token, pos,
                                    lcfg, cdt, ax, tp_axis=tp_ax)

        self._decode = jax.jit(
            shard_map(
                decode_fn, mesh=mesh,
                in_specs=(wspec, cspec, P(), P()),
                out_specs=(P(), cspec),
                check_rep=False,
            ),
            donate_argnames=("cache",),
        )

    MAX_CHUNK_PER_DEV = 512  # per-device rows per prefill chunk

    def prefill(self, prompt: str, bos: bool = True):
        """Text prefill; returns (pos, last_token, first_gen)."""
        toks = self.tokenizer.encode(prompt, bos=bos)
        row = self.prefill_tokens(toks)
        return self.pos, toks[-1], self._pick(row)

    def prefill_tokens(self, toks: list[int]) -> np.ndarray:
        """CHUNKED sequence-parallel prefill: the prompt pays only its own
        (bucket-padded) length — a 100-token prompt on an sp=4 x 4096-slot
        cache prefills 128 rows, not 4096 (VERDICT r2 #7). Chunks of up to
        sp*512 tokens stream through `_sp_prefill_chunk_local`; per-device
        chunk widths bucket to powers of two to bound compile count.
        Returns the last prompt position's logits row (V,) — the serving
        tier picks with its own per-request sampler (serving.sp_engine)."""
        from ..utils import bucket as _bucket

        limit = self.seq_len - 1
        if len(toks) > limit:
            toks = toks[-limit:]
        n = self.mesh.shape[self.axis]
        last_row = len(toks) - 1
        t0 = 0
        logits = None
        cl_last = 1
        while t0 < len(toks):
            rest = toks[t0:]
            cl = min(_bucket(-(-len(rest) // n), 16), self.MAX_CHUNK_PER_DEV,
                     self.seq_len // n)
            C = cl * n
            chunk = np.zeros((1, C), np.int32)
            chunk[0, : min(len(rest), C)] = rest[:C]
            logits, self.cache = self._prefill_chunk(
                self.weights, self.cache, jnp.asarray(chunk),
                jnp.int32(t0), jnp.int32(last_row),
            )
            cl_last, t0_last = cl, t0
            t0 += min(len(rest), C)
        owner = (last_row - t0_last) // cl_last
        self.pos = len(toks)
        return np.asarray(logits)[owner, 0]

    def _pick(self, logits_row) -> int:
        """Greedy by default; a Sampler gives temperature/top-p parity with
        the dense Runner."""
        if self.sampler is None:
            return int(np.asarray(logits_row).argmax())
        self._key, sub = jax.random.split(self._key)
        return int(np.asarray(self.sampler.sample(
            jnp.asarray(logits_row)[None], sub))[0])

    def decode_logits(self, token: int) -> np.ndarray:
        """One sp decode step: feed `token` at the current position,
        advance, return the next-token logits row (V,)."""
        logits, self.cache = self._decode(
            self.weights, self.cache,
            jnp.asarray([token], jnp.int32),
            jnp.asarray([self.pos], jnp.int32),
        )
        self.pos += 1
        return np.asarray(logits)[0]

    def generate(self, token: int, steps: int):
        """Streaming decode (text pieces), reference-style. Greedy unless
        a Sampler was given (sampler parity with runtime.Runner)."""
        yield self.tokenizer.decode(token, self._utf8)
        cur = token
        for _ in range(min(steps - 1, self.seq_len - self.pos - 1)):
            cur = self._pick(self.decode_logits(cur))
            if cur == self.tokenizer.eos_token:
                return
            yield self.tokenizer.decode(cur, self._utf8)

    def prefill_and_generate(self, prompt: str, steps: int):
        _, _, tok = self.prefill(prompt, bos=True)
        return self.generate(tok, steps)
