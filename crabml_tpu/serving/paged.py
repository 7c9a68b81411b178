"""Paged KV cache: vLLM-style block-pool serving memory.

The slot-pool engine reserves seq_len cache slots per sequence — fine for
uniform workloads, wasteful when lengths vary (a 64-slot 7B pool at 4k
context reserves 34 GB whether or not anyone uses it). This module
allocates KV memory in PAGE-token blocks from a shared pool instead:

- `PagedKVCache`: pages (L, n_pages, KV, PAGE, hd) ×2 + a host-side free
  list; each sequence owns a list of pages recorded in a (B, max_pages)
  block table. Memory scales with TOKENS IN FLIGHT, not slots × seq_len.
- `paged_decode_step`: single jitted decode tick — per layer, the new
  K/V vectors scatter into each sequence's current page
  (pages.at[table[b, pos//PAGE], :, pos%PAGE]) and attention runs through
  the block table (ops.pallas.decode_attention.paged_decode_attention on
  TPU; an XLA gather fallback elsewhere/for small heads).
- `PagedServingEngine`: the continuous-batching engine over the pool.
  Admission allocates pages for the prompt, each decode tick allocates a
  page when a sequence crosses a boundary, and _finish returns pages to
  the free list. Default admission writes prompt chunks DIRECTLY into
  pool pages (paged_prefill_chunk); a dense-scratch + scatter path
  remains for non-page-aligned chunk sizes.
- **Automatic prefix caching** (vLLM-style, on by default): each full
  prompt page registers under a position-chained token digest; a later
  request whose prompt starts with the same tokens REUSES those pages
  read-only (refcounted) and prefills only its tail — prefill compute
  and admission latency scale with the novel suffix. Finished requests'
  registered pages are retained as evictable cache (LRU under pool
  pressure), so shared system prompts stay resident across requests.
  Sharing is safe because a page's KV is final once its prompt chunk is
  written: decode writes only positions past the prompt, rope is
  absolute-position (prefixes align at 0), and the last prompt token
  always recomputes so sampling sees real logits.

PAGE == the decode kernel's chunk size (128), so kernel DMA chunks and
pages coincide.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forward import (KVCache, apply_final_norm, forward,
                              layer_norm_in, project_ffn, project_qkv)
from ..ops.pallas.decode_attention import BK as PAGE
from ..ops.pallas.decode_attention import MAX_T
from ..ops.pallas.decode_attention import paged_decode_attention
from ..ops.matmul import qmatmul
from ..ops.norm import rms_norm
from ..ops.rope import apply_rope
from ..runtime.sampler import sample_batch
from ..utils import bucket as _bucket
from .engine import (Request, ServingEngine, _accept_round,
                     _draft_2gram_one)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "table", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclass
class PagedKVCache:
    """k, v: (L, n_pages, KV, PAGE, hd); table: (B, max_pages) int32
    (physical page of each sequence's logical chunk; unused entries 0).

    dtype=int8 pages carry per-(page-slot, head) f32 scales in
    k_scale/v_scale (L, n_pages, KV, PAGE, 1) — the paged form of the
    dense engine's quantized cache (models.forward.KVCache): 8.25
    bits/entry, halving pool HBM."""

    k: jnp.ndarray
    v: jnp.ndarray
    table: jnp.ndarray
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @staticmethod
    def create(cfg, n_pages: int, n_slots: int, max_pages: int,
               dtype=jnp.bfloat16, lane_pad: bool = False):
        hd = cfg.head_dim
        if lane_pad and hd % 128:  # see models.forward.KVCache.create
            hd = -(-hd // 128) * 128
        shape = (cfg.n_layers, n_pages, cfg.n_kv_heads, PAGE, hd)
        table = jnp.zeros((n_slots, max_pages), jnp.int32)
        if dtype == jnp.int8:
            sshape = shape[:-1] + (1,)
            return PagedKVCache(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8), table,
                jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32),
            )
        return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype), table)


def _paged_attention_fallback(q, k_pages, v_pages, table, lengths, scale,
                              **attn_kw):
    """XLA path: gather each sequence's pages dense, then mask-attend.
    Used off-TPU and for head dims the kernel can't take."""
    B, T, H, hd = q.shape
    KV = k_pages.shape[1]
    max_pages = table.shape[1]
    # (B, max_pages, KV, PAGE, hd) -> (B, KV, S, hd)
    kg = k_pages[table].transpose(0, 2, 1, 3, 4).reshape(B, KV, max_pages * PAGE, hd)
    vg = v_pages[table].transpose(0, 2, 1, 3, 4).reshape(B, KV, max_pages * PAGE, hd)
    from ..models.forward import attention

    return attention(q, kg, vg, lengths - 1, T, scale, **attn_kw)


def _q8_vec(a):
    """Symmetric per-vector int8 over the last axis (KV quantization);
    zero pad lanes leave the max-abs scale unchanged (lane_pad-safe)."""
    s_ = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0
    s_ = jnp.maximum(s_.astype(jnp.float32), 1e-12)
    qv = jnp.clip(jnp.round(a.astype(jnp.float32) / s_), -127, 127)
    return qv.astype(jnp.int8), s_


def _fused_pool_ok(cache: "PagedKVCache", hd: int, lane_pad: int) -> bool:
    """Shape gate for the fused (pool-out-of-scan) paged paths: the
    kernel DMAs whole (PAGE, hd) tiles, so it needs lane-tiled head dims
    and BK-sized pages."""
    return (hd + lane_pad) % 128 == 0 and cache.k.shape[3] == 128


def _fused_token_io(cache: "PagedKVCache", q, k_t, v_t, l, pos, scale, cfg,
                    quantized):
    """Shared kv_io body of the fused paged decode/verify: quantize the
    new tokens (k_t/v_t (B, KV, T, hd)), attend over the stacked pool +
    the VMEM new block, and return (out, news) — `news` is what the
    post-scan _write_new_pages scatters into the pool."""
    from ..models.forward import _window_eff
    from ..ops.pallas.decode_attention import paged_decode_attention_fused

    use_local = (l % 2 == 0) if cfg.alternating_window else None
    if quantized:
        kq, ks_new = _q8_vec(k_t)
        vq, vs_new = _q8_vec(v_t)
        news = (kq, vq, ks_new, vs_new)
    else:
        kq = k_t.astype(cache.k.dtype)
        vq = v_t.astype(cache.v.dtype)
        ks_new = vs_new = None
        news = (kq, vq)
    out = paged_decode_attention_fused(
        q, cache.k, cache.v, cache.table, l, pos, scale,
        k_new=kq, v_new=vq, k_scale=cache.k_scale, v_scale=cache.v_scale,
        ks_new=ks_new, vs_new=vs_new,
        softcap=cfg.attn_logit_softcap,
        local_window=_window_eff(cfg.sliding_window, use_local))
    return out, news


def _write_new_pages(cache: "PagedKVCache", news, page_of, off
                     ) -> "PagedKVCache":
    """Write all layers' new tokens into the pool in per-(slot, token)
    dynamic_update_slices. news: (L, B, KV, T, d) stacked scan outputs;
    page_of/off: (B, T) physical page + in-page offset per token. DUS
    (unlike XLA scatter, which here picks a non-default operand layout
    and pays full-pool layout-conversion copies) updates the donated pool
    in place — update bytes are L*B*KV*T*hd, independent of pool size."""
    B, T = page_of.shape
    zero = jnp.int32(0)

    def wr(pool, upd):  # pool (L, P, KV, PAGE, d); upd (L, B, KV, T, d)
        for b in range(B):
            for t in range(T):
                pool = jax.lax.dynamic_update_slice(
                    pool, upd[:, b : b + 1, :, t : t + 1],
                    (zero, page_of[b, t], zero, off[b, t], zero))
        return pool

    if cache.quantized:
        kq, vq, ks, vs = news
        return PagedKVCache(wr(cache.k, kq), wr(cache.v, vq), cache.table,
                            wr(cache.k_scale, ks), wr(cache.v_scale, vs))
    kn, vn = news
    return PagedKVCache(wr(cache.k, kn), wr(cache.v, vn), cache.table)


def _write_chunk_pages(cache: "PagedKVCache", news, pages_here
                       ) -> "PagedKVCache":
    """Post-scan whole-page writes for the fused direct-to-page prefill.
    news: (L, KV, T, d) stacked scan outputs (T = c_pages*PAGE);
    pages_here: c_pages traced physical page ids, chunk page j holding
    tokens [j*PAGE, (j+1)*PAGE). One whole-page dynamic_update_slice per
    chunk page updates the donated pool in place — update bytes are
    L*KV*PAGE*d per page, independent of pool size (same rationale as
    _write_new_pages). Entries past the slot's allocation are page 0 =
    the shared scratch page, so padded-tail writes stay harmless."""
    zero = jnp.int32(0)

    def wr(pool, upd):  # pool (L, P, KV, PAGE, d); upd (L, KV, T, d)
        for j, pg in enumerate(pages_here):
            blk = upd[:, None, :, j * PAGE : (j + 1) * PAGE]
            pool = jax.lax.dynamic_update_slice(
                pool, blk, (zero, pg, zero, zero, zero))
        return pool

    if cache.quantized:
        kq, vq, ks, vs = news
        return PagedKVCache(wr(cache.k, kq), wr(cache.v, vq), cache.table,
                            wr(cache.k_scale, ks), wr(cache.v_scale, vs))
    kn, vn = news
    return PagedKVCache(wr(cache.k, kn), wr(cache.v, vn), cache.table)


def _layer_body(lw, rope_ff, l, x, positions, cfg, compute_dtype, kv_io,
                B, T, lane_pad):
    """The transformer layer shared by the three paged forwards (decode /
    direct-to-page prefill / speculative verify). Everything is common
    except HOW k/v write into the pool and HOW attention reads it back:
    `kv_io(q, k, v)` receives rope'd (and lane-padded) tensors, performs
    its own page writes + attention, and returns (out, new_page_arrays).
    One body means a new arch feature (norms, softcaps, rope variants)
    lands in every paged path at once — the drift class ADVICE r2 flagged
    when these bodies were hand-copied."""
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rope_ps = (1.0 / cfg.rope_scaling_factor
               if cfg.rope_scaling_type == "linear" else 1.0)
    h = layer_norm_in(lw, l, x, cfg)
    q, k, v = project_qkv(lw, l, h, cfg, compute_dtype)
    q = q.reshape(B, T, H, hd)
    k = k.reshape(B, T, KV, hd)
    v = v.reshape(B, T, KV, hd)
    if cfg.qk_norm:  # qwen3: per-head RMS norm before rope
        q = rms_norm(q, jnp.asarray(lw["q_norm"])[l], cfg.rms_norm_eps)
        k = rms_norm(k, jnp.asarray(lw["k_norm"])[l], cfg.rms_norm_eps)
    q = apply_rope(q, positions, cfg.effective_rope_dim, cfg.rope_mode,
                   cfg.rope_base, freq_factors=rope_ff, pos_scale=rope_ps,
                   mscale=cfg.rope_mscale)
    k = apply_rope(k, positions, cfg.effective_rope_dim, cfg.rope_mode,
                   cfg.rope_base, freq_factors=rope_ff, pos_scale=rope_ps,
                   mscale=cfg.rope_mscale)
    if lane_pad:  # zero lanes: score- and scale-neutral (see KVCache)
        padw = ((0, 0), (0, 0), (0, 0), (0, lane_pad))
        q = jnp.pad(q, padw)
        k = jnp.pad(k, padw)
        v = jnp.pad(v, padw)

    out, pages = kv_io(q, k, v)

    if lane_pad:  # drop the zero lanes before wo
        out = out.reshape(B, T, H, hd + lane_pad)[..., :hd].reshape(
            B, T, H * hd)
    attn_out = qmatmul(out.astype(compute_dtype), lw["wo"], compute_dtype,
                       layer=l)
    if "bo" in lw:
        attn_out = attn_out + jnp.asarray(lw["bo"])[l].astype(compute_dtype)
    if cfg.post_norms:  # gemma2: norm the block OUTPUT before residual
        attn_out = rms_norm(
            attn_out, jnp.asarray(lw["post_attn_norm"])[l], cfg.rms_norm_eps
        )
    if cfg.parallel_residual:
        ffn_in = h
    else:
        x2 = x + attn_out
        ffn_in = rms_norm(x2, jnp.asarray(lw["ffn_norm"])[l], cfg.rms_norm_eps)
    down = project_ffn(lw, l, ffn_in, cfg, compute_dtype)
    if cfg.post_norms:
        down = rms_norm(
            down, jnp.asarray(lw["post_ffn_norm"])[l], cfg.rms_norm_eps
        )
    x_out = (x + attn_out + down) if cfg.parallel_residual else (x2 + down)
    return x_out, pages


def _final_logits(weights, x, cfg, compute_dtype):
    """Final norm -> lm head (+bias, +softcap): the shared tail of the
    three paged forwards."""
    x = apply_final_norm(weights, x, cfg)
    out_w = (weights["output"] if weights["output"] is not None
             else weights["token_embed"])
    logits = qmatmul(x, out_w, compute_dtype).astype(jnp.float32)
    if weights.get("output_b") is not None:  # phi2 lm_head bias
        logits = logits + jnp.asarray(weights["output_b"], jnp.float32)
    if cfg.final_logit_softcap:
        cap = jnp.float32(cfg.final_logit_softcap)
        logits = cap * jnp.tanh(logits / cap)
    return logits


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype"),
    donate_argnames=("cache",),
)
def paged_decode_step(weights, cache: PagedKVCache, tokens, pos, key, temp, topp,
                      minp, recent, rep_pen, freq_pen, pres_pen, bias, cfg,
                      compute_dtype):
    """One decode tick over the page pool. tokens/pos: (B,)."""
    from ..ops.matmul import embedding_lookup

    B = tokens.shape[0]
    D, H, KV, hd = cfg.embedding_dim, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    scale = cfg.attn_scale  # 1/sqrt(hd) unless overridden (gemma2-27b)
    lw = weights["layers"]
    L = cfg.n_layers
    rope_ff = weights.get("rope_freqs")
    rope_ps = (1.0 / cfg.rope_scaling_factor
               if cfg.rope_scaling_type == "linear" else 1.0)

    page_of = cache.table[jnp.arange(B), pos // PAGE]  # (B,) physical page
    off = pos % PAGE
    # lane-padded pool (PagedKVCache.create(lane_pad=True)): k/v/q store
    # zero-extended to the pool's lane width (score- and scale-neutral)
    lane_pad = cache.k.shape[-1] - hd

    x = embedding_lookup(weights["token_embed"], tokens[:, None], compute_dtype)
    if cfg.scale_embedding:
        x = x * jnp.sqrt(jnp.float32(D)).astype(compute_dtype)
    positions = pos[:, None]

    quantized = cache.quantized
    # fused path (VERDICT r4 #1/#3): pools stay OUT of the layer scan —
    # the kernel reads the full stacked pool via a prefetched layer scalar
    # and attends this step's token from VMEM; page writes batch into
    # per-slot dynamic_update_slices after the scan (_write_new_pages).
    # The old path streamed the whole pool through the scan's xs->ys every
    # tick — and once more per fused-speculation round, the paged
    # fused-scan regression's root cause.
    fused = _fused_pool_ok(cache, hd, lane_pad)

    def layer_step(x, per_layer):
        if fused:
            l = per_layer
        elif quantized:
            l, k_pages, v_pages, ks_pages, vs_pages = per_layer
        else:
            l, k_pages, v_pages = per_layer
            ks_pages = vs_pages = None

        def kv_io(q, k, v):
            kt = k[:, 0]  # (B, KV, hd[+pad])
            vt = v[:, 0]
            if fused:
                return _fused_token_io(
                    cache, q, kt[:, :, None], vt[:, :, None], l, pos,
                    scale, cfg, quantized)
            # scatter this token's K/V into each sequence's current page
            kp, vp, ksp, vsp = k_pages, v_pages, ks_pages, vs_pages
            if quantized:
                kq, ks_new = _q8_vec(kt)
                vq, vs_new = _q8_vec(vt)
                kp = kp.at[page_of, :, off].set(kq)
                vp = vp.at[page_of, :, off].set(vq)
                ksp = ksp.at[page_of, :, off].set(ks_new)
                vsp = vsp.at[page_of, :, off].set(vs_new)
            else:
                kp = kp.at[page_of, :, off].set(kt.astype(kp.dtype))
                vp = vp.at[page_of, :, off].set(vt.astype(vp.dtype))

            use_local = (l % 2 == 0) if cfg.alternating_window else None
            out = None
            if jax.default_backend() == "tpu" and (hd + lane_pad) % 128 == 0:
                # int8 pools ride the kernel with their scale pools (half
                # the pool HBM AND no XLA gather+materialize on the hot
                # path); gemma2 softcap/sliding-window ride the kernel too
                from ..models.forward import _window_eff

                out = paged_decode_attention(
                    q, kp, vp, cache.table, pos + 1, scale,
                    k_scale=ksp, v_scale=vsp,
                    softcap=cfg.attn_logit_softcap,
                    local_window=_window_eff(cfg.sliding_window, use_local),
                )
            if out is None:
                attn_kw = dict(
                    softcap=cfg.attn_logit_softcap,
                    local_window=cfg.sliding_window,
                    use_local=use_local,
                )
                if quantized:
                    # dequantize the gathered pages, then masked fallback
                    mp = cache.table.shape[1]
                    kd = (kp[cache.table].astype(jnp.float32)
                          * ksp[cache.table])
                    vd = (vp[cache.table].astype(jnp.float32)
                          * vsp[cache.table])
                    kd = kd.transpose(0, 2, 1, 3, 4).reshape(
                        B, KV, mp * PAGE, hd + lane_pad)
                    vd = vd.transpose(0, 2, 1, 3, 4).reshape(
                        B, KV, mp * PAGE, hd + lane_pad)
                    from ..models.forward import attention

                    out = attention(q, kd, vd, pos, 1, scale, **attn_kw)
                else:
                    out = _paged_attention_fallback(
                        q, kp, vp, cache.table, pos + 1, scale, **attn_kw)
            pages = ((kp, vp, ksp, vsp) if quantized else (kp, vp))
            return out, pages

        return _layer_body(lw, rope_ff, l, x, positions, cfg, compute_dtype,
                           kv_io, B, 1, lane_pad)

    idx = jnp.arange(L, dtype=jnp.int32)
    if fused:
        x, news = jax.lax.scan(layer_step, x, idx)
        out_cache = _write_new_pages(cache, news, page_of[:, None],
                                     off[:, None])
    elif quantized:
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            layer_step, x, (idx, cache.k, cache.v, cache.k_scale, cache.v_scale)
        )
        out_cache = PagedKVCache(k_new, v_new, cache.table, ks_new, vs_new)
    else:
        x, (k_new, v_new) = jax.lax.scan(layer_step, x, (idx, cache.k, cache.v))
        out_cache = PagedKVCache(k_new, v_new, cache.table)
    logits = _final_logits(weights, x, cfg, compute_dtype)[:, 0]
    nxt, lp = sample_batch(logits, key, temp, topp, minp=minp,
                           recent_tokens=recent, repetition_penalty=rep_pen,
                           frequency_penalty=freq_pen, presence_penalty=pres_pen,
                           logit_bias=bias, with_logprobs=True)
    return nxt, lp, out_cache


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "n_ctx_pages", "c_pages"),
    donate_argnames=("cache",),
)
def paged_prefill_chunk(weights, cache: PagedKVCache, tokens, filled,
                        slot_pages, cfg, compute_dtype, n_ctx_pages: int,
                        c_pages: int = 1):
    """One c_pages×PAGE-token prompt chunk written DIRECTLY into pool
    pages — no dense scratch cache, no second write (VERDICT r2 #4).

    tokens: (1, c_pages*PAGE) — the chunk, zero-padded at the prompt tail;
    filled: traced PAGE-multiple offset of this chunk; slot_pages:
    (n_ctx_pages,) physical pages of this slot's prompt so far (a bucketed
    prefix of its allocation — passed OUT OF BAND, not via cache.table,
    so idle decode slots keep scattering onto the shared scratch page).
    The chunk writes pages slot_pages[filled//PAGE : filled//PAGE+c_pages]
    (entries past the allocation are 0 = the scratch page, so padded-tail
    writes are harmless); attention gathers this slot's live pages dense
    (bounded by n_ctx_pages) and masks cols <= filled + t. Multi-page
    chunks exist because each chunk is one device dispatch: on a
    high-RTT link, admission cost is dispatch-count-bound, so writing 4
    pages per dispatch quarters it. Returns (logits (1, T, V), cache)."""
    from ..models.forward import attention
    from ..ops.matmul import embedding_lookup

    B, T = tokens.shape  # (1, c_pages*PAGE)
    assert T == c_pages * PAGE
    D, H, KV, hd = cfg.embedding_dim, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    scale = cfg.attn_scale
    lw = weights["layers"]
    L = cfg.n_layers
    rope_ff = weights.get("rope_freqs")
    rope_ps = (1.0 / cfg.rope_scaling_factor
               if cfg.rope_scaling_type == "linear" else 1.0)
    quantized = cache.quantized

    # physical page of each of this chunk's c_pages logical pages
    pages_here = [slot_pages[filled // PAGE + j] for j in range(c_pages)]
    ctx = jax.lax.dynamic_slice_in_dim(slot_pages, 0, n_ctx_pages)
    lane_pad = cache.k.shape[-1] - hd  # see paged_decode_step

    x = embedding_lookup(weights["token_embed"], tokens, compute_dtype)
    if cfg.scale_embedding:
        x = x * jnp.sqrt(jnp.float32(D)).astype(compute_dtype)
    positions = filled + jnp.arange(T, dtype=jnp.int32)[None, :]

    # pool-out-of-scan (same rewrite as paged_decode_step): the pool is a
    # read-only closure; attention gathers this slot's ctx pages from it
    # (bounded by n_ctx_pages — NOT the engine-wide pool the old xs->ys
    # scan streamed every chunk) and splices the chunk's own k/v in before
    # attending; whole-page writes batch after the scan.
    fused = _fused_pool_ok(cache, hd, lane_pad)

    def layer_step(x, per_layer):
        if fused:
            l = per_layer
        elif quantized:
            l, k_pages, v_pages, ks_pages, vs_pages = per_layer
        else:
            l, k_pages, v_pages = per_layer
            ks_pages = vs_pages = None

        def kv_io(q, k, v):
            kt = k[0].transpose(1, 0, 2)  # (KV, T, hd)
            vt = v[0].transpose(1, 0, 2)
            if fused:
                if quantized:
                    kq, ks_new = _q8_vec(kt)
                    vq, vs_new = _q8_vec(vt)
                    news = (kq, vq, ks_new, vs_new)
                    chunk_k = kq.astype(q.dtype) * ks_new.astype(q.dtype)
                    chunk_v = vq.astype(q.dtype) * vs_new.astype(q.dtype)
                else:
                    kq = kt.astype(cache.k.dtype)
                    vq = vt.astype(cache.v.dtype)
                    news = (kq, vq)
                    chunk_k = kq  # pool dtype == the gathered kd's dtype
                    chunk_v = vq
                kg = cache.k[l, ctx]  # (n_ctx_pages, KV, PAGE, hd) gather
                vg = cache.v[l, ctx]
                if quantized:
                    kg = kg.astype(q.dtype) * cache.k_scale[l, ctx].astype(q.dtype)
                    vg = vg.astype(q.dtype) * cache.v_scale[l, ctx].astype(q.dtype)
                kd = kg.transpose(1, 0, 2, 3).reshape(
                    1, KV, n_ctx_pages * PAGE, hd + lane_pad)
                vd = vg.transpose(1, 0, 2, 3).reshape(
                    1, KV, n_ctx_pages * PAGE, hd + lane_pad)
                # the closure pool predates this chunk: splice the chunk's
                # (quantize-roundtripped, so numerics match a pool read)
                # k/v into its own span before attending
                zero = jnp.int32(0)
                kd = jax.lax.dynamic_update_slice(
                    kd, chunk_k[None], (zero, zero, filled, zero))
                vd = jax.lax.dynamic_update_slice(
                    vd, chunk_v[None], (zero, zero, filled, zero))
                out = attention(
                    q, kd, vd, jnp.reshape(filled, (1,)), T, scale,
                    softcap=cfg.attn_logit_softcap,
                    local_window=cfg.sliding_window,
                    use_local=(l % 2 == 0) if cfg.alternating_window else None,
                )
                return out, news

            # write the whole chunk straight into its pages: (KV, T, hd)
            kp, vp, ksp, vsp = k_pages, v_pages, ks_pages, vs_pages
            if quantized:
                kq, ks_new = _q8_vec(kt)
                vq, vs_new = _q8_vec(vt)
                for j, pg in enumerate(pages_here):
                    sl = slice(j * PAGE, (j + 1) * PAGE)
                    kp = kp.at[pg].set(kq[:, sl])
                    vp = vp.at[pg].set(vq[:, sl])
                    ksp = ksp.at[pg].set(ks_new[:, sl])
                    vsp = vsp.at[pg].set(vs_new[:, sl])
            else:
                for j, pg in enumerate(pages_here):
                    sl = slice(j * PAGE, (j + 1) * PAGE)
                    kp = kp.at[pg].set(kt[:, sl].astype(kp.dtype))
                    vp = vp.at[pg].set(vt[:, sl].astype(vp.dtype))

            # attend over this slot's live pages (incl. the one just written)
            kg = kp[ctx]  # (n_ctx_pages, KV, PAGE, hd)
            vg = vp[ctx]
            if quantized:
                # dequantize in the compute dtype: the attention einsum is
                # bf16 anyway and an f32 intermediate doubles the gather's
                # HBM traffic (same reasoning as models/forward.py)
                kg = kg.astype(q.dtype) * ksp[ctx].astype(q.dtype)
                vg = vg.astype(q.dtype) * vsp[ctx].astype(q.dtype)
            kd = kg.transpose(1, 0, 2, 3).reshape(
                1, KV, n_ctx_pages * PAGE, hd + lane_pad)
            vd = vg.transpose(1, 0, 2, 3).reshape(
                1, KV, n_ctx_pages * PAGE, hd + lane_pad)
            out = attention(
                q, kd, vd, jnp.reshape(filled, (1,)), T, scale,
                softcap=cfg.attn_logit_softcap,
                local_window=cfg.sliding_window,
                use_local=(l % 2 == 0) if cfg.alternating_window else None,
            )
            pages = ((kp, vp, ksp, vsp) if quantized else (kp, vp))
            return out, pages

        return _layer_body(lw, rope_ff, l, x, positions, cfg, compute_dtype,
                           kv_io, B, T, lane_pad)

    idx = jnp.arange(L, dtype=jnp.int32)
    if fused:
        x, news = jax.lax.scan(layer_step, x, idx)
        out_cache = _write_chunk_pages(cache, news, pages_here)
    elif quantized:
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            layer_step, x, (idx, cache.k, cache.v, cache.k_scale, cache.v_scale)
        )
        out_cache = PagedKVCache(k_new, v_new, cache.table, ks_new, vs_new)
    else:
        x, (k_new, v_new) = jax.lax.scan(layer_step, x, (idx, cache.k, cache.v))
        out_cache = PagedKVCache(k_new, v_new, cache.table)
    logits = _final_logits(weights, x, cfg, compute_dtype)
    return logits, out_cache


def _paged_verify_fwd(weights, cache: PagedKVCache, tokens, pos,
                      cfg, compute_dtype, n_ctx_pages: int | None = None):
    """Traceable verify forward through the page pool (shared by the
    single-dispatch paged_verify_step jit and the fused multi-round
    _paged_spec_scan): tokens (B, T=K+1) = each
    slot's current token + its drafts; returns (logits (B, T, V), cache).
    T KV entries write through the block table (pages pre-allocated by
    the engine); rejected tails sit past the accepted position, masked
    until overwritten — same no-rollback argument as the dense
    engine's _spec_verify_step. Attention rides the multi-token decode
    kernel (all K+1 rows per slot read the pool through the block table
    with per-row causal bounds — no page gather, no dequant
    materialization); ineligible shapes fall back to the gathered-pages
    path, bounded to the first `n_ctx_pages` table columns
    (pow2-bucketed by the engine) so gather bytes track the live
    context, not the table width.

    Position 0 is additionally sampled with the full per-slot params so
    non-greedy slots take one correct token from the same dispatch (see
    engine._spec_verify_step)."""
    from ..models.forward import attention
    from ..ops.matmul import embedding_lookup

    B, T = tokens.shape
    D, H, KV, hd = cfg.embedding_dim, cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    scale = cfg.attn_scale
    lw = weights["layers"]
    L = cfg.n_layers
    rope_ff = weights.get("rope_freqs")
    rope_ps = (1.0 / cfg.rope_scaling_factor
               if cfg.rope_scaling_type == "linear" else 1.0)
    quantized = cache.quantized
    lane_pad = cache.k.shape[-1] - hd
    mp = min(n_ctx_pages or cache.table.shape[1], cache.table.shape[1])
    ctx_table = cache.table[:, :mp]

    positions = pos[:, None] + jnp.arange(T, dtype=pos.dtype)[None, :]  # (B,T)
    pg_bt = cache.table[jnp.arange(B)[:, None], positions // PAGE]  # (B, T)
    off_bt = positions % PAGE
    pg_f = pg_bt.reshape(-1)  # (B*T,)
    off_f = off_bt.reshape(-1)

    x = embedding_lookup(weights["token_embed"], tokens, compute_dtype)
    if cfg.scale_embedding:
        x = x * jnp.sqrt(jnp.float32(D)).astype(compute_dtype)

    # same pool-out-of-scan rewrite as paged_decode_step: this is the
    # forward the fused speculative scan loops over, so removing the
    # per-call pool stream also removes the per-ROUND pool copy that made
    # the paged fused scan lose to single-dispatch (VERDICT r4 #3)
    fused = T <= MAX_T and _fused_pool_ok(cache, hd, lane_pad)

    def layer_step(x, per_layer):
        if fused:
            l = per_layer
        elif quantized:
            l, k_pages, v_pages, ks_pages, vs_pages = per_layer
        else:
            l, k_pages, v_pages = per_layer
            ks_pages = vs_pages = None

        def kv_io(q, k, v):
            if fused:
                return _fused_token_io(
                    cache, q, k.transpose(0, 2, 1, 3),
                    v.transpose(0, 2, 1, 3), l, pos, scale, cfg, quantized)
            # flat scatter: every slot's K+1 tokens through the block
            # table (page boundaries straddled via per-token indices)
            kp, vp, ksp, vsp = k_pages, v_pages, ks_pages, vs_pages
            kt = k.reshape(B * T, KV, hd + lane_pad)
            vt = v.reshape(B * T, KV, hd + lane_pad)
            if quantized:
                kq, ks_new = _q8_vec(kt)
                vq, vs_new = _q8_vec(vt)
                kp = kp.at[pg_f, :, off_f].set(kq)
                vp = vp.at[pg_f, :, off_f].set(vq)
                ksp = ksp.at[pg_f, :, off_f].set(ks_new)
                vsp = vsp.at[pg_f, :, off_f].set(vs_new)
            else:
                kp = kp.at[pg_f, :, off_f].set(kt.astype(kp.dtype))
                vp = vp.at[pg_f, :, off_f].set(vt.astype(vp.dtype))

            use_local = (l % 2 == 0) if cfg.alternating_window else None
            out = None
            if jax.default_backend() == "tpu" and (hd + lane_pad) % 128 == 0:
                # the multi-token decode kernel attends all K+1 verify
                # rows through the block table in-register (per-row causal
                # bounds) — no page gather, no dequant materialization
                from ..models.forward import _window_eff

                out = paged_decode_attention(
                    q, kp, vp, cache.table, pos + T, scale,
                    k_scale=ksp, v_scale=vsp,
                    softcap=cfg.attn_logit_softcap,
                    local_window=_window_eff(cfg.sliding_window, use_local),
                )
            if out is None:
                kg = kp[ctx_table]  # (B, mp, KV, PAGE, hd)
                vg = vp[ctx_table]
                if quantized:
                    # compute-dtype dequant (see the admission-path note)
                    kg = kg.astype(q.dtype) * ksp[ctx_table].astype(q.dtype)
                    vg = vg.astype(q.dtype) * vsp[ctx_table].astype(q.dtype)
                kd = kg.transpose(0, 2, 1, 3, 4).reshape(
                    B, KV, mp * PAGE, hd + lane_pad)
                vd = vg.transpose(0, 2, 1, 3, 4).reshape(
                    B, KV, mp * PAGE, hd + lane_pad)
                out = attention(
                    q, kd, vd, pos, T, scale,
                    softcap=cfg.attn_logit_softcap,
                    local_window=cfg.sliding_window,
                    use_local=use_local,
                )
            pages = ((kp, vp, ksp, vsp) if quantized else (kp, vp))
            return out, pages

        return _layer_body(lw, rope_ff, l, x, positions, cfg, compute_dtype,
                           kv_io, B, T, lane_pad)

    idx = jnp.arange(L, dtype=jnp.int32)
    if fused:
        x, news = jax.lax.scan(layer_step, x, idx)
        out_cache = _write_new_pages(cache, news, pg_bt, off_bt)
    elif quantized:
        x, (k_new, v_new, ks_new, vs_new) = jax.lax.scan(
            layer_step, x, (idx, cache.k, cache.v, cache.k_scale, cache.v_scale)
        )
        out_cache = PagedKVCache(k_new, v_new, cache.table, ks_new, vs_new)
    else:
        x, (k_new, v_new) = jax.lax.scan(layer_step, x, (idx, cache.k, cache.v))
        out_cache = PagedKVCache(k_new, v_new, cache.table)
    logits = _final_logits(weights, x, cfg, compute_dtype)
    return logits, out_cache


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "n_ctx_pages"),
    donate_argnames=("cache",),
)
def paged_verify_step(weights, cache: PagedKVCache, tokens, pos, key, temp,
                      topp, minp, recent, rep_pen, freq_pen, pres_pen, bias,
                      cfg, compute_dtype, n_ctx_pages: int | None = None):
    """One speculative verify dispatch (see _paged_verify_fwd): greedy
    argmax at every position, position 0 additionally sampled with the
    full per-slot params so non-greedy slots take one correct token from
    the same dispatch (engine._spec_verify_step semantics)."""
    logits, cache = _paged_verify_fwd(weights, cache, tokens, pos, cfg,
                                      compute_dtype, n_ctx_pages)
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    nxt, lp = sample_batch(logits[:, 0], key, temp, topp, minp=minp,
                           recent_tokens=recent, repetition_penalty=rep_pen,
                           frequency_penalty=freq_pen, presence_penalty=pres_pen,
                           logit_bias=bias, with_logprobs=True)
    return greedy, nxt, lp, cache


@partial(
    jax.jit,
    static_argnames=("rounds", "draft", "match_len", "two_model", "cfg",
                     "dcfg", "compute_dtype", "n_ctx_pages", "attn_window"),
    donate_argnames=("cache", "dcache"),
)
def _paged_spec_scan(weights, cache: PagedKVCache, hist, token, pos, active,
                     eligible, key, temp, topp, minp, recent, rep_pen,
                     freq_pen, pres_pen, bias, dweights, dcache, rounds,
                     draft, cfg, compute_dtype, dcfg=None,
                     match_len: int = 2, two_model: bool = False,
                     n_ctx_pages: int | None = None, attn_window=None):
    """Fused multi-round speculative tick through the PAGE POOL — the
    paged twin of engine._spec_scan: `rounds` draft+verify rounds per
    dispatch, drafts on device (2-gram lookup over per-slot history, or
    the draft model's fused greedy chain over its dense cache), each
    verify writing K+1 tokens per slot through the block table
    (_paged_verify_fwd) with pages pre-allocated by the engine for the
    whole scan's horizon. Acceptance/eligibility semantics are exactly
    engine._spec_scan's (shared _accept_round). Removes the
    one-dispatch-round-trip-per-round cost that bounded the paged
    engine's speculation floor (BASELINE: 0.60x paged at accept≈0)."""
    B, S = hist.shape
    draft_one = partial(_draft_2gram_one, draft=draft, match_len=match_len)

    def body(carry, key_r):
        cache, dcache, hist, token, pos, rec = carry
        if two_model:
            def dstep(dc, _):
                dcache, t, p = dc
                dlogits, dcache = forward(dweights, dcache, t[:, None], p,
                                          dcfg, compute_dtype,
                                          attn_window=attn_window)
                nt = jnp.argmax(dlogits[:, 0], -1).astype(jnp.int32)
                return (dcache, nt, p + 1), nt

            # draft+1 steps: full-accept frontier hole argument, see
            # engine._spec_scan
            (dcache, _, _), dr = jax.lax.scan(
                dstep, (dcache, token, pos), length=draft + 1)
            dr = dr.T[:, :draft]
        else:
            dr, hist = jax.vmap(draft_one)(hist, token, pos)
        tok_seq = jnp.concatenate([token[:, None], dr], axis=1)  # (B, K+1)
        logits, cache = _paged_verify_fwd(weights, cache, tok_seq, pos, cfg,
                                          compute_dtype, n_ctx_pages)
        g = jnp.argmax(logits, -1).astype(jnp.int32)
        nxt, lp = sample_batch(logits[:, 0], key_r, temp, topp, minp=minp,
                               recent_tokens=rec, repetition_penalty=rep_pen,
                               frequency_penalty=freq_pen,
                               presence_penalty=pres_pen, logit_bias=bias,
                               with_logprobs=True)
        out, count, token = _accept_round(g, dr, nxt, token, active,
                                          eligible, draft)
        hist = jax.vmap(
            lambda h, row, p: jax.lax.dynamic_update_slice(h, row, (p + 1,))
        )(hist, out, pos)
        rec = jnp.concatenate([rec[:, 1:], token[:, None]], axis=1)
        pos = pos + count
        return (cache, dcache, hist, token, pos, rec), (out, count, *lp)

    keys = jax.random.split(key, rounds)
    (cache, dcache, _, _, _, _), (outs, counts, tok_lp, top_lp, top_id) = (
        jax.lax.scan(body, (cache, dcache, hist, token, pos, recent), keys)
    )
    return outs, counts, (tok_lp, top_lp, top_id), cache, dcache


@partial(
    jax.jit,
    static_argnames=("n_prompt_pages",),
    donate_argnames=("cache",),
)
def _scatter_prefill(cache: PagedKVCache, dense: KVCache, pages,
                     n_prompt_pages: int):
    """Copy a dense (L, 1, KV, t_pad, hd) prefill cache into pool pages.
    `pages`: (n_prompt_pages,) int32. The block table is host-owned and
    pushed separately (the engine's _push_table). int8 caches scatter
    their scale planes alongside."""
    k, v = cache.k, cache.v
    ks, vs = cache.k_scale, cache.v_scale

    def chunk(a, c):  # (L, KV, PAGE, last) slice of the dense scratch
        return jax.lax.dynamic_slice_in_dim(a[:, 0], c * PAGE, PAGE, axis=2)

    for c in range(n_prompt_pages):
        k = k.at[:, pages[c]].set(chunk(dense.k, c).astype(k.dtype))
        v = v.at[:, pages[c]].set(chunk(dense.v, c).astype(v.dtype))
        if ks is not None:
            ks = ks.at[:, pages[c]].set(chunk(dense.k_scale, c))
            vs = vs.at[:, pages[c]].set(chunk(dense.v_scale, c))
    return PagedKVCache(k, v, cache.table, ks, vs)


@partial(
    jax.jit,
    static_argnames=("steps", "cfg", "compute_dtype"),
    donate_argnames=("cache",),
)
def paged_decode_scan(weights, cache: PagedKVCache, tokens, pos, key, temp, topp,
                      minp, recent, rep_pen, freq_pen, pres_pen, bias, steps, cfg,
                      compute_dtype):
    """`steps` paged decode ticks fused in one executable (multi-token
    ticks). The engine pre-allocates every page the scan can touch
    (ceil((pos+steps)/PAGE) per slot) before dispatch, so the in-scan
    table lookups always hit owned pages."""

    def body(carry, _):
        cache, tok, p, key, rec = carry
        key, sub = jax.random.split(key)
        nxt, lp, cache = paged_decode_step(weights, cache, tok, p, sub, temp,
                                           topp, minp, rec, rep_pen, freq_pen,
                                           pres_pen, bias, cfg, compute_dtype)
        rec = jnp.concatenate([rec[:, 1:], nxt[:, None]], axis=1)
        return (cache, nxt, p + 1, key, rec), (nxt, *lp)

    (cache, _, _, _, _), (toks, tok_lp, top_lp, top_id) = jax.lax.scan(
        body, (cache, tokens, pos, key, recent), length=steps
    )
    lp = (tok_lp.T, jnp.swapaxes(top_lp, 0, 1), jnp.swapaxes(top_id, 0, 1))
    return toks.T, lp, cache


class PagedServingEngine(ServingEngine):
    """Continuous batching over a paged KV pool.

    Same request lifecycle as ServingEngine; memory is allocated in PAGE
    blocks on demand (admission: ceil(prompt/PAGE) pages; decode: one page
    at each boundary crossing) and returned on completion. `n_pages`
    bounds total in-flight tokens instead of slots × seq_len.

    The block table's source of truth is the HOST mirror `self._table`
    (pages are only ever assigned host-side); it is pushed to the device
    cache when it changes. Freed slots' rows reset to the scratch page so
    an idle slot can never scatter into a reallocated page.
    """

    # fused multi-round spec measured SLOWER than single-dispatch ticks
    # through the page pool (same-process A/B, benchmarks/r4/
    # spec_ab_paged.json: 0.47x vs 0.62x of plain at accept~0 — the pool
    # carried through the rounds-scan outweighs the saved round trips);
    # opt back in with spec_fused=True if a workload's acceptance pays.
    SPEC_FUSED_DEFAULT = False

    def __init__(self, runner=None, *, n_pages: int = 256,
                 prefix_cache: bool = True, **kw):
        kw.setdefault("kv_dtype", jnp.bfloat16)
        # direct-to-page admission: 4 pages per chunk — admission cost on
        # a high-RTT link is dispatch-count-bound (measured: 128-token
        # chunks put paged at 0.91x the dense engine at prompt=512)
        kw.setdefault("prefill_chunk", 4 * PAGE)
        self._n_pages_cfg = n_pages
        self._prefix_on = prefix_cache
        super().__init__(runner, **kw)
        # two-model speculation: the (small) draft model rides a plain
        # DENSE slot cache (base class) alongside the paged target pool —
        # admission paths below prefill it, plain ticks teacher-force it,
        # and _make_drafts/_spec_verify work unchanged. (Lifts the r3
        # dense-engine-only restriction, VERDICT r3 #4.)
        # chunked admission writes pages directly when chunks are
        # page-multiples; other chunk sizes (and prefill_chunk=None —
        # legacy synchronous admission) keep the dense-scratch path
        self._direct_prefill = (
            self.prefill_chunk is not None and self.prefill_chunk % PAGE == 0
        )
        # prefix caching rides direct-to-page admission only: the dense
        # scratch path's in-chunk attention cannot see reused pool pages
        if self._prefix_on and not self._direct_prefill:
            import logging

            logging.getLogger("crabml_tpu").warning(
                "prefix caching DISABLED: it requires page-multiple chunked "
                "admission (prefill_chunk %% %d == 0; got %r). Pass a "
                "PAGE-multiple prefill_chunk to re-enable.",
                PAGE, self.prefill_chunk)
        self._prefix_on = self._prefix_on and self._direct_prefill

    def _make_cache(self):
        self.max_pages = -(-self.seq_len // PAGE)
        self.n_pages = self._n_pages_cfg
        # page 0 is a scratch page shared by empty slots; never allocated
        self._free = list(range(1, self.n_pages))
        self._owned = [[] for _ in range(self.n_slots)]
        # -- automatic prefix caching state (vLLM-style) -------------------
        # full prompt pages register under a position-chained token digest;
        # identical prompt prefixes of later requests reuse the pages
        # read-only (refcounted). Ref-0 registered pages are RETAINED as
        # evictable cache until the allocator needs them back (LRU).
        self._ref: dict[int, int] = {}  # page -> live-slot refcount
        self._page_hash: dict[int, bytes] = {}  # registered page -> digest
        self._hash_page: dict[bytes, int] = {}  # digest -> page
        self._evictable: list[bytes] = []  # ref-0 registered digests, LRU
        self._slot_digests: dict[int, list[bytes]] = {}
        self._reuse: dict[int, int] = {}  # slot -> reused token count
        self.prefix_hits = 0
        self.prefix_tokens_reused = 0
        self.prefix_evictions = 0  # cached ref-0 pages dropped on pressure
        self.preemptions = 0  # pool-pressure recompute preemptions
        self._table = np.zeros((self.n_slots, self.max_pages), np.int32)
        self._scratch = {}  # slot -> dense KVCache accumulating prefill chunks
        self._prefill_jit = jax.jit(
            partial(forward, cfg=self.cfg, compute_dtype=self.compute_dtype),
            donate_argnames=("cache",),
        )
        cache = PagedKVCache.create(
            self.cfg, self.n_pages, self.n_slots, self.max_pages,
            self.kv_dtype, lane_pad=self.kv_lane_pad,
        )
        if self.mesh is not None:
            # TP-sharded pool (ROADMAP #3): pages split over KV heads, so
            # pool HBM divides by tp instead of replicating per device; the
            # block table (tiny, host-authored) stays replicated
            from jax.sharding import NamedSharding, PartitionSpec as P

            pool = NamedSharding(self.mesh, P(None, None, "tp", None, None))
            rep = NamedSharding(self.mesh, P(None, None))
            cache = PagedKVCache(
                jax.device_put(cache.k, pool), jax.device_put(cache.v, pool),
                jax.device_put(cache.table, rep),
                None if cache.k_scale is None
                else jax.device_put(cache.k_scale, pool),
                None if cache.v_scale is None
                else jax.device_put(cache.v_scale, pool),
            )
        return cache

    def _reset_device_state(self):
        super()._reset_device_state()  # calls _make_cache: pool state rebuilt

    def pages_free(self) -> int:
        return len(self._free) + len(self._evictable)

    def _evict_one(self) -> bool:
        """Drop the least-recently-used ref-0 cached page back to free."""
        while self._evictable:
            dig = self._evictable.pop(0)
            pg = self._hash_page.get(dig)
            if pg is None or self._ref.get(pg, 0) > 0:
                continue  # stale entry (page re-registered or re-live)
            del self._hash_page[dig]
            del self._page_hash[pg]
            self._free.append(pg)
            self.prefix_evictions += 1
            return True
        return False

    def _alloc(self, n: int) -> list[int] | None:
        """Pop n pages; cached ref-0 pages are evicted LRU on pressure.
        Every returned page starts at refcount 1."""
        while len(self._free) < n and self._evict_one():
            pass
        if len(self._free) < n:
            return None
        pages = [self._free.pop() for _ in range(n)]
        for pg in pages:
            self._ref[pg] = 1
        return pages

    @staticmethod
    def _chain_digests(toks: list[int], n_pages: int) -> list[bytes]:
        """Position-chained page digests: digest i commits to ALL tokens
        up to page i's end, so equal digests mean equal full prefixes."""
        import hashlib

        out: list[bytes] = []
        h = b""
        for i in range(n_pages):
            page = np.asarray(toks[i * PAGE:(i + 1) * PAGE], np.int32)
            h = hashlib.sha1(h + page.tobytes()).digest()
            out.append(h)
        return out

    def _push_table(self):
        table = jnp.asarray(self._table)
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            table = jax.device_put(
                table, NamedSharding(self.mesh, P(None, None))
            )
        self.cache = PagedKVCache(self.cache.k, self.cache.v, table,
                                  self.cache.k_scale, self.cache.v_scale)

    def _trim_prompt(self, req: Request) -> list[int]:
        toks = req.prompt_tokens
        limit = min(self.seq_len - 1, self.max_pages * PAGE - 1)
        if len(toks) > limit:
            toks = toks[-limit:]
        return toks

    def _claim_pages(self, slot: int, req: Request, toks: list[int]) -> bool:
        """Allocate the prompt's pages up front; False leaves it queued.
        With prefix caching, leading full pages whose chained digest is
        registered are REUSED (refcounted, read-only) and only the rest
        allocate; the reused token count lands in self._reuse[slot]."""
        n_prompt_pages = -(-len(toks) // PAGE)  # ceil: only live pages
        if n_prompt_pages > self.n_pages - 1:
            # can NEVER fit this pool: fail instead of requeueing forever
            self.slots[slot] = req
            self._finish(slot, "error")
            return False
        reused: list[int] = []
        digests: list[bytes] = []
        if self._prefix_on:
            digests = self._chain_digests(toks, len(toks) // PAGE)
            # the LAST prompt token always recomputes (its logits seed
            # sampling), so at most (len-1)//PAGE pages can be reused
            for i in range((len(toks) - 1) // PAGE):
                pg = self._hash_page.get(digests[i])
                if pg is None:
                    break
                reused.append(pg)
        # PIN the reused pages BEFORE allocating: _alloc evicts ref-0
        # cached pages under pressure, and without the pin it could evict
        # and re-hand-out the very pages we are about to reuse — one
        # physical page mapped at two logical positions (corruption)
        for pg in reused:
            r = self._ref.get(pg, 0)
            self._ref[pg] = r + 1
            if r == 0 and self._page_hash.get(pg) in self._evictable:
                self._evictable.remove(self._page_hash[pg])
        pages = self._alloc(n_prompt_pages - len(reused))
        if pages is None:  # pool busy: leave queued for a later tick
            for pg in reused:  # unpin; retain as evictable cache again
                r = self._ref[pg] - 1
                self._ref[pg] = r
                dig = self._page_hash.get(pg)
                if r == 0 and dig is not None:
                    self._evictable.append(dig)
            self.pending.put(req)
            return False
        if reused:
            self.prefix_hits += 1
            self.prefix_tokens_reused += len(reused) * PAGE
        self._owned[slot] = reused + pages
        self._reuse[slot] = len(reused) * PAGE
        self._slot_digests[slot] = digests
        self.slots[slot] = req  # claimed before device work (crash recovery)
        return True

    # -- chunked admission: chunks accumulate into a per-slot dense scratch
    #    cache (attention inside a chunk must see the earlier chunks' KV),
    #    which scatters into the page pool once the whole prompt is in ------

    def _claim_for_prefill(self, slot: int, req: Request):
        toks = self._trim_prompt(req)
        if not self._claim_pages(slot, req, toks):
            return
        # prefix-cache hits skip straight past the reused pages: the
        # chunk loop starts at the first non-reused position (the reused
        # pages' KV is already in the pool and attention sees it through
        # slot_pages)
        reuse = self._reuse.get(slot, 0)
        self._prefilling[slot] = (toks, reuse)
        if self._draft_cache is not None and reuse:
            # the draft model has no pages to reuse: teacher-force the
            # reused prefix through it so its cache covers the whole prompt
            self._draft_prefill(slot, toks[:reuse], 0)
        if not self._direct_prefill:
            self._scratch[slot] = KVCache.create(
                self.cfg, 1, _bucket(len(toks), PAGE), self.kv_dtype,
                lane_pad=self.kv_lane_pad,
            )
        self.pos = self.pos.copy()
        self.pos[slot] = 0  # table row stays 0: garbage decode writes land
        # on the shared scratch page, never on owned pages

    def _prefill_chunk_device(self, slot: int, chunk: list[int], filled: int):
        if self._draft_cache is not None:  # two-model: draft KV in lockstep
            self._draft_prefill(slot, chunk, filled)
        if self._direct_prefill:
            # chunk -> c_pages pool pages, written in-step; the slot's
            # page list travels out of band (NOT cache.table: idle decode
            # writes must keep landing on the scratch page). Ragged tail
            # chunks bucket c_pages pow2 so compile count stays log.
            c_pages = min(_bucket(-(-len(chunk) // PAGE), 1),
                          self.prefill_chunk // PAGE)
            padded = np.zeros((1, c_pages * PAGE), np.int32)
            padded[0, : len(chunk)] = chunk
            n_ctx = _bucket(filled // PAGE + c_pages, 1)
            pages = np.zeros(n_ctx, np.int32)
            live = self._owned[slot][: n_ctx]
            pages[: len(live)] = live
            logits, self.cache = paged_prefill_chunk(
                self.weights, self.cache, jnp.asarray(padded),
                jnp.int32(filled), jnp.asarray(pages),
                self.cfg, self.compute_dtype, n_ctx, c_pages,
            )
            return logits
        scratch = self._scratch[slot]
        t_pad = min(_bucket(len(chunk)), scratch.seq_len - filled)
        padded = np.zeros((1, t_pad), np.int32)
        padded[0, : len(chunk)] = chunk
        logits, self._scratch[slot] = self._prefill_jit(
            self.weights, scratch, jnp.asarray(padded),
            jnp.asarray([filled], jnp.int32),
        )
        return logits

    def _prefill_complete(self, slot: int):
        pages = self._owned[slot]
        self._table[slot, :] = 0
        self._table[slot, : len(pages)] = pages
        if self._direct_prefill:
            self._push_table()  # KV already lives in the pages
            if self._prefix_on:
                # register this prompt's FULL pages (their KV is final:
                # decode writes start past them) so later identical
                # prefixes reuse; first registration of a digest wins
                for i, dig in enumerate(self._slot_digests.pop(slot, [])):
                    pg = pages[i]
                    if dig not in self._hash_page and pg not in self._page_hash:
                        self._hash_page[dig] = pg
                        self._page_hash[pg] = dig
            return
        dense = self._scratch.pop(slot)
        self.cache = _scatter_prefill(
            self.cache, dense, jnp.asarray(np.asarray(pages, np.int32)),
            len(pages),
        )
        self._push_table()

    # -- legacy synchronous admission --------------------------------------

    def _prefill_into(self, slot: int, req: Request):
        toks = self._trim_prompt(req)
        if not self._claim_pages(slot, req, toks):
            return
        if self._draft_cache is not None:
            self._draft_prefill(slot, toks, 0)
        pages = self._owned[slot]
        n_prompt_pages = len(pages)

        # dense prefill on a scratch cache (jitted), then scatter the live
        # pages into the pool
        t_pad = _bucket(len(toks), PAGE)
        padded = np.zeros((1, t_pad), np.int32)
        padded[0, : len(toks)] = toks
        dense = KVCache.create(self.cfg, 1, t_pad, self.kv_dtype,
                               lane_pad=self.kv_lane_pad)
        logits, dense = self._prefill_jit(
            self.weights, dense, jnp.asarray(padded), jnp.zeros(1, jnp.int32)
        )
        self._table[slot, :] = 0
        self._table[slot, :n_prompt_pages] = pages
        self.cache = _scatter_prefill(
            self.cache, dense, jnp.asarray(np.asarray(pages, np.int32)),
            n_prompt_pages,
        )
        self._push_table()
        self._key, sub = jax.random.split(self._key)
        self._set_slot_bias(slot, req)
        first, first_lp = sample_batch(
            logits[:, len(toks) - 1], sub,
            jnp.asarray([req.temperature], jnp.float32),
            jnp.asarray([req.topp], jnp.float32),
            logit_bias=self._bias()[slot][None] if req.logit_bias else None,
            with_logprobs=True,
        )
        self.pos = self.pos.copy()
        self.cur_tok = self.cur_tok.copy()
        self.temp = self.temp.copy()
        self.topp = self.topp.copy()
        self.pos[slot] = len(toks)
        self.temp[slot] = req.temperature
        self.topp[slot] = req.topp
        self._deliver_first(slot, req, first, first_lp)

    def _ensure_pages(self, active: list, horizon: int) -> bool:
        """Pre-allocate every page the next `horizon` positions can touch
        for each active slot, preempting the youngest under pool pressure
        (recompute later; older requests keep making progress, which
        guarantees the preemption cascade terminates). Mutates `active`
        in place; False when no active slot survives."""
        dirty = False
        for i in list(active):  # copy: preemption below mutates membership
            if i not in active:
                continue  # preempted as a victim of an earlier slot's alloc
            # clamp at the table width: a slot at the seq_len edge finishes
            # via _deliver's length check before touching pages beyond it
            need = min((int(self.pos[i]) + horizon - 1) // PAGE + 1,
                       self.max_pages)
            while len(self._owned[i]) < need:
                new = self._alloc(1)
                if new is None:
                    victim = max(active,
                                 key=lambda j: self.slots[j].request_id)
                    self._preempt(victim)
                    active.remove(victim)
                    dirty = True
                    if victim == i:
                        break
                    continue
                self._table[i, len(self._owned[i])] = new[0]
                self._owned[i].extend(new)
                dirty = True
        if dirty:
            self._push_table()
        return bool(active)

    def _spec_prepare(self, active, K: int) -> bool:
        """Speculative tick hook: the verify writes K+1 positions per
        active slot; allocate their pages first (preempting if needed)."""
        return self._ensure_pages(active, K + 1)

    def _run_spec_scan(self, hist, active_m, eligible, rounds: int,
                       K: int, pmax: int):
        """Paged device half of the fused multi-round tick: the scan's
        verifies write through the block table (_paged_spec_scan); pages
        for the whole rounds*(K+1) horizon were pre-allocated by
        _spec_prepare before this runs."""
        self._key, sub = jax.random.split(self._key)
        horizon = pmax + rounds * (K + 1)
        need = -(-horizon // PAGE)
        n_ctx = 1
        while n_ctx < need:
            n_ctx *= 2
        n_ctx = min(n_ctx, self.max_pages)
        win = min(_bucket(horizon, 128), self.seq_len)
        two = self._draft_w is not None
        outs, counts, lp, self.cache, dcache = _paged_spec_scan(
            self.weights, self.cache, jnp.asarray(hist),
            jnp.asarray(self.cur_tok), jnp.asarray(self.pos),
            jnp.asarray(active_m), jnp.asarray(eligible), sub,
            jnp.asarray(self.temp), jnp.asarray(self.topp),
            jnp.asarray(self.minp), jnp.asarray(self.recent),
            jnp.asarray(self.rep_pen), jnp.asarray(self.freq_pen),
            jnp.asarray(self.pres_pen), self._bias(),
            self._draft_w, self._draft_cache,
            rounds, K, self.cfg, self.compute_dtype,
            dcfg=self._draft_cfg, two_model=two,
            n_ctx_pages=n_ctx, attn_window=win,
        )
        if two:
            self._draft_cache = dcache
        return outs, counts, lp

    def _spec_verify(self, tokens_in, key):
        need = -(-(int(self.pos.max()) + tokens_in.shape[1]) // PAGE)
        n_ctx = 1
        while n_ctx < need:
            n_ctx *= 2
        n_ctx = min(n_ctx, self.max_pages)
        out, nxt, lp, self.cache = paged_verify_step(
            self.weights, self.cache, jnp.asarray(tokens_in),
            jnp.asarray(self.pos), key,
            jnp.asarray(self.temp), jnp.asarray(self.topp),
            jnp.asarray(self.minp), jnp.asarray(self.recent),
            jnp.asarray(self.rep_pen), jnp.asarray(self.freq_pen),
            jnp.asarray(self.pres_pen), self._bias(),
            self.cfg, self.compute_dtype, n_ctx_pages=n_ctx,
        )
        return out, nxt, lp

    def step(self, multi: int = 1) -> int:
        self._admit()
        self._prefill_tick()
        active = [
            i for i, r in enumerate(self.slots)
            if r is not None and i not in self._prefilling
        ]
        if not active:
            return sum(r is not None for r in self.slots)
        snapshot = list(self.slots)
        pos0 = self.pos
        # cap the scan at the seq_len edge (see ServingEngine.step): an
        # in-scan position past max_pages*PAGE would clamp to the slot's
        # LAST page and overwrite its live KV history mid-scan
        pmax = int(max(pos0[i] for i in active))
        multi = max(1, min(multi, self.seq_len - 1 - pmax))

        if self.speculative:
            n = None
            if multi > 1 and self.spec_fused:
                n = self._spec_scan_tick(active, snapshot, pos0, pmax, multi)
            if n is None and active:
                n = self._spec_tick(active, snapshot, pos0, pmax)
            if n is not None:
                return n
            if not active:  # _spec_prepare preempted every active slot
                return sum(r is not None for r in self.slots)

        if not self._ensure_pages(active, multi):
            return sum(r is not None for r in self.slots)

        self._key, sub = jax.random.split(self._key)
        args = (
            self.weights, self.cache,
            jnp.asarray(self.cur_tok), jnp.asarray(self.pos), sub,
            jnp.asarray(self.temp), jnp.asarray(self.topp),
            jnp.asarray(self.minp), jnp.asarray(self.recent),
            jnp.asarray(self.rep_pen), jnp.asarray(self.freq_pen),
            jnp.asarray(self.pres_pen), self._bias(),
        )
        if multi == 1:
            nxt, lp, self.cache = paged_decode_step(
                *args, self.cfg, self.compute_dtype
            )
            toks = np.asarray(nxt)[:, None]
            lp = tuple(a[:, None] for a in lp)
        else:
            toks, lp, self.cache = paged_decode_scan(
                *args, multi, self.cfg, self.compute_dtype
            )
            toks = np.asarray(toks)
        if self._draft_cache is not None:
            # teacher-force the plain tick's tokens into the (dense) draft
            # cache — same gap-avoidance as ServingEngine.step
            from .engine import _draft_sync

            inputs = np.concatenate([self.cur_tok[:, None], toks[:, :-1]],
                                    axis=1)
            win = min(_bucket(int(self.pos.max()) + multi, 128), self.seq_len)
            self._draft_cache = _draft_sync(
                self._draft_w, self._draft_cache, jnp.asarray(inputs),
                jnp.asarray(self.pos), self._draft_cfg, self._draft_dtype,
                attn_window=win,
            )
        if any(snapshot[i] is not None and snapshot[i].logprobs is not None
               for i in active):
            tok_lp, top_lp, top_id = (np.asarray(a) for a in lp)
        else:
            tok_lp = top_lp = top_id = None
        active_set = set(active)
        self.pos = self.pos + np.asarray(
            [multi if i in active_set else 0 for i in range(self.n_slots)],
            np.int32,
        )
        self.steps += multi
        self.tokens_generated += len(active) * multi
        if self._started is None:
            import time

            self._started = time.monotonic()
        for j in range(multi):
            for i in active:
                if self.slots[i] is not snapshot[i]:
                    continue
                self._deliver(
                    i, int(toks[i, j]), pos_after=int(pos0[i]) + j + 1,
                    logprob=None if tok_lp is None else float(tok_lp[i, j]),
                    top=None if top_id is None else (top_id[i, j], top_lp[i, j]),
                )
        return sum(r is not None for r in self.slots)

    def _release_pages(self, slot: int):
        for pg in self._owned[slot]:
            r = self._ref.get(pg, 1) - 1
            self._ref[pg] = r
            if r > 0:
                continue  # still shared with another live slot
            dig = self._page_hash.get(pg)
            if dig is not None:
                # registered prompt page: RETAIN as evictable cache so a
                # later identical prefix still hits (freed under pressure)
                self._evictable.append(dig)
            else:
                self._free.append(pg)
        self._owned[slot] = []
        self._scratch.pop(slot, None)
        self._slot_digests.pop(slot, None)
        self._reuse.pop(slot, None)
        # reset the row to the scratch page: the idle slot keeps stepping
        # and must never scatter into a page that gets reallocated
        self._table[slot, :] = 0
        self._push_table()

    def _finish(self, slot: int, reason: str):
        self._release_pages(slot)
        super()._finish(slot, reason)

    def _preempt(self, slot: int):
        """Recompute-style preemption (the vLLM policy): under pool
        pressure, a running request releases its pages and goes back to
        the pending queue with its generated tokens folded into the
        prompt, so a later admission re-prefills (prefix-cache-assisted
        when its registered pages survive) and decoding continues exactly
        where it stopped. The request object, its stream, and its output
        accumulate seamlessly across the preemption."""
        req = self.slots[slot]
        self._release_pages(slot)
        self._clear_slot(slot)
        # idempotent across repeated preemptions: always rebuild from the
        # ORIGINAL prompt + everything generated so far
        orig = getattr(req, "_orig_prompt", None)
        if orig is None:
            orig = list(req.prompt_tokens)
            req._orig_prompt = orig
        req.prompt_tokens = orig + list(req.output_tokens)
        self.preemptions += 1
        self.pending.put(req)
