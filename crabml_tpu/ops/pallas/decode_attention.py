"""Decode attention with manual, length-gated KV DMA.

For T=1 decode the XLA path (and the BlockSpec-driven flash kernel) must
fetch the cache up to a STATIC bound — best case a power-of-two window over
the max sequence length in the batch. This kernel instead keeps K/V in HBM
(memory_space=ANY) and issues its own chunk DMAs inside the kernel, so each
sequence reads exactly ceil(len_b / BK) chunks: heterogeneous-length
serving batches stop paying for their longest member, and nothing
recompiles as contexts grow.

Structure (the paged-attention recipe from jax's pallas ops, with a
contiguous per-sequence cache instead of page tables — our serving layer
allocates whole-slot regions, so the "page table" is the identity):
  grid (B, KV): one step per sequence x kv head, all G q-heads of the
  group computed together (GQA grid-native, like flash_attention.py).
  Inside: fori_loop over live chunks with DOUBLE-BUFFERED
  pltpu.make_async_copy — chunk i+1's DMA is in flight while chunk i runs
  the online-softmax update. Lengths arrive via scalar prefetch.

Reference baseline: crabml materializes every score against the full
cache each step (batch_matmul.rs:97-123) — no length gating at all.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
BK = 128  # tokens per DMA chunk (matches the 128-token window buckets)
MAX_T = 8  # widest q the kernel takes per step: decode (T=1) and the
#            speculative verify's K+1 tokens; prefill widths ride flash/XLA


def _kernel(*refs, scale: float, quantized: bool, paged: bool,
            softcap: float, t_new: int = 1):
    if paged and quantized:
        # int8 page pools carry per-(page-slot, head) scale pools that DMA
        # through the table exactly like the payload pages
        (len_ref, win_ref, table_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm,
         o_ref, k_buf, v_buf, ks_buf, vs_buf, sem_k, sem_v, sem_ks,
         sem_vs) = refs
    elif paged:
        # page-table indirection: chunk i of sequence b lives in physical
        # page table[b, i] of a (n_pages, KV, BK, hd) pool
        (len_ref, win_ref, table_ref, q_ref, k_hbm, v_hbm, o_ref,
         k_buf, v_buf, sem_k, sem_v) = refs
        ks_buf = vs_buf = None
    elif quantized:
        (len_ref, win_ref, q_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         k_buf, v_buf, ks_buf, vs_buf, sem_k, sem_v, sem_ks, sem_vs) = refs
    else:
        (len_ref, win_ref, q_ref, k_hbm, v_hbm, o_ref,
         k_buf, v_buf, sem_k, sem_v) = refs
        ks_buf = vs_buf = None
    b = pl.program_id(0)
    kv = pl.program_id(1)
    length = len_ref[b]
    # sliding window (gemma2): only cols >= own_pos + 1 - win are visible,
    # so whole leading chunks are SKIPPED (win=0 disables; traced because
    # alternating local/global layers toggle it per scan step). With
    # t_new > 1 (speculative verify: q carries T tokens whose KV is
    # already written at length-T..length-1) the EARLIEST row's window
    # start bounds the skip: row t's own position is length - t_new + t.
    win = win_ref[0]
    first = jnp.where(
        win > 0,
        jax.lax.div(jnp.maximum(length - (t_new - 1) - win, 0), BK),
        0,
    )
    n_chunks = jax.lax.div(length + BK - 1, BK)

    def copy_in(i, slot):
        if paged:
            page = table_ref[b, i]
            pltpu.make_async_copy(
                k_hbm.at[page, kv], k_buf.at[slot], sem_k.at[slot]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[page, kv], v_buf.at[slot], sem_v.at[slot]
            ).start()
            if quantized:  # scale pools: (n_pages, KV, 1, BK) lane-major
                pltpu.make_async_copy(
                    ks_hbm.at[page, kv], ks_buf.at[slot], sem_ks.at[slot]
                ).start()
                pltpu.make_async_copy(
                    vs_hbm.at[page, kv], vs_buf.at[slot], sem_vs.at[slot]
                ).start()
            return
        pltpu.make_async_copy(
            k_hbm.at[b, kv, pl.ds(i * BK, BK)], k_buf.at[slot], sem_k.at[slot]
        ).start()
        pltpu.make_async_copy(
            v_hbm.at[b, kv, pl.ds(i * BK, BK)], v_buf.at[slot], sem_v.at[slot]
        ).start()
        if quantized:  # scales are (B, KV, 1, S): (1, BK) lane-major tiles
            pltpu.make_async_copy(
                ks_hbm.at[b, kv, :, pl.ds(i * BK, BK)], ks_buf.at[slot], sem_ks.at[slot]
            ).start()
            pltpu.make_async_copy(
                vs_hbm.at[b, kv, :, pl.ds(i * BK, BK)], vs_buf.at[slot], sem_vs.at[slot]
            ).start()

    @pl.when(n_chunks > 0)
    def _run():
        copy_in(first, jax.lax.rem(first, 2))
        q = q_ref[0, 0].astype(jnp.float32) * scale  # (T*G, hd)
        TG = q.shape[0]
        G = TG // t_new
        # row r holds query token t = r // G (t_new > 1: verify rows);
        # its own absolute position is length - t_new + (r // G)
        row_pos = (
            length - t_new
            + jax.lax.div(
                jax.lax.broadcasted_iota(jnp.int32, (TG, BK), 0), G
            )
        )  # (TG, BK), constant along lanes

        def body(i, carry):
            m, l, acc = carry
            slot = jax.lax.rem(i, 2)

            @pl.when(i + 1 < n_chunks)
            def _prefetch():
                copy_in(i + 1, jax.lax.rem(i + 1, 2))

            if paged:
                pltpu.make_async_copy(
                    k_hbm.at[0, kv], k_buf.at[slot], sem_k.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[0, kv], v_buf.at[slot], sem_v.at[slot]
                ).wait()
                if quantized:
                    pltpu.make_async_copy(
                        ks_hbm.at[0, kv], ks_buf.at[slot], sem_ks.at[slot]
                    ).wait()
                    pltpu.make_async_copy(
                        vs_hbm.at[0, kv], vs_buf.at[slot], sem_vs.at[slot]
                    ).wait()
            else:
                pltpu.make_async_copy(
                    k_hbm.at[b, kv, pl.ds(0, BK)], k_buf.at[slot], sem_k.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    v_hbm.at[b, kv, pl.ds(0, BK)], v_buf.at[slot], sem_v.at[slot]
                ).wait()

            k = k_buf[slot]  # (BK, hd)
            v = v_buf[slot]
            if quantized and not paged:
                pltpu.make_async_copy(
                    ks_hbm.at[b, kv, :, pl.ds(0, BK)], ks_buf.at[slot], sem_ks.at[slot]
                ).wait()
                pltpu.make_async_copy(
                    vs_hbm.at[b, kv, :, pl.ds(0, BK)], vs_buf.at[slot], sem_vs.at[slot]
                ).wait()
            # f32 operands need an explicit multi-pass MXU precision — the
            # TPU default is single-pass bf16 even for f32 inputs. Key on
            # the ACTUAL dot operand dtypes: q is cast to f32 above, so any
            # f32 q/cache (or the int8 dequant, also f32) needs HIGHEST.
            prec = (
                jax.lax.Precision.HIGHEST
                if q_ref.dtype == jnp.float32
                or k_buf.dtype == jnp.float32
                or quantized
                else None
            )
            s = jax.lax.dot_general(
                q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )  # (G, BK)
            if quantized:
                # int8 cache: per-token scales fold into the score COLUMNS
                # (s = q . k_i8 * ks[col]) — a lane-dim broadcast, so the
                # int8 payload feeds the dot untouched and no (BK, 1)
                # sublane tile or transpose is ever needed
                s = s * ks_buf[slot]  # (1, BK) broadcast over G
            if softcap:  # gemma2: cap*tanh(s/cap) BEFORE masking
                s = softcap * jnp.tanh(s / softcap)
            col = i * BK + jax.lax.broadcasted_iota(jnp.int32, (TG, BK), 1)
            live = col <= row_pos  # causal per row (col < length at T=1)
            live &= (win == 0) | (col > row_pos - win)
            s = jnp.where(live, s, NEG_INF)

            m_new = jnp.maximum(m, s.max(axis=1, keepdims=True))
            alpha = jnp.exp(m - m_new)
            p = jnp.exp(s - m_new)
            p = jnp.where(live, p, 0.0)
            l = l * alpha + p.sum(axis=1, keepdims=True)
            if quantized:  # fold V's per-token scale into the probs
                p = p * vs_buf[slot]
            acc = acc * alpha + jax.lax.dot_general(
                p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            return jnp.broadcast_to(m_new, m.shape), l, acc

        hd = q.shape[-1]
        m0 = jnp.full((TG, 1), NEG_INF, jnp.float32)
        l0 = jnp.zeros((TG, 1), jnp.float32)
        acc0 = jnp.zeros((TG, hd), jnp.float32)
        m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))
        o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "t_new"))
def _run(q, k_cache, v_cache, lengths, win, scale: float, k_scale=None,
         v_scale=None, softcap: float = 0.0, t_new: int = 1):
    B, KV, G, hd = q.shape  # G = t_new * q_heads_per_kv (rows per grid step)
    quantized = k_scale is not None
    grid = (B, KV)
    in_specs = [
        pl.BlockSpec((1, 1, G, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
        pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
    ]
    scratch = [
        pltpu.VMEM((2, BK, hd), k_cache.dtype),
        pltpu.VMEM((2, BK, hd), v_cache.dtype),
    ]
    args = [lengths.astype(jnp.int32), win, q, k_cache, v_cache]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # k scales (B, KV, S, 1)
            pl.BlockSpec(memory_space=pl.ANY),  # v scales
        ]
        scratch += [
            pltpu.VMEM((2, 1, BK), jnp.float32),
            pltpu.VMEM((2, 1, BK), jnp.float32),
        ]
        # (B, KV, S, 1) -> (B, KV, 1, S): identical element order (free
        # reshape), but the chunk slice becomes a lane-major (1, BK) tile
        args += [
            k_scale.reshape(k_scale.shape[:2] + (1, -1)),
            v_scale.reshape(v_scale.shape[:2] + (1, -1)),
        ]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (4 if quantized else 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lengths + sliding window
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_kernel, scale=scale, quantized=quantized,
                               paged=False, softcap=softcap, t_new=t_new)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


@functools.partial(jax.jit, static_argnames=("scale", "softcap", "t_new"))
def _run_paged(q, k_pages, v_pages, page_table, lengths, win, scale: float,
               k_scale=None, v_scale=None, softcap: float = 0.0,
               t_new: int = 1):
    B, KV, G, hd = q.shape  # G = t_new * q_heads_per_kv (rows per grid step)
    quantized = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, 1, G, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        pl.BlockSpec(memory_space=pl.ANY),
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    scratch = [
        pltpu.VMEM((2, BK, hd), k_pages.dtype),
        pltpu.VMEM((2, BK, hd), v_pages.dtype),
    ]
    args = [lengths.astype(jnp.int32), win, page_table.astype(jnp.int32),
            q, k_pages, v_pages]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # k scale pool
            pl.BlockSpec(memory_space=pl.ANY),  # v scale pool
        ]
        scratch += [
            pltpu.VMEM((2, 1, BK), jnp.float32),
            pltpu.VMEM((2, 1, BK), jnp.float32),
        ]
        # (n_pages, KV, BK, 1) -> (n_pages, KV, 1, BK): same element order
        # (free reshape); the page chunk becomes a lane-major (1, BK) tile
        args += [
            k_scale.reshape(k_scale.shape[:2] + (1, -1)),
            v_scale.reshape(v_scale.shape[:2] + (1, -1)),
        ]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (4 if quantized else 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # lengths + sliding window + page table
        grid=(B, KV),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, G, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_kernel, scale=scale, quantized=quantized,
                               paged=True, softcap=softcap, t_new=t_new)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, hd), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _kernel_fused(*refs, scale: float, quantized: bool, softcap: float,
                  t_new: int, paged: bool = False):
    """Stacked-cache decode attention with the NEW tokens as a VMEM block.

    The cache keeps its full (L, B, KV, S, hd) shape in HBM and the layer
    is a prefetched scalar, so the layer scan never slices (= copies) the
    cache; the step's new k/v arrive as a separate (T, hd) block and join
    the online softmax in-register, so attention runs BEFORE the cache
    write — forward() batches all layers' writes into one small scatter
    after the scan. This is what closed the B=32 serving glue gap
    (VERDICT r4 #1): the old path streamed the whole cache through the
    scan's xs->ys every step (~20 ms at B=32 S=512 bf16)."""
    if paged and quantized:
        (layer_ref, len_ref, win_ref, table_ref, q_ref, kn_ref, vn_ref,
         ksn_ref, vsn_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         k_buf, v_buf, ks_buf, vs_buf, sem_k, sem_v, sem_ks, sem_vs) = refs
    elif paged:
        (layer_ref, len_ref, win_ref, table_ref, q_ref, kn_ref, vn_ref,
         k_hbm, v_hbm, o_ref, k_buf, v_buf, sem_k, sem_v) = refs
        ks_buf = vs_buf = None
    elif quantized:
        (layer_ref, len_ref, win_ref, q_ref, kn_ref, vn_ref, ksn_ref,
         vsn_ref, k_hbm, v_hbm, ks_hbm, vs_hbm, o_ref,
         k_buf, v_buf, ks_buf, vs_buf, sem_k, sem_v, sem_ks, sem_vs) = refs
    else:
        (layer_ref, len_ref, win_ref, q_ref, kn_ref, vn_ref,
         k_hbm, v_hbm, o_ref, k_buf, v_buf, sem_k, sem_v) = refs
        ks_buf = vs_buf = None
    lyr = layer_ref[0]
    b = pl.program_id(0)
    kv = pl.program_id(1)
    prefix = len_ref[b]  # valid cache cols BEFORE this step's tokens
    win = win_ref[0]
    # rows span absolute positions prefix..prefix+T-1; the earliest row's
    # window start bounds the chunk skip (win=0 disables)
    first = jnp.where(
        win > 0, jax.lax.div(jnp.maximum(prefix + 1 - win, 0), BK), 0
    )
    n_chunks = jax.lax.div(prefix + BK - 1, BK)

    def copy_in(i, slot):
        if paged:  # chunk i of sequence b lives in physical page table[b,i]
            page = table_ref[b, i]
            pltpu.make_async_copy(
                k_hbm.at[lyr, page, kv], k_buf.at[slot], sem_k.at[slot]
            ).start()
            pltpu.make_async_copy(
                v_hbm.at[lyr, page, kv], v_buf.at[slot], sem_v.at[slot]
            ).start()
            if quantized:  # scale pools viewed (L, n_pages, KV, 1, PAGE)
                pltpu.make_async_copy(
                    ks_hbm.at[lyr, page, kv], ks_buf.at[slot], sem_ks.at[slot]
                ).start()
                pltpu.make_async_copy(
                    vs_hbm.at[lyr, page, kv], vs_buf.at[slot], sem_vs.at[slot]
                ).start()
            return
        pltpu.make_async_copy(
            k_hbm.at[lyr, b, kv, pl.ds(i * BK, BK)], k_buf.at[slot],
            sem_k.at[slot]).start()
        pltpu.make_async_copy(
            v_hbm.at[lyr, b, kv, pl.ds(i * BK, BK)], v_buf.at[slot],
            sem_v.at[slot]).start()
        if quantized:  # scales are (L, B, KV, 1, S): (1, BK) lane tiles
            pltpu.make_async_copy(
                ks_hbm.at[lyr, b, kv, :, pl.ds(i * BK, BK)], ks_buf.at[slot],
                sem_ks.at[slot]).start()
            pltpu.make_async_copy(
                vs_hbm.at[lyr, b, kv, :, pl.ds(i * BK, BK)], vs_buf.at[slot],
                sem_vs.at[slot]).start()

    q = q_ref[0, 0].astype(jnp.float32) * scale  # (TG, hd)
    TG, hd = q.shape
    G = TG // t_new
    prec = (
        jax.lax.Precision.HIGHEST
        if q_ref.dtype == jnp.float32 or k_buf.dtype == jnp.float32
        or quantized
        else None
    )
    # row r is query token t = r // G at absolute position prefix + t
    row_t = jax.lax.div(jax.lax.broadcasted_iota(jnp.int32, (TG, BK), 0), G)

    m0 = jnp.full((TG, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((TG, 1), jnp.float32)
    acc0 = jnp.zeros((TG, hd), jnp.float32)

    def body(i, carry):
        m, l, acc = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _prefetch():
            copy_in(i + 1, jax.lax.rem(i + 1, 2))

        if paged:
            pltpu.make_async_copy(
                k_hbm.at[0, 0, kv], k_buf.at[slot], sem_k.at[slot]).wait()
            pltpu.make_async_copy(
                v_hbm.at[0, 0, kv], v_buf.at[slot], sem_v.at[slot]).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_hbm.at[0, 0, kv], ks_buf.at[slot],
                    sem_ks.at[slot]).wait()
                pltpu.make_async_copy(
                    vs_hbm.at[0, 0, kv], vs_buf.at[slot],
                    sem_vs.at[slot]).wait()
        else:
            pltpu.make_async_copy(
                k_hbm.at[lyr, b, kv, pl.ds(0, BK)], k_buf.at[slot],
                sem_k.at[slot]).wait()
            pltpu.make_async_copy(
                v_hbm.at[lyr, b, kv, pl.ds(0, BK)], v_buf.at[slot],
                sem_v.at[slot]).wait()
            if quantized:
                pltpu.make_async_copy(
                    ks_hbm.at[lyr, b, kv, :, pl.ds(0, BK)], ks_buf.at[slot],
                    sem_ks.at[slot]).wait()
                pltpu.make_async_copy(
                    vs_hbm.at[lyr, b, kv, :, pl.ds(0, BK)], vs_buf.at[slot],
                    sem_vs.at[slot]).wait()
        k = k_buf[slot]
        v = v_buf[slot]
        s = jax.lax.dot_general(
            q, k.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )  # (TG, BK)
        if quantized:
            s = s * ks_buf[slot]  # (1, BK) broadcast over rows
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        col = i * BK + jax.lax.broadcasted_iota(jnp.int32, (TG, BK), 1)
        # prefix cols are all causally visible (col < prefix <= row pos);
        # only validity (col < prefix) and the sliding window mask apply
        live = col < prefix
        live &= (win == 0) | (col > prefix + row_t - win)
        s = jnp.where(live, s, NEG_INF)
        m_new = jnp.maximum(m, s.max(axis=1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        p = jnp.where(live, p, 0.0)
        l = l * alpha + p.sum(axis=1, keepdims=True)
        if quantized:
            p = p * vs_buf[slot]
        acc = acc * alpha + jax.lax.dot_general(
            p, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        return jnp.broadcast_to(m_new, m.shape), l, acc

    @pl.when(n_chunks > 0)
    def _start():
        copy_in(first, jax.lax.rem(first, 2))

    m, l, acc = jax.lax.fori_loop(first, n_chunks, body, (m0, l0, acc0))

    # the step's own T tokens: already in VMEM, never round-trip the cache
    kn = kn_ref[0, 0]  # (T, hd)
    vn = vn_ref[0, 0]
    sn = jax.lax.dot_general(
        q, kn.astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # (TG, T)
    if quantized:
        sn = sn * ksn_ref[0, 0]  # (1, T)
    if softcap:
        sn = softcap * jnp.tanh(sn / softcap)
    tcol = jax.lax.broadcasted_iota(jnp.int32, (TG, t_new), 1)
    trow = jax.lax.div(
        jax.lax.broadcasted_iota(jnp.int32, (TG, t_new), 0), G)
    live_n = tcol <= trow  # causal within the new block
    live_n &= (win == 0) | (tcol > trow - win)
    sn = jnp.where(live_n, sn, NEG_INF)
    m_new = jnp.maximum(m, sn.max(axis=1, keepdims=True))
    alpha = jnp.exp(m - m_new)
    pn = jnp.exp(sn - m_new)
    pn = jnp.where(live_n, pn, 0.0)
    l = l * alpha + pn.sum(axis=1, keepdims=True)
    if quantized:
        pn = pn * vsn_ref[0, 0]
    acc = acc * alpha + jax.lax.dot_general(
        pn, vn.astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    o_ref[0, 0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("scale", "softcap", "t_new"))
def _run_fused(q, k_cache, v_cache, k_new, v_new, layer, lengths, win,
               scale: float, k_scale=None, v_scale=None, ks_new=None,
               vs_new=None, softcap: float = 0.0, t_new: int = 1):
    B, KV, TG, hd = q.shape
    quantized = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, 1, TG, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        pl.BlockSpec((1, 1, t_new, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        pl.BlockSpec((1, 1, t_new, hd), lambda b, kv, *_: (b, kv, 0, 0)),
    ]
    args = [jnp.asarray(layer, jnp.int32).reshape(1),
            lengths.astype(jnp.int32), win, q, k_new, v_new]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, 1, t_new), lambda b, kv, *_: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, 1, t_new), lambda b, kv, *_: (b, kv, 0, 0)),
        ]
        args += [ks_new, vs_new]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),  # K cache (L, B, KV, S, hd)
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args += [k_cache, v_cache]
    scratch = [
        pltpu.VMEM((2, BK, hd), k_cache.dtype),
        pltpu.VMEM((2, BK, hd), v_cache.dtype),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # (L, B, KV, 1, S)
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args += [
            k_scale.reshape(k_scale.shape[:3] + (1, -1)),
            v_scale.reshape(v_scale.shape[:3] + (1, -1)),
        ]
        scratch += [
            pltpu.VMEM((2, 1, BK), jnp.float32),
            pltpu.VMEM((2, 1, BK), jnp.float32),
        ]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (4 if quantized else 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # layer + lengths + sliding window
        grid=(B, KV),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, TG, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_kernel_fused, scale=scale,
                               quantized=quantized, softcap=softcap,
                               t_new=t_new)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, KV, TG, hd), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


@functools.partial(jax.jit,
                   static_argnames=("scale", "softcap", "t_new"))
def _run_fused_paged(q, k_pages, v_pages, k_new, v_new, table, layer,
                     lengths, win, scale: float, k_scale=None, v_scale=None,
                     ks_new=None, vs_new=None, softcap: float = 0.0,
                     t_new: int = 1):
    B, KV, TG, hd = q.shape
    quantized = k_scale is not None
    in_specs = [
        pl.BlockSpec((1, 1, TG, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        pl.BlockSpec((1, 1, t_new, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        pl.BlockSpec((1, 1, t_new, hd), lambda b, kv, *_: (b, kv, 0, 0)),
    ]
    args = [jnp.asarray(layer, jnp.int32).reshape(1),
            lengths.astype(jnp.int32), win, table.astype(jnp.int32),
            q, k_new, v_new]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, 1, 1, t_new), lambda b, kv, *_: (b, kv, 0, 0)),
            pl.BlockSpec((1, 1, 1, t_new), lambda b, kv, *_: (b, kv, 0, 0)),
        ]
        args += [ks_new, vs_new]
    in_specs += [
        pl.BlockSpec(memory_space=pl.ANY),  # K pool (L, n_pages, KV, PAGE, hd)
        pl.BlockSpec(memory_space=pl.ANY),
    ]
    args += [k_pages, v_pages]
    scratch = [
        pltpu.VMEM((2, BK, hd), k_pages.dtype),
        pltpu.VMEM((2, BK, hd), v_pages.dtype),
    ]
    if quantized:
        in_specs += [
            pl.BlockSpec(memory_space=pl.ANY),  # (L, n_pages, KV, 1, PAGE)
            pl.BlockSpec(memory_space=pl.ANY),
        ]
        args += [
            k_scale.reshape(k_scale.shape[:3] + (1, -1)),
            v_scale.reshape(v_scale.shape[:3] + (1, -1)),
        ]
        scratch += [
            pltpu.VMEM((2, 1, BK), jnp.float32),
            pltpu.VMEM((2, 1, BK), jnp.float32),
        ]
    scratch += [pltpu.SemaphoreType.DMA((2,))] * (4 if quantized else 2)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # layer + lengths + sliding window + table
        grid=(B, KV),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 1, TG, hd), lambda b, kv, *_: (b, kv, 0, 0)),
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_kernel_fused, scale=scale,
                               quantized=quantized, softcap=softcap,
                               t_new=t_new, paged=True)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, KV, TG, hd), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def paged_decode_attention_fused(q, k_pages, v_pages, table, layer, pos,
                                 scale: float, k_new, v_new, k_scale=None,
                                 v_scale=None, ks_new=None, vs_new=None,
                                 softcap: float = 0.0, local_window=None):
    """Paged counterpart of decode_attention_fused: pools keep their full
    (L, n_pages, KV, PAGE, hd) shape (layer via prefetched scalar), the
    live prefix DMAs through the page table, and this step's tokens attend
    from VMEM — the caller writes them into the pool AFTER its layer scan
    (serving.paged._write_new_pages). pos (B,) counts tokens BEFORE this
    step. Returns (B, T, H*hd) or None when ineligible."""
    B, T, H, hd = q.shape
    KV = k_pages.shape[2]
    if (T > MAX_T or H % KV or hd % 128 or k_pages.shape[3] != BK):
        from ...utils import log_fallback

        log_fallback("paged_decode_attention_fused",
                     f"T={T} H={H} KV={KV} hd={hd} page={k_pages.shape[3]}")
        return None
    G = H // KV
    if T == 1:
        qg = q.reshape(B, KV, G, hd)
    else:
        qg = (q.reshape(B, T, KV, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, KV, T * G, hd))
    ksn = vsn = None
    if ks_new is not None:
        ksn = ks_new.reshape(B, KV, 1, T)
        vsn = vs_new.reshape(B, KV, 1, T)
    out = _run_fused_paged(qg, k_pages, v_pages, k_new, v_new, table, layer,
                           pos, _win_arr(local_window), scale, k_scale,
                           v_scale, ksn, vsn, float(softcap), t_new=T)
    if T == 1:
        return out.reshape(B, 1, H * hd)
    return (out.reshape(B, KV, T, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, T, H * hd))


def fused_decode_eligible(T: int, H: int, KV: int, hd: int, S: int) -> bool:
    """Static shape gate for decode_attention_fused (same constraints as
    decode_attention: lane-tiled head dim, chunk-aligned cache)."""
    return T <= MAX_T and H % KV == 0 and hd % 128 == 0 and S % BK == 0


def decode_attention_fused(q, k_cache, v_cache, layer, pos, scale: float,
                           k_new, v_new, k_scale=None, v_scale=None,
                           ks_new=None, vs_new=None, softcap: float = 0.0,
                           local_window=None):
    """Decode/verify attention over the FULL layer-stacked cache.

    q (B, T, H, hd); k_cache/v_cache (L, B, KV, S, hd) — the whole cache,
    layer selected by the prefetched `layer` scalar, so the caller's layer
    scan closes over the cache read-only instead of scanning it (no xs->ys
    cache stream). k_new/v_new (B, KV, T, hd) are this step's tokens,
    attended from VMEM; the caller writes them into the cache AFTER its
    layer scan in one batched scatter (models.forward._scatter_new_kv).
    pos (B,) counts valid cache cols BEFORE this step. With
    k_scale/v_scale (L, B, KV, S, 1) + ks_new/vs_new (B, KV, T, 1) the
    cache is int8 and both the chunks and the new block dequantize
    in-register. Returns (B, T, H*hd) or None if shapes are ineligible.
    """
    B, T, H, hd = q.shape
    KV, S = k_cache.shape[2], k_cache.shape[3]
    if not fused_decode_eligible(T, H, KV, hd, S):
        from ...utils import log_fallback

        log_fallback("decode_attention_fused",
                     f"T={T} H={H} KV={KV} hd={hd} S={S}")
        return None
    G = H // KV
    if T == 1:
        qg = q.reshape(B, KV, G, hd)
    else:
        qg = (q.reshape(B, T, KV, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, KV, T * G, hd))
    ksn = vsn = None
    if ks_new is not None:
        ksn = ks_new.reshape(B, KV, 1, T)
        vsn = vs_new.reshape(B, KV, 1, T)
    out = _run_fused(qg, k_cache, v_cache, k_new, v_new, layer, pos,
                     _win_arr(local_window), scale, k_scale, v_scale,
                     ksn, vsn, float(softcap), t_new=T)
    if T == 1:
        return out.reshape(B, 1, H * hd)
    return (out.reshape(B, KV, T, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, T, H * hd))


def _win_arr(local_window):
    return (jnp.zeros((1,), jnp.int32) if local_window is None
            else jnp.asarray(local_window, jnp.int32).reshape(1))


def paged_decode_attention(q, k_pages, v_pages, page_table, lengths,
                           scale: float, k_scale=None, v_scale=None,
                           softcap: float = 0.0, local_window=None):
    """Decode attention over a PAGED cache pool (vLLM-style block tables).

    q (B, 1, H, hd); k_pages/v_pages (n_pages, KV, BK, hd); page_table
    (B, max_pages) int32 physical page per logical chunk; lengths (B,).
    With k_scale/v_scale (n_pages, KV, BK, 1) the pool is int8 and pages
    dequantize in-register — the int8 pool's halved HBM rides the kernel
    instead of paying an XLA gather+materialize per step (VERDICT r2 #4).
    `softcap`/`local_window` as in decode_attention.
    """
    B, T, H, hd = q.shape
    if T > MAX_T:
        return None  # decode/verify-class only
    KV = k_pages.shape[1]
    if H % KV or hd % 128 or k_pages.shape[2] != BK:
        from ...utils import log_fallback

        log_fallback("paged_decode_attention",
                     f"H={H} KV={KV} hd={hd} page={k_pages.shape[2]}")
        return None
    G = H // KV
    if T == 1:
        qg = q.reshape(B, KV, G, hd)
    else:  # verify rows (see decode_attention); lengths must already
        #    count the T tokens written through the block table
        qg = (q.reshape(B, T, KV, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, KV, T * G, hd))
    out = _run_paged(qg, k_pages, v_pages, page_table,
                     lengths, _win_arr(local_window), scale, k_scale, v_scale,
                     float(softcap), t_new=T)
    if T == 1:
        return out.reshape(B, 1, H * hd)
    return (out.reshape(B, KV, T, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, T, H * hd))


def decode_attention(q, k_cache, v_cache, pos, scale: float,
                     k_scale=None, v_scale=None, softcap: float = 0.0,
                     local_window=None):
    """q (B, 1, H, hd), cache (B, KV, S, hd), pos (B,) -> (B, 1, H*hd) or
    None when shapes aren't eligible (caller keeps the XLA path).

    Reads exactly ceil((pos_b+1)/BK) chunks per sequence/head via in-kernel
    double-buffered DMA — per-sequence length gating with no recompiles.
    With k_scale/v_scale (B, KV, S, 1), the cache is int8 and chunks
    dequantize in-register — long-context int8 decode reads half the
    bytes of a bf16 cache AND only the live prefix.

    `softcap` (static): gemma2 logit capping. `local_window` (traced int32
    scalar or None): sliding window; chunks fully before length-win are
    never DMA'd, so local layers read O(window) bytes, not O(context).
    """
    B, T, H, hd = q.shape
    if T > MAX_T:
        return None  # decode/verify-class only; prefill rides flash/XLA
    KV, S = k_cache.shape[1], k_cache.shape[2]
    # hd must be a 128 multiple here: the in-kernel DMA slices (BK, hd)
    # chunks out of the lane-tiled HBM cache, and Mosaic cannot slice a
    # partial lane tile (verified on-chip: hd=80 fails lowering — unlike
    # flash_attention, whose BlockSpec path lane-pads hd=80 fine). Odd
    # head sizes (phi2's 80) decode on the XLA path and say so once.
    if H % KV or hd % 128 or S % BK:
        from ...utils import log_fallback

        log_fallback("decode_attention",
                     f"H={H} KV={KV} hd={hd} S={S} (need H%KV==0, "
                     f"hd%128==0, S%{BK}==0)")
        return None
    G = H // KV
    if T == 1:
        qg = q.reshape(B, KV, G, hd)
    else:
        # speculative verify: fold the T new tokens into the row dim —
        # (B, T, KV, G, hd) -> (B, KV, T*G, hd); the kernel masks each
        # row to its own causal bound (their KV is already in the cache)
        qg = (q.reshape(B, T, KV, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, KV, T * G, hd))
    out = _run(qg, k_cache, v_cache, pos + T, _win_arr(local_window), scale,
               k_scale, v_scale, float(softcap), t_new=T)
    if T == 1:
        return out.reshape(B, 1, H * hd)
    return (out.reshape(B, KV, T, G, hd)
               .transpose(0, 2, 1, 3, 4)
               .reshape(B, T, H * hd))
