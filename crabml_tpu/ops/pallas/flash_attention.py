"""Causal flash-attention prefill kernel over the fixed-shape KV cache.

The XLA attention path materializes the (B, KV, G, T, S) score tensor —
fine for decode (T=1) but O(T·S) HBM for prefill: a 2k-token llama-7B
prefill would materialize ~0.5 GB of probabilities per layer. This kernel
runs the standard online-softmax tiling (running max m, denominator l, and
output accumulator in VMEM scratch across the KV sweep), so HBM traffic is
just Q/K/V/O.

Shapes match models.forward.attention: q (B, T, H, hd); cache k/v
(B, KV, S, hd) head-major; pos (B,) — each sequence's first new row sits at its own
cache offset (multi-turn chat, serving slots). pos arrives via scalar
prefetch, so the causal/validity mask col ≤ pos[b] + row is computed
in-kernel per block. GQA is grid-native: one grid step per KV head
processes ALL G q-heads of the group as a single (G·BQ, hd) block — K/V
tiles are fetched once per group (not once per q head) and the score
matmul is G× larger, which is what the MXU wants.

Grid: (B, KV, T/BQ, S/BK), KV-sweep minor; fully-masked KV blocks
early-out via pl.when. The reference has no attention kernel at all
(scores materialize through batch_matmul,
crabml-core/.../batch_matmul.rs:97-123).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(pos_ref, win_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
            acc_ref, *, bq: int, bk: int, g: int, scale: float,
            softcap: float):
    b = pl.program_id(0)
    qi = pl.program_id(2)
    kj = pl.program_id(3)
    last_k = pl.num_programs(3) - 1
    rows = g * bq  # all q heads of this KV group, stacked

    @pl.when(kj == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    pos = pos_ref[b]
    # sliding window (gemma2): 0 disables; traced because alternating
    # local/global layers toggle it per scan step
    win = win_ref[0]
    # stacked row r = head-local g*bq + t; its token index uses r % bq
    row = pos + qi * bq + (
        jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 0) % bq
    )
    col = kj * bk + jax.lax.broadcasted_iota(jnp.int32, (rows, bk), 1)
    # col <= row: causal over the new tokens AND validity over the cache
    # prefix (cols < pos are earlier turns, visible; cols in this call's
    # range obey causality; cols beyond are unwritten slots).
    block_live = kj * bk <= pos + (qi + 1) * bq - 1
    # window block-skip: a local block is dead when even its LAST column
    # falls outside the window of the block's SMALLEST row — so local
    # attention prefill gets cheaper, not just masked
    block_live &= (win == 0) | ((kj + 1) * bk - 1 > pos + qi * bq - win)

    @pl.when(block_live)
    def _step():
        q = q_ref[0].reshape(rows, q_ref.shape[-1])  # (G*BQ, hd)
        k = k_ref[0, 0]  # (BK, hd)
        v = v_ref[0, 0]
        prec = (
            jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
        )
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        ) * scale
        if softcap:  # gemma2: cap*tanh(s/cap) BEFORE masking
            s = softcap * jnp.tanh(s / softcap)
        live = col <= row
        live &= (win == 0) | (col > row - win)
        s = jnp.where(live, s, NEG_INF)

        m_prev = m_ref[:, :1]  # (BQ, 1), lanes replicated
        m_cur = s.max(axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        # rows with no live column yet keep m = -inf; exp(-inf - -inf) guard:
        alpha = jnp.exp(jnp.minimum(m_prev - m_new, 0.0))
        p = jnp.exp(s - m_new)
        p = jnp.where(live, p, 0.0)

        l_new = l_ref[:, :1] * alpha + p.sum(axis=1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kj == last_k)
    def _finish():
        l = l_ref[:, :1]
        out = (acc_ref[:] / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        o_ref[0] = out.reshape(o_ref.shape[1:])


@functools.partial(
    jax.jit, static_argnames=("scale", "bq", "bk", "s_limit", "softcap")
)
def _flash(q, k_cache, v_cache, pos, win, scale: float, bq: int, bk: int,
           s_limit: int, softcap: float):
    # q arrives group-major (B, KV, G, T, hd); cache is (B, KV, S, hd)
    B, KV, G, T, hd = q.shape

    grid = (B, KV, T // bq, s_limit // bk)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pos + sliding window
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, G, bq, hd), lambda b, kv, i, j, *_: (b, kv, 0, i, 0)),
            pl.BlockSpec((1, 1, bk, hd), lambda b, kv, i, j, *_: (b, kv, j, 0)),
            pl.BlockSpec((1, 1, bk, hd), lambda b, kv, i, j, *_: (b, kv, j, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, G, bq, hd), lambda b, kv, i, j, *_: (b, kv, 0, i, 0)
        ),
        scratch_shapes=[
            pltpu.VMEM((G * bq, 128), jnp.float32),  # running max (lanes replicated)
            pltpu.VMEM((G * bq, 128), jnp.float32),  # running denominator
            pltpu.VMEM((G * bq, hd), jnp.float32),  # output accumulator
        ],
    )
    kernel = functools.partial(_kernel, bq=bq, bk=bk, g=G, scale=scale,
                               softcap=softcap)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, KV, G, T, hd), q.dtype),
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
        ),
        interpret=jax.default_backend() != "tpu",
    )(pos.astype(jnp.int32), win, q, k_cache, v_cache)


def flash_attention(q, k_cache, v_cache, pos, scale: float, force: bool = False,
                    s_limit: int | None = None, softcap: float = 0.0,
                    local_window=None):
    """Flash prefill over the cache, or None if shapes aren't eligible
    (caller keeps the XLA attention path — decode T=1 always falls back).

    q: (B, T, H, hd) -> (B, T, H*hd), matching models.forward.attention.

    `softcap` (static): gemma2 attention-logit capping cap*tanh(s/cap).
    `local_window` (traced int32 scalar or None): sliding-window width,
    0 = global — traced so gemma2's alternating local/global layers work
    inside one scanned layer body; out-of-window KV BLOCKS are skipped,
    not just masked.

    Dispatch heuristic: below ~1.5M score elements per head-group the
    XLA-fused path wins (kernel grid overhead dominates); above it the
    flash tiling wins — measured 1.9x at T=S=2048 on v5e — and, more
    importantly, never materializes the (T, S) score tensor, so prefill
    memory stays flat with context length.
    """
    B, T, H, hd = q.shape
    KV, S = k_cache.shape[1], k_cache.shape[2]
    s_lim = min(s_limit or S, S)
    # hd is always a FULL minor block dim (lane-padded by Mosaic), so odd
    # head sizes like phi2's 80 run the kernel instead of falling back
    if H % KV or hd % 8 or hd > 512:
        from ...utils import log_fallback

        log_fallback("flash_attention",
                     f"H={H} KV={KV} hd={hd} (need H%KV==0, hd%8==0, hd<=512)")
        return None
    if T * s_lim < (3 << 19) and not force:  # ~1.5M: XLA wins below this
        return None  # deliberate heuristic, not a capability gap: no log
    bq = 256 if T % 256 == 0 else 128 if T % 128 == 0 else None
    bk = 256 if s_lim % 256 == 0 else 128 if s_lim % 128 == 0 else None
    if bq is None or bk is None:
        from ...utils import log_fallback

        log_fallback("flash_attention", f"T={T} S={s_lim} not 128-tileable")
        return None
    G = H // KV
    qg = q.reshape(B, T, KV, G, hd).transpose(0, 2, 3, 1, 4)  # (B, KV, G, T, hd)
    win = (jnp.zeros((1,), jnp.int32) if local_window is None
           else jnp.asarray(local_window, jnp.int32).reshape(1))
    out = _flash(
        qg, k_cache.astype(q.dtype), v_cache.astype(q.dtype), pos, win, scale,
        bq, bk, s_lim, float(softcap),
    )
    # (B, KV, G, T, hd) -> (B, T, KV, G, hd) -> (B, T, H*hd)
    return out.transpose(0, 3, 1, 2, 4).reshape(B, T, H * hd)
