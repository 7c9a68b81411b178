"""Ring attention: causal prefill over a sequence-sharded KV cache.

The reference is strictly single-device with a fully local KV cache
(SURVEY §5.7 — "no ring attention, no blockwise streaming"); contexts are
bounded by one chip's HBM. This module removes that bound the TPU way:
shard the sequence over a mesh axis ("sp"), keep Q local, and rotate the
K/V shards around the ring with lax.ppermute while accumulating blockwise
online-softmax partials — compute on step i overlaps the collective that
delivers the shard for step i+1 (XLA schedules the ppermute DMA
concurrently with the einsums; ICI latency hides behind the local block's
FLOPs).

Math: standard online softmax across ring steps — per step keep running
max m, denominator l, and unnormalized accumulator acc; merging a new
block rescales by exp(m_old - m_new). Causality uses GLOBAL indices:
q shard p owns rows [p·Tq, (p+1)·Tq); the k shard visiting at step i
came from device (p - i) mod n and owns cols [src·Tk, (src+1)·Tk).

Use `ring_attention` inside shard_map (see `ring_prefill` for the wrapper)
— 8-device virtual-mesh tests pin it against the dense single-device path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def ring_attention(q, k, v, *, axis_name: str, scale: float,
                   row_offset=None, col_offset=None, return_partials=False,
                   softcap: float = 0.0, local_window=None):
    """Blockwise-causal attention with ring-permuted KV (collective form).

    q: (B, Tq, H, hd) — this device's query rows (sequence-sharded).
    k, v: (B, KV, Tk, hd) — this device's KV shard (head-major, like the
    engine's cache layout).
    Returns (B, Tq, H, hd). Call inside shard_map over `axis_name`.

    `row_offset`/`col_offset` (traced scalars) shift the GLOBAL ids of the
    q rows / kv cols — the chunked-prefill case, where the chunk's rows
    start at the current cache position rather than 0. `return_partials`
    returns the online-softmax state (m, l, acc) of shape
    (B, KV, G, Tq, {1,1,hd}) instead of the normalized output, so the
    caller can merge with partials from other KV sources (the cache's
    earlier chunks).

    `softcap` (static): gemma2 logit capping cap*tanh(s/cap).
    `local_window` (traced int32 scalar or None, 0 = global): gemma2
    sliding window — masked on GLOBAL row/col ids, so it composes with
    the chunk offsets.
    """
    n = jax.lax.psum(1, axis_name)
    p = jax.lax.axis_index(axis_name)
    B, Tq, H, hd = q.shape
    KV = k.shape[1]
    G = H // KV

    qg = q.reshape(B, Tq, KV, G, hd).astype(jnp.float32)
    row = p * Tq + jnp.arange(Tq)  # global row ids of this q shard
    if row_offset is not None:
        row = row + row_offset

    m0 = jnp.full((B, KV, G, Tq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, KV, G, Tq, 1), jnp.float32)
    acc0 = jnp.zeros((B, KV, G, Tq, hd), jnp.float32)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def step(i, carry):
        k_cur, v_cur, m, l, acc = carry
        src = (p - i) % n  # ring position this shard originated from
        col = src * k_cur.shape[2] + jnp.arange(k_cur.shape[2])
        if col_offset is not None:
            col = col + col_offset

        s = jnp.einsum(
            "btkgh,bksh->bkgts", qg, k_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) * scale
        if softcap:
            s = softcap * jnp.tanh(s / softcap)
        mask = col[None, :] <= row[:, None]  # (Tq, Tk) causal, global ids
        if local_window is not None:
            mask &= (local_window == 0) | (
                col[None, :] > row[:, None] - local_window
            )
        s = jnp.where(mask[None, None, None], s, NEG_INF)

        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p_blk = jnp.exp(s - m_new)
        p_blk = jnp.where(mask[None, None, None], p_blk, 0.0)
        l = l * alpha + p_blk.sum(axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "bkgts,bksh->bkgth", p_blk, v_cur.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        # rotate KV to the next device; XLA overlaps this ICI transfer with
        # the next iteration's compute
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return k_nxt, v_nxt, m_new, l, acc

    _, _, m, l, acc = jax.lax.fori_loop(0, n, step, (k, v, m0, l0, acc0))
    if return_partials:
        return m, l, acc
    out = acc / jnp.maximum(l, 1e-30)  # rows with no visible cols: l=0 -> 0
    return out.transpose(0, 3, 1, 2, 4).reshape(B, Tq, H, hd).astype(q.dtype)


def merge_partials(parts):
    """Merge online-softmax partials [(m, l, acc), ...] from disjoint KV
    sources into one normalized output (..., Tq, hd-shaped acc layout)."""
    m = parts[0][0]
    for mp, _, _ in parts[1:]:
        m = jnp.maximum(m, mp)
    l = jnp.zeros_like(parts[0][1])
    acc = jnp.zeros_like(parts[0][2])
    for mp, lp, ap in parts:
        corr = jnp.exp(mp - m)
        l = l + lp * corr
        acc = acc + ap * corr
    return acc / jnp.maximum(l, 1e-30)


def ring_prefill(q, k, v, mesh: Mesh, *, scale: float, axis: str = "sp"):
    """shard_map wrapper: q sequence-sharded on T, k/v on S, heads local.

    q: (B, T, H, hd); k/v: (B, KV, S, hd) with S == T (self-attention
    prefill from an empty cache). Output matches the dense causal
    attention bit-for-almost (f32 accumulation both sides).
    """
    from jax.experimental.shard_map import shard_map

    fn = shard_map(
        partial(ring_attention, axis_name=axis, scale=scale),
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None),
            P(None, None, axis, None),
            P(None, None, axis, None),
        ),
        out_specs=P(None, axis, None, None),
        check_rep=False,
    )
    return fn(q, k, v)
