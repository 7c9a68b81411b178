"""Rotary position embeddings, Llama (interleaved) and Neox (split) modes.

Semantics follow crabml-core/src/cpu/primitives/rope.rs:47-81:
- llama mode rotates adjacent pairs (2i, 2i+1) with theta_i = pos * base^(-2i/head_dim)
- neox mode rotates pairs (i, i + head_dim/2) with the same frequencies
- only the first `rope_dim` dims of each head rotate; the tail passes through
- `base` is 10000 and the exponent uses head_dim (not rope_dim), as in the
  reference.

Vectorized over (batch, seq, heads); positions are a (batch, seq) array so
each sequence in a batch can sit at a different cache offset.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions, head_dim: int, rope_dim: int, base: float = 10000.0):
    """(…,) positions -> cos/sin of shape (…, rope_dim//2), f32."""
    i = jnp.arange(rope_dim // 2, dtype=jnp.float32)
    inv_freq = jnp.float32(base) ** (-2.0 * i / jnp.float32(head_dim))
    theta = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., rd/2)
    return jnp.cos(theta), jnp.sin(theta)


def apply_rope(x, positions, rope_dim: int, mode: str, base: float = 10000.0):
    """x: (B, T, H, head_dim); positions: (B, T) absolute positions."""
    head_dim = x.shape[-1]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    cos, sin = rope_angles(positions, head_dim, rope_dim, base)
    cos = cos[:, :, None, :]  # (B, T, 1, rd/2)
    sin = sin[:, :, None, :]

    if mode == "llama":
        xr = xf[..., :rope_dim].reshape(*xf.shape[:-1], rope_dim // 2, 2)
        x0 = xr[..., 0]
        x1 = xr[..., 1]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rot = jnp.stack([r0, r1], axis=-1).reshape(*xf.shape[:-1], rope_dim)
    elif mode == "neox":
        half = head_dim // 2
        # pairs (i, i + head_dim/2) for i < rope_dim/2 (rope.rs:65-81)
        x0 = xf[..., : rope_dim // 2]
        x1 = xf[..., half : half + rope_dim // 2]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        if rope_dim // 2 == half:
            rot = jnp.concatenate([r0, r1], axis=-1)
        else:
            mid = xf[..., rope_dim // 2 : half]
            tail = xf[..., half + rope_dim // 2 : head_dim]
            rot = jnp.concatenate([r0, mid, r1, tail], axis=-1)
            return rot.astype(dt)
    else:
        raise ValueError(f"unknown rope mode {mode!r}")

    if rope_dim < head_dim and mode == "llama":
        rot = jnp.concatenate([rot, xf[..., rope_dim:]], axis=-1)
    return rot.astype(dt)
