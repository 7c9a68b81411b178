"""Rotary position embeddings, Llama (interleaved) and Neox (split) modes.

Pairing/frequency semantics follow **ggml/llama.cpp** (the format's source
of truth), which matters when `rope_dim < head_dim` (partial rotary, e.g.
real phi2: rope_dim 32, head_dim 80):
- llama mode rotates adjacent pairs (2i, 2i+1),
- neox mode rotates pairs (i, i + rope_dim/2) *within the first rope_dim
  dims*; the tail passes through,
- theta_i = pos * base^(-2i/rope_dim) — the exponent uses ROPE_DIM.

Known deviation from the reference: crabml pairs neox elements across
head_dim/2 and uses head_dim in the exponent (rope.rs:65-81), which
disagrees with ggml whenever rope_dim < head_dim — i.e. its phi2 rope does
not match llama.cpp's output for real phi2 GGUFs. We follow ggml; for
every model with rope_dim == head_dim (llama/gemma/qwen2) the two are
identical. Documented like the reference's phi2 double-scale bug
(models/config.py).

Vectorized over (batch, seq, heads); positions are a (batch, seq) array so
each sequence in a batch can sit at a different cache offset.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_angles(positions, rope_dim: int, base: float = 10000.0,
                freq_factors=None, pos_scale: float = 1.0,
                mscale: float = 1.0):
    """(…,) positions -> cos/sin of shape (…, rope_dim//2), f32.

    `freq_factors`: optional (rope_dim//2,) per-frequency DIVISORS — the
    llama3.1 `rope_freqs.weight` tensor (llama.cpp ggml_rope_ext
    freq_factors semantics). `pos_scale`: positions multiply by this
    (1/factor for "linear" rope scaling). `mscale`: YaRN attention
    magnitude scale multiplying both cos and sin (ggml rope_yarn)."""
    i = jnp.arange(rope_dim // 2, dtype=jnp.float32)
    inv_freq = jnp.float32(base) ** (-2.0 * i / jnp.float32(rope_dim))
    if freq_factors is not None:
        inv_freq = inv_freq / freq_factors.astype(jnp.float32)
    pos = positions.astype(jnp.float32) * jnp.float32(pos_scale)
    theta = pos[..., None] * inv_freq  # (..., rd/2)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    if mscale != 1.0:
        cos = cos * jnp.float32(mscale)
        sin = sin * jnp.float32(mscale)
    return cos, sin


def yarn_freq_factors(rope_dim: int, base: float, factor: float,
                      orig_ctx: int, beta_fast: float = 32.0,
                      beta_slow: float = 1.0):
    """YaRN NTK-by-parts interpolation as per-frequency DIVISORS (numpy,
    computed once at load): high-frequency dims (many rotations inside the
    original context) extrapolate unchanged, low-frequency dims interpolate
    by `factor`, with a linear ramp between the beta_fast/beta_slow
    correction dims. Returns (rope_dim//2,) float32 divisors compatible
    with `freq_factors` (llama.cpp ggml_rope_yarn corr_dims semantics)."""
    import numpy as np

    def corr_dim(n_rot):
        return (rope_dim * np.log(orig_ctx / (n_rot * 2 * np.pi))
                / (2 * np.log(base)))

    low = max(np.floor(corr_dim(beta_fast)), 0.0)
    high = min(np.ceil(corr_dim(beta_slow)), rope_dim - 1.0)
    # corr_dim is in PAIR-index space: ggml's rope_yarn_ramp compares it
    # against i0/2 (i0 steps by 2 over elements) and HF's ramp uses
    # arange(dim//2) — so the ramp variable is the pair index, not 2*pair
    pair = np.arange(rope_dim // 2, dtype=np.float32)
    ramp = np.clip((pair - low) / max(high - low, 1e-3), 0.0, 1.0)
    # ramp 0 = extrapolation (divisor 1); ramp 1 = interpolation (divisor
    # `factor`). Both ggml's rope_yarn and HF blend the two inv_freqs
    # LINEARLY — inv = ex*(1-ramp) + (ex/factor)*ramp — so the divisor is
    # the reciprocal of that blend, not a linear 1 -> factor ramp.
    return (1.0 / ((1.0 - ramp) + ramp / factor)).astype(np.float32)


def yarn_mscale(factor: float, attn_factor: float = 1.0) -> float:
    """YaRN attention scale: attn_factor * (1 + 0.1 ln(factor))."""
    import numpy as np

    if factor <= 1.0:
        return float(attn_factor)
    return float(attn_factor * (1.0 + 0.1 * np.log(factor)))


def apply_rope(x, positions, rope_dim: int, mode: str, base: float = 10000.0,
               freq_factors=None, pos_scale: float = 1.0, mscale: float = 1.0):
    """x: (B, T, H, head_dim); positions: (B, T) absolute positions."""
    head_dim = x.shape[-1]
    dt = x.dtype
    xf = x.astype(jnp.float32)
    cos, sin = rope_angles(positions, rope_dim, base, freq_factors, pos_scale,
                           mscale)
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
        half = rope_dim // 2
        x0 = xf[..., :half]
        x1 = xf[..., half:rope_dim]
        r0 = x0 * cos - x1 * sin
        r1 = x0 * sin + x1 * cos
        rot = jnp.concatenate([r0, r1], axis=-1)
    else:
        raise ValueError(f"unknown rope mode {mode!r}")

    if rope_dim < head_dim:
        rot = jnp.concatenate([rot, xf[..., rope_dim:]], axis=-1)
    return rot.astype(dt)
