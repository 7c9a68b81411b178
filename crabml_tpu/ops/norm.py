"""RMS normalization (crabml primitives/rms_norm.rs semantics, batched)."""

from __future__ import annotations

import jax.numpy as jnp


def layer_norm(x, weight, eps: float, bias=None):
    """True LayerNorm: (x - mean) / sqrt(var + eps) * w (+ b), f32.

    phi2's norm. The reference implements phi2 with rms_norm + bias
    (llama2.rs:371-375) — a deviation from the checkpoint's semantics
    that we intentionally do NOT replicate (HF PhiForCausalLM and
    llama.cpp build_phi2 both mean-subtract; same policy as the neox
    partial-rotary deviation, see ROADMAP known-limitations)."""
    dt = x.dtype
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    xc = xf - mu
    var = jnp.mean(xc * xc, axis=-1, keepdims=True)
    out = xc / jnp.sqrt(var + jnp.float32(eps)) * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)


def rms_norm(x, weight, eps: float, bias=None):
    """x * w / sqrt(mean(x^2) + eps) over the last axis.

    Matches rms_norm_inplace (rms_norm.rs:9-47) + the mul with the norm
    weight; phi2 additionally adds a bias (llama2.rs:378-380).
    Computation in f32 regardless of input dtype.
    """
    dt = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf / jnp.sqrt(var + jnp.float32(eps))
    out = normed * weight.astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out.astype(dt)
