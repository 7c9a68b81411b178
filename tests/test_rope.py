"""RoPE semantics, including the DELIBERATE deviation from the reference.

For partial rotary (rope_dim < head_dim — real phi2: rope_dim 32,
head_dim 80) this repo follows ggml/llama.cpp: neox pairs (i, i+rope_dim/2)
within the first rope_dim dims, exponent over rope_dim. The reference
(rope.rs:65-81) instead pairs across head_dim/2 and uses head_dim in the
exponent, which disagrees with llama.cpp on real phi2 GGUFs. These tests
pin (a) the ggml behavior we ship and (b) that the reference's formula is
genuinely different, so the divergence stays a documented product decision
(ops/rope.py:11-17) rather than silently drifting.
"""

import numpy as np
import jax.numpy as jnp

from crabml_tpu.ops.rope import apply_rope


def _ref_crabml_neox(x, pos, rope_dim):
    """The REFERENCE's neox rope (rope.rs:65-81): pairs (i, i+head_dim/2),
    theta exponent over head_dim, first rope_dim/2 pairs rotated."""
    out = x.astype(np.float64).copy()
    B, T, H, hd = x.shape
    half = hd // 2
    for b in range(B):
        for t in range(T):
            p = pos[b, t]
            for h in range(H):
                for i in range(rope_dim // 2):
                    theta = p * 10000.0 ** (-2.0 * i / hd)
                    c, s = np.cos(theta), np.sin(theta)
                    a0, a1 = out[b, t, h, i], out[b, t, h, i + half]
                    out[b, t, h, i] = a0 * c - a1 * s
                    out[b, t, h, i + half] = a0 * s + a1 * c
    return out


def _ggml_neox(x, pos, rope_dim):
    """ggml/llama.cpp neox: pairs (i, i+rope_dim/2) inside the first
    rope_dim dims, exponent over rope_dim, tail passes through."""
    out = x.astype(np.float64).copy()
    B, T, H, hd = x.shape
    half = rope_dim // 2
    for b in range(B):
        for t in range(T):
            p = pos[b, t]
            for h in range(H):
                for i in range(half):
                    theta = p * 10000.0 ** (-2.0 * i / rope_dim)
                    c, s = np.cos(theta), np.sin(theta)
                    a0, a1 = out[b, t, h, i], out[b, t, h, i + half]
                    out[b, t, h, i] = a0 * c - a1 * s
                    out[b, t, h, i + half] = a0 * s + a1 * c
    return out


def test_neox_partial_rotary_matches_ggml_not_reference():
    rng = np.random.default_rng(7)
    # phi2-like: head_dim 80, rope_dim 32
    x = rng.standard_normal((1, 3, 2, 80)).astype(np.float32)
    pos = np.array([[5, 6, 7]], np.int32)
    ours = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), 32, "neox"))
    ggml = _ggml_neox(x, pos, 32)
    ref = _ref_crabml_neox(x, pos, 32)
    np.testing.assert_allclose(ours, ggml, atol=1e-4)
    # and the reference's formula is genuinely different at these shapes
    assert np.abs(ggml - ref).max() > 0.1


def test_neox_full_rotary_agrees_with_reference():
    """When rope_dim == head_dim the two formulas coincide — llama/gemma/
    qwen2 are unaffected by the divergence."""
    rng = np.random.default_rng(8)
    x = rng.standard_normal((1, 2, 2, 64)).astype(np.float32)
    pos = np.array([[3, 9]], np.int32)
    ours = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), 64, "neox"))
    ref = _ref_crabml_neox(x, pos, 64)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_llama_mode_adjacent_pairs():
    """llama mode rotates adjacent (2i, 2i+1) pairs — rope.rs:47-63."""
    x = np.zeros((1, 1, 1, 4), np.float32)
    x[0, 0, 0] = [1.0, 0.0, 0.0, 1.0]
    pos = np.array([[2]], np.int32)
    out = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos), 4, "llama"))
    t0 = 2 * 10000.0 ** (0.0)
    t1 = 2 * 10000.0 ** (-2.0 / 4)
    exp = np.array([np.cos(t0), np.sin(t0), -np.sin(t1), np.cos(t1)], np.float32)
    np.testing.assert_allclose(out[0, 0, 0], exp, atol=1e-5)


def test_yarn_divisors_match_transformers():
    """External pin for the YaRN NTK-by-parts ramp: the divisors must
    reproduce transformers' yarn inv_freq (pair-index correction range —
    an element-index ramp shifts the interpolation boundary 2x)."""
    import numpy as np
    import torch
    from transformers import LlamaConfig
    from transformers.modeling_rope_utils import ROPE_INIT_FUNCTIONS

    from crabml_tpu.ops.rope import yarn_freq_factors

    base, rd, orig, factor = 10000.0, 128, 32768, 8.0
    cfg = LlamaConfig(
        hidden_size=rd * 4, num_attention_heads=4,
        max_position_embeddings=orig * int(factor), rope_theta=base,
        rope_scaling={"rope_type": "yarn", "factor": factor,
                      "original_max_position_embeddings": orig},
    )
    want_inv, _ = ROPE_INIT_FUNCTIONS["yarn"](cfg, device="cpu")
    want_inv = want_inv.float().numpy()

    div = yarn_freq_factors(rd, base, factor, orig)
    inv = (1.0 / base ** (np.arange(0, rd, 2) / rd)).astype(np.float64) / div
    np.testing.assert_allclose(inv, want_inv, rtol=1e-5)
