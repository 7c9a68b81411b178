"""Length-gated decode attention kernel vs the exact XLA path."""
import numpy as np
import jax.numpy as jnp
import pytest

from crabml_tpu.models import forward as fwd
from crabml_tpu.ops.pallas.decode_attention import decode_attention


@pytest.mark.parametrize("gqa", [1, 4], ids=["mha", "gqa4"])
def test_decode_attention_matches_xla(gqa):
    B, S, KV, hd = 3, 512, 2, 128
    H = KV * gqa
    rng = np.random.default_rng(gqa)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    # heterogeneous lengths incl. chunk-boundary cases
    pos = jnp.asarray([0, 255, 411], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(q, k, v, pos, 1, scale)
    got = decode_attention(q, k, v, pos, scale)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_decode_attention_fallbacks():
    q = jnp.zeros((1, 9, 4, 128))  # T=9 > MAX_T: prefill-class, not decode
    k = jnp.zeros((1, 4, 512, 128))
    assert decode_attention(q, k, k, jnp.zeros(1, jnp.int32), 1.0) is None
    q = jnp.zeros((1, 1, 4, 64))  # hd 64: ineligible
    k = jnp.zeros((1, 4, 512, 64))
    assert decode_attention(q, k, k, jnp.zeros(1, jnp.int32), 1.0) is None


def test_decode_attention_int8_cache():
    """int8-cache variant dequantizes chunks in-register; matches the
    dequantize-then-attend reference path."""
    import jax

    B, S, KV, G, hd = 2, 256, 2, 2, 128
    H = KV * G
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    kf = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    vf = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    ks = (np.abs(kf).max(axis=-1, keepdims=True) / 127.0).astype(np.float32)
    vs = (np.abs(vf).max(axis=-1, keepdims=True) / 127.0).astype(np.float32)
    k8 = np.clip(np.round(kf / ks), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs), -127, 127).astype(np.int8)
    pos = jnp.asarray([100, 255], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(
        q, jnp.asarray(k8.astype(np.float32) * ks), jnp.asarray(v8.astype(np.float32) * vs),
        pos, 1, scale,
    )
    got = decode_attention(
        q, jnp.asarray(k8), jnp.asarray(v8), pos, scale,
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_paged_decode_attention():
    """Block-table variant: shuffled physical pages == contiguous cache."""
    from crabml_tpu.ops.pallas.decode_attention import BK, paged_decode_attention

    B, KV, G, hd = 2, 2, 2, 128
    H = KV * G
    max_pages = 4
    S = max_pages * BK
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    dense_k = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    dense_v = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    lengths = np.asarray([300, 512], np.int32)

    # scatter each sequence's chunks into shuffled physical pages
    n_pages = B * max_pages
    perm = rng.permutation(n_pages)
    k_pages = np.zeros((n_pages, KV, BK, hd), np.float32)
    v_pages = np.zeros((n_pages, KV, BK, hd), np.float32)
    table = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        for c in range(max_pages):
            p = perm[b * max_pages + c]
            table[b, c] = p
            k_pages[p] = dense_k[b, :, c * BK : (c + 1) * BK].transpose(0, 1, 2)
            v_pages[p] = dense_v[b, :, c * BK : (c + 1) * BK]

    scale = 1.0 / np.sqrt(hd)
    got = paged_decode_attention(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(table),
        jnp.asarray(lengths), scale,
    )
    want = fwd.attention(q, jnp.asarray(dense_k), jnp.asarray(dense_v),
                         jnp.asarray(lengths - 1), 1, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_paged_decode_attention_int8_pool():
    """VERDICT r2 #4: the paged kernel takes the int8 pool's scale pools —
    shuffled int8 pages + scales must match the dense dequantized path."""
    from crabml_tpu.ops.pallas.decode_attention import BK, paged_decode_attention

    B, KV, G, hd = 2, 2, 2, 128
    H = KV * G
    max_pages = 4
    S = max_pages * BK
    rng = np.random.default_rng(13)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    dense_k = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    dense_v = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    lengths = np.asarray([300, 512], np.int32)

    # int8-quantize per (token, head) like the engine does
    def q8(a):
        s_ = np.maximum(np.abs(a).max(-1, keepdims=True) / 127.0, 1e-12)
        return np.clip(np.rint(a / s_), -127, 127).astype(np.int8), s_.astype(np.float32)

    k8, ks = q8(dense_k)
    v8, vs = q8(dense_v)

    n_pages = B * max_pages
    perm = rng.permutation(n_pages)
    k_pages = np.zeros((n_pages, KV, BK, hd), np.int8)
    v_pages = np.zeros((n_pages, KV, BK, hd), np.int8)
    ks_pages = np.zeros((n_pages, KV, BK, 1), np.float32)
    vs_pages = np.zeros((n_pages, KV, BK, 1), np.float32)
    table = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        for c in range(max_pages):
            p = perm[b * max_pages + c]
            table[b, c] = p
            sl = slice(c * BK, (c + 1) * BK)
            k_pages[p] = k8[b, :, sl]
            v_pages[p] = v8[b, :, sl]
            ks_pages[p] = ks[b, :, sl]
            vs_pages[p] = vs[b, :, sl]

    scale = 1.0 / np.sqrt(hd)
    got = paged_decode_attention(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(table),
        jnp.asarray(lengths), scale,
        k_scale=jnp.asarray(ks_pages), v_scale=jnp.asarray(vs_pages),
    )
    assert got is not None
    want = fwd.attention(
        q, jnp.asarray(k8.astype(np.float32) * ks),
        jnp.asarray(v8.astype(np.float32) * vs),
        jnp.asarray(lengths - 1), 1, scale,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("win", [100, 300], ids=["skip-chunks", "cover-all"])
def test_decode_attention_softcap_and_window(win):
    """gemma2 features on the decode kernel (VERDICT r2 weak #5): logit
    softcap + sliding window match the XLA path, including windows that
    skip whole leading DMA chunks (length=300, win=100 -> chunk 0 never
    read) and chunk-boundary lengths."""
    B, S, KV, G, hd = 3, 512, 2, 2, 128
    H = KV * G
    softcap = 50.0
    rng = np.random.default_rng(win)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    pos = jnp.asarray([40, 299, 383], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(q, k, v, pos, 1, scale, softcap=softcap,
                         local_window=win)
    got = decode_attention(q, k, v, pos, scale, softcap=softcap,
                           local_window=jnp.int32(win))
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # traced win=0 == global attention (gemma2's alternating global layers)
    want_g = fwd.attention(q, k, v, pos, 1, scale, softcap=softcap)
    got_g = decode_attention(q, k, v, pos, scale, softcap=softcap,
                             local_window=jnp.int32(0))
    np.testing.assert_allclose(np.asarray(got_g), np.asarray(want_g),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_int8_window():
    """sliding window + softcap on the int8-cache decode variant."""
    B, S, KV, G, hd = 2, 256, 2, 2, 128
    H = KV * G
    rng = np.random.default_rng(9)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    kf = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    vf = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    ks = (np.abs(kf).max(axis=-1, keepdims=True) / 127.0).astype(np.float32)
    vs = (np.abs(vf).max(axis=-1, keepdims=True) / 127.0).astype(np.float32)
    k8 = np.clip(np.round(kf / ks), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs), -127, 127).astype(np.int8)
    pos = jnp.asarray([100, 255], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(
        q, jnp.asarray(k8.astype(np.float32) * ks),
        jnp.asarray(v8.astype(np.float32) * vs), pos, 1, scale,
        softcap=30.0, local_window=64,
    )
    got = decode_attention(
        q, jnp.asarray(k8), jnp.asarray(v8), pos, scale,
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
        softcap=30.0, local_window=jnp.int32(64),
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=5e-3, atol=5e-3)


def test_paged_decode_attention_softcap_window():
    """gemma2 softcap + sliding window through the block-table kernel:
    shuffled physical pages == the XLA path on the dense equivalent, and
    a window that skips whole leading pages never reads them."""
    from crabml_tpu.ops.pallas.decode_attention import BK, paged_decode_attention

    B, KV, G, hd = 2, 2, 2, 128
    H = KV * G
    max_pages = 4
    S = max_pages * BK
    rng = np.random.default_rng(21)
    q = jnp.asarray(rng.standard_normal((B, 1, H, hd)), jnp.float32)
    dense_k = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    dense_v = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    lengths = np.asarray([300, 512], np.int32)

    n_pages = B * max_pages
    perm = rng.permutation(n_pages)
    k_pages = np.zeros((n_pages, KV, BK, hd), np.float32)
    v_pages = np.zeros((n_pages, KV, BK, hd), np.float32)
    table = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        for c in range(max_pages):
            p = perm[b * max_pages + c]
            table[b, c] = p
            k_pages[p] = dense_k[b, :, c * BK : (c + 1) * BK]
            v_pages[p] = dense_v[b, :, c * BK : (c + 1) * BK]

    scale = 1.0 / np.sqrt(hd)
    win, cap = 100, 30.0
    got = paged_decode_attention(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(table),
        jnp.asarray(lengths), scale, softcap=cap, local_window=jnp.int32(win),
    )
    want = fwd.attention(q, jnp.asarray(dense_k), jnp.asarray(dense_v),
                         jnp.asarray(lengths - 1), 1, scale,
                         softcap=cap, local_window=win)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


# ---------------------------------------------------------------------------
# multi-token q (the speculative verify shape, T <= MAX_T)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("gqa", [1, 4], ids=["mha", "gqa4"])
def test_decode_attention_multitoken_matches_xla(gqa):
    """T=5 verify rows fold into the kernel's row dim with per-row causal
    bounds; must match the XLA masked-attention path exactly."""
    B, S, KV, hd, T = 3, 512, 2, 128, 5
    H = KV * gqa
    rng = np.random.default_rng(21 + gqa)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    # pos = live entries BEFORE the T new tokens (whose KV sits at
    # pos..pos+T-1 in the cache); includes chunk-boundary cases
    pos = jnp.asarray([0, 123, 380], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(q, k, v, pos, T, scale)
    got = decode_attention(q, k, v, pos, scale)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_decode_attention_multitoken_rowwise_exact():
    """Causal exactness: row t of a T=4 call equals a T=1 call at pos+t
    (teacher-forced equivalence) — no future-column leakage possible."""
    B, S, KV, G, hd, T = 2, 256, 2, 2, 128, 4
    H = KV * G
    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    pos = jnp.asarray([50, 127], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    multi = decode_attention(q, k, v, pos, scale)
    assert multi is not None
    for t in range(T):
        one = decode_attention(q[:, t : t + 1], k, v, pos + t, scale)
        np.testing.assert_allclose(
            np.asarray(multi[:, t]), np.asarray(one[:, 0]),
            rtol=2e-6, atol=2e-6,
        )


def test_decode_attention_multitoken_int8():
    """T=3 verify over an int8 cache + scales vs dequantize-then-attend."""
    B, S, KV, G, hd, T = 2, 256, 2, 2, 128, 3
    H = KV * G
    rng = np.random.default_rng(11)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    kf = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    vf = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    ks = (np.abs(kf).max(axis=-1, keepdims=True) / 127.0).astype(np.float32)
    vs = (np.abs(vf).max(axis=-1, keepdims=True) / 127.0).astype(np.float32)
    k8 = np.clip(np.round(kf / ks), -127, 127).astype(np.int8)
    v8 = np.clip(np.round(vf / vs), -127, 127).astype(np.int8)
    pos = jnp.asarray([100, 253], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(
        q, jnp.asarray(k8.astype(np.float32) * ks),
        jnp.asarray(v8.astype(np.float32) * vs), pos, T, scale,
    )
    got = decode_attention(
        q, jnp.asarray(k8), jnp.asarray(v8), pos, scale,
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
    )
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("win", [64, 200])
def test_decode_attention_multitoken_window(win):
    """Sliding window with T=4: each row's window is its OWN position's
    (gemma2 local layers under a verify tick)."""
    B, S, KV, G, hd, T = 2, 384, 2, 2, 128, 4
    H = KV * G
    rng = np.random.default_rng(win)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, KV, S, hd)), jnp.float32)
    pos = jnp.asarray([150, 300], jnp.int32)
    scale = 1.0 / np.sqrt(hd)

    want = fwd.attention(q, k, v, pos, T, scale, probe={"x": None},
                         local_window=win)
    got = decode_attention(q, k, v, pos, scale, local_window=win)
    assert got is not None
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_paged_decode_attention_multitoken():
    """T=4 verify through the page table (the paged engine's verify path):
    matches dense XLA attention over the scattered pages."""
    from crabml_tpu.ops.pallas.decode_attention import BK, paged_decode_attention

    B, KV, G, hd, T = 2, 2, 2, 128, 4
    H = KV * G
    max_pages = 3
    S = max_pages * BK
    rng = np.random.default_rng(17)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    dense_k = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    dense_v = rng.standard_normal((B, KV, S, hd)).astype(np.float32)
    # lengths INCLUDE the T verify tokens already written through the table
    pos = np.asarray([100, 250], np.int32)
    lengths = pos + T

    n_pages = B * max_pages
    perm = rng.permutation(n_pages)
    k_pages = np.zeros((n_pages, KV, BK, hd), np.float32)
    v_pages = np.zeros((n_pages, KV, BK, hd), np.float32)
    table = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        for c in range(max_pages):
            p = perm[b * max_pages + c]
            table[b, c] = p
            sl = slice(c * BK, (c + 1) * BK)
            k_pages[p] = dense_k[b, :, sl]
            v_pages[p] = dense_v[b, :, sl]

    scale = 1.0 / np.sqrt(hd)
    got = paged_decode_attention(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(table),
        jnp.asarray(lengths), scale,
    )
    assert got is not None
    want = fwd.attention(jnp.asarray(q), jnp.asarray(dense_k),
                         jnp.asarray(dense_v), jnp.asarray(pos), T, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("T", [1, 4])
def test_decode_attention_fused_stacked(T):
    """Fused variant: full (L, B, KV, S, hd) cache + prefetched layer
    scalar + the step's tokens from VMEM == old kernel on a cache with
    the tokens already written (per layer)."""
    from crabml_tpu.ops.pallas.decode_attention import (
        decode_attention, decode_attention_fused)

    L, B, S, KV, G, hd = 3, 2, 256, 2, 2, 128
    H = KV * G
    rng = np.random.default_rng(21)
    cache_k = rng.standard_normal((L, B, KV, S, hd)).astype(np.float32)
    cache_v = rng.standard_normal((L, B, KV, S, hd)).astype(np.float32)
    pos = np.asarray([37, 128], np.int32)  # incl. a chunk boundary
    scale = 1.0 / np.sqrt(hd)
    for l in range(L):
        q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
        k_new = jnp.asarray(rng.standard_normal((B, KV, T, hd)), jnp.float32)
        v_new = jnp.asarray(rng.standard_normal((B, KV, T, hd)), jnp.float32)
        got = decode_attention_fused(
            q, jnp.asarray(cache_k), jnp.asarray(cache_v), jnp.int32(l),
            jnp.asarray(pos), scale, k_new=k_new, v_new=v_new)
        assert got is not None
        # reference: write the tokens into layer l's slice, run the old kernel
        kl, vl = cache_k[l].copy(), cache_v[l].copy()
        for b in range(B):
            kl[b, :, pos[b] : pos[b] + T] = np.asarray(k_new)[b]
            vl[b, :, pos[b] : pos[b] + T] = np.asarray(v_new)[b]
        want = decode_attention(q, jnp.asarray(kl), jnp.asarray(vl),
                                jnp.asarray(pos), scale)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


def test_decode_attention_fused_int8_window_softcap():
    """Fused variant with the int8 cache (+ per-token scales for both the
    chunks and the new block), sliding window, and softcap — vs the
    dequantize-then-attend XLA reference."""
    from crabml_tpu.ops.pallas.decode_attention import decode_attention_fused

    L, B, S, KV, G, hd, T = 2, 2, 256, 2, 2, 128, 3
    H = KV * G
    lyr, win, cap = 1, 96, 30.0
    rng = np.random.default_rng(23)

    def q8(a):
        s = (np.abs(a).max(axis=-1, keepdims=True) / 127.0 + 1e-12
             ).astype(np.float32)
        return np.clip(np.round(a / s), -127, 127).astype(np.int8), s

    kf = rng.standard_normal((L, B, KV, S, hd)).astype(np.float32)
    vf = rng.standard_normal((L, B, KV, S, hd)).astype(np.float32)
    k8, ks = q8(kf)
    v8, vs = q8(vf)
    knf = rng.standard_normal((B, KV, T, hd)).astype(np.float32)
    vnf = rng.standard_normal((B, KV, T, hd)).astype(np.float32)
    kn8, ksn = q8(knf)
    vn8, vsn = q8(vnf)
    pos = np.asarray([130, 200], np.int32)
    scale = 1.0 / np.sqrt(hd)

    got = decode_attention_fused(
        jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32),
        jnp.asarray(k8), jnp.asarray(v8), jnp.int32(lyr), jnp.asarray(pos),
        scale, k_new=jnp.asarray(kn8), v_new=jnp.asarray(vn8),
        k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs),
        ks_new=jnp.asarray(ksn), vs_new=jnp.asarray(vsn),
        softcap=cap, local_window=win)
    # the q above must match the reference call: regenerate deterministically
    rng = np.random.default_rng(23)
    q8(rng.standard_normal((L, B, KV, S, hd)).astype(np.float32))
    q8(rng.standard_normal((L, B, KV, S, hd)).astype(np.float32))
    q8(rng.standard_normal((B, KV, T, hd)).astype(np.float32))
    q8(rng.standard_normal((B, KV, T, hd)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    assert got is not None

    # dense dequantized reference with the new tokens written at pos
    kd = k8.astype(np.float32) * ks
    vd = v8.astype(np.float32) * vs
    for b in range(B):
        kd[lyr, b, :, pos[b] : pos[b] + T] = kn8[b].astype(np.float32) * ksn[b]
        vd[lyr, b, :, pos[b] : pos[b] + T] = vn8[b].astype(np.float32) * vsn[b]
    want = fwd.attention(q, jnp.asarray(kd[lyr]), jnp.asarray(vd[lyr]),
                         jnp.asarray(pos), T, scale, softcap=cap,
                         local_window=win)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-5, atol=3e-5)


@pytest.mark.parametrize("T", [1, 5])
def test_paged_decode_attention_fused(T):
    """Paged fused variant: stacked pools + layer scalar + VMEM new block
    == dense attention over the scattered pages with the tokens written."""
    from crabml_tpu.ops.pallas.decode_attention import (
        BK, paged_decode_attention_fused)

    L, B, KV, G, hd = 2, 2, 2, 2, 128
    H = KV * G
    max_pages = 3
    S = max_pages * BK
    lyr = 1
    rng = np.random.default_rng(29)
    q = jnp.asarray(rng.standard_normal((B, T, H, hd)), jnp.float32)
    dense_k = rng.standard_normal((L, B, KV, S, hd)).astype(np.float32)
    dense_v = rng.standard_normal((L, B, KV, S, hd)).astype(np.float32)
    k_new = jnp.asarray(rng.standard_normal((B, KV, T, hd)), jnp.float32)
    v_new = jnp.asarray(rng.standard_normal((B, KV, T, hd)), jnp.float32)
    pos = np.asarray([100, 250], np.int32)  # prefix BEFORE this step

    n_pages = B * max_pages
    perm = rng.permutation(n_pages)
    k_pages = np.zeros((L, n_pages, KV, BK, hd), np.float32)
    v_pages = np.zeros((L, n_pages, KV, BK, hd), np.float32)
    table = np.zeros((B, max_pages), np.int32)
    for b in range(B):
        for c in range(max_pages):
            p = perm[b * max_pages + c]
            table[b, c] = p
            sl = slice(c * BK, (c + 1) * BK)
            k_pages[:, p] = dense_k[:, b, :, sl]
            v_pages[:, p] = dense_v[:, b, :, sl]

    scale = 1.0 / np.sqrt(hd)
    got = paged_decode_attention_fused(
        q, jnp.asarray(k_pages), jnp.asarray(v_pages), jnp.asarray(table),
        jnp.int32(lyr), jnp.asarray(pos), scale, k_new=k_new, v_new=v_new)
    assert got is not None
    kd, vd = dense_k[lyr].copy(), dense_v[lyr].copy()
    for b in range(B):
        kd[b, :, pos[b] : pos[b] + T] = np.asarray(k_new)[b]
        vd[b, :, pos[b] : pos[b] + T] = np.asarray(v_new)[b]
    want = fwd.attention(q, jnp.asarray(kd), jnp.asarray(vd),
                         jnp.asarray(pos), T, scale)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
