"""Lane-padded KV cache (Runner(kv_lane_pad=True), CLI --kv-lane-pad).

The decode-attention kernel cannot DMA partial 128-lane tiles, so models
with head_dim % 128 != 0 (phi2 hd=80, the 260k fixture hd=8) normally
decode on the XLA fallback. lane_pad stores the cache zero-extended to
the next 128-lane multiple: scores (q·k over zero lanes) and int8
per-vector scales are unchanged, so outputs must be bit-identical to the
unpadded cache on every backend — while the kernel's eligibility gate
(ops/pallas/decode_attention: hd % 128) now passes.
"""

import jax.numpy as jnp
import numpy as np

from crabml_tpu.models.forward import KVCache
from crabml_tpu.ops import matmul as mm
from crabml_tpu.runtime.runner import Runner

PROMPT = "Lily is a cat"


def _gen(runner, steps=16):
    _, _, tok = runner.prefill(PROMPT, bos=True)
    out = [tok]
    out.extend(runner.generate(tok, steps=steps))
    return out


def test_lane_pad_padded_cache_is_bit_identical(stories260k_path):
    plain = Runner(stories260k_path, seq_len=128)
    padded = Runner(stories260k_path, seq_len=128, kv_lane_pad=True)
    assert plain.cfg.head_dim == 8
    assert plain.cache.k.shape[-1] == 8
    assert padded.cache.k.shape[-1] == 128
    assert _gen(padded) == _gen(plain)


def test_lane_pad_enables_decode_kernel(stories260k_path):
    """With the pallas backend, the padded cache passes the decode
    kernel's hd % 128 gate (the unpadded one returns None = fallback)."""
    from crabml_tpu.ops.pallas.decode_attention import decode_attention

    B, H, KV, S = 1, 8, 4, 128
    pos = jnp.array([5], jnp.int32)
    q64 = jnp.zeros((B, 1, H, 64), jnp.float32)
    k64 = jnp.zeros((B, KV, S, 64), jnp.float32)
    assert decode_attention(q64, k64, k64, pos, 0.125) is None
    q128 = jnp.zeros((B, 1, H, 128), jnp.float32)
    k128 = jnp.zeros((B, KV, S, 128), jnp.float32)
    assert decode_attention(q128, k128, k128, pos, 0.125) is not None

    mm.set_backend("pallas")
    try:
        plain = Runner(stories260k_path, seq_len=128, backend="pallas")
        padded = Runner(stories260k_path, seq_len=128, backend="pallas",
                        kv_lane_pad=True)
        got, want = _gen(padded, steps=10), _gen(plain, steps=10)
    finally:
        mm.set_backend("xla")
    assert got == want


def test_lane_pad_int8_kv_parity(stories260k_path):
    """Zero lanes don't move the per-vector max-abs scales, so the int8
    cache quantizes identically padded or not."""
    plain = Runner(stories260k_path, seq_len=128, kv_dtype=jnp.int8)
    padded = Runner(stories260k_path, seq_len=128, kv_dtype=jnp.int8,
                    kv_lane_pad=True)
    assert padded.cache.k.shape[-1] == 128
    assert padded.cache.k_scale.shape[-1] == 1
    assert _gen(padded) == _gen(plain)


def test_lane_pad_create_rounds_only_when_needed():
    from crabml_tpu.models.synthetic import llama7b_config, tiny_config

    cfg = llama7b_config()  # hd = 128: already aligned, pad is a no-op
    assert KVCache.create(cfg, 1, 64, lane_pad=True).k.shape[-1] == 128
    tiny = tiny_config()  # hd = 32 -> rounds to one full lane tile
    assert KVCache.create(tiny, 1, 64).k.shape[-1] == 32
    assert KVCache.create(tiny, 1, 64, lane_pad=True).k.shape[-1] == 128


def test_lane_pad_serving_engine_parity(stories260k_path):
    from crabml_tpu.serving import ServingEngine

    plain_r = Runner(stories260k_path, seq_len=128)
    plain = ServingEngine(plain_r, n_slots=2, seq_len=96)
    want = plain.generate([PROMPT], max_tokens=10)[0]
    pad_r = Runner(stories260k_path, seq_len=128, kv_lane_pad=True)
    eng = ServingEngine(pad_r, n_slots=2, seq_len=96)  # inherits lane pad
    assert eng.cache.k.shape[-1] == 128
    assert eng.generate([PROMPT], max_tokens=10)[0] == want


def test_lane_pad_paged_engine_parity(stories260k_path):
    """The paged pool, its direct-to-page prefill, and the decode step all
    carry the padded lane width; outputs match the unpadded pool."""
    from crabml_tpu.serving.paged import PagedServingEngine

    plain_r = Runner(stories260k_path, seq_len=256)
    plain = PagedServingEngine(plain_r, n_slots=2, seq_len=256, n_pages=8)
    want = plain.generate([PROMPT], max_tokens=12)[0]

    pad_r = Runner(stories260k_path, seq_len=256, kv_lane_pad=True)
    eng = PagedServingEngine(pad_r, n_slots=2, seq_len=256, n_pages=8)
    assert eng.cache.k.shape[-1] == 128
    assert eng.generate([PROMPT], max_tokens=12)[0] == want

    # int8 pool + lane pad (scales are zero-lane-neutral)
    eng8a = PagedServingEngine(plain_r, n_slots=2, seq_len=256, n_pages=8,
                               kv_dtype=jnp.int8)
    eng8b = PagedServingEngine(pad_r, n_slots=2, seq_len=256, n_pages=8,
                               kv_dtype=jnp.int8)
    assert (eng8b.generate([PROMPT], max_tokens=12)
            == eng8a.generate([PROMPT], max_tokens=12))
