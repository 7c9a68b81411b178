"""Quant codec tests.

Strategy mirrors the reference (SURVEY §4.2):
1. hand-built byte patterns decode to exact f32 (vs buf_q8_0.rs:292-322,
   buf_q4_0.rs:259-298 style checks, recomputed here from the layout spec);
2. quantize→dequantize round-trip RMSE within the reference error budgets on
   the same synthetic cos data (util.rs:286-326);
3. quantize→dot vs f32 dot within per-scheme budgets
   (e.g. MAX_Q4K_PRODUCT_ERROR=0.02, buf_q4_k.rs:289).
"""

import numpy as np
import pytest

from crabml_tpu.gguf.constants import GGMLType, QK_K, tensor_nbytes
from crabml_tpu.quant.codecs import (
    dequantize,
    f16_bits_to_f32,
    nearest_i32,
    quantize,
)


def generate_data(offset: float, n: int) -> np.ndarray:
    # same synthetic data as the reference tests (util.rs:289-295)
    return (0.1 + 2.0 * np.cos(np.arange(n, dtype=np.float32) + np.float32(offset))).astype(
        np.float32
    )


def rmse(a, b):
    return float(np.sqrt(((a - b) ** 2).sum()) / a.size)


def test_nearest_i32_matches_reference_cases():
    cases = [
        (3256291.8, 3256292),
        (234.4, 234),
        (3255.6, 3256),
        (0.5, 0),  # round-half-even
        (1.5, 2),
        (2.5, 2),
        (-0.5, 0),
        (-1.5, -2),
        (-234.6, -235),
    ]
    for x, want in cases:
        assert int(nearest_i32(np.float32(x))) == want, x


def test_q8_0_handbuilt_bytes():
    # one block: d = 0.5 (f16 0x3800), qs = 0..31 as i8
    d = np.array([0.5], np.float16).view(np.uint8)
    qs = np.arange(32, dtype=np.int8).view(np.uint8)
    raw = np.concatenate([d, qs]).tobytes()
    got = dequantize(GGMLType.Q8_0, raw)
    np.testing.assert_allclose(got, 0.5 * np.arange(32, dtype=np.float32))


def test_q4_0_handbuilt_bytes():
    # one block: d = 2.0, nibble bytes j -> elems j (lo) and j+16 (hi)
    d = np.array([2.0], np.float16).view(np.uint8)
    qs = np.array([(j % 16) | ((15 - j % 16) << 4) for j in range(16)], np.uint8)
    raw = np.concatenate([d, qs]).tobytes()
    got = dequantize(GGMLType.Q4_0, raw)
    want = np.concatenate(
        [2.0 * (np.arange(16) - 8), 2.0 * ((15 - np.arange(16)) - 8)]
    ).astype(np.float32)
    np.testing.assert_allclose(got, want)


def test_q5_0_handbuilt_bytes():
    d = np.array([1.0], np.float16).view(np.uint8)
    qh = np.frombuffer(np.uint32(0xAAAA5555).tobytes(), np.uint8)  # bits 0101.. / 1010..
    qs = np.zeros(16, np.uint8)
    raw = np.concatenate([d, qh, qs]).tobytes()
    got = dequantize(GGMLType.Q5_0, raw)
    bits = [(0xAAAA5555 >> j) & 1 for j in range(32)]
    want = np.array([(b << 4) - 16 for b in bits], np.float32)
    np.testing.assert_allclose(got, want)


def test_f16_bits_roundtrip():
    vals = np.array([0.0, 1.0, -2.5, 65504.0, 6.1e-5], np.float32)
    bits = vals.astype(np.float16).view(np.uint16)
    back = f16_bits_to_f32(bits)
    np.testing.assert_allclose(back, vals.astype(np.float16).astype(np.float32))


# per-scheme (quantize-rmse budget, dot-error budget) — reference error gates
BUDGETS = {
    GGMLType.Q8_0: (0.002, 0.005),
    GGMLType.Q8_1: (0.002, 0.005),
    GGMLType.Q4_0: (0.01, 0.02),
    GGMLType.Q4_1: (0.01, 0.02),
    GGMLType.Q5_0: (0.005, 0.02),
    GGMLType.Q5_1: (0.005, 0.02),
    GGMLType.Q2_K: (0.03, 0.02),
    # the reference's 0.02 Q3_K dot assert is commented out (buf_q3_k.rs:336-337)
    # because 3-bit dot error genuinely exceeds it; we gate at 0.04
    GGMLType.Q3_K: (0.01, 0.04),
    GGMLType.Q4_K: (0.005, 0.02),
    GGMLType.Q5_K: (0.002, 0.02),
    GGMLType.Q6_K: (0.002, 0.002),
    GGMLType.Q8_K: (0.0005, 0.002),
}


@pytest.mark.parametrize("typ", list(BUDGETS.keys()), ids=lambda t: t.name)
def test_roundtrip_rmse(typ):
    n = 1024
    x = generate_data(0.0, n)
    raw = quantize(typ, x)
    assert len(raw) == tensor_nbytes(typ, n)
    y = dequantize(typ, raw, n)
    budget = BUDGETS[typ][0]
    assert rmse(x, y) < budget, f"{typ.name} rmse {rmse(x, y)} > {budget}"


@pytest.mark.parametrize("typ", list(BUDGETS.keys()), ids=lambda t: t.name)
def test_dot_error(typ):
    """quantized(a)·quantized(b) vs float dot, per-element error budget."""
    n = 1024
    a = generate_data(0.3, n)
    b = generate_data(0.7, n)
    da = dequantize(typ, quantize(typ, a), n)
    # partner-side quantization for b (activation path)
    from crabml_tpu.gguf.constants import VEC_DOT_PARTNER

    pt = VEC_DOT_PARTNER[typ]
    db = dequantize(pt, quantize(pt, b), n)
    got = float(da @ db)
    want = float(a @ b)
    err = abs(got - want) / n
    budget = BUDGETS[typ][1]
    assert err < budget, f"{typ.name}: {err} > {budget}"


@pytest.mark.parametrize(
    "typ", [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K, GGMLType.Q2_K, GGMLType.Q3_K],
    ids=lambda t: t.name,
)
def test_multi_block_independence(typ):
    """Each super-block must be encoded independently (reference Q2_K has a
    bug here, buf_q2_k.rs:196 indexes `data` not `data_chunk`; we are correct)."""
    x = generate_data(1.7, 2 * QK_K)
    one = dequantize(typ, quantize(typ, x[QK_K:]), QK_K)
    both = dequantize(typ, quantize(typ, x), 2 * QK_K)
    np.testing.assert_array_equal(both[QK_K:], one)


def test_q8_k_bsums():
    x = generate_data(0.1, QK_K)
    raw = np.frombuffer(quantize(GGMLType.Q8_K, x), np.uint8).reshape(1, -1)
    qs = raw[0, 4:260].view(np.int8).astype(np.int32)
    bsums = raw[0, 260:292].view(np.int16)
    np.testing.assert_array_equal(bsums, qs.reshape(16, 16).sum(axis=1).astype(np.int16))
