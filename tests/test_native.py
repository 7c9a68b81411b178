"""Native C++ layer vs the Python oracles: repack layout, dequant codecs,
GGUF probe. Bit-exactness is the contract — any drift here silently breaks
perplexity."""

import numpy as np
import pytest

from crabml_tpu import native
from crabml_tpu.gguf.constants import GGMLType
from crabml_tpu.ops.pallas import gemm_quant
from crabml_tpu.quant.codecs import dequantize, quantize
from crabml_tpu.quant.planar import to_planar

pytestmark = pytest.mark.skipif(not native.available(), reason="no native lib")

ALL = list(gemm_quant.SCHEMES)


@pytest.mark.parametrize("typ", ALL, ids=lambda t: t.name)
@pytest.mark.parametrize("mk", [(256, 512), (512, 2816)], ids=["even", "padded"])
def test_native_repack_matches_python(typ, mk):
    m, k = mk
    rng = np.random.default_rng(int(typ) + m)
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    raw = quantize(typ, w)

    want = gemm_quant.repack(to_planar(typ, raw, (m, k)))
    got = native.repack_raw(typ, np.frombuffer(raw, np.uint8), m, k)
    assert got is not None
    assert set(got) == set(want.planes)
    for name in want.planes:
        np.testing.assert_array_equal(
            got[name], np.asarray(want.planes[name]), err_msg=f"{typ.name}:{name}"
        )


@pytest.mark.parametrize("typ", ALL, ids=lambda t: t.name)
def test_native_dequant_matches_python(typ):
    m, k = 4, 512
    rng = np.random.default_rng(int(typ))
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    raw = quantize(typ, w)
    want = dequantize(typ, np.frombuffer(raw, np.uint8), m * k).reshape(m, k)
    got = native.dequant(typ, np.frombuffer(raw, np.uint8), m, k)
    assert got is not None
    np.testing.assert_array_equal(got, want)


def test_native_repack_bf16_scales():
    import ml_dtypes

    typ = GGMLType.Q4_K
    m, k = 256, 512
    rng = np.random.default_rng(7)
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    raw = quantize(typ, w)
    want = gemm_quant.repack(to_planar(typ, raw, (m, k)), scale_dtype="bf16")
    got = native.repack_raw(typ, np.frombuffer(raw, np.uint8), m, k, scale_dtype="bf16")
    assert got["dsub"].dtype == ml_dtypes.bfloat16
    for name in want.planes:
        np.testing.assert_array_equal(
            np.asarray(got[name]).view(np.uint8), np.asarray(want.planes[name]).view(np.uint8)
        )


def test_gguf_probe(stories260k_path):
    with open(stories260k_path, "rb") as f:
        head = f.read(64)
    version, n_tensors, n_kv = native.gguf_probe(head)
    assert version == 1
    assert n_tensors == 48


# --- native ENCODERS (crabml_quantize / crabml_synth_quantize) -------------

# schemes whose encode is byte-identical to the numpy oracle; Q4_K/Q5_K/Q6_K
# differ in a few sub-blocks because their scale searches accumulate f32
# sequentially (like ggml/the reference) while numpy sums pairwise — both
# are valid encodings of the same algorithm
EXACT_ENC = [
    GGMLType.Q8_0, GGMLType.Q8_1, GGMLType.Q4_0, GGMLType.Q4_1,
    GGMLType.Q5_0, GGMLType.Q5_1, GGMLType.Q8_K, GGMLType.Q2_K, GGMLType.Q3_K,
]
SUMORDER_ENC = [GGMLType.Q4_K, GGMLType.Q5_K, GGMLType.Q6_K]


@pytest.mark.parametrize("typ", EXACT_ENC, ids=lambda t: t.name)
def test_native_quantize_bit_exact(typ):
    rng = np.random.default_rng(int(typ) + 99)
    x = rng.standard_normal(4096).astype(np.float32) * 0.3
    got = native.quantize(typ, x)
    assert got is not None
    assert got == quantize(typ, x)


@pytest.mark.parametrize("typ", SUMORDER_ENC, ids=lambda t: t.name)
def test_native_quantize_within_budget(typ):
    """Sum-order-divergent schemes: dequantized output must stay within the
    scheme's own quantization error of the numpy encoding, and round-trip
    within the reference error budgets (buf_q4_k.rs:289 etc.)."""
    rng = np.random.default_rng(int(typ) + 99)
    x = rng.standard_normal(8192).astype(np.float32) * 0.3
    got = native.quantize(typ, x)
    assert got is not None
    dn = dequantize(typ, np.frombuffer(got, np.uint8), x.size)
    dp = dequantize(typ, np.frombuffer(quantize(typ, x), np.uint8), x.size)
    # both encodings quantize the same data: they agree within ~1 quantum
    step = np.abs(dp - x).max()
    assert np.abs(dn - dp).max() <= 2.5 * step
    # and the native round-trip is no worse than the numpy one (2% slack)
    assert np.sqrt(np.mean((dn - x) ** 2)) <= 1.02 * np.sqrt(np.mean((dp - x) ** 2))


def test_native_synth_quantize_deterministic():
    a = native.synth_quantize(GGMLType.Q4_K, 7, 4096, 0.1)
    b = native.synth_quantize(GGMLType.Q4_K, 7, 4096, 0.1)
    c = native.synth_quantize(GGMLType.Q4_K, 8, 4096, 0.1)
    assert a is not None and a == b and a != c
    vals = dequantize(GGMLType.Q4_K, np.frombuffer(a, np.uint8), 4096)
    # Irwin-Hall(4) scaled to sigma=0.1: bounded, roughly centred
    assert np.abs(vals).max() < 0.5
    assert abs(float(vals.mean())) < 0.01
    assert 0.05 < float(vals.std()) < 0.2
