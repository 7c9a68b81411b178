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
