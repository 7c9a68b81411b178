"""Planar re-layout + on-device dequant must be bit-exact (f32) with the host
codecs for every quant scheme."""

import numpy as np
import pytest

from crabml_tpu.gguf.constants import GGMLType
from crabml_tpu.quant.codecs import dequantize, quantize
from crabml_tpu.quant.jnp_dequant import dequant_jnp
from crabml_tpu.quant.planar import QTensor, stack_qtensors, to_planar

SCHEMES = [
    GGMLType.F32,
    GGMLType.F16,
    GGMLType.Q8_0,
    GGMLType.Q4_0,
    GGMLType.Q4_1,
    GGMLType.Q5_0,
    GGMLType.Q5_1,
    GGMLType.Q2_K,
    GGMLType.Q3_K,
    GGMLType.Q4_K,
    GGMLType.Q5_K,
    GGMLType.Q6_K,
]


@pytest.mark.parametrize("typ", SCHEMES, ids=lambda t: t.name)
def test_planar_dequant_bitexact(typ):
    m, k = 4, 512
    rng = np.random.default_rng(int(typ))
    x = rng.standard_normal((m, k)).astype(np.float32)
    raw = quantize(typ, x)
    want = dequantize(typ, raw, m * k).reshape(m, k)

    qt = to_planar(typ, raw, (m, k))
    got = np.asarray(dequant_jnp(qt))
    np.testing.assert_array_equal(got, want, err_msg=typ.name)


def test_stacked_qtensors():
    typ = GGMLType.Q4_K
    rng = np.random.default_rng(7)
    qts = []
    wants = []
    for _ in range(3):
        x = rng.standard_normal((2, 256)).astype(np.float32)
        raw = quantize(typ, x)
        qts.append(to_planar(typ, raw, (2, 256)))
        wants.append(dequantize(typ, raw, 512).reshape(2, 256))
    st = stack_qtensors(qts)
    assert st.shape == (3, 2, 256)
    for i in range(3):
        layer = QTensor(st.kind, st.shape[1:], {n: p[i] for n, p in st.planes.items()})
        np.testing.assert_array_equal(np.asarray(dequant_jnp(layer)), wants[i])
