"""Pallas fused dequant+matmul kernels vs the exact XLA dequant path.

On CPU these run in interpret mode (same kernel code, no Mosaic); the real
TPU run is covered by bench.py and the verify drives.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crabml_tpu.gguf.constants import GGMLType
from crabml_tpu.quant.codecs import quantize
from crabml_tpu.quant.jnp_dequant import dequant_jnp
from crabml_tpu.quant.planar import QTensor, to_planar
from crabml_tpu.ops.pallas import gemm_quant

ALL = list(gemm_quant.SCHEMES)


@pytest.mark.parametrize("typ", ALL, ids=lambda t: t.name)
def test_kernel_matches_dequant(typ):
    rng = np.random.default_rng(int(typ))
    m, k = 256, 512
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, k)).astype(np.float32)

    qt = to_planar(typ, quantize(typ, w), (m, k))
    want = x @ np.asarray(dequant_jnp(qt)).T

    rqt = gemm_quant.repack(qt)
    assert rqt is not None and gemm_quant.is_repacked(rqt)
    got = gemm_quant.qmatmul_pallas(jnp.asarray(x, jnp.bfloat16), rqt, jnp.bfloat16)
    assert got is not None
    got = np.asarray(got, np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.01, f"{typ.name}: rel err {rel}"


def test_kernel_f32_is_tight():
    typ = GGMLType.Q4_K
    rng = np.random.default_rng(1)
    m, k = 256, 512
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    x = rng.standard_normal((1, k)).astype(np.float32)
    qt = to_planar(typ, quantize(typ, w), (m, k))
    want = x @ np.asarray(dequant_jnp(qt)).T
    rqt = gemm_quant.repack(qt)
    got = np.asarray(gemm_quant.qmatmul_pallas(jnp.asarray(x), rqt, jnp.float32))
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 2e-5, rel


def test_unsupported_shapes_fall_back():
    typ = GGMLType.Q8_0
    rng = np.random.default_rng(2)
    w = rng.standard_normal((100, 64)).astype(np.float32)
    qt = to_planar(typ, quantize(typ, w), (100, 64))
    assert gemm_quant.repack(qt) is None
    assert gemm_quant.qmatmul_pallas(jnp.zeros((1, 64)), qt) is None


def test_batched_lead_dims():
    typ = GGMLType.Q4_0
    rng = np.random.default_rng(3)
    m, k = 256, 512
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, 3, k)).astype(np.float32)
    qt = to_planar(typ, quantize(typ, w), (m, k))
    rqt = gemm_quant.repack(qt)
    got = gemm_quant.qmatmul_pallas(jnp.asarray(x), rqt, jnp.float32)
    assert got.shape == (2, 3, m)
    want = x.reshape(6, k) @ np.asarray(dequant_jnp(qt)).T
    np.testing.assert_allclose(np.asarray(got).reshape(6, m), want, rtol=2e-5, atol=2e-5)


def test_runner_pallas_backend_matches_xla(stories260k_path, tmp_path):
    """End-to-end: a Q8_0 synthetic model generates the same tokens on both
    backends (260k dims are too small for the kernels — they fall back)."""
    from crabml_tpu.models.synthetic import tiny_config, write_synthetic_gguf
    from crabml_tpu.runtime.runner import Runner
    from crabml_tpu.ops import matmul as mm

    cfg = tiny_config(
        embedding_dim=512, hidden_dim=512, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=512, seq_len=256,
    )
    path = str(tmp_path / "syn-q8.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.Q8_0, seed=5)

    r1 = Runner(path, seq_len=64, backend="xla", compute_dtype=jnp.bfloat16)
    out_xla = "".join(r1.prefill_and_generate("hello", steps=6))
    r2 = Runner(path, seq_len=64, backend="pallas", compute_dtype=jnp.bfloat16)
    out_pl = "".join(r2.prefill_and_generate("hello", steps=6))
    mm.set_backend("xla")
    assert out_xla == out_pl


@pytest.mark.parametrize("typ", ALL, ids=lambda t: t.name)
def test_w4a8_kernel_accuracy(typ):
    """W4A8 path (int8 activations × int weights on the MXU, group-sum
    correction — the reference's matmul_vec.rs:37-40 design): must stay
    within the Q8_0-activation error class of the exact dequant matmul."""
    rng = np.random.default_rng(int(typ) + 31)
    m, k = 256, 512
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    x = rng.standard_normal((2, k)).astype(np.float32)

    qt = to_planar(typ, quantize(typ, w), (m, k))
    want = x @ np.asarray(dequant_jnp(qt)).T

    rqt = gemm_quant.repack(qt)
    got = gemm_quant.qmatmul_pallas(jnp.asarray(x), rqt, jnp.float32,
                                    act_quant=True)
    assert got is not None
    got = np.asarray(got, np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    # activation int8 per-32 rounding: ~0.4% typical, 1% budget
    assert rel < 0.012, f"{typ.name}: w4a8 rel err {rel}"


def test_w4a8_stacked_layer_prefetch():
    """Scalar-prefetch layer selection works for the w4a8 kernel too."""
    from crabml_tpu.quant.planar import stack_qtensors

    typ = GGMLType.Q4_K
    rng = np.random.default_rng(3)
    m, k, L = 256, 512, 3
    ws = [rng.standard_normal((m, k)).astype(np.float32) * 0.1 for _ in range(L)]
    qts = [gemm_quant.repack(to_planar(typ, quantize(typ, w), (m, k))) for w in ws]
    stacked = stack_qtensors(qts)
    x = rng.standard_normal((1, k)).astype(np.float32)
    for l in range(L):
        got = gemm_quant.qmatmul_pallas(jnp.asarray(x), stacked, jnp.float32,
                                        layer=jnp.int32(l), act_quant=True)
        qt1 = to_planar(typ, quantize(typ, ws[l]), (m, k))
        want = x @ np.asarray(dequant_jnp(qt1)).T
        rel = np.abs(np.asarray(got) - want).max() / np.abs(want).max()
        assert rel < 0.012, f"layer {l}: {rel}"


def test_w_from_kernel_planes_roundtrip():
    """Kernel-layout planes reconstruct the exact dequantized weights
    (the W8 prefill path requantizes from this reconstruction)."""
    for typ in (GGMLType.Q4_K, GGMLType.Q6_K, GGMLType.Q5_0, GGMLType.Q8_0):
        rng = np.random.default_rng(int(typ))
        m, k = 256, 768
        w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
        qt = to_planar(typ, quantize(typ, w), (m, k))
        want = np.asarray(dequant_jnp(qt), np.float32)
        rqt = gemm_quant.repack(qt)
        got = gemm_quant.w_from_kernel_planes(rqt)
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("typ", [GGMLType.Q4_K, GGMLType.Q8_0, GGMLType.Q3_K],
                         ids=lambda t: t.name)
def test_w8_prefill_kernel_accuracy(typ):
    """W8 prefill path (depth-KSC int8 dots): end-to-end error vs the
    exact dequant matmul stays within the W4A8-class budget."""
    rng = np.random.default_rng(int(typ) + 7)
    m, k = 512, 1024
    B = 512  # prefill-class rows: routed to the W8 kernel
    w = rng.standard_normal((m, k)).astype(np.float32) * 0.1
    x = rng.standard_normal((B, k)).astype(np.float32)
    qt = to_planar(typ, quantize(typ, w), (m, k))
    want = x @ np.asarray(dequant_jnp(qt)).T

    rqt = gemm_quant.augment_w8(gemm_quant.repack(qt))
    assert "w8" in rqt.planes and "dw" in rqt.planes
    got = gemm_quant.qmatmul_pallas(jnp.asarray(x, jnp.bfloat16), rqt,
                                    jnp.bfloat16)
    got = np.asarray(got, np.float32)
    rel = np.abs(got - want).max() / np.abs(want).max()
    assert rel < 0.015, f"{typ.name}: W8 rel err {rel}"

    # small batches must NOT route through W8 (bandwidth regime)
    x1 = jnp.asarray(x[:2], jnp.bfloat16)
    got1 = np.asarray(gemm_quant.qmatmul_pallas(x1, rqt, jnp.bfloat16),
                      np.float32)
    rel1 = np.abs(got1 - want[:2]).max() / np.abs(want[:2]).max()
    assert rel1 < 0.01  # bf16-path accuracy, tighter than W8A8


def test_w8_stacked_layer_prefetch():
    """Stacked (lax.scan) W8 path: per-layer results equal per-layer
    unstacked calls."""
    typ = GGMLType.Q4_K
    rng = np.random.default_rng(11)
    L, m, k = 3, 256, 512
    B = 512
    ws = [rng.standard_normal((m, k)).astype(np.float32) * 0.1 for _ in range(L)]
    x = rng.standard_normal((B, k)).astype(np.float32)

    from crabml_tpu.quant.planar import stack_qtensors

    qts = [gemm_quant.augment_w8(gemm_quant.repack(
        to_planar(typ, quantize(typ, w), (m, k)))) for w in ws]
    stacked = stack_qtensors(qts)
    assert "w8" in stacked.planes
    for l in range(L):
        want = np.asarray(gemm_quant.qmatmul_pallas(
            jnp.asarray(x, jnp.bfloat16), qts[l], jnp.bfloat16), np.float32)
        got = np.asarray(gemm_quant.qmatmul_pallas(
            jnp.asarray(x, jnp.bfloat16), stacked, jnp.bfloat16,
            layer=jnp.int32(l)), np.float32)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_qmatmul_grouped_per_tile_planes():
    """Each TB-row tile of the grouped kernel multiplies ONLY the plane
    its experts[] entry names — pinned against per-plane dense matmuls
    on stacked random kernel-layout planes."""
    typ = GGMLType.Q4_K
    rng = np.random.default_rng(7)
    m, k, E, TB = 256, 512, 3, 8
    singles = [gemm_quant.random_repacked(typ, (m, k), np.random.default_rng(i))
               for i in range(E)]
    stacked = QTensor(
        typ, (E, m, k),
        {n: jnp.stack([jnp.asarray(s.planes[n]) for s in singles])
         for n in singles[0].planes},
    )
    P = 4 * TB
    experts = np.array([2, 0, 2, 1], np.int32)
    x = rng.standard_normal((P, k)).astype(np.float32) * 0.1
    got = np.asarray(gemm_quant.qmatmul_grouped(
        jnp.asarray(x), stacked, jnp.asarray(experts), TB, jnp.float32))
    assert got.shape == (P, m)
    for t, e in enumerate(experts):
        w = gemm_quant.w_from_kernel_planes(singles[e])
        want = x[t * TB:(t + 1) * TB] @ w.T
        rel = np.abs(got[t * TB:(t + 1) * TB] - want).max() / max(np.abs(want).max(), 1e-6)
        assert rel < 2e-5, (t, e, rel)


def test_qmatmul_grouped_w8_planes():
    """With W8 prefill planes attached and rows >= W8_MIN_ROWS, the
    grouped call routes to the W8 kernel and still honors per-tile
    expert indices (int8-storage path: ~1e-2 relative tolerance)."""
    typ = GGMLType.Q8_0
    rng = np.random.default_rng(11)
    m, k, E, TB = 256, 512, 3, 8
    singles = [
        gemm_quant.augment_w8(
            gemm_quant.random_repacked(typ, (m, k), np.random.default_rng(i)))
        for i in range(E)
    ]
    assert all("w8" in s.planes for s in singles)
    stacked = QTensor(
        typ, (E, m, k),
        {n: jnp.stack([jnp.asarray(s.planes[n]) for s in singles])
         for n in singles[0].planes},
    )
    n_tiles = gemm_quant.W8_MIN_ROWS // TB
    P = n_tiles * TB
    experts = np.asarray(rng.integers(0, E, n_tiles), np.int32)
    x = rng.standard_normal((P, k)).astype(np.float32) * 0.1
    got = np.asarray(gemm_quant.qmatmul_grouped(
        jnp.asarray(x), stacked, jnp.asarray(experts), TB, jnp.float32))
    for t in range(0, n_tiles, 7):  # sample tiles
        e = experts[t]
        w = gemm_quant.w_from_kernel_planes(singles[e])
        want = x[t * TB:(t + 1) * TB] @ w.T
        rel = np.abs(got[t * TB:(t + 1) * TB] - want).max() / max(np.abs(want).max(), 1e-6)
        assert rel < 2e-2, (t, e, rel)
