"""On-device dequantization of planar QTensors (XLA-composed).

Each function reconstructs the dense (m, k) weight from planes using only
reshape/shift/mask/multiply — all fusable by XLA into the consuming matmul.
Bit-exact (in f32) with the host codecs in crabml_tpu.quant.codecs, which are
themselves validated against the ggml layouts. The Pallas kernels in
crabml_tpu.ops.pallas use the same plane layouts.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..gguf.constants import GGMLType
from .planar import QTensor


def _unpack_nib16(qs, m, k):
    """ggml 32-block nibble order: byte j -> elems j (lo), j+16 (hi)."""
    q = qs.reshape(m, k // 32, 16)
    lo = q & 0xF
    hi = q >> 4
    return jnp.concatenate([lo, hi], axis=-1).reshape(m, k)


def _unpack_nib32(qs, m, k):
    """K-quant 64-chunk nibble order: byte j of chunk -> elems j, j+32."""
    q = qs.reshape(m, k // 64, 32)
    lo = q & 0xF
    hi = q >> 4
    return jnp.concatenate([lo, hi], axis=-1).reshape(m, k)


def _unpack_bits(qh, m, k):
    """LSB-first bitplane u8 (m, k/8) -> (m, k) in {0,1}."""
    h = qh.reshape(m, k // 8, 1)
    shifts = jnp.arange(8, dtype=jnp.uint8).reshape(1, 1, 8)
    return ((h >> shifts) & 1).reshape(m, k)


def _unpack_2bit(qs, m, k):
    """K-quant 2-bit order: per 128-half, byte l -> elems l+32j at shift 2j."""
    q = qs.reshape(m, k // 128, 1, 32)
    shifts = (jnp.arange(4, dtype=jnp.uint8) * 2).reshape(1, 1, 4, 1)
    return ((q >> shifts) & 3).reshape(m, k)


def _rep(plane, n):
    """Broadcast a per-group plane (m, k/n) over its n-element groups."""
    return jnp.repeat(plane, n, axis=-1)


def dequant_jnp(qt: QTensor, dtype=jnp.float32) -> jnp.ndarray:
    """Planes -> dense (m, k). Call inside jit; XLA fuses into the matmul."""
    m, k = qt.m, qt.k
    p = qt.planes
    t = GGMLType
    kind = qt.kind

    if kind in (t.F32, t.F16):
        return p["w"].astype(dtype)

    if kind in (t.Q8_0, t.Q8_1):
        w = p["qs"].astype(dtype) * _rep(p["d"], 32).astype(dtype)
        return w

    if kind == t.Q4_0:
        q = _unpack_nib16(p["qs"], m, k).astype(jnp.int8) - 8
        return q.astype(dtype) * _rep(p["d"], 32).astype(dtype)

    if kind == t.Q4_1:
        q = _unpack_nib16(p["qs"], m, k)
        return q.astype(dtype) * _rep(p["d"], 32).astype(dtype) + _rep(
            p["mn"], 32
        ).astype(dtype)

    if kind == t.Q5_0:
        q = _unpack_nib16(p["qs"], m, k).astype(jnp.int32)
        hb = _unpack_bits(p["qh"], m, k).astype(jnp.int32)
        q = (q | (hb << 4)) - 16
        return q.astype(dtype) * _rep(p["d"], 32).astype(dtype)

    if kind == t.Q5_1:
        q = _unpack_nib16(p["qs"], m, k).astype(jnp.int32)
        hb = _unpack_bits(p["qh"], m, k).astype(jnp.int32)
        q = q | (hb << 4)
        return q.astype(dtype) * _rep(p["d"], 32).astype(dtype) + _rep(
            p["mn"], 32
        ).astype(dtype)

    if kind == t.Q2_K:
        q = _unpack_2bit(p["qs"], m, k)
        dl = _rep(p["d"], 256).astype(dtype) * _rep(p["sc"], 16).astype(dtype)
        ml = _rep(p["dmin"], 256).astype(dtype) * _rep(p["mn"], 16).astype(dtype)
        return dl * q.astype(dtype) - ml

    if kind == t.Q3_K:
        q = _unpack_2bit(p["qs"], m, k).astype(jnp.int32)
        hb = _unpack_bits(p["hb"], m, k).astype(jnp.int32)
        # NOTE the reference/ggml ordering: high bit for element e of the
        # superblock lives in hmask byte e%32, bit e//32 — _unpack_bits gives
        # bit b of byte j at position j*8+b, so re-index via reshape/transpose.
        hbm = hb.reshape(m, k // 256, 32, 8).transpose(0, 1, 3, 2).reshape(m, k)
        q = q - 4 * (1 - hbm)
        dl = _rep(p["d"], 256).astype(dtype) * _rep(p["sc"], 16).astype(dtype)
        return dl * q.astype(dtype)

    if kind == t.Q4_K:
        q = _unpack_nib32(p["qs"], m, k)
        dl = _rep(p["d"], 256).astype(dtype) * _rep(p["sc"], 32).astype(dtype)
        ml = _rep(p["dmin"], 256).astype(dtype) * _rep(p["mn"], 32).astype(dtype)
        return dl * q.astype(dtype) - ml

    if kind == t.Q5_K:
        q = _unpack_nib32(p["qs"], m, k).astype(jnp.int32)
        # qh bit for elem: chunk c (64 elems), lo half bit 2c, hi half 2c+1,
        # over the same 32 qh bytes per superblock
        hb = _unpack_bits(p["qh"], m, k)  # (m, k) in byte-major bit order
        hbm = (
            hb.reshape(m, k // 256, 32, 8).transpose(0, 1, 3, 2).reshape(m, k)
        )  # elem-major: superblock e -> byte e%32? see note below
        q = q + 16 * hbm.astype(jnp.int32)
        dl = _rep(p["d"], 256).astype(dtype) * _rep(p["sc"], 32).astype(dtype)
        ml = _rep(p["dmin"], 256).astype(dtype) * _rep(p["mn"], 32).astype(dtype)
        return dl * q.astype(dtype) - ml

    if kind == t.Q6_K:
        ql = p["ql"].reshape(m, k // 128, 64)
        q_lo = jnp.concatenate([ql & 0xF, ql >> 4], axis=-1)  # q1q2 | q3q4
        qh = p["qh"].reshape(m, k // 128, 1, 32)
        shifts = (jnp.arange(4, dtype=jnp.uint8) * 2).reshape(1, 1, 4, 1)
        q_hi = ((qh >> shifts) & 3).reshape(m, k // 128, 128)
        q = (q_lo.astype(jnp.int32) | (q_hi.astype(jnp.int32) << 4)) - 32
        q = q.reshape(m, k)
        dl = _rep(p["d"], 256).astype(dtype) * _rep(p["sc"], 16).astype(dtype)
        return dl * q.astype(dtype)

    raise NotImplementedError(f"dequant_jnp for {kind.name}")
