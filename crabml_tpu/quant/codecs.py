"""Bit-exact ggml block-quantization codecs (host side, vectorized numpy).

Implements dequantize + quantize for every ggml dtype the reference supports
(Q4_0/Q4_1, Q5_0/Q5_1, Q8_0/Q8_1, Q2_K..Q8_K, F16/F32; layout tables in
SURVEY §2.4, reference structs in crabml-core/src/cpu/buf/buf_*.rs). These are
the *reference semantics* used for: loading GGUF weights, generating test
fixtures, and validating the Pallas fused kernels. The hot path on TPU never
calls these — it consumes the planar re-layouts from crabml_tpu.quant.planar.

Everything is vectorized numpy over blocks; the iterative K-quant scale search
(make_qkx1_quants / make_qx_quants, reference crabml-core/src/cpu/buf/util.rs)
is vectorized across sub-blocks with convergence masks so results stay
bit-identical to the sequential reference.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType, GGML_BLOCK_SIZES, QK_K

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def f16_bits_to_f32(bits: np.ndarray) -> np.ndarray:
    """u16 IEEE-754 half bits -> f32 (exact)."""
    return bits.astype(np.uint16).view(np.float16).astype(np.float32)


def f32_to_f16_bits(x: np.ndarray) -> np.ndarray:
    return np.asarray(x, dtype=np.float32).astype(np.float16).view(np.uint16)


def nearest_i32(x: np.ndarray) -> np.ndarray:
    """ggml's magic-number round-to-nearest-even (util.rs:10-16), bit-exact."""
    f = np.asarray(x, dtype=np.float32) + np.float32(12582912.0)
    i = f.view(np.int32)
    return (i & 0x007FFFFF) - 0x00400000


def _round_half_away(x: np.ndarray) -> np.ndarray:
    """C roundf / Rust f32::round: ties away from zero."""
    return np.trunc(x + np.copysign(np.float32(0.5), x))


def _blocks(raw: bytes | np.ndarray, typ: GGMLType) -> np.ndarray:
    """(n_blocks, block_bytes) u8 view of the packed payload."""
    _, bsz = GGML_BLOCK_SIZES[typ]
    a = np.frombuffer(raw, dtype=np.uint8) if not isinstance(raw, np.ndarray) else raw.reshape(-1)
    assert a.size % bsz == 0, f"payload {a.size}B not a multiple of {typ.name} block {bsz}B"
    return a.reshape(-1, bsz)


# ---------------------------------------------------------------------------
# dequantization (bit-exact vs reference dequantize())
# ---------------------------------------------------------------------------


def dequantize_f32(raw) -> np.ndarray:
    return np.frombuffer(raw, dtype=np.float32).copy() if not isinstance(raw, np.ndarray) else raw.view(np.float32).reshape(-1)


def dequantize_f16(raw) -> np.ndarray:
    a = np.frombuffer(raw, dtype=np.float16) if not isinstance(raw, np.ndarray) else raw.view(np.float16)
    return a.astype(np.float32).reshape(-1)


def dequantize_q8_0(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_0)
    d = f16_bits_to_f32(b[:, 0:2].copy().view(np.uint16).reshape(-1))
    qs = b[:, 2:34].view(np.int8).astype(np.float32)
    return (qs * d[:, None]).reshape(-1)


def dequantize_q8_1(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_1)
    d = f16_bits_to_f32(b[:, 0:2].copy().view(np.uint16).reshape(-1))
    qs = b[:, 4:36].view(np.int8).astype(np.float32)
    return (qs * d[:, None]).reshape(-1)


def _nibbles(qs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    return (qs & 0xF), (qs >> 4)


def dequantize_q4_0(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_0)
    d = f16_bits_to_f32(b[:, 0:2].copy().view(np.uint16).reshape(-1))[:, None]
    lo, hi = _nibbles(b[:, 2:18])
    # block layout: byte j holds elems j (lo) and j+16 (hi)  (buf_q4_0.rs:10-15)
    q = np.concatenate([lo, hi], axis=1).astype(np.float32) - 8.0
    return (q * d).reshape(-1)


def dequantize_q4_1(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q4_1)
    u16 = b[:, 0:4].copy().view(np.uint16)
    d = f16_bits_to_f32(u16[:, 0])[:, None]
    m = f16_bits_to_f32(u16[:, 1])[:, None]
    lo, hi = _nibbles(b[:, 4:20])
    q = np.concatenate([lo, hi], axis=1).astype(np.float32)
    return (q * d + m).reshape(-1)


def _qh_bits(qh_bytes: np.ndarray) -> np.ndarray:
    """(nb, 4) u8 -> (nb, 32) the 32 per-element high bits (LSB-first u32)."""
    bits = np.unpackbits(qh_bytes, axis=1, bitorder="little")
    return bits  # (nb, 32)


def dequantize_q5_0(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_0)
    d = f16_bits_to_f32(b[:, 0:2].copy().view(np.uint16).reshape(-1))[:, None]
    hb = _qh_bits(b[:, 2:6])
    lo, hi = _nibbles(b[:, 6:22])
    q = np.concatenate([lo, hi], axis=1).astype(np.int32) | (hb.astype(np.int32) << 4)
    return ((q - 16).astype(np.float32) * d).reshape(-1)


def dequantize_q5_1(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q5_1)
    u16 = b[:, 0:4].copy().view(np.uint16)
    d = f16_bits_to_f32(u16[:, 0])[:, None]
    m = f16_bits_to_f32(u16[:, 1])[:, None]
    hb = _qh_bits(b[:, 4:8])
    lo, hi = _nibbles(b[:, 8:24])
    q = np.concatenate([lo, hi], axis=1).astype(np.int32) | (hb.astype(np.int32) << 4)
    return (q.astype(np.float32) * d + m).reshape(-1)


def dequantize_q8_k(raw) -> np.ndarray:
    b = _blocks(raw, GGMLType.Q8_K)
    d = b[:, 0:4].copy().view(np.float32).reshape(-1)[:, None]
    qs = b[:, 4:260].view(np.int8).astype(np.float32)
    return (qs * d).reshape(-1)


def dequantize_q2_k(raw) -> np.ndarray:
    # layout: scales u8[16], qs u8[64], d f16, dmin f16 (buf_q2_k.rs:12-28)
    b = _blocks(raw, GGMLType.Q2_K)
    nb = b.shape[0]
    scales = b[:, 0:16]
    qs = b[:, 16:80].reshape(nb, 2, 32)  # two 128-elem halves
    dd = f16_bits_to_f32(b[:, 80:82].copy().view(np.uint16).reshape(-1))[:, None]
    dmin = f16_bits_to_f32(b[:, 82:84].copy().view(np.uint16).reshape(-1))[:, None]

    shifts = np.arange(4, dtype=np.uint8) * 2  # (4,)
    # q[half, shift, l] for l in 0..32 -> elems half*128 + shift*32 + l
    q = (qs[:, :, None, :] >> shifts[None, None, :, None]) & 3  # (nb, 2, 4, 32)
    q = q.reshape(nb, 256).astype(np.float32)

    sc = (scales & 0xF).astype(np.float32)  # (nb, 16) per-16-elem scales
    mn = (scales >> 4).astype(np.float32)
    dl = (dd * sc).repeat(16, axis=1)  # (nb, 256)
    ml = (dmin * mn).repeat(16, axis=1)
    return (dl * q - ml).reshape(-1)


def _q3k_scales(scales_raw: np.ndarray) -> np.ndarray:
    """Unpack Q3_K 12-byte scale field -> (nb, 16) int32 (pre -32 offset).

    The u32 shuffle from buf_q3_k.rs / ggml: 16 6-bit values.
    """
    nb = scales_raw.shape[0]
    aux = scales_raw.copy().view(np.uint32)  # (nb, 3)
    kmask1 = np.uint32(0x03030303)
    kmask2 = np.uint32(0x0F0F0F0F)
    tmp = aux[:, 2]
    a0 = (aux[:, 0] & kmask2) | (((tmp >> np.uint32(0)) & kmask1) << np.uint32(4))
    a1 = (aux[:, 1] & kmask2) | (((tmp >> np.uint32(2)) & kmask1) << np.uint32(4))
    a2 = ((aux[:, 0] >> np.uint32(4)) & kmask2) | (((tmp >> np.uint32(4)) & kmask1) << np.uint32(4))
    a3 = ((aux[:, 1] >> np.uint32(4)) & kmask2) | (((tmp >> np.uint32(6)) & kmask1) << np.uint32(4))
    packed = np.stack([a0, a1, a2, a3], axis=1)  # (nb, 4) u32
    return packed.view(np.int8).astype(np.int32).reshape(nb, 16)


def dequantize_q3_k(raw) -> np.ndarray:
    # layout: hmask u8[32], qs u8[64], scales u8[12], d f16 (buf_q3_k.rs:21-30)
    b = _blocks(raw, GGMLType.Q3_K)
    nb = b.shape[0]
    hmask = b[:, 0:32]
    qs = b[:, 32:96].reshape(nb, 2, 32)
    scales = _q3k_scales(b[:, 96:108]) - 32  # (nb, 16)
    dd = f16_bits_to_f32(b[:, 108:110].copy().view(np.uint16).reshape(-1))[:, None]

    shifts = np.arange(4, dtype=np.uint8) * 2
    q = ((qs[:, :, None, :] >> shifts[None, None, :, None]) & 3).astype(np.int32)
    # high bit: m = 1 << (half*4 + j), applied over the SAME 32 hmask bytes
    mbit = (np.arange(2)[:, None] * 4 + np.arange(4)[None, :]).astype(np.uint8)  # (2,4)
    hm = (hmask[:, None, None, :] >> mbit[None, :, :, None]) & 1  # (nb,2,4,32)
    q = q - 4 * (1 - hm.astype(np.int32))
    q = q.reshape(nb, 256).astype(np.float32)

    dl = dd * scales.astype(np.float32)  # (nb, 16)
    dl = dl.repeat(16, axis=1)  # elem e uses scale[e//16]
    return (dl * q).reshape(-1)


def _k4_scale_min(scales_raw: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """get_scale_min_k4 for all 8 sub-blocks (util.rs:19-27). -> (nb,8),(nb,8) u8."""
    q = scales_raw.astype(np.uint8)
    d = np.empty(q.shape[:-1] + (8,), dtype=np.uint8)
    m = np.empty_like(d)
    d[..., :4] = q[..., 0:4] & 63
    m[..., :4] = q[..., 4:8] & 63
    d[..., 4:] = (q[..., 8:12] & 0xF) | ((q[..., 0:4] >> 6) << 4)
    m[..., 4:] = (q[..., 8:12] >> 4) | ((q[..., 4:8] >> 6) << 4)
    return d, m


def dequantize_q4_k(raw) -> np.ndarray:
    # layout: d f16, dmin f16, scales u8[12], qs u8[128] (buf_q4_k.rs:14-21)
    b = _blocks(raw, GGMLType.Q4_K)
    nb = b.shape[0]
    u16 = b[:, 0:4].copy().view(np.uint16)
    dd = f16_bits_to_f32(u16[:, 0])[:, None]
    dmin = f16_bits_to_f32(u16[:, 1])[:, None]
    sc, mn = _k4_scale_min(b[:, 4:16])  # (nb, 8)
    qs = b[:, 16:144].reshape(nb, 4, 32)  # 4 chunks of 64 elems
    lo = (qs & 0xF).astype(np.float32)
    hi = (qs >> 4).astype(np.float32)
    q = np.concatenate([lo[:, :, None, :], hi[:, :, None, :]], axis=2)  # (nb,4,2,32)
    d_sub = (dd * sc.astype(np.float32)).reshape(nb, 4, 2)[:, :, :, None]
    m_sub = (dmin * mn.astype(np.float32)).reshape(nb, 4, 2)[:, :, :, None]
    return (q * d_sub - m_sub).reshape(-1)


def dequantize_q5_k(raw) -> np.ndarray:
    # layout: d f16, dmin f16, scales u8[12], qh u8[32], qs u8[128]
    b = _blocks(raw, GGMLType.Q5_K)
    nb = b.shape[0]
    u16 = b[:, 0:4].copy().view(np.uint16)
    dd = f16_bits_to_f32(u16[:, 0])[:, None]
    dmin = f16_bits_to_f32(u16[:, 1])[:, None]
    sc, mn = _k4_scale_min(b[:, 4:16])
    qh = b[:, 16:48]
    qs = b[:, 48:176].reshape(nb, 4, 32)
    lo = (qs & 0xF).astype(np.int32)
    hi = (qs >> 4).astype(np.int32)
    # qh bit u1 = 1 << 2c for lo of chunk c, u2 = 2 << 2c for hi (buf_q5_k.rs:24-59)
    c = np.arange(4)
    u1 = (qh[:, None, :] >> (2 * c)[None, :, None]) & 1  # (nb,4,32)
    u2 = (qh[:, None, :] >> (2 * c + 1)[None, :, None]) & 1
    lo = lo + 16 * u1.astype(np.int32)
    hi = hi + 16 * u2.astype(np.int32)
    q = np.concatenate([lo[:, :, None, :], hi[:, :, None, :]], axis=2).astype(np.float32)
    d_sub = (dd * sc.astype(np.float32)).reshape(nb, 4, 2)[:, :, :, None]
    m_sub = (dmin * mn.astype(np.float32)).reshape(nb, 4, 2)[:, :, :, None]
    return (q * d_sub - m_sub).reshape(-1)


def dequantize_q6_k(raw) -> np.ndarray:
    # layout: ql u8[128], qh u8[64], scales i8[16], d f16 (buf_q6_k.rs:11-19)
    b = _blocks(raw, GGMLType.Q6_K)
    nb = b.shape[0]
    ql = b[:, 0:128].reshape(nb, 2, 64)
    qh = b[:, 128:192].reshape(nb, 2, 32)
    scales = b[:, 192:208].view(np.int8).astype(np.float32)  # (nb, 16)
    dd = f16_bits_to_f32(b[:, 208:210].copy().view(np.uint16).reshape(-1))[:, None]

    l_lo = ql[:, :, 0:32].astype(np.int32)
    l_hi = ql[:, :, 32:64].astype(np.int32)
    h = qh.astype(np.int32)
    q1 = (l_lo & 0xF) | ((h & 3) << 4)
    q2 = (l_hi & 0xF) | (((h >> 2) & 3) << 4)
    q3 = (l_lo >> 4) | (((h >> 4) & 3) << 4)
    q4 = (l_hi >> 4) | (((h >> 6) & 3) << 4)
    # half-chunk layout: [q1(32) q2(32) q3(32) q4(32)] per 128 elems
    q = np.stack([q1, q2, q3, q4], axis=2) - 32  # (nb, 2, 4, 32)
    q = q.reshape(nb, 256).astype(np.float32)
    dl = (dd * scales).repeat(16, axis=1)  # scale index: elem e -> e//16
    return (dl * q).reshape(-1)


_DEQUANT = {
    GGMLType.F32: dequantize_f32,
    GGMLType.F16: dequantize_f16,
    GGMLType.Q4_0: dequantize_q4_0,
    GGMLType.Q4_1: dequantize_q4_1,
    GGMLType.Q5_0: dequantize_q5_0,
    GGMLType.Q5_1: dequantize_q5_1,
    GGMLType.Q8_0: dequantize_q8_0,
    GGMLType.Q8_1: dequantize_q8_1,
    GGMLType.Q2_K: dequantize_q2_k,
    GGMLType.Q3_K: dequantize_q3_k,
    GGMLType.Q4_K: dequantize_q4_k,
    GGMLType.Q5_K: dequantize_q5_k,
    GGMLType.Q6_K: dequantize_q6_k,
    GGMLType.Q8_K: dequantize_q8_k,
}


def dequantize(typ: GGMLType, raw, n_elems: int | None = None) -> np.ndarray:
    out = _DEQUANT[typ](raw)
    if n_elems is not None:
        assert out.size == n_elems, f"{typ.name}: got {out.size}, want {n_elems}"
    return out


# ---------------------------------------------------------------------------
# quantization (matches ggml/reference encoders)
# ---------------------------------------------------------------------------


def quantize_f32(x: np.ndarray) -> bytes:
    return np.asarray(x, dtype=np.float32).tobytes()


def quantize_f16(x: np.ndarray) -> bytes:
    return np.asarray(x, dtype=np.float32).astype(np.float16).tobytes()


def quantize_q8_0(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, 32)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    id_ = np.where(d != 0, np.float32(1.0) / d, np.float32(0.0))
    qs = _round_half_away(x * id_[:, None]).astype(np.int8)
    out = np.empty((x.shape[0], 34), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bits(d).reshape(-1, 1).view(np.uint8)
    out[:, 2:34] = qs.view(np.uint8)
    return out.tobytes()


def quantize_q8_1(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, 32)
    amax = np.abs(x).max(axis=1)
    d = (amax / 127.0).astype(np.float32)
    id_ = np.where(d != 0, np.float32(1.0) / d, np.float32(0.0))
    qs = _round_half_away(x * id_[:, None]).astype(np.int8)
    s = d * qs.astype(np.float32).sum(axis=1)
    out = np.empty((x.shape[0], 36), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bits(d).reshape(-1, 1).view(np.uint8)
    out[:, 2:4] = f32_to_f16_bits(s).reshape(-1, 1).view(np.uint8)
    out[:, 4:36] = qs.view(np.uint8)
    return out.tobytes()


def quantize_q4_0(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, 32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]  # signed value of max magnitude
    d = (maxv / -8.0).astype(np.float32)
    id_ = np.where(d != 0, np.float32(1.0) / d, np.float32(0.0))
    xi = x * id_[:, None] + np.float32(8.5)
    q = np.minimum(np.int32(15), xi.astype(np.int32)).astype(np.uint8)
    q = np.maximum(q, 0)
    out = np.empty((x.shape[0], 18), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bits(d).reshape(-1, 1).view(np.uint8)
    out[:, 2:18] = q[:, 0:16] | (q[:, 16:32] << 4)
    return out.tobytes()


def quantize_q4_1(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, 32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / 15.0).astype(np.float32)
    id_ = np.where(d != 0, np.float32(1.0) / d, np.float32(0.0))
    xi = (x - mn[:, None]) * id_[:, None] + np.float32(0.5)
    q = np.clip(xi.astype(np.int32), 0, 15).astype(np.uint8)
    out = np.empty((x.shape[0], 20), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bits(d).reshape(-1, 1).view(np.uint8)
    out[:, 2:4] = f32_to_f16_bits(mn).reshape(-1, 1).view(np.uint8)
    out[:, 4:20] = q[:, 0:16] | (q[:, 16:32] << 4)
    return out.tobytes()


def quantize_q5_0(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, 32)
    idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(x.shape[0]), idx]
    d = (maxv / -16.0).astype(np.float32)
    id_ = np.where(d != 0, np.float32(1.0) / d, np.float32(0.0))
    xi = x * id_[:, None] + np.float32(16.5)
    q = np.clip(xi.astype(np.int32), 0, 31).astype(np.uint8)
    qh = np.packbits((q >> 4) & 1, axis=1, bitorder="little")  # (nb, 4)
    out = np.empty((x.shape[0], 22), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bits(d).reshape(-1, 1).view(np.uint8)
    out[:, 2:6] = qh
    out[:, 6:22] = (q[:, 0:16] & 0xF) | ((q[:, 16:32] & 0xF) << 4)
    return out.tobytes()


def quantize_q5_1(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, 32)
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    d = ((mx - mn) / 31.0).astype(np.float32)
    id_ = np.where(d != 0, np.float32(1.0) / d, np.float32(0.0))
    xi = (x - mn[:, None]) * id_[:, None] + np.float32(0.5)
    q = np.clip(xi.astype(np.int32), 0, 31).astype(np.uint8)
    qh = np.packbits((q >> 4) & 1, axis=1, bitorder="little")
    out = np.empty((x.shape[0], 24), dtype=np.uint8)
    out[:, 0:2] = f32_to_f16_bits(d).reshape(-1, 1).view(np.uint8)
    out[:, 2:4] = f32_to_f16_bits(mn).reshape(-1, 1).view(np.uint8)
    out[:, 4:8] = qh
    out[:, 8:24] = (q[:, 0:16] & 0xF) | ((q[:, 16:32] & 0xF) << 4)
    return out.tobytes()


def quantize_q8_k(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    amax_idx = np.abs(x).argmax(axis=1)
    maxv = x[np.arange(nb), amax_idx]
    amax = np.abs(maxv)
    iscale = np.where(amax != 0, np.float32(-127.0) / maxv, np.float32(0.0))
    q = np.minimum(np.int32(127), nearest_i32(iscale[:, None] * x)).astype(np.int32)
    q = np.maximum(q, -128)
    d = np.where(iscale != 0, np.float32(1.0) / iscale, np.float32(0.0)).astype(np.float32)
    bsums = q.reshape(nb, 16, 16).sum(axis=2).astype(np.int16)
    out = np.empty((nb, 292), dtype=np.uint8)
    out[:, 0:4] = d.reshape(-1, 1).view(np.uint8)
    out[:, 4:260] = q.astype(np.int8).view(np.uint8)
    out[:, 260:292] = bsums.view(np.uint8).reshape(nb, 32)
    return out.tobytes()


# --- K-quant scale searches (vectorized ports of util.rs) -------------------


def make_qkx1_quants(nmax: int, x: np.ndarray, ntry: int = 5):
    """Vectorized make_qkx1_quants (util.rs:154-216) over rows of `x`.

    x: (nsb, n). Returns (scale (nsb,), the_min (nsb,), L (nsb, n) uint8).
    """
    x = np.asarray(x, dtype=np.float32)
    nsb, n = x.shape
    mn = x.min(axis=1)
    mx = x.max(axis=1)
    degenerate = mx == mn
    mn = np.where(mn > 0, np.float32(0.0), mn)

    iscale = np.where(degenerate, np.float32(0.0), nmax / (mx - mn))
    scale = np.where(iscale != 0, np.float32(1.0) / iscale, np.float32(0.0))
    L = np.zeros((nsb, n), dtype=np.int32)
    active = ~degenerate

    for _ in range(ntry):
        if not active.any():
            break
        l_new = np.clip(nearest_i32(iscale[:, None] * (x - mn[:, None])), 0, nmax)
        did_change = (l_new != L).any(axis=1) & active
        L = np.where(active[:, None], l_new, L)
        sumlx = ((x - mn[:, None]) * L).sum(axis=1)
        suml2 = (L * L).sum(axis=1).astype(np.float32)
        new_scale = np.where(suml2 != 0, sumlx / suml2, np.float32(0.0))
        scale = np.where(active, new_scale, scale)
        s = (x - scale[:, None] * L).sum(axis=1)
        new_min = s / np.float32(n)
        new_min = np.where(new_min > 0, np.float32(0.0), new_min)
        mn = np.where(active, new_min, mn)
        iscale = np.where(scale != 0, np.float32(1.0) / scale, np.float32(0.0))
        active = active & did_change

    the_min = -mn
    scale = np.where(degenerate, np.float32(0.0), scale)
    the_min = np.where(degenerate, np.float32(0.0), the_min)
    L = np.where(degenerate[:, None], 0, L)
    return scale.astype(np.float32), the_min.astype(np.float32), L.astype(np.uint8)


def make_qx_quants(nmax: int, x: np.ndarray, rmse_type: int = 1):
    """make_qx_quants (util.rs:29-152) over rows. Returns (scale (nsb,), L (nsb,n) ints in [0, 2*nmax))."""
    x = np.asarray(x, dtype=np.float32)
    nsb, n = x.shape
    out_scale = np.zeros(nsb, dtype=np.float32)
    out_L = np.zeros((nsb, n), dtype=np.int32)
    for r in range(nsb):
        out_scale[r], out_L[r] = _make_qx_quants_row(nmax, x[r], rmse_type)
    return out_scale, out_L


def _make_qx_quants_row(nmax: int, x: np.ndarray, rmse_type: int):
    n = x.size
    absx = np.abs(x)
    amax_i = int(absx.argmax())
    amax = absx[amax_i]
    if amax == 0:
        return np.float32(0.0), np.zeros(n, dtype=np.int32)
    maxv = x[amax_i]
    iscale = np.float32(-nmax) / maxv
    if rmse_type == 0:
        L = np.clip(nearest_i32(iscale * x), -nmax, nmax - 1) + nmax
        return np.float32(1.0) / iscale, L
    weight_type = rmse_type % 2
    w = x * x if weight_type == 1 else np.ones_like(x)
    l = np.clip(nearest_i32(iscale * x), -nmax, nmax - 1)
    L = l + nmax
    sumlx = np.float32((w * x * l).sum())
    suml2 = np.float32((w * l * l).sum())
    scale = sumlx / suml2
    best = scale * sumlx
    for _ in range(3):
        iscale = np.float32(1.0) / scale
        l_new = np.clip(nearest_i32(iscale * x), -nmax, nmax - 1)
        changed = (l_new + nmax != L).any()
        slx = np.float32((w * x * l_new).sum())
        sl2 = np.float32((w * l_new * l_new).sum())
        if not changed or sl2 == 0 or slx * slx <= best * sl2:
            break
        L = l_new + nmax
        sumlx, suml2 = slx, sl2
        scale = sumlx / suml2
        best = scale * sumlx
    # greedy per-element improvement (sequential by design)
    for _ in range(5):
        n_changed = 0
        for i in range(n):
            wi = np.float32(w[i])
            xi = np.float32(x[i])
            li = int(L[i]) - nmax
            slx = sumlx - wi * xi * np.float32(li)
            if slx > 0:
                sl2 = suml2 - wi * np.float32(li) * np.float32(li)
                new_l = int(np.clip(nearest_i32(xi * sl2 / slx), -nmax, nmax - 1))
                if new_l != li:
                    slx = slx + wi * xi * np.float32(new_l)
                    sl2 = sl2 + wi * np.float32(new_l) * np.float32(new_l)
                    if sl2 > 0 and slx * slx * suml2 > sumlx * sumlx * sl2:
                        L[i] = new_l + nmax
                        sumlx, suml2 = np.float32(slx), np.float32(sl2)
                        scale = sumlx / suml2
                        best = scale * sumlx
                        n_changed += 1
        if n_changed == 0:
            break
    if rmse_type < 3:
        return np.float32(scale), L
    for is_ in range(-4, 4):
        if is_ == 0:
            continue
        iscale = -(np.float32(nmax) + np.float32(0.1) * np.float32(is_)) / maxv
        l_new = np.clip(nearest_i32(iscale * x), -nmax, nmax - 1)
        sumlx_c = np.float32((w * x * l_new).sum())
        suml2_c = np.float32((w * l_new * l_new).sum())
        if suml2_c > 0 and sumlx_c * sumlx_c > best * suml2_c:
            L = l_new + nmax
            scale = sumlx_c / suml2_c
            best = scale * sumlx_c
    return np.float32(scale), L


def quantize_q2_k(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    out = np.zeros((nb, 84), dtype=np.uint8)
    Q4SCALE = np.float32(15.0)
    for i in range(nb):
        chunk = x[i]
        scales, mins, _ = make_qkx1_quants(3, chunk.reshape(16, 16), ntry=5)
        block_scales = np.zeros(16, dtype=np.uint8)
        max_scale = np.float32(max(scales.max(), 0.0))
        max_min = np.float32(max(mins.max(), 0.0))
        d = np.float16(0.0)
        dmin = np.float16(0.0)
        if max_scale > 0:
            iscale = Q4SCALE / max_scale
            block_scales |= nearest_i32(iscale * scales).astype(np.uint8)
            d = np.float16(max_scale / Q4SCALE)
        if max_min > 0:
            iscale = Q4SCALE / max_min
            block_scales |= (nearest_i32(iscale * mins).astype(np.uint8) << 4)
            dmin = np.float16(max_min / Q4SCALE)
        df = np.float32(d)
        dmf = np.float32(dmin)
        L = np.zeros(QK_K, dtype=np.int32)
        for j in range(16):
            dj = df * np.float32(block_scales[j] & 0xF)
            if dj == 0:
                continue
            dm = dmf * np.float32(block_scales[j] >> 4)
            L[16 * j : 16 * j + 16] = np.clip(
                nearest_i32((chunk[16 * j : 16 * j + 16] + dm) / dj), 0, 3
            )
        qs = np.zeros(64, dtype=np.uint8)
        Lh = L.reshape(2, 4, 32).astype(np.uint8)
        for half in range(2):
            qs[half * 32 : half * 32 + 32] = (
                Lh[half, 0] | (Lh[half, 1] << 2) | (Lh[half, 2] << 4) | (Lh[half, 3] << 6)
            )
        out[i, 0:16] = block_scales
        out[i, 16:80] = qs
        out[i, 80:82] = np.array([d], dtype=np.float16).view(np.uint8)
        out[i, 82:84] = np.array([dmin], dtype=np.float16).view(np.uint8)
    return out.tobytes()


def quantize_q3_k(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    out = np.zeros((nb, 110), dtype=np.uint8)
    for i in range(nb):
        chunk = x[i]
        scales = np.zeros(16, dtype=np.float32)
        for j in range(16):
            scales[j], _ = _make_q3_quants_row(4, chunk[16 * j : 16 * j + 16], do_rmse=True)
        amax_j = int(np.abs(scales).argmax())
        max_scale = scales[amax_j]
        sfield = np.zeros(12, dtype=np.uint8)
        d16 = np.float16(0.0)
        if max_scale != 0:
            iscale = np.float32(-32.0) / max_scale
            for j in range(16):
                l_ = int(np.clip(nearest_i32(iscale * scales[j]), -32, 31)) + 32
                if j < 8:
                    sfield[j] |= np.uint8(l_ & 0xF)
                else:
                    sfield[j - 8] |= np.uint8((l_ & 0xF) << 4)
                sfield[8 + j % 4] |= np.uint8((l_ >> 4) << (2 * (j // 4)))
            d16 = np.float16(np.float32(1.0) / iscale)
        df = np.float32(d16)
        L = np.zeros(QK_K, dtype=np.int32)
        for j in range(16):
            if j < 8:
                sc = sfield[j] & 0xF
            else:
                sc = sfield[j - 8] >> 4
            sc = np.int32(sc | (((sfield[8 + j % 4] >> (2 * (j // 4))) & 3) << 4)) - 32
            dj = df * np.float32(sc)
            if dj == 0:
                continue
            L[16 * j : 16 * j + 16] = (
                np.clip(nearest_i32(chunk[16 * j : 16 * j + 16] / dj), -4, 3) + 4
            )
        high = L > 3
        Lb = np.where(high, L - 4, L)
        # hmask bit for element j lives in byte j%32, bit j//32
        hmask = np.bitwise_or.reduce(
            high.astype(np.uint8).reshape(8, 32) << np.arange(8, dtype=np.uint8)[:, None],
            axis=0,
        )
        qs = np.zeros(64, dtype=np.uint8)
        Lh = Lb.reshape(2, 4, 32).astype(np.uint8)
        for half in range(2):
            qs[half * 32 : half * 32 + 32] = (
                Lh[half, 0] | (Lh[half, 1] << 2) | (Lh[half, 2] << 4) | (Lh[half, 3] << 6)
            )
        out[i, 0:32] = hmask
        out[i, 32:96] = qs
        out[i, 96:108] = sfield
        out[i, 108:110] = np.array([d16], dtype=np.float16).view(np.uint8)
    return out.tobytes()


def _make_q3_quants_row(nmax: int, x: np.ndarray, do_rmse: bool):
    """make_q3_quants (util.rs:218-284) for one row."""
    x = np.asarray(x, dtype=np.float32)
    n = x.size
    absx = np.abs(x)
    amax_i = int(absx.argmax())
    amax = absx[amax_i]
    if amax == 0:
        return np.float32(0.0), np.zeros(n, dtype=np.int32)
    maxv = x[amax_i]
    iscale = np.float32(-nmax) / maxv
    if do_rmse:
        L = np.clip(nearest_i32(iscale * x), -nmax, nmax - 1)
        w = x * x
        sumlx = np.float32((w * x * L).sum())
        suml2 = np.float32((w * L * L).sum())
        for _ in range(5):
            n_changed = 0
            for idx in range(n):
                wi, xi, li = np.float32(w[idx]), np.float32(x[idx]), int(L[idx])
                slx = sumlx - wi * xi * np.float32(li)
                if slx > 0:
                    sl2 = suml2 - wi * np.float32(li) * np.float32(li)
                    new_l = int(np.clip(nearest_i32(xi * sl2 / slx), -nmax, nmax - 1))
                    if new_l != li:
                        slx = slx + wi * xi * np.float32(new_l)
                        sl2 = sl2 + wi * np.float32(new_l) * np.float32(new_l)
                        if sl2 > 0 and slx * slx * suml2 > sumlx * sumlx * sl2:
                            L[idx] = new_l
                            sumlx, suml2 = np.float32(slx), np.float32(sl2)
                            n_changed += 1
            if n_changed == 0:
                break
        return np.float32(sumlx / suml2), L + nmax
    L = np.clip(nearest_i32(iscale * x), -nmax, nmax - 1) + nmax
    return np.float32(1.0) / iscale, L


def _pack_k4_scales(ls: np.ndarray, lm: np.ndarray) -> np.ndarray:
    """Pack 8 6-bit (scale, min) pairs into the 12-byte field (inverse of get_scale_min_k4)."""
    sf = np.zeros(12, dtype=np.uint8)
    for idx in range(8):
        s, m = int(ls[idx]), int(lm[idx])
        if idx < 4:
            sf[idx] = s
            sf[idx + 4] = m
        else:
            sf[idx + 4] = (s & 0xF) | ((m & 0xF) << 4)
            sf[idx - 4] |= (s >> 4) << 6
            sf[idx] |= (m >> 4) << 6
    return sf


def quantize_q4_k(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    out = np.zeros((nb, 144), dtype=np.uint8)
    for i in range(nb):
        chunk = x[i]
        scales, mins, _ = make_qkx1_quants(15, chunk.reshape(8, 32), ntry=5)
        max_scale = np.float32(max(scales.max(), 0.0))
        max_min = np.float32(max(mins.max(), 0.0))
        inv_scale = np.float32(63.0) / max_scale if max_scale > 0 else np.float32(0.0)
        inv_min = np.float32(63.0) / max_min if max_min > 0 else np.float32(0.0)
        ls = np.minimum(nearest_i32(inv_scale * scales), 63).astype(np.uint8)
        lm = np.minimum(nearest_i32(inv_min * mins), 63).astype(np.uint8)
        sfield = _pack_k4_scales(ls, lm)
        d = max_scale / np.float32(63.0)
        dmin = max_min / np.float32(63.0)
        sc, mn = _k4_scale_min(sfield[None, :])
        L = np.zeros(QK_K, dtype=np.int32)
        for idx in range(8):
            dj = d * np.float32(sc[0, idx])
            if dj == 0:
                continue
            dm = dmin * np.float32(mn[0, idx])
            L[32 * idx : 32 * idx + 32] = np.clip(
                nearest_i32((chunk[32 * idx : 32 * idx + 32] + dm) / dj), 0, 15
            )
        qs = np.zeros(128, dtype=np.uint8)
        Lc = L.reshape(4, 64).astype(np.uint8)
        for c in range(4):
            qs[32 * c : 32 * c + 32] = Lc[c, 0:32] | (Lc[c, 32:64] << 4)
        out[i, 0:2] = np.array([np.float16(d)], dtype=np.float16).view(np.uint8)
        out[i, 2:4] = np.array([np.float16(dmin)], dtype=np.float16).view(np.uint8)
        out[i, 4:16] = sfield
        out[i, 16:144] = qs
    return out.tobytes()


def quantize_q5_k(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    out = np.zeros((nb, 176), dtype=np.uint8)
    for i in range(nb):
        chunk = x[i]
        scales, mins, _ = make_qkx1_quants(31, chunk.reshape(8, 32), ntry=5)
        max_scale = np.float32(max(scales.max(), 0.0))
        max_min = np.float32(max(mins.max(), 0.0))
        inv_scale = np.float32(63.0) / max_scale if max_scale > 0 else np.float32(0.0)
        inv_min = np.float32(63.0) / max_min if max_min > 0 else np.float32(0.0)
        ls = np.minimum(nearest_i32(inv_scale * scales), 63).astype(np.uint8)
        lm = np.minimum(nearest_i32(inv_min * mins), 63).astype(np.uint8)
        sfield = _pack_k4_scales(ls, lm)
        d = max_scale / np.float32(63.0)
        dmin = max_min / np.float32(63.0)
        sc, mn = _k4_scale_min(sfield[None, :])
        L = np.zeros(QK_K, dtype=np.int32)
        for idx in range(8):
            dj = d * np.float32(sc[0, idx])
            if dj == 0:
                continue
            dm = dmin * np.float32(mn[0, idx])
            L[32 * idx : 32 * idx + 32] = np.clip(
                nearest_i32((chunk[32 * idx : 32 * idx + 32] + dm) / dj), 0, 31
            )
        qh = np.zeros(32, dtype=np.uint8)
        ql = np.zeros(128, dtype=np.uint8)
        Lc = L.reshape(4, 64)
        for c in range(4):
            l1 = Lc[c, 0:32].copy()
            l2 = Lc[c, 32:64].copy()
            hb1 = l1 > 15
            hb2 = l2 > 15
            l1 = np.where(hb1, l1 - 16, l1)
            l2 = np.where(hb2, l2 - 16, l2)
            qh |= (hb1.astype(np.uint8) << (2 * c)) | (hb2.astype(np.uint8) << (2 * c + 1))
            ql[32 * c : 32 * c + 32] = (l1 | (l2 << 4)).astype(np.uint8)
        out[i, 0:2] = np.array([np.float16(d)], dtype=np.float16).view(np.uint8)
        out[i, 2:4] = np.array([np.float16(dmin)], dtype=np.float16).view(np.uint8)
        out[i, 4:16] = sfield
        out[i, 16:48] = qh
        out[i, 48:176] = ql
    return out.tobytes()


def quantize_q6_k(x: np.ndarray) -> bytes:
    x = np.asarray(x, dtype=np.float32).reshape(-1, QK_K)
    nb = x.shape[0]
    out = np.zeros((nb, 210), dtype=np.uint8)
    for i in range(nb):
        chunk = x[i]
        scales, _ = make_qx_quants(32, chunk.reshape(16, 16), rmse_type=1)
        amax_j = int(np.abs(scales).argmax())
        max_abs_scale = np.abs(scales[amax_j])
        if max_abs_scale == 0:
            continue  # all-zero block stays zero
        max_scale = scales[amax_j]
        iscale = np.float32(-128.0) / max_scale
        d = np.float32(1.0) / iscale
        block_scales = np.minimum(nearest_i32(iscale * scales), 127).astype(np.int8)
        L = np.zeros(QK_K, dtype=np.int32)
        for j in range(16):
            dj = d * np.float32(block_scales[j])
            if dj == 0:
                continue
            L[16 * j : 16 * j + 16] = (
                np.clip(nearest_i32(chunk[16 * j : 16 * j + 16] / dj), -32, 31) + 32
            )
        ql = np.zeros(128, dtype=np.uint8)
        qh = np.zeros(64, dtype=np.uint8)
        Lh = L.reshape(2, 4, 32)
        for half in range(2):
            q1, q2, q3, q4 = (Lh[half, c] for c in range(4))
            ql[64 * half : 64 * half + 32] = ((q1 & 0xF) | ((q3 & 0xF) << 4)).astype(np.uint8)
            ql[64 * half + 32 : 64 * half + 64] = ((q2 & 0xF) | ((q4 & 0xF) << 4)).astype(np.uint8)
            qh[32 * half : 32 * half + 32] = (
                (q1 >> 4) | ((q2 >> 4) << 2) | ((q3 >> 4) << 4) | ((q4 >> 4) << 6)
            ).astype(np.uint8)
        out[i, 0:128] = ql
        out[i, 128:192] = qh
        out[i, 192:208] = block_scales.view(np.uint8)
        out[i, 208:210] = np.array([np.float16(d)], dtype=np.float16).view(np.uint8)
    return out.tobytes()


_QUANT = {
    GGMLType.F32: quantize_f32,
    GGMLType.F16: quantize_f16,
    GGMLType.Q4_0: quantize_q4_0,
    GGMLType.Q4_1: quantize_q4_1,
    GGMLType.Q5_0: quantize_q5_0,
    GGMLType.Q5_1: quantize_q5_1,
    GGMLType.Q8_0: quantize_q8_0,
    GGMLType.Q8_1: quantize_q8_1,
    GGMLType.Q2_K: quantize_q2_k,
    GGMLType.Q3_K: quantize_q3_k,
    GGMLType.Q4_K: quantize_q4_k,
    GGMLType.Q5_K: quantize_q5_k,
    GGMLType.Q6_K: quantize_q6_k,
    GGMLType.Q8_K: quantize_q8_k,
}


def quantize(typ: GGMLType, x: np.ndarray) -> bytes:
    return _QUANT[typ](x)
