"""Fused dequant+matmul Pallas kernels — the HBM-roofline decode path.

The XLA dequant path materializes dequantized weights (≈3-7× the packed HBM
traffic); these kernels stream *packed* planes HBM→VMEM, unpack on the VPU,
and feed the MXU per tile, so per-token traffic ≈ packed weight bytes. They
are the TPU analogue of the reference's per-scheme vec_dot SIMD kernels
(crabml-core/src/cpu/buf/*::vec_dot, matmul_vec.rs:9-78).

Every ggml scheme reduces to ONE kernel template via a host-side repack:

  w[:, c] = (val(c) - off) * dsub[:, c // gr] (+ msub[:, c // gr])

All planes are stored **m-tiled and k-major**: q planes are
(m/TM, kpad/P, TM) and scale planes (m/TM, S, G, TM), so (a) every array's
lane dim is tile-aligned (a scale layout with G=8..32 lanes tile-pads
8-16× in HBM — that alone OOM'd a 7B model), and (b) every grid block is a
single fully *contiguous* HBM region (a (TKp, TM) block cut from a (k, m)
array fragments into TKp separate TM-byte bursts). k zero-pads up to a TK
multiple (MAX_PAD_FRAC) so odd shapes like ffn_down's k=11008 keep large
steps. The kernel computes (B, TK) @ (TK, TM), the MXU-native orientation.

Key layout facts (all row order is NATURAL k order — no permutation):

1. *Strided sub-byte packing.* Byte row b of a step holds the values of
   rows {p·(TK/P) + b : p < P} at bit p·pbits. Unpack =
   pltpu.repeat(plane, P, axis=0) >> (sublane//(TK/P)·pbits) & mask —
   a sublane tiling + constant iota shift, no relayout. 5/6/3-bit schemes
   use two planes (4+1, 4+2, 2+1 bits).

2. *Scale broadcast by free sublane reshape.* Row r's scale group is
   r // gr, so viewing the (TK, TM) value tile as (G, gr, TM) makes the
   scale a natural (G, 1, TM) broadcast — sublane-splitting reshapes are
   layout-free in Mosaic. (An earlier lane-major layout needed a stride
   permutation of rows AND activation columns to make the scale tile a
   pltpu.repeat; transposing the layout made all of that unnecessary.)

3. *Folded scales.* K-quant superblock scales fold on the host:
   dsub = d·sc, msub = -dmin·mn, one scale granularity per scheme.

Layer-stacked weights (the lax.scan-over-layers forward) use **scalar
prefetch**: planes keep their leading L dim on device and the kernel's
index_map picks the layer with a prefetched scalar — no per-layer
dynamic-slice copies of multi-MB plane arrays inside the scan.

Grid: (m/TM, kpad/TK) with k minor; the (B, TM) f32 output block stays
resident in VMEM and accumulates across the k sweep.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gguf.constants import GGMLType
from ...quant.planar import QTensor

TM = 256
TK_CHOICES = (1024, 512, 256)  # k elements per grid step (k pads up to a multiple)
MAX_PAD_FRAC = 0.04  # accept <=4% zero-padding of k to use a bigger TK
B_PAD = 8
# W4A8 routing cap, decoupled from the B_PAD pad tile: the depth-32 int8
# group dots beat the bf16 dequant kernels up to ~16 padded rows (v5e
# decode_loop sweep, r4: 16 rows W4A8 32.9 ms/step vs bf16 36.2; 32 rows
# 50.7 vs 46.7; 40-row verify 70.1 vs 59.8 — crossover between 16 and 24)
W4A8_MAX_ROWS = 16
W8_MIN_ROWS = 256  # padded row count above which W8 prefill planes win


@dataclass(frozen=True)
class _Scheme:
    gr: int  # scale granularity (elements per dsub entry)
    off: float  # value offset: w = (val - off) * dsub (+ msub)
    planes: tuple[int, ...]  # sub-plane bit widths, low bits first
    has_min: bool


SCHEMES: dict[GGMLType, _Scheme] = {
    GGMLType.Q8_0: _Scheme(32, 0.0, (8,), False),
    GGMLType.Q8_1: _Scheme(32, 0.0, (8,), False),
    GGMLType.Q4_0: _Scheme(32, 8.0, (4,), False),
    GGMLType.Q4_1: _Scheme(32, 0.0, (4,), True),
    GGMLType.Q5_0: _Scheme(32, 16.0, (4, 1), False),
    GGMLType.Q5_1: _Scheme(32, 0.0, (4, 1), True),
    GGMLType.Q2_K: _Scheme(16, 0.0, (2,), True),
    GGMLType.Q3_K: _Scheme(16, 4.0, (2, 1), False),
    GGMLType.Q4_K: _Scheme(32, 0.0, (4,), True),
    GGMLType.Q5_K: _Scheme(32, 0.0, (4, 1), True),
    GGMLType.Q6_K: _Scheme(16, 32.0, (4, 2), False),
}

PALLAS_KINDS = tuple(SCHEMES)


def _tk_for(kind: GGMLType, m: int, k: int) -> int | None:
    """Pick the k-step size (k zero-pads up to a TK multiple), or None if the
    shape can't use the kernels."""
    if kind not in SCHEMES or m % TM or k < 256:
        return None
    for tk in TK_CHOICES:
        kpad = -(-k // tk) * tk
        if (kpad - k) / k <= MAX_PAD_FRAC:
            return tk
    return 256


# ---------------------------------------------------------------------------
# the one kernel template
# ---------------------------------------------------------------------------


def _sq2(ref):
    """Block ref -> its trailing-2D tile (leading dims are all size 1)."""
    a = ref[...]
    return a.reshape(a.shape[-2], a.shape[-1])


def _qmm_kernel(*refs, scheme: _Scheme, out_dtype, n_qplanes, tk: int, stacked: bool):
    refs = refs[1:] if stacked else refs  # drop the prefetched layer scalar
    x_ref = refs[0]
    qrefs = refs[1 : 1 + n_qplanes]
    dsub_ref = refs[1 + n_qplanes]
    msub_ref = refs[2 + n_qplanes] if scheme.has_min else None
    o_ref = refs[-1]
    G = tk // scheme.gr

    @pl.when(pl.program_id(2) == 0)  # first k step of this (b, m) tile
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    val = None
    bit_base = 0
    for pbits, qref in zip(scheme.planes, qrefs):
        q2 = _sq2(qref)
        if pbits == 8:
            v = q2.astype(jnp.int32)  # i8 plane, already full width
        else:
            P = 8 // pbits
            TKp = tk // P
            t = pltpu.repeat(q2, P, axis=0)  # (TK, TM), row r = plane[r % TKp]
            shift = (
                jax.lax.broadcasted_iota(jnp.int32, (tk, TM), 0) // TKp
            ) * pbits
            v = (t.astype(jnp.int32) >> shift) & ((1 << pbits) - 1)
        val = v if val is None else val | (v << bit_base)
        bit_base += pbits
    if scheme.off:
        val = val - int(scheme.off)  # integer sub, before the f-convert

    # compute in f32 only when the caller wants exact-f32 output
    cd = jnp.float32 if out_dtype == jnp.float32 else jnp.bfloat16
    d3 = _sq2(dsub_ref).astype(cd)[:, None, :]  # (G, 1, TM)
    w3 = val.astype(cd).reshape(G, scheme.gr, TM) * d3
    if msub_ref is not None:
        w3 = w3 + _sq2(msub_ref).astype(cd)[:, None, :]
    w = w3.reshape(tk, TM).astype(out_dtype)
    # f32 operands need explicit multi-pass MXU precision (TPU default is
    # single-pass bf16 even for f32 dots); bf16 keeps the fast path
    prec = jax.lax.Precision.HIGHEST if out_dtype == jnp.float32 else None
    o_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )


# ---------------------------------------------------------------------------
# W4A8 variant: int8 activations x int-unpacked weights on the MXU
# ---------------------------------------------------------------------------
#
# The TPU translation of the reference's central activation-quantization
# trick (matmul_vec.rs:37-40: quantize the activation once per matmul, then
# integer-dot against packed weights; Q8_K carries per-group bsums for the
# K-quant min terms, buf_q8_k.rs:8-11). Math per scale group g (gr elems):
#
#   x·w|g = d_g * dx_bg * (xq_bg · q_g)_int32            [int8 MXU dot]
#         - d_g * off * sx_bg                            [offset correction]
#         + m_g * sx_bg                                  [min correction]
#
# where xq = per-(row, group) int8 activation, dx its scale, and
# sx_bg = dx_bg * sum(xq_bg) ≈ sum(x_g) — the bsums idea. The per-element
# bf16 dequant multiply of the baseline kernel (TK*TM VPU ops per step)
# becomes G int8 MXU dots + O(G*B*TM) scalar corrections.


def _qmm_w4a8_kernel(*refs, scheme: _Scheme, n_qplanes, tk: int, stacked: bool):
    refs = refs[1:] if stacked else refs
    xq_ref = refs[0]  # (B, tk) int8
    dx_ref = refs[1]  # (1, B, 128) f32 activation scales, lanes 0..G-1 live
    sx_ref = refs[2]  # (1, B, 128) f32 dx * sum(xq) per group
    qrefs = refs[3 : 3 + n_qplanes]
    dsub_ref = refs[3 + n_qplanes]
    msub_ref = refs[4 + n_qplanes] if scheme.has_min else None
    o_ref = refs[-1]
    G = tk // scheme.gr

    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    val = None
    bit_base = 0
    for pbits, qref in zip(scheme.planes, qrefs):
        q2 = _sq2(qref)
        if pbits == 8:
            v = q2.astype(jnp.int32)
        else:
            P = 8 // pbits
            TKp = tk // P
            t = pltpu.repeat(q2, P, axis=0)
            shift = (
                jax.lax.broadcasted_iota(jnp.int32, (tk, TM), 0) // TKp
            ) * pbits
            v = (t.astype(jnp.int32) >> shift) & ((1 << pbits) - 1)
        val = v if val is None else val | (v << bit_base)
        bit_base += pbits
    # weights stay INTEGER; offset folds into the sx correction below.
    # Unsigned packed vals (0..2^bits-1) center by 128 to fit int8; the
    # signed i8 plane (Q8_0/Q8_1) is already in range.
    if scheme.planes == (8,):
        w_i8 = val.astype(jnp.int8)
        base = -float(scheme.off)
    else:
        w_i8 = (val - 128).astype(jnp.int8)
        base = 128.0 - float(scheme.off)  # val = w_i8 + 128; w = (val-off)*d

    xq = xq_ref[:].astype(jnp.int8)
    dsub = _sq2(dsub_ref).astype(jnp.float32)  # (G, TM)
    msub = _sq2(msub_ref).astype(jnp.float32) if msub_ref is not None else None
    dx = _sq2(dx_ref)  # (B, 128): lane g = group g's scale
    sx = _sq2(sx_ref)

    acc = o_ref[:]
    for g in range(G):
        sl = slice(g * scheme.gr, (g + 1) * scheme.gr)
        ig = jax.lax.dot_general(
            xq[:, sl], w_i8[sl, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # (B, TM) int8 MXU dot
        d_g = dsub[g][None, :]  # (1, TM)
        term = ig.astype(jnp.float32) * dx[:, g][:, None] * d_g
        # + base * sum(x_g) * d_g  (un-centers w_i8 and applies -off)
        term = term + sx[:, g][:, None] * (d_g * base)
        if msub is not None:
            term = term + sx[:, g][:, None] * msub[g][None, :]
        acc = acc + term
    o_ref[:] = acc


def quantize_activation(x2, gr: int, tk: int):
    """Per-(row, gr-group) symmetric int8 activation quantization.

    x2: (B, K) -> (xq int8 (B, K), dx f32 (S, B, 128), sx f32 (S, B, 128))
    with S = K//tk k-steps; scale lane g holds group g of that step
    (zero-padded to the 128-lane tile so Mosaic block shapes stay legal)."""
    B, K = x2.shape
    G = tk // gr
    S = K // tk
    xg = x2.astype(jnp.float32).reshape(B, K // gr, gr)
    amax = jnp.max(jnp.abs(xg), axis=-1)
    dx = amax / 127.0
    inv = jnp.where(dx > 0, 1.0 / jnp.maximum(dx, 1e-30), 0.0)
    xq = jnp.clip(jnp.round(xg * inv[..., None]), -127, 127).astype(jnp.int8)
    sx = dx * xq.astype(jnp.float32).sum(-1)  # ≈ sum(x) per group (bsums)

    def lanes(a):  # (B, K/gr) -> (S, B, 128)
        a = a.reshape(B, S, G).transpose(1, 0, 2)
        return jnp.pad(a, ((0, 0), (0, 0), (0, 128 - G)))

    return xq.reshape(B, K), lanes(dx), lanes(sx)


# ---------------------------------------------------------------------------
# host-side repack (one-time, at weight load)
# ---------------------------------------------------------------------------


def _extract_vals_scales(qt: QTensor):
    """Canonical planes -> (vals (m,k) int in [0,2^bits), dsub f32 (m,k/gr),
    msub f32 or None). Reuses the bit-exact host dequant structure."""
    t = GGMLType
    kind = qt.kind
    m, k = qt.m, qt.k
    p = {n: np.asarray(v) for n, v in qt.planes.items()}
    s = SCHEMES[kind]

    def nib(qs, chunk):  # ggml nibble order -> element order
        h = chunk // 2
        q = qs.reshape(m, k // chunk, h)
        return np.concatenate([q & 0xF, q >> 4], axis=2).reshape(m, k)

    def bits1(qh):  # (m, k/8) LSB-first bitplane -> (m, k)
        return np.unpackbits(qh, axis=1, bitorder="little").reshape(m, k)

    if kind in (t.Q8_0, t.Q8_1):
        return p["qs"].view(np.int8).reshape(m, k), p["d"], None
    if kind == t.Q4_0:
        return nib(p["qs"], 32), p["d"], None
    if kind == t.Q4_1:
        return nib(p["qs"], 32), p["d"], p["mn"]
    if kind == t.Q5_0:
        return nib(p["qs"], 32) | (bits1(p["qh"]) << 4), p["d"], None
    if kind == t.Q5_1:
        return nib(p["qs"], 32) | (bits1(p["qh"]) << 4), p["d"], p["mn"]
    if kind == t.Q2_K:
        q = p["qs"].reshape(m, k // 128, 1, 32)
        shifts = (np.arange(4, dtype=np.uint8) * 2).reshape(1, 1, 4, 1)
        vals = ((q >> shifts) & 3).reshape(m, k)
        dsub = p["d"].repeat(16, axis=1) * p["sc"].astype(np.float32)
        msub = -(p["dmin"].repeat(16, axis=1) * p["mn"].astype(np.float32))
        return vals, dsub, msub
    if kind == t.Q3_K:
        q = p["qs"].reshape(m, k // 128, 1, 32)
        shifts = (np.arange(4, dtype=np.uint8) * 2).reshape(1, 1, 4, 1)
        v2 = ((q >> shifts) & 3).reshape(m, k)
        hb = bits1(p["hb"]).reshape(m, k // 256, 32, 8).transpose(0, 1, 3, 2).reshape(m, k)
        vals = v2 | (hb << 2)
        dsub = p["d"].repeat(16, axis=1) * p["sc"].astype(np.float32)
        return vals, dsub, None
    if kind in (t.Q4_K, t.Q5_K):
        vals = nib(p["qs"], 64)
        if kind == t.Q5_K:
            hb = bits1(p["qh"]).reshape(m, k // 256, 32, 8).transpose(0, 1, 3, 2)
            vals = vals | (hb.reshape(m, k) << 4)
        dsub = p["d"].repeat(8, axis=1) * p["sc"].astype(np.float32)
        msub = -(p["dmin"].repeat(8, axis=1) * p["mn"].astype(np.float32))
        return vals, dsub, msub
    if kind == t.Q6_K:
        ql = p["ql"].reshape(m, k // 128, 64)
        lo = np.concatenate([ql & 0xF, ql >> 4], axis=2).reshape(m, k)
        qh = p["qh"].reshape(m, k // 128, 1, 32)
        shifts = (np.arange(4, dtype=np.uint8) * 2).reshape(1, 1, 4, 1)
        hi = ((qh >> shifts) & 3).reshape(m, k)
        vals = lo | (hi << 4)  # biased 0..63 (true value - 32)
        dsub = p["d"].repeat(16, axis=1) * p["sc"].astype(np.float32)
        return vals, dsub, None
    raise NotImplementedError(kind.name)


def _np_scale_dtype(scale_dtype):
    if scale_dtype in ("bf16", jnp.bfloat16):
        import ml_dtypes

        return ml_dtypes.bfloat16
    return np.dtype(scale_dtype)


def repack(qt: QTensor, scale_dtype=np.float32) -> QTensor | None:
    """Canonical planar QTensor -> m-tiled kernel-layout QTensor, or None
    if shape unsupported (caller keeps the XLA path). scale_dtype="bf16"
    halves scale-plane HBM traffic at ~3 decimal digits of scale precision."""
    kind = qt.kind
    if kind not in SCHEMES:
        return None
    m, k = qt.m, qt.k
    tk = _tk_for(kind, m, k)
    if tk is None:
        return None
    sdt = _np_scale_dtype(scale_dtype)
    s = SCHEMES[kind]
    vals, dsub, msub = _extract_vals_scales(qt)
    if msub is None and s.has_min:
        msub = np.zeros_like(dsub)

    S = -(-k // tk)
    kpad = S * tk
    G = tk // s.gr
    MT = m // TM
    if kpad != k:  # zero scales make the padded tail a no-op
        vals = np.pad(vals, ((0, 0), (0, kpad - k)))
        dsub = np.pad(dsub, ((0, 0), (0, (kpad - k) // s.gr)))
        if msub is not None:
            msub = np.pad(msub, ((0, 0), (0, (kpad - k) // s.gr)))

    # m-tiled k-major: (m/TM, kpad, TM); every (tk, TM) block contiguous
    vals_t = np.ascontiguousarray(vals.reshape(MT, TM, kpad).transpose(0, 2, 1))

    planes: dict[str, np.ndarray] = {}
    bit_base = 0
    for idx, pbits in enumerate(s.planes):
        if pbits == 8:
            planes[f"q{idx}"] = vals_t.astype(np.int8)  # signed i8 payload
            bit_base += pbits
            continue
        sub = (vals_t.astype(np.int32) >> bit_base) & ((1 << pbits) - 1)
        bit_base += pbits
        P = 8 // pbits
        TKp = tk // P
        # byte row b of step s holds rows {p*TKp + b} at bit p*pbits
        sub = sub.reshape(MT, S, P, TKp, TM).astype(np.uint8)
        packed = np.zeros((MT, S, TKp, TM), np.uint8)
        for pp in range(P):
            packed |= sub[:, :, pp] << (pp * pbits)
        planes[f"q{idx}"] = packed.reshape(MT, kpad // P, TM)

    def sweep_scale(a):  # (m, kpad/gr) -> (m/TM, S, G, TM)
        return np.ascontiguousarray(
            a.astype(sdt).reshape(MT, TM, S, G).transpose(0, 2, 3, 1)
        )

    planes["dsub"] = sweep_scale(dsub)
    if s.has_min:
        planes["msub"] = sweep_scale(msub)
    return QTensor(kind, qt.shape, planes)


# ---------------------------------------------------------------------------
# W8 prefill planes: host-requantized int8 weights for compute-bound batches
# ---------------------------------------------------------------------------
#
# The decode kernels win by streaming the fewest bytes; prefill is MXU-bound
# instead, and the bf16 path spends ~40% of each tile on VPU unpack+dequant
# (BASELINE r2: 59% of the chip's matmul rate). These planes trade bytes for
# compute: the EXACT dequantized weights are requantized once on the host to
# int8 with one scale per (output column, W8_KSC-deep k-chunk). The kernel
# converts the int8 tile to bf16 (ONE VPU op/element — no strided unpack,
# no per-element scale multiply) and applies the scale to the (TB, TM)
# OUTPUT tile once per k-step. Compute stays bf16: measured on this v5e,
# int8 MXU dots run no faster than bf16 through XLA, and Mosaic's int8
# dot_general is ~6x SLOWER (emulated) — so int8 here buys storage + VPU
# savings, not MXU rate. Second-quantization error is bounded by
# max|w|/254 per chunk — well under the 4-6 bit schemes' own step (gated
# end to end by the perplexity sweep). Storage: +8 bits/weight in HBM, so
# this is opt-in (Runner prefill_w8 / bench --prefill-w8).


W8_KSC = 512  # k elements per W8 scale chunk == kernel k-step


def w_from_kernel_planes(qt: QTensor, layer: int | None = None) -> np.ndarray:
    """Exact dequantized weights (m, k) reconstructed from KERNEL-layout
    planes (reverses `repack`; also used by tests). For stacked tensors
    pass `layer`."""
    s = SCHEMES[qt.kind]
    p = qt.planes
    if layer is not None:
        p = {n: np.asarray(v[layer]) for n, v in p.items()}
        _, m, k = qt.shape
    else:
        p = {n: np.asarray(v) for n, v in p.items()}
        m, k = qt.m, qt.k
    dsub = p["dsub"]
    MT, S, G, _ = dsub.shape
    tk = G * s.gr
    kpad = S * tk

    vals = None
    bit_base = 0
    for idx, pbits in enumerate(s.planes):
        plane = p[f"q{idx}"]
        if pbits == 8:
            v = plane.astype(np.int32)  # (MT, kpad, TM)
        else:
            P = 8 // pbits
            TKp = tk // P
            sub = plane.reshape(MT, S, TKp, -1)  # TM lanes
            parts = [
                (sub >> (pp * pbits)) & ((1 << pbits) - 1) for pp in range(P)
            ]
            v = np.concatenate(parts, axis=2).reshape(MT, kpad, plane.shape[-1])
            v = v.astype(np.int32)
        vals = v if vals is None else vals | (v << bit_base)
        bit_base += pbits

    w = (vals - s.off).astype(np.float32)
    dexp = np.repeat(dsub.astype(np.float32), s.gr, axis=2).reshape(MT, kpad, -1)
    w = w * dexp
    if "msub" in p:
        mexp = np.repeat(p["msub"].astype(np.float32), s.gr, axis=2).reshape(
            MT, kpad, -1
        )
        w = w + mexp
    # (MT, kpad, TM) -> (m, kpad) -> trim the zero-padded k tail
    w = w.transpose(0, 2, 1).reshape(m, kpad)
    return w[:, :k]


def _tm8_for(m: int) -> int:
    """W8 planes use their OWN (wider) lane tile: per grid step the x block
    (TB, tk) is re-fetched for every m-tile, so at TM=256 the activation
    traffic is ~4x the weight bytes on 7B-sized matmuls (measured: the
    prefill ceiling). TM8=1024 cuts x re-fetch 4x while the w8 block
    (tk, 1024) int8 = 512 KB still double-buffers comfortably."""
    for tm in (2048, 1024, 512, 256):
        if m % tm == 0:
            return tm
    return 0


def w8_planes_from_weights(w: np.ndarray, ksc: int = W8_KSC):
    """(m, k) exact weights -> {"w8": (m/TM8, kpad8, TM8) int8,
    "dw": (m/TM8, S8, 1, TM8) f32} — per-(column, ksc-chunk) symmetric
    int8, m-tiled with the W8 lane tile (see _tm8_for)."""
    m, k = w.shape
    tm8 = _tm8_for(m)
    S8 = -(-k // ksc)
    kpad8 = S8 * ksc
    if kpad8 != k:
        w = np.pad(w, ((0, 0), (0, kpad8 - k)))
    wc = w.reshape(m, S8, ksc)
    s8 = np.abs(wc).max(axis=2) / 127.0  # (m, S8)
    inv = np.where(s8 > 0, 1.0 / np.maximum(s8, 1e-30), 0.0)
    w8 = np.clip(np.rint(wc * inv[:, :, None]), -127, 127).astype(np.int8)
    MT = m // tm8
    w8_t = np.ascontiguousarray(
        w8.reshape(MT, tm8, kpad8).transpose(0, 2, 1)
    )  # m-tiled k-major, same contract as the q planes
    dw = np.ascontiguousarray(
        s8.astype(np.float32).reshape(MT, tm8, S8, 1).transpose(0, 2, 3, 1)
    )  # (MT, S8, 1, TM8): G=1 scale sweep, same contract as dsub
    return {"w8": w8_t, "dw": dw}


def augment_w8(qt: QTensor, ksc: int = W8_KSC) -> QTensor:
    """Attach W8 prefill planes to a repacked QTensor (stacked or not).
    No-op (returns qt) when not kernel-layout or already augmented."""
    if not is_repacked(qt) or "w8" in qt.planes:
        return qt
    stacked = len(qt.shape) == 3
    if not _tm8_for(qt.shape[-2]) or qt.kind not in SCHEMES:
        return qt
    if stacked:
        per = [
            w8_planes_from_weights(w_from_kernel_planes(qt, layer=l), ksc)
            for l in range(qt.shape[0])
        ]
        new = {
            name: np.stack([d[name] for d in per])
            for name in ("w8", "dw")
        }
    else:
        new = w8_planes_from_weights(w_from_kernel_planes(qt), ksc)
    return QTensor(qt.kind, qt.shape, {**qt.planes, **new})


def _qmm_w8_kernel(*refs, stacked: bool):
    """int8-storage bf16-compute: o += (x_bf16 . w8_bf16) * dw[col].
    One convert per weight element, one scale FMA per output element."""
    refs = refs[1:] if stacked else refs
    x_ref, w8_ref, dw_ref, o_ref = refs

    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    ig = jax.lax.dot_general(
        x_ref[:], _sq2(w8_ref).astype(jnp.bfloat16),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (TB, TM) f32 partial over this k-chunk
    dw = _sq2(dw_ref)  # (1, TM)
    o_ref[:] += ig * dw


@functools.partial(jax.jit, static_argnames=("m", "tk", "tm8", "stacked"))
def _run_w8(m: int, tk: int, tm8: int, stacked: bool, x2, layer, *planes):
    B, kpad = x2.shape
    TB = min(B, 512)
    grid = (B // TB, m // tm8, kpad // tk)
    MT = m // tm8

    if stacked:  # fold L into the m-tile axis (see _run)
        planes = tuple(p.reshape((-1,) + tuple(p.shape[2:])) for p in planes)

    def vspec(core_shape, core_imap):
        if stacked:
            imap = lambda b, i, j, l_ref: core_imap(b, l_ref[0] * MT + i, j)
        else:
            imap = core_imap
        return pl.BlockSpec(core_shape, imap, memory_space=pltpu.VMEM)

    def flat(core_shape, core_imap):
        if stacked:
            imap = lambda b, i, j, l_ref: core_imap(b, i, j)
        else:
            imap = core_imap
        return pl.BlockSpec(core_shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        flat((TB, tk), lambda b, i, j: (b, j)),        # x (bf16)
        vspec((1, tk, tm8), lambda b, i, j: (i, j, 0)),  # w8
        vspec((1, 1, 1, tm8), lambda b, i, j: (i, j, 0, 0)),  # dw
    ]
    kernel = functools.partial(_qmm_w8_kernel, stacked=stacked)
    out_shape = jax.ShapeDtypeStruct((B, m), jnp.float32)
    interp = jax.default_backend() != "tpu"
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((TB, tm8), lambda b, i, j, l_ref: (b, i),
                                   memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec,
                              interpret=interp)(
            jnp.asarray(layer, jnp.int32)[None], x2, *planes
        )
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, tm8), lambda b, i, j: (b, i),
                               memory_space=pltpu.VMEM),
        interpret=interp,
    )(x2, *planes)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _pad_x(x2, tk):
    """Zero-pad the activation's k up to a tk multiple (matches repack)."""
    k = x2.shape[1]
    kpad = -(-k // tk) * tk
    if kpad != k:
        x2 = jnp.pad(x2, ((0, 0), (0, kpad - k)))
    return x2


@functools.partial(jax.jit, static_argnames=("kind", "m", "tk", "out_dtype", "stacked"))
def _run(kind: GGMLType, m: int, tk: int, out_dtype, stacked: bool, x2, layer, *planes):
    s = SCHEMES[kind]
    B, kpad = x2.shape
    # batch tiling: large prefill batches (B*T rows) must not blow VMEM —
    # a (2048, tk) x-block + (2048, TM) f32 out-block alone exceed the 16MB
    # scoped limit. TB rows per grid step; B is padded to a TB multiple by
    # the caller. 512 keeps a T=512 prefill to ONE b-tile so each weight
    # tile is unpacked once (the unpack is the kernel's VPU cost).
    TB = min(B, 512)
    grid = (B // TB, m // TM, kpad // tk)
    G = tk // s.gr
    n_qplanes = len(s.planes)
    MT = m // TM

    # stacked (layer-scanned) planes FOLD the leading L dim into the m-tile
    # axis (free reshape: (L, MT, ...) -> (L*MT, ...)) so the block specs
    # are byte-identical to the unstacked kernel's — the earlier
    # rank-raising layout ((1, 1, rows, TM) blocks) streamed ~15% slower
    # through Mosaic than the rank-3 blocks (188 vs 225 GB/s measured).
    if stacked:
        planes = tuple(p.reshape((-1,) + tuple(p.shape[2:])) for p in planes)

    def vspec(core_shape, core_imap):
        if stacked:
            # same rank as unstacked; the prefetched layer scalar offsets
            # the m-tile index
            imap = lambda b, i, j, l_ref: core_imap(b, l_ref[0] * MT + i, j)
        else:
            imap = core_imap
        return pl.BlockSpec(core_shape, imap, memory_space=pltpu.VMEM)

    def xspec():
        if stacked:
            return pl.BlockSpec((TB, tk), lambda b, i, j, l_ref: (b, j), memory_space=pltpu.VMEM)
        return pl.BlockSpec((TB, tk), lambda b, i, j: (b, j), memory_space=pltpu.VMEM)

    in_specs = [xspec()]
    for pbits in s.planes:
        rows = tk if pbits == 8 else tk // (8 // pbits)
        in_specs.append(vspec((1, rows, TM), lambda b, i, j: (i, j, 0)))
    for _ in range(1 + int(s.has_min)):  # dsub (+ msub)
        in_specs.append(vspec((1, 1, G, TM), lambda b, i, j: (i, j, 0, 0)))

    kernel = functools.partial(
        _qmm_kernel, scheme=s, out_dtype=out_dtype, n_qplanes=n_qplanes,
        tk=tk, stacked=stacked,
    )
    out_shape = jax.ShapeDtypeStruct((B, m), jnp.float32)
    interp = jax.default_backend() != "tpu"
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((TB, TM), lambda b, i, j, l_ref: (b, i), memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec, interpret=interp)(
            jnp.asarray(layer, jnp.int32)[None], x2, *planes
        )
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, TM), lambda b, i, j: (b, i), memory_space=pltpu.VMEM),
        interpret=interp,
    )(x2, *planes)


@functools.partial(jax.jit, static_argnames=("kind", "m", "tk", "stacked"))
def _run_w4a8(kind: GGMLType, m: int, tk: int, stacked: bool, xq, dx, sx,
              layer, *planes):
    s = SCHEMES[kind]
    B, kpad = xq.shape
    TB = min(B, 256)
    grid = (B // TB, m // TM, kpad // tk)
    G = tk // s.gr
    n_qplanes = len(s.planes)
    MT = m // TM

    if stacked:  # fold L into the m-tile axis (see _run)
        planes = tuple(p.reshape((-1,) + tuple(p.shape[2:])) for p in planes)

    def vspec(core_shape, core_imap):
        if stacked:
            imap = lambda b, i, j, l_ref: core_imap(b, l_ref[0] * MT + i, j)
        else:
            imap = core_imap
        return pl.BlockSpec(core_shape, imap, memory_space=pltpu.VMEM)

    def flat(core_shape, core_imap):
        if stacked:
            imap = lambda b, i, j, l_ref: core_imap(b, i, j)
        else:
            imap = core_imap
        return pl.BlockSpec(core_shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        flat((TB, tk), lambda b, i, j: (b, j)),       # xq
        flat((1, TB, 128), lambda b, i, j: (j, b, 0)),  # dx (lane-aligned)
        flat((1, TB, 128), lambda b, i, j: (j, b, 0)),  # sx
    ]
    for pbits in s.planes:
        rows = tk if pbits == 8 else tk // (8 // pbits)
        in_specs.append(vspec((1, rows, TM), lambda b, i, j: (i, j, 0)))
    for _ in range(1 + int(s.has_min)):
        in_specs.append(vspec((1, 1, G, TM), lambda b, i, j: (i, j, 0, 0)))

    kernel = functools.partial(
        _qmm_w4a8_kernel, scheme=s, n_qplanes=n_qplanes, tk=tk, stacked=stacked,
    )
    out_shape = jax.ShapeDtypeStruct((B, m), jnp.float32)
    out_spec_flat = pl.BlockSpec((TB, TM), lambda b, i, j: (b, i), memory_space=pltpu.VMEM)
    interp = jax.default_backend() != "tpu"
    if stacked:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
            out_specs=pl.BlockSpec((TB, TM), lambda b, i, j, l_ref: (b, i), memory_space=pltpu.VMEM),
        )
        return pl.pallas_call(kernel, out_shape=out_shape, grid_spec=grid_spec, interpret=interp)(
            jnp.asarray(layer, jnp.int32)[None], xq, dx, sx, *planes
        )
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid=grid, in_specs=in_specs,
        out_specs=out_spec_flat, interpret=interp,
    )(xq, dx, sx, *planes)


def is_repacked(qt: QTensor) -> bool:
    return "dsub" in qt.planes


def _infer_tk(qt: QTensor) -> int:
    # dsub is (m/TM, S, G, TM) (one more leading dim when layer-stacked):
    # TK = G * gr
    s = SCHEMES[qt.kind]
    return qt.planes["dsub"].shape[-2] * s.gr


def random_repacked(kind: GGMLType, shape, rng=None, scale_dtype=np.float32) -> QTensor:
    """Random kernel-layout planes (for benchmarks; layout-faithful)."""
    rng = rng or np.random.default_rng(0)
    m = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    k = int(shape[-1])
    tk = _tk_for(kind, m, k)
    if tk is None:
        from ...quant.planar import random_planar

        return random_planar(kind, shape, rng)  # XLA fallback layout
    sdt = _np_scale_dtype(scale_dtype)
    s = SCHEMES[kind]
    S = -(-k // tk)
    kpad, G, MT = S * tk, tk // s.gr, m // TM
    planes: dict[str, np.ndarray] = {}
    for idx, pbits in enumerate(s.planes):
        if pbits == 8:
            planes[f"q{idx}"] = rng.integers(-127, 127, (MT, kpad, TM), dtype=np.int8)
        else:
            P = 8 // pbits
            planes[f"q{idx}"] = rng.integers(0, 256, (MT, kpad // P, TM), dtype=np.uint8)
    planes["dsub"] = (np.abs(rng.standard_normal((MT, S, G, TM))) * 0.01).astype(sdt)
    if s.has_min:
        planes["msub"] = (rng.standard_normal((MT, S, G, TM)) * 0.01).astype(sdt)
    return QTensor(kind, (m, k), planes)


@functools.partial(
    jax.jit, static_argnames=("kind", "m", "tk", "out_dtype", "tb")
)
def _run_grouped(kind: GGMLType, m: int, tk: int, out_dtype, tb: int,
                 x2, experts, *planes):
    """Grouped (ragged) quantized matmul: row-tile b computes against the
    weight plane `experts[b]` instead of one shared plane — the megablox
    idea restricted to tile-aligned groups. The caller sorts rows by
    expert and pads each expert's segment to a `tb` multiple, so every
    (tb)-row tile belongs to exactly ONE expert and the kernel body is
    byte-identical to `_run`'s: only the index maps change, reading the
    per-tile plane index from the scalar-prefetch array (the same
    mechanism the layer-stacked decode path uses with a single scalar).

    MoE prefill use: compute drops from all-E-experts to the top-k the
    router chose (E/k-fold FLOP cut); each executed tile still feeds the
    MXU a dense (tb, tk) x (tk, TM) dot. Arithmetic intensity per weight
    byte stays above the v5e compute ridge for tb >= 128 at 4-bit, so
    the regime remains MXU-bound despite re-reading an expert's planes
    once per tile."""
    s = SCHEMES[kind]
    P, kpad = x2.shape
    TB = tb
    grid = (P // TB, m // TM, kpad // tk)
    G = tk // s.gr
    n_qplanes = len(s.planes)
    MT = m // TM
    # fold the plane axis (L*E experts) into the m-tile axis, as _run does
    planes = tuple(p.reshape((-1,) + tuple(p.shape[2:])) for p in planes)

    def vspec(core_shape, core_imap):
        imap = lambda b, i, j, e_ref: core_imap(b, e_ref[b] * MT + i, j)
        return pl.BlockSpec(core_shape, imap, memory_space=pltpu.VMEM)

    in_specs = [pl.BlockSpec((TB, tk), lambda b, i, j, e_ref: (b, j),
                             memory_space=pltpu.VMEM)]
    for pbits in s.planes:
        rows = tk if pbits == 8 else tk // (8 // pbits)
        in_specs.append(vspec((1, rows, TM), lambda b, i, j: (i, j, 0)))
    for _ in range(1 + int(s.has_min)):  # dsub (+ msub)
        in_specs.append(vspec((1, 1, G, TM), lambda b, i, j: (i, j, 0, 0)))

    kernel = functools.partial(
        _qmm_kernel, scheme=s, out_dtype=out_dtype, n_qplanes=n_qplanes,
        tk=tk, stacked=True,  # stacked=True: drop the prefetch ref in-body
    )
    out_shape = jax.ShapeDtypeStruct((P, m), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, TM), lambda b, i, j, e_ref: (b, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(experts, jnp.int32), x2, *planes)


@functools.partial(jax.jit, static_argnames=("m", "tk", "tm8", "tb"))
def _run_grouped_w8(m: int, tk: int, tm8: int, tb: int, x2, experts, *planes):
    """Grouped variant of `_run_w8` (int8-storage bf16-compute prefill
    tiles): row tile b multiplies the W8 planes of `experts[b]`. Same
    per-tile-prefetch mechanism as `_run_grouped`."""
    P, kpad = x2.shape
    TB = tb
    grid = (P // TB, m // tm8, kpad // tk)
    MT = m // tm8
    planes = tuple(p.reshape((-1,) + tuple(p.shape[2:])) for p in planes)

    def vspec(core_shape, core_imap):
        imap = lambda b, i, j, e_ref: core_imap(b, e_ref[b] * MT + i, j)
        return pl.BlockSpec(core_shape, imap, memory_space=pltpu.VMEM)

    in_specs = [
        pl.BlockSpec((TB, tk), lambda b, i, j, e_ref: (b, j),
                     memory_space=pltpu.VMEM),
        vspec((1, tk, tm8), lambda b, i, j: (i, j, 0)),        # w8
        vspec((1, 1, 1, tm8), lambda b, i, j: (i, j, 0, 0)),   # dw
    ]
    kernel = functools.partial(_qmm_w8_kernel, stacked=True)
    out_shape = jax.ShapeDtypeStruct((P, m), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=grid, in_specs=in_specs,
        out_specs=pl.BlockSpec((TB, tm8), lambda b, i, j, e_ref: (b, i),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel, out_shape=out_shape, grid_spec=grid_spec,
        interpret=jax.default_backend() != "tpu",
    )(jnp.asarray(experts, jnp.int32), x2, *planes)


def qmatmul_grouped(x2, qt: QTensor, experts, tb: int,
                    compute_dtype=jnp.bfloat16):
    """Grouped matmul over expert-sorted rows: x2 (P, k) where row tile
    t (of `tb` rows) multiplies the weight plane `experts[t]` of the
    plane-stacked `qt` (shape (n_planes, m, k), e.g. an `_expert_view`).
    Returns (P, m) or None when qt lacks the kernel layout. P % tb == 0
    and experts.shape == (P // tb,) are the caller's contract. When the
    view carries W8 prefill planes and the rows clear W8_MIN_ROWS, the
    grouped W8 kernel runs instead (same routing as qmatmul_pallas)."""
    kind = qt.kind
    if kind not in SCHEMES or not is_repacked(qt):
        return None
    m, k = qt.shape[-2], qt.shape[-1]
    if m % TM:
        return None
    s = SCHEMES[kind]
    tk = _infer_tk(qt)
    P = x2.shape[0]
    if P % tb:
        raise ValueError(f"grouped rows {P} not a multiple of tile {tb}")
    p = qt.planes
    if "w8" in p and P >= W8_MIN_ROWS:
        w8, dw = p["w8"], p["dw"]
        S8 = dw.shape[-3]
        tk8 = w8.shape[-2] // S8
        tm8 = w8.shape[-1]
        x8 = _pad_x(x2.astype(jnp.bfloat16), tk8)
        out = _run_grouped_w8(m, tk8, tm8, tb, x8, experts, w8, dw)
        return out.astype(compute_dtype)
    x2 = _pad_x(x2.astype(compute_dtype), tk)
    qplanes = [p[f"q{i}"] for i in range(len(s.planes))]
    splanes = [p["dsub"]] + ([p["msub"]] if s.has_min else [])
    out = _run_grouped(kind, m, tk, compute_dtype, tb, x2, experts,
                       *qplanes, *splanes)
    return out.astype(x2.dtype)


def qmatmul_pallas(x, qt: QTensor, compute_dtype=jnp.bfloat16, layer=None,
                   act_quant: bool = False):
    """x: (..., k) @ qt(m, k)^T -> (..., m), or None if `qt` has no kernel
    layout (caller falls back to the XLA dequant path).

    With `layer`, qt's planes carry a leading layer axis and the kernel
    selects the layer via scalar prefetch — pass the full stacked QTensor
    inside a lax.scan body instead of slicing it (slicing copies planes).

    `act_quant=True` routes through the W4A8 kernel: activations quantize
    to per-group int8 once, weights stay integer, the MXU dots int8×int8
    (the reference's activation-quantization design, matmul_vec.rs:37-40).
    """
    kind = qt.kind
    if kind not in SCHEMES or not is_repacked(qt):
        return None
    stacked = layer is not None
    if stacked:
        _, m, k = qt.shape[-3], qt.shape[-2], qt.shape[-1]
    else:
        m, k = qt.m, qt.k
    if m % TM:
        return None
    tk = _infer_tk(qt)
    s = SCHEMES[kind]

    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(B, k).astype(compute_dtype)
    # pad rows to the batch tile: B_PAD for decode, 512 for big prefills
    row_tile = B_PAD if B <= 512 else 512
    Bp = -(-B // row_tile) * row_tile
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    x2 = _pad_x(x2, tk)

    p = qt.planes
    qplanes = [p[f"q{i}"] for i in range(len(s.planes))]
    splanes = [p["dsub"]] + ([p["msub"]] if s.has_min else [])
    # Routing by padded row count (all measured on the v5e):
    # - decode-class (<= W4A8_MAX_ROWS) + act_quant: W4A8 — fewest bytes
    #   wins (covers B<=16 serving slots and K=1 verify rows)
    # - prefill-class (>= W8_MIN_ROWS) with W8 planes present: depth-KSC
    #   int8 MXU dots, no unpack — compute-bound regime, 2x the bf16 rate
    # - otherwise: bf16 dequant kernels
    if act_quant and x2.shape[0] <= W4A8_MAX_ROWS:
        xq, dx, sx = quantize_activation(x2, s.gr, tk)
        out = _run_w4a8(kind, m, tk, stacked, xq, dx, sx,
                        layer if stacked else 0, *qplanes, *splanes)
    elif "w8" in p and x2.shape[0] >= W8_MIN_ROWS:
        w8, dw = p["w8"], p["dw"]
        S8 = dw.shape[-3]
        tk8 = w8.shape[-2] // S8
        tm8 = w8.shape[-1]
        x8 = x.reshape(B, k).astype(jnp.bfloat16)
        if Bp != B:
            x8 = jnp.pad(x8, ((0, Bp - B), (0, 0)))
        x8 = _pad_x(x8, tk8)
        out = _run_w8(m, tk8, tm8, stacked, x8,
                      layer if stacked else 0, w8, dw)
    else:
        out = _run(kind, m, tk, compute_dtype, stacked, x2,
                   layer if stacked else 0, *qplanes, *splanes)

    if Bp != B:
        out = out[:B]
    return out.reshape(*lead, m).astype(x.dtype)
