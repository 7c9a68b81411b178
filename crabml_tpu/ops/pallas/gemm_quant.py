"""Fused dequant+matmul Pallas kernels — the HBM-roofline decode path.

The XLA dequant path materializes dequantized weights (≈3-7× the packed HBM
traffic); these kernels stream *packed* planes HBM→VMEM, unpack on the VPU,
and feed the MXU per tile, so per-token traffic ≈ packed weight bytes. They
are the TPU analogue of the reference's per-scheme vec_dot SIMD kernels
(crabml-core/src/cpu/buf/*::vec_dot, matmul_vec.rs:9-78).

Every ggml scheme reduces to ONE kernel template via a host-side repack:

  w[:, c] = (val(c) - off) * dsub[:, c // gr] (+ msub[:, c // gr])

1. *Stride permutation.* Mosaic has no lane element-repeat (pltpu.repeat
   TILES the array, and gather/reshape broadcasts don't lower), so we permute
   columns within each TK-step: new column c ↔ original column
   (c % G)·gr + c // G  (G = TK/gr groups). After this, the scale vector the
   kernel needs IS pltpu.repeat(dsub_tile, gr) — a tile. The activation gets
   the same permutation, a (B, S, G, gr)→(B, S, gr, G) transpose, O(B·k).

2. *Strided sub-byte packing.* q values are packed so byte b of a step holds
   the values of new columns {p·(TK/P) + b : p < P} at bit p·pbits. Unpack =
   pltpu.repeat(plane, P) >> (lane//(TK/P)·pbits) & mask — tile + iota shift,
   no relayout. 5/6/3-bit schemes use two planes (4+1, 4+2, 2+1 bits).

3. *Folded scales.* K-quant superblock scales fold on the host:
   dsub = d·sc, msub = -dmin·mn (bf16), one scale granularity per scheme.
   Scale planes are swept to (k/TK, m, G) so the k-step is a blocked leading
   axis (any G is then a legal block width).

Grid: (m/TM, k/TK) with k minor; the (B, TM) f32 output block stays resident
in VMEM and accumulates across the k sweep.
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
from ...quant import codecs

TM = 256
TK = 512  # original-k elements per grid step (layout is tied to this)
B_PAD = 8


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


def _f32(a):
    if a.dtype in (jnp.uint8, jnp.int8):
        a = a.astype(jnp.int32)
    return a.astype(jnp.float32)


# ---------------------------------------------------------------------------
# the one kernel template
# ---------------------------------------------------------------------------


def _qmm_kernel(*refs, scheme: _Scheme, out_dtype, n_qplanes):
    x_ref = refs[0]
    qrefs = refs[1 : 1 + n_qplanes]
    dsub_ref = refs[1 + n_qplanes]
    msub_ref = refs[2 + n_qplanes] if scheme.has_min else None
    o_ref = refs[-1]

    @pl.when(pl.program_id(1) == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    val = None
    bit_base = 0
    for pbits, qref in zip(scheme.planes, qrefs):
        if pbits == 8:
            v = qref[:].astype(jnp.int32)  # i8 plane, already full width
        else:
            P = 8 // pbits
            TKp = TK // P
            tile = qref[:] if len(qref.shape) == 2 else qref[0]
            t = pltpu.repeat(tile, P, axis=1)
            shift = (
                jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1) // TKp
            ) * pbits
            v = (t.astype(jnp.int32) >> shift) & ((1 << pbits) - 1)
        val = v if val is None else val | (v << bit_base)
        bit_base += pbits

    w = (val.astype(jnp.float32) - scheme.off) * _f32(
        pltpu.repeat(dsub_ref[0], scheme.gr, axis=1)
    )
    if msub_ref is not None:
        w = w + _f32(pltpu.repeat(msub_ref[0], scheme.gr, axis=1))
    w = w.astype(out_dtype)
    o_ref[:] += jax.lax.dot_general(
        x_ref[:], w, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )


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


def repack(qt: QTensor, scale_dtype=np.float32) -> QTensor | None:
    """Canonical planar QTensor -> kernel-layout QTensor, or None if shape
    unsupported (caller keeps the XLA path)."""
    kind = qt.kind
    if kind not in SCHEMES:
        return None
    m, k = qt.m, qt.k
    if m % TM or k % TK:
        return None
    s = SCHEMES[kind]
    vals, dsub, msub = _extract_vals_scales(qt)

    S = k // TK
    G = TK // s.gr

    # stride permutation within each step: new c <-> orig (c%G)*gr + c//G
    vals = np.ascontiguousarray(
        vals.reshape(m, S, G, s.gr).transpose(0, 1, 3, 2).reshape(m, k)
    )

    planes: dict[str, np.ndarray] = {}
    bit_base = 0
    for idx, pbits in enumerate(s.planes):
        if pbits == 8:
            planes[f"q{idx}"] = vals.astype(np.int8)  # signed i8 payload
            bit_base += pbits
            continue
        sub = (vals.astype(np.int32) >> bit_base) & ((1 << pbits) - 1)
        bit_base += pbits
        P = 8 // pbits
        TKp = TK // P
        # byte b of step s holds new columns {p*TKp + b} at bit p*pbits
        sub = sub.reshape(m, S, P, TKp).astype(np.uint8)
        packed = np.zeros((m, S, TKp), np.uint8)
        for pp in range(P):
            packed |= sub[:, :, pp, :] << (pp * pbits)
        if TKp >= 128:
            planes[f"q{idx}"] = packed.reshape(m, k // P)
        else:  # narrow plane: sweep so the block covers the full width
            planes[f"q{idx}"] = np.ascontiguousarray(packed.transpose(1, 0, 2))

    def sweep_scale(a):
        return np.ascontiguousarray(
            a.astype(scale_dtype).reshape(m, S, G).transpose(1, 0, 2)
        )

    planes["dsub"] = sweep_scale(dsub)
    if s.has_min:
        planes["msub"] = sweep_scale(msub if msub is not None else np.zeros_like(dsub))
    return QTensor(kind, qt.shape, planes)


# ---------------------------------------------------------------------------
# dispatch
# ---------------------------------------------------------------------------


def _permute_x(x2, k, gr):
    """Per-step stride permutation of the activation (matches repack)."""
    B = x2.shape[0]
    S = k // TK
    G = TK // gr
    return x2.reshape(B, S, G, gr).transpose(0, 1, 3, 2).reshape(B, k)


@functools.partial(jax.jit, static_argnames=("kind", "m", "k", "out_dtype"))
def _run(kind: GGMLType, m: int, k: int, out_dtype, x2, *planes):
    s = SCHEMES[kind]
    B = x2.shape[0]
    grid = (m // TM, k // TK)
    G = TK // s.gr

    def vspec(shape, imap):
        return pl.BlockSpec(shape, imap, memory_space=pltpu.VMEM)

    in_specs = [vspec((B, TK), lambda i, j: (0, j))]
    n_qplanes = len(s.planes)
    for pbits, plane in zip(s.planes, planes[:n_qplanes]):
        if pbits == 8:
            in_specs.append(vspec((TM, TK), lambda i, j: (i, j)))
        else:
            P = 8 // pbits
            TKp = TK // P
            if plane.ndim == 2:
                in_specs.append(vspec((TM, TKp), lambda i, j: (i, j)))
            else:  # swept narrow plane (S, m, TKp)
                in_specs.append(
                    vspec((1, TM, TKp), lambda i, j: (j, i, 0))
                )
    in_specs.append(vspec((1, TM, G), lambda i, j: (j, i, 0)))  # dsub
    if s.has_min:
        in_specs.append(vspec((1, TM, G), lambda i, j: (j, i, 0)))  # msub

    kernel = functools.partial(
        _qmm_kernel, scheme=s, out_dtype=out_dtype, n_qplanes=n_qplanes
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, m), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((B, TM), lambda i, j: (0, i), memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(x2, *planes)


def is_repacked(qt: QTensor) -> bool:
    return "dsub" in qt.planes


def random_repacked(kind: GGMLType, shape, rng=None, scale_dtype=np.float32) -> QTensor:
    """Random kernel-layout planes (for benchmarks; layout-faithful)."""
    rng = rng or np.random.default_rng(0)
    m = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    k = int(shape[-1])
    if kind not in SCHEMES or m % TM or k % TK:
        from ...quant.planar import random_planar

        return random_planar(kind, shape, rng)  # XLA fallback layout
    s = SCHEMES[kind]
    S, G = k // TK, TK // s.gr
    planes: dict[str, np.ndarray] = {}
    for idx, pbits in enumerate(s.planes):
        if pbits == 8:
            planes[f"q{idx}"] = rng.integers(-127, 127, (m, k), dtype=np.int8)
            continue
        P = 8 // pbits
        TKp = TK // P
        a = rng.integers(0, 256, (m, S, TKp), dtype=np.uint8)
        planes[f"q{idx}"] = (
            a.reshape(m, k // P) if TKp >= 128 else np.ascontiguousarray(a.transpose(1, 0, 2))
        )
    planes["dsub"] = (np.abs(rng.standard_normal((S, m, G))) * 0.01).astype(scale_dtype)
    if s.has_min:
        planes["msub"] = (rng.standard_normal((S, m, G)) * 0.01).astype(scale_dtype)
    return QTensor(kind, (m, k), planes)


def qmatmul_pallas(x, qt: QTensor, compute_dtype=jnp.bfloat16):
    """x: (..., k) @ qt(m, k)^T -> (..., m), or None if `qt` has no kernel
    layout (caller falls back to the XLA dequant path)."""
    kind = qt.kind
    if kind not in SCHEMES or not is_repacked(qt):
        return None
    m, k = qt.m, qt.k
    if m % TM or k % TK:
        return None
    s = SCHEMES[kind]

    lead = x.shape[:-1]
    B = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(B, k).astype(compute_dtype)
    Bp = -(-B // B_PAD) * B_PAD
    if Bp != B:
        x2 = jnp.pad(x2, ((0, Bp - B), (0, 0)))
    x2 = _permute_x(x2, k, s.gr)

    p = qt.planes
    qplanes = [p[f"q{i}"] for i in range(len(s.planes))]
    splanes = [p["dsub"]] + ([p["msub"]] if s.has_min else [])
    out = _run(kind, m, k, compute_dtype, x2, *qplanes, *splanes)

    if Bp != B:
        out = out[:B]
    return out.reshape(*lead, m).astype(x.dtype)
