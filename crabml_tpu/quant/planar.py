"""Planar TPU re-layouts of ggml block-quantized tensors.

The reference keeps weights as interleaved block structs and walks them with
scalar SIMD (crabml-core/src/cpu/buf/). That layout is hostile to XLA/Pallas:
sub-byte fields interleaved with f16 scales defeat tiling. At load time we
split every tensor into a small set of *planes* — dense 2-D arrays aligned to
(sublane, lane) tiling — chosen so that
  (a) on-device dequantization is reshape/shift/mask only (no gathers), and
  (b) per-element HBM traffic stays within ~5% of the packed ggml size.

Layout notes per scheme (m = rows, k = cols; blocks run along k):

- Q8_0:  qs i8 (m,k);           d  f32 (m,k/32)
- Q8_1:  like Q8_0 (s is redundant for matmul)
- Q4_0:  qs u8 (m,k/2) ggml nibble order [byte j = elems j | j+16<<4 per
         32-block, so lo-plane ++ hi-plane restores element order with a
         block-local reshape]; d f32 (m,k/32)
- Q4_1:  qs like Q4_0; d,m f32 (m,k/32)
- Q5_0:  qs + qh u8 (m,k/8) bitplane; d f32
- Q5_1:  qs + qh; d,m f32
- Q2_K:  qs u8 (m,k/4) [byte l of 32-chunk = elems l,l+32,l+64,l+96 of each
         128-half at shifts 0/2/4/6]; sc u8 (m,k/16), mn u8 (m,k/16)
         (4-bit fields split at load); d,dmin f32 (m,k/256)
- Q3_K:  qs u8 (m,k/4) same 2-bit order; hb u8 (m,k/8) high-bit plane;
         sc i8 (m,k/16) (6-bit field decoded, offset -32 applied);
         d f32 (m,k/256)
- Q4_K:  qs u8 (m,k/2) [per 64-chunk: lo = elems 0..32, hi = 32..64];
         sc,mn u8 (m,k/32) (6-bit decode of get_scale_min_k4);
         d,dmin f32 (m,k/256)
- Q5_K:  Q4_K + qh u8 (m,k/8) bitplane
- Q6_K:  ql u8 (m,k/2), qh u8 (m,k/4); sc i8 (m,k/16); d f32 (m,k/256)
- F16/F32: dense `w` plane in bf16/f32

The planes preserve ggml bit patterns exactly, so XLA-composed dequantization
reproduces the reference dequantize() bit-for-bit in f32.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial

import jax
import numpy as np

from ..gguf.constants import GGMLType, QK_K
from .codecs import _blocks, f16_bits_to_f32


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["planes"],
    meta_fields=["kind", "shape"],
)
@dataclass
class QTensor:
    """A quantized (or dense) 2-D weight as TPU-friendly planes.

    `shape` is the logical (m, k) row-major dense shape; `kind` drives
    dispatch in matmul/dequant, statically at trace time.
    """

    kind: GGMLType
    shape: tuple[int, ...]
    planes: dict[str, object] = field(default_factory=dict)

    @property
    def m(self) -> int:
        return self.shape[0]

    @property
    def k(self) -> int:
        return self.shape[-1]


def _f16_plane(b: np.ndarray, sl: slice, m: int, per_row: int) -> np.ndarray:
    return f16_bits_to_f32(b[:, sl].copy().view(np.uint16).reshape(-1)).reshape(m, per_row)


def to_planar(typ: GGMLType, raw, shape) -> QTensor:
    """Host-side reshard: packed ggml payload -> planar numpy arrays."""
    m = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    k = int(shape[-1])
    t = GGMLType

    if typ in (t.F32, t.F16):
        a = np.frombuffer(raw, dtype=np.float32 if typ == t.F32 else np.float16)
        return QTensor(typ, (m, k), {"w": a.reshape(m, k)})

    if typ in (t.Q8_0, t.Q8_1):
        b = _blocks(raw, typ)
        off = 2 if typ == t.Q8_0 else 4
        nb_row = k // 32
        qs = b[:, off : off + 32].view(np.int8).reshape(m, k)
        d = _f16_plane(b, slice(0, 2), m, nb_row)
        return QTensor(typ, (m, k), {"qs": qs, "d": d})

    if typ == t.Q4_0:
        b = _blocks(raw, typ)
        qs = b[:, 2:18].reshape(m, k // 2)
        d = _f16_plane(b, slice(0, 2), m, k // 32)
        return QTensor(typ, (m, k), {"qs": qs, "d": d})

    if typ == t.Q4_1:
        b = _blocks(raw, typ)
        u16 = b[:, 0:4].copy().view(np.uint16)
        qs = b[:, 4:20].reshape(m, k // 2)
        d = f16_bits_to_f32(u16[:, 0]).reshape(m, k // 32)
        mn = f16_bits_to_f32(u16[:, 1]).reshape(m, k // 32)
        return QTensor(typ, (m, k), {"qs": qs, "d": d, "mn": mn})

    if typ == t.Q5_0:
        b = _blocks(raw, typ)
        d = _f16_plane(b, slice(0, 2), m, k // 32)
        qh = b[:, 2:6].reshape(m, k // 8)
        qs = b[:, 6:22].reshape(m, k // 2)
        return QTensor(typ, (m, k), {"qs": qs, "qh": qh, "d": d})

    if typ == t.Q5_1:
        b = _blocks(raw, typ)
        u16 = b[:, 0:4].copy().view(np.uint16)
        d = f16_bits_to_f32(u16[:, 0]).reshape(m, k // 32)
        mn = f16_bits_to_f32(u16[:, 1]).reshape(m, k // 32)
        qh = b[:, 4:8].reshape(m, k // 8)
        qs = b[:, 8:24].reshape(m, k // 2)
        return QTensor(typ, (m, k), {"qs": qs, "qh": qh, "d": d, "mn": mn})

    if typ == t.Q2_K:
        b = _blocks(raw, typ)
        sfield = b[:, 0:16].reshape(m, k // 16)
        qs = b[:, 16:80].reshape(m, k // 4)
        d = _f16_plane(b, slice(80, 82), m, k // QK_K)
        dmin = _f16_plane(b, slice(82, 84), m, k // QK_K)
        return QTensor(
            typ,
            (m, k),
            {"qs": qs, "sc": sfield & 0xF, "mn": sfield >> 4, "d": d, "dmin": dmin},
        )

    if typ == t.Q3_K:
        from .codecs import _q3k_scales

        b = _blocks(raw, typ)
        hb = b[:, 0:32].reshape(m, k // 8)
        qs = b[:, 32:96].reshape(m, k // 4)
        sc = (_q3k_scales(b[:, 96:108]) - 32).astype(np.int8).reshape(m, k // 16)
        d = _f16_plane(b, slice(108, 110), m, k // QK_K)
        return QTensor(typ, (m, k), {"qs": qs, "hb": hb, "sc": sc, "d": d})

    if typ in (t.Q4_K, t.Q5_K):
        from .codecs import _k4_scale_min

        b = _blocks(raw, typ)
        u16 = b[:, 0:4].copy().view(np.uint16)
        d = f16_bits_to_f32(u16[:, 0]).reshape(m, k // QK_K)
        dmin = f16_bits_to_f32(u16[:, 1]).reshape(m, k // QK_K)
        sc, mn = _k4_scale_min(b[:, 4:16])  # (nb, 8) each
        sc = sc.reshape(m, k // 32)
        mn = mn.reshape(m, k // 32)
        planes = {"sc": sc, "mn": mn, "d": d, "dmin": dmin}
        if typ == t.Q4_K:
            planes["qs"] = b[:, 16:144].reshape(m, k // 2)
        else:
            planes["qh"] = b[:, 16:48].reshape(m, k // 8)
            planes["qs"] = b[:, 48:176].reshape(m, k // 2)
        return QTensor(typ, (m, k), planes)

    if typ == t.Q6_K:
        b = _blocks(raw, typ)
        ql = b[:, 0:128].reshape(m, k // 2)
        qh = b[:, 128:192].reshape(m, k // 4)
        sc = b[:, 192:208].view(np.int8).reshape(m, k // 16)
        d = _f16_plane(b, slice(208, 210), m, k // QK_K)
        return QTensor(typ, (m, k), {"ql": ql, "qh": qh, "sc": sc, "d": d})

    raise NotImplementedError(f"planar layout for {typ.name}")


def plane_spec(typ: GGMLType, m: int, k: int) -> dict[str, tuple[tuple[int, int], type]]:
    """{plane name: (shape, numpy dtype)} for a (m, k) tensor of `typ`."""
    t = GGMLType
    f32, f16, u8, i8 = np.float32, np.float16, np.uint8, np.int8
    if typ == t.F32:
        return {"w": ((m, k), f32)}
    if typ == t.F16:
        return {"w": ((m, k), f16)}
    if typ in (t.Q8_0, t.Q8_1):
        return {"qs": ((m, k), i8), "d": ((m, k // 32), f32)}
    if typ == t.Q4_0:
        return {"qs": ((m, k // 2), u8), "d": ((m, k // 32), f32)}
    if typ == t.Q4_1:
        return {"qs": ((m, k // 2), u8), "d": ((m, k // 32), f32), "mn": ((m, k // 32), f32)}
    if typ == t.Q5_0:
        return {"qs": ((m, k // 2), u8), "qh": ((m, k // 8), u8), "d": ((m, k // 32), f32)}
    if typ == t.Q5_1:
        return {
            "qs": ((m, k // 2), u8),
            "qh": ((m, k // 8), u8),
            "d": ((m, k // 32), f32),
            "mn": ((m, k // 32), f32),
        }
    if typ == t.Q2_K:
        return {
            "qs": ((m, k // 4), u8),
            "sc": ((m, k // 16), u8),
            "mn": ((m, k // 16), u8),
            "d": ((m, k // QK_K), f32),
            "dmin": ((m, k // QK_K), f32),
        }
    if typ == t.Q3_K:
        return {
            "qs": ((m, k // 4), u8),
            "hb": ((m, k // 8), u8),
            "sc": ((m, k // 16), i8),
            "d": ((m, k // QK_K), f32),
        }
    if typ == t.Q4_K:
        return {
            "qs": ((m, k // 2), u8),
            "sc": ((m, k // 32), u8),
            "mn": ((m, k // 32), u8),
            "d": ((m, k // QK_K), f32),
            "dmin": ((m, k // QK_K), f32),
        }
    if typ == t.Q5_K:
        return {
            "qs": ((m, k // 2), u8),
            "qh": ((m, k // 8), u8),
            "sc": ((m, k // 32), u8),
            "mn": ((m, k // 32), u8),
            "d": ((m, k // QK_K), f32),
            "dmin": ((m, k // QK_K), f32),
        }
    if typ == t.Q6_K:
        return {
            "ql": ((m, k // 2), u8),
            "qh": ((m, k // 4), u8),
            "sc": ((m, k // 16), i8),
            "d": ((m, k // QK_K), f32),
        }
    raise NotImplementedError(typ.name)


def random_planar(typ: GGMLType, shape, rng=None, scale: float = 0.02) -> QTensor:
    """Random planes with realistic value ranges — instant synthetic weights
    for benchmarks (layout-faithful; no slow encode path)."""
    rng = rng or np.random.default_rng(0)
    m = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    k = int(shape[-1])
    planes = {}
    for name, (pshape, dt) in plane_spec(typ, m, k).items():
        if dt in (np.float32, np.float16):
            if name in ("d", "dmin", "mn", "w"):
                vals = rng.standard_normal(pshape) * scale
            else:
                vals = rng.standard_normal(pshape)
            planes[name] = np.abs(vals).astype(dt) if name in ("d", "dmin") else vals.astype(dt)
        elif dt == np.int8:
            planes[name] = rng.integers(-64, 64, pshape, dtype=np.int8)
        else:
            planes[name] = rng.integers(0, 256, pshape, dtype=np.uint8)
    return QTensor(typ, (m, k), planes)


def device_put_qtensor(qt: QTensor, sharding=None) -> QTensor:
    """Move all planes to device (optionally with a NamedSharding)."""
    put = (lambda a: jax.device_put(a, sharding)) if sharding else jax.device_put
    return QTensor(qt.kind, qt.shape, {n: put(p) for n, p in qt.planes.items()})


def stack_qtensors(qts: list[QTensor]) -> QTensor:
    """Stack per-layer QTensors along a new leading axis (for lax.scan)."""
    kind = qts[0].kind
    shape = qts[0].shape
    assert all(q.kind == kind and q.shape == shape for q in qts)
    planes = {
        n: np.stack([q.planes[n] for q in qts], axis=0) for n in qts[0].planes
    }
    return QTensor(kind, (len(qts),) + tuple(shape), planes)
