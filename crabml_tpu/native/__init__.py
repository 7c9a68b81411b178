"""Native (C++) fast path: GGUF probe, bit-exact dequant, single-pass repack.

The reference implements its container/codec layer in Rust
(crabml-core/src/gguf.rs, crabml-core/src/cpu/buf/*); here the same roles are
C++ behind a C ABI loaded via ctypes. The library is built on demand with
g++ (no pip/pybind11 in the image) and cached next to this file; every entry
point has a pure-numpy fallback, so the package works without a toolchain.

Why it matters: loading a 7B GGUF does ~10 full numpy passes per tensor
(block split → planar → extract → permute → pack); crabml_repack does it in
one streaming pass per m-tile, threaded when cores are available.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import pathlib
import subprocess

import numpy as np

_DIR = pathlib.Path(__file__).resolve().parent
_SO = _DIR / "libcrabml_native.so"
_SRC = _DIR / "crabml_native.cpp"
_HASH = _DIR / "libcrabml_native.so.srchash"

_lib = None
_tried = False


def _src_hash() -> str:
    return hashlib.sha256(_SRC.read_bytes()).hexdigest()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-std=c++17",
             "-o", str(_SO), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        _HASH.write_text(_src_hash())
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _stale() -> bool:
    """True unless the cached .so was built from EXACTLY this source.

    Gate on a content hash of the source, not mtimes: git does not preserve
    mtimes, and the .so sits on the weight-correctness path (repack/dequant)
    — a stale or foreign binary must never be silently loaded.
    """
    if not _SO.exists() or not _HASH.exists():
        return True
    try:
        return _HASH.read_text().strip() != _src_hash()
    except OSError:
        return True


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if _stale():
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        return None
    lib.crabml_repack.restype = ctypes.c_int
    lib.crabml_repack.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.crabml_dequant.restype = ctypes.c_int
    lib.crabml_dequant.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p,
    ]
    lib.crabml_gguf_probe.restype = ctypes.c_int
    lib.crabml_gguf_probe.argtypes = [
        ctypes.c_void_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint32), ctypes.POINTER(ctypes.c_uint64),
        ctypes.POINTER(ctypes.c_uint64),
    ]
    lib.crabml_quantize.restype = ctypes.c_int
    lib.crabml_quantize.argtypes = [
        ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_int,
    ]
    lib.crabml_synth_quantize.restype = ctypes.c_int
    lib.crabml_synth_quantize.argtypes = [
        ctypes.c_int, ctypes.c_uint64, ctypes.c_int64, ctypes.c_float,
        ctypes.c_void_p, ctypes.c_int,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def repack_raw(typ, raw: np.ndarray, m: int, k: int, scale_dtype=np.float32):
    """Raw ggml blocks -> kernel-layout planes dict, or None if the native
    lib is unavailable or the scheme/shape is unsupported.

    Mirrors ops.pallas.gemm_quant.repack (the oracle for tests) including
    TK selection and k zero-padding.
    """
    from ..ops.pallas.gemm_quant import SCHEMES, TM, _tk_for

    lib = _load()
    if lib is None:
        return None
    kind = typ if isinstance(typ, int) else int(typ)
    from ..gguf.constants import GGMLType

    gt = GGMLType(kind)
    if gt not in SCHEMES:
        return None
    tk = _tk_for(gt, m, k)
    if tk is None:
        return None
    s = SCHEMES[gt]
    S = -(-k // tk)
    kpad, G, MT = S * tk, tk // s.gr, m // TM

    is_bf16 = scale_dtype in ("bf16",) or scale_dtype == np.dtype("bfloat16")
    if scale_dtype == "bf16" or (hasattr(scale_dtype, "__name__") and "bfloat16" in str(scale_dtype)):
        is_bf16 = True
    if is_bf16:
        import ml_dtypes

        sdt = ml_dtypes.bfloat16
    else:
        sdt = np.float32

    raw = np.ascontiguousarray(raw.reshape(-1).view(np.uint8))
    planes = {}
    qptrs = []
    for idx, pbits in enumerate(s.planes):
        if pbits == 8:
            p = np.empty((MT, kpad, TM), np.int8)
        else:
            p = np.empty((MT, kpad // (8 // pbits), TM), np.uint8)
        planes[f"q{idx}"] = p
        qptrs.append(_ptr(p))
    while len(qptrs) < 2:
        qptrs.append(None)
    dsub = np.empty((MT, S, G, TM), sdt)
    planes["dsub"] = dsub
    msub = None
    if s.has_min:
        msub = np.empty((MT, S, G, TM), sdt)
        planes["msub"] = msub

    n_threads = os.cpu_count() or 1
    rc = lib.crabml_repack(
        int(kind), _ptr(raw), m, k, tk, n_threads, int(is_bf16),
        qptrs[0], qptrs[1], _ptr(dsub), _ptr(msub) if msub is not None else None,
    )
    if rc != 0:
        return None
    return planes


def dequant(typ, raw: np.ndarray, m: int, k: int):
    """Bit-exact f32 dequant via the native codecs, or None if unavailable."""
    lib = _load()
    if lib is None:
        return None
    raw = np.ascontiguousarray(raw.reshape(-1).view(np.uint8))
    out = np.empty((m, k), np.float32)
    rc = lib.crabml_dequant(int(typ), _ptr(raw), m, k, _ptr(out))
    return out if rc == 0 else None


def _block_geometry(typ: int):
    from ..gguf.constants import GGMLType, GGML_BLOCK_SIZES

    gt = GGMLType(int(typ))
    return GGML_BLOCK_SIZES[gt]


def quantize(typ, x: np.ndarray) -> bytes | None:
    """Fast ggml block encode (all quant schemes incl. K-quants), or None
    if the native lib is unavailable. Same semantics as codecs.quantize
    (reference encoders: buf_*.rs quantize + util.rs scale searches) but
    ~100x faster — Python's per-element greedy K-quant refinement makes
    requantizing a 7B take hours; this does it in minutes on one core."""
    lib = _load()
    if lib is None:
        return None
    belems, bbytes = _block_geometry(typ)
    x = np.ascontiguousarray(np.asarray(x, np.float32).reshape(-1))
    if x.size % belems:
        return None
    out = np.empty((x.size // belems) * bbytes, np.uint8)
    rc = lib.crabml_quantize(int(typ), _ptr(x), x.size, _ptr(out),
                             os.cpu_count() or 1)
    return out.tobytes() if rc == 0 else None


def synth_quantize(typ, seed: int, n: int, sigma: float) -> bytes | None:
    """Deterministic pseudo-random weights quantized straight to ggml
    blocks (no host f32 materialization) — used to construct full-size
    synthetic GGUF files for load/cold-start benchmarks."""
    lib = _load()
    if lib is None:
        return None
    belems, bbytes = _block_geometry(typ)
    if n % belems:
        return None
    out = np.empty((n // belems) * bbytes, np.uint8)
    rc = lib.crabml_synth_quantize(int(typ), seed & (2**64 - 1), n,
                                   float(sigma), _ptr(out), os.cpu_count() or 1)
    return out.tobytes() if rc == 0 else None


def gguf_probe(buf) -> tuple[int, int, int] | None:
    """(version, n_tensors, n_kv) from a GGUF header, or None."""
    lib = _load()
    if lib is None:
        return None
    b = np.frombuffer(bytes(buf[:64]), np.uint8)
    ver = ctypes.c_uint32()
    nt = ctypes.c_uint64()
    nkv = ctypes.c_uint64()
    rc = lib.crabml_gguf_probe(_ptr(b), len(b), ctypes.byref(ver),
                               ctypes.byref(nt), ctypes.byref(nkv))
    if rc != 0:
        return None
    return ver.value, nt.value, nkv.value
