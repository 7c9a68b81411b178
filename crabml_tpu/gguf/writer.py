"""GGUF file writer.

The reference engine is read-only; we add a writer so the framework can
(a) generate committed tiny test fixtures in every quant scheme — mirroring the
reference's tiny-fixture test strategy (SURVEY §4) without copying its binary
testdata — and (b) export/convert models.
Wire format follows crabml-core/src/gguf.rs:399-570 (v3 by default).
"""

from __future__ import annotations

import struct
from typing import Any, Sequence

import numpy as np

from .constants import GGMLType, GGUF_MAGIC, GGUFValueType, tensor_nbytes


def _pack_str(s: str) -> bytes:
    b = s.encode("utf-8")
    return struct.pack("<Q", len(b)) + b


def _value_type_of(v: Any) -> GGUFValueType:
    if isinstance(v, bool):
        return GGUFValueType.BOOL
    if isinstance(v, int):
        return GGUFValueType.U32 if 0 <= v < 2**32 else GGUFValueType.I64
    if isinstance(v, float):
        return GGUFValueType.F32
    if isinstance(v, str):
        return GGUFValueType.STRING
    if isinstance(v, (list, tuple, np.ndarray)):
        return GGUFValueType.ARRAY
    raise TypeError(f"cannot infer GGUF type for {type(v)}")


def _pack_value(v: Any, typ: GGUFValueType) -> bytes:
    if typ == GGUFValueType.U8:
        return struct.pack("<B", v)
    if typ == GGUFValueType.I8:
        return struct.pack("<b", v)
    if typ == GGUFValueType.U16:
        return struct.pack("<H", v)
    if typ == GGUFValueType.I16:
        return struct.pack("<h", v)
    if typ == GGUFValueType.U32:
        return struct.pack("<I", v)
    if typ == GGUFValueType.I32:
        return struct.pack("<i", v)
    if typ == GGUFValueType.U64:
        return struct.pack("<Q", v)
    if typ == GGUFValueType.I64:
        return struct.pack("<q", v)
    if typ == GGUFValueType.F32:
        return struct.pack("<f", v)
    if typ == GGUFValueType.F64:
        return struct.pack("<d", v)
    if typ == GGUFValueType.BOOL:
        return struct.pack("<B", 1 if v else 0)
    if typ == GGUFValueType.STRING:
        return _pack_str(v)
    if typ == GGUFValueType.ARRAY:
        return _pack_array(v)
    raise TypeError(f"unsupported type {typ}")


_NP_TO_GGUF = {
    np.dtype(np.uint8): GGUFValueType.U8,
    np.dtype(np.int8): GGUFValueType.I8,
    np.dtype(np.uint16): GGUFValueType.U16,
    np.dtype(np.int16): GGUFValueType.I16,
    np.dtype(np.uint32): GGUFValueType.U32,
    np.dtype(np.int32): GGUFValueType.I32,
    np.dtype(np.uint64): GGUFValueType.U64,
    np.dtype(np.int64): GGUFValueType.I64,
    np.dtype(np.float32): GGUFValueType.F32,
    np.dtype(np.float64): GGUFValueType.F64,
}


def _pack_array(arr) -> bytes:
    if isinstance(arr, np.ndarray):
        et = _NP_TO_GGUF[arr.dtype]
        return (
            struct.pack("<IQ", int(et), arr.size) + arr.astype(arr.dtype).tobytes()
        )
    if len(arr) == 0:
        return struct.pack("<IQ", int(GGUFValueType.U32), 0)
    first = arr[0]
    if isinstance(first, str):
        out = struct.pack("<IQ", int(GGUFValueType.STRING), len(arr))
        return out + b"".join(_pack_str(s) for s in arr)
    if isinstance(first, float):
        a = np.asarray(arr, dtype=np.float32)
        return struct.pack("<IQ", int(GGUFValueType.F32), a.size) + a.tobytes()
    if isinstance(first, bool):
        out = struct.pack("<IQ", int(GGUFValueType.BOOL), len(arr))
        return out + b"".join(struct.pack("<B", 1 if b else 0) for b in arr)
    if isinstance(first, int):
        a = np.asarray(arr, dtype=np.int32)
        return struct.pack("<IQ", int(GGUFValueType.I32), a.size) + a.tobytes()
    raise TypeError(f"cannot pack array of {type(first)}")


class GGUFWriter:
    """Builds a GGUF v3 file in memory, then writes it out."""

    def __init__(self, alignment: int = 32):
        self.alignment = alignment
        self._metadata: list[tuple[str, Any, GGUFValueType | None]] = []
        # (name, ggml_dims, typ, packed_bytes)
        self._tensors: list[tuple[str, tuple[int, ...], GGMLType, bytes]] = []

    def add_metadata(self, key: str, value: Any, typ: GGUFValueType | None = None):
        self._metadata.append((key, value, typ))

    def add_tensor(
        self,
        name: str,
        typ: GGMLType,
        shape: Sequence[int],
        packed: bytes | np.ndarray,
    ):
        """`shape` is numpy order; stored on disk in reversed (ggml) order.

        `packed` must already be in the ggml wire encoding for `typ`
        (use crabml_tpu.quant.codecs.quantize for float data).
        """
        if isinstance(packed, np.ndarray):
            packed = packed.tobytes()
        n_elems = int(np.prod(shape)) if len(shape) else 1
        from .constants import GGML_BLOCK_SIZES

        blk = GGML_BLOCK_SIZES[typ][0]
        if len(shape) > 1 and shape[-1] % blk != 0:
            raise ValueError(
                f"tensor {name}: row length {shape[-1]} not a multiple of "
                f"{typ.name} block size {blk} (blocks must not span rows)"
            )
        expect = tensor_nbytes(typ, n_elems)
        if len(packed) != expect:
            raise ValueError(
                f"tensor {name}: expected {expect} packed bytes for "
                f"{typ.name} {tuple(shape)}, got {len(packed)}"
            )
        ggml_dims = tuple(reversed(tuple(int(d) for d in shape)))
        self._tensors.append((name, ggml_dims, typ, packed))

    def write(self, path: str):
        align = self.alignment
        header = bytearray()
        header += struct.pack("<IIQQ", GGUF_MAGIC, 3, len(self._tensors), len(self._metadata))
        for key, value, typ in self._metadata:
            typ = typ if typ is not None else _value_type_of(value)
            header += _pack_str(key)
            header += struct.pack("<I", int(typ))
            header += _pack_value(value, typ)

        # tensor infos with ascending aligned offsets
        offset = 0
        blobs = []
        for name, ggml_dims, typ, packed in self._tensors:
            header += _pack_str(name)
            header += struct.pack("<I", len(ggml_dims))
            for d in ggml_dims:
                header += struct.pack("<Q", d)
            header += struct.pack("<I", int(typ))
            header += struct.pack("<Q", offset)
            blobs.append((offset, packed))
            offset += (len(packed) + align - 1) // align * align

        data_start = (len(header) + align - 1) // align * align
        with open(path, "wb") as f:
            f.write(header)
            f.write(b"\x00" * (data_start - len(header)))
            pos = 0
            for off, packed in blobs:
                if off > pos:
                    f.write(b"\x00" * (off - pos))
                    pos = off
                f.write(packed)
                pos += len(packed)


def requantize_gguf(src_path: str, dst_path: str, typ: GGMLType) -> int:
    """Re-quantize a GGUF's matmul weights to `typ` (the llama.cpp
    `quantize` tool's role). Norm vectors and any tensor whose row length
    doesn't divide the target block size keep their original encoding;
    metadata is copied verbatim. Returns the number of requantized
    tensors (0 means the sweep was a no-op, e.g. K-quants on rows < 256).

    Uses the native C++ encoders when available (quant/codecs.py's K-quant
    scale searches are Python-per-element: hours at 7B; native does
    ~70 Melem/s/core), falling back to the numpy oracle."""
    from .. import native
    from ..quant.codecs import dequantize
    from ..quant.codecs import quantize as _py_quantize
    from .constants import GGML_BLOCK_SIZES
    from .reader import GGUFFile

    def quantize(t, x):
        out = native.quantize(t, x)
        return out if out is not None else _py_quantize(t, x)

    gf = GGUFFile(src_path)
    w = GGUFWriter()
    for key, value in gf.metadata.as_dict().items():
        w.add_metadata(key, value, gf.metadata.value_type(key))
    blk = GGML_BLOCK_SIZES[typ][0]
    n_requant = 0
    for info in gf.tensor_infos:
        shape = info.shape
        requant = (
            len(shape) == 2
            and shape[-1] % blk == 0
            and info.typ in (GGMLType.F32, GGMLType.F16)
            or len(shape) == 2
            and shape[-1] % blk == 0
            and info.typ != typ
        )
        if requant:
            dense = dequantize(info.typ, info.to_numpy(), info.n_elems).reshape(shape)
            w.add_tensor(info.name, typ, shape, quantize(typ, dense))
            n_requant += 1
        else:
            w.add_tensor(info.name, info.typ, shape, bytes(info.to_numpy()))
    w.write(dst_path)
    return n_requant
