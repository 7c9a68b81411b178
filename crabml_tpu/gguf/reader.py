"""Zero-copy GGUF file reader.

Parses the GGUF container (v1/v2/v3) from an mmap'd file and exposes each
tensor's raw bytes as a numpy view without copying — the TPU-native analogue of
the reference mmap loader (crabml-core/src/gguf.rs:689-833). Unlike the
reference, parsing is byte-offset based (no transmutes); the quantized payloads
are resharded into planar TPU layouts by crabml_tpu.quant.planar at load time.
"""

from __future__ import annotations

import mmap
import os
import struct
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from .constants import (
    GGMLType,
    GGUF_DEFAULT_ALIGNMENT,
    GGUF_MAGIC,
    GGUFValueType,
    tensor_nbytes,
)


from ..errors import FormatError


class GGUFError(FormatError):
    """Malformed GGUF container (typed; part of the crabml_tpu.errors
    taxonomy — the reference's ErrorKind::BadInput family)."""


@dataclass
class GGUFTensorInfo:
    """One tensor entry from the header.

    `dimensions` is the on-disk (ggml) order: dims[0] is the *fastest varying*
    axis. `shape` is the numpy/JAX order (reversed), matching how the reference
    loads tensors (crabml-llama2/src/model.rs:473-475).
    """

    name: str
    dimensions: tuple[int, ...]  # ggml order (ne[0] fastest)
    typ: GGMLType
    offset: int  # relative to start of tensor data section
    data: memoryview = field(repr=False, default=None)

    @property
    def shape(self) -> tuple[int, ...]:
        return tuple(reversed(self.dimensions))

    @property
    def n_elems(self) -> int:
        n = 1
        for d in self.dimensions:
            n *= d
        return n

    @property
    def nbytes(self) -> int:
        return tensor_nbytes(self.typ, self.n_elems)

    def to_numpy(self) -> np.ndarray:
        """Raw packed bytes as a (n_blocks, block_bytes)-flat u8 view. No copy."""
        return np.frombuffer(self.data, dtype=np.uint8)


class _Reader:
    """Little-endian cursor over a buffer."""

    __slots__ = ("buf", "pos", "version")

    def __init__(self, buf, version: int = 2):
        self.buf = buf
        self.pos = 0
        self.version = version

    def take(self, n: int) -> memoryview:
        if self.pos + n > len(self.buf):
            raise GGUFError(
                f"unexpected EOF: need {n} bytes at {self.pos}, have {len(self.buf)}"
            )
        out = memoryview(self.buf)[self.pos : self.pos + n]
        self.pos += n
        return out

    def _scalar2(self, fmt: str, size: int):
        v = struct.unpack_from(fmt, self.buf, self.pos)[0]
        self.pos += size
        return v

    def u8(self):
        return self._scalar2("<B", 1)

    def i8(self):
        return self._scalar2("<b", 1)

    def u16(self):
        return self._scalar2("<H", 2)

    def i16(self):
        return self._scalar2("<h", 2)

    def u32(self):
        return self._scalar2("<I", 4)

    def i32(self):
        return self._scalar2("<i", 4)

    def u64(self):
        return self._scalar2("<Q", 8)

    def i64(self):
        return self._scalar2("<q", 8)

    def f32(self):
        return self._scalar2("<f", 4)

    def f64(self):
        return self._scalar2("<d", 8)

    def boolean(self):
        return self.u8() != 0

    def length(self) -> int:
        """Length field: u32 in GGUF v1, u64 in v2/v3 (gguf.rs:399-424)."""
        return self.u32() if self.version == 1 else self.u64()

    def string(self) -> str:
        n = self.length()
        return bytes(self.take(n)).decode("utf-8", errors="replace")

    def array(self):
        typ = GGUFValueType(self.u32())
        n = self.length()
        # Fast-path numeric arrays via numpy frombuffer.
        np_map = {
            GGUFValueType.U8: np.uint8,
            GGUFValueType.I8: np.int8,
            GGUFValueType.U16: np.uint16,
            GGUFValueType.I16: np.int16,
            GGUFValueType.U32: np.uint32,
            GGUFValueType.I32: np.int32,
            GGUFValueType.U64: np.uint64,
            GGUFValueType.I64: np.int64,
            GGUFValueType.F32: np.float32,
            GGUFValueType.F64: np.float64,
        }
        if typ in np_map:
            dt = np.dtype(np_map[typ])
            raw = self.take(n * dt.itemsize)
            # copy: metadata is small, and a zero-copy view would pin the
            # mmap open (BufferError from close()) for the file's lifetime
            return np.frombuffer(raw, dtype=dt).copy()
        if typ == GGUFValueType.STRING:
            return [self.string() for _ in range(n)]
        if typ == GGUFValueType.BOOL:
            return [self.boolean() for _ in range(n)]
        if typ == GGUFValueType.ARRAY:
            return [self.array() for _ in range(n)]
        raise GGUFError(f"unsupported array element type {typ}")

    def value(self, typ: GGUFValueType):
        dispatch = {
            GGUFValueType.U8: self.u8,
            GGUFValueType.I8: self.i8,
            GGUFValueType.U16: self.u16,
            GGUFValueType.I16: self.i16,
            GGUFValueType.U32: self.u32,
            GGUFValueType.I32: self.i32,
            GGUFValueType.F32: self.f32,
            GGUFValueType.F64: self.f64,
            GGUFValueType.U64: self.u64,
            GGUFValueType.I64: self.i64,
            GGUFValueType.BOOL: self.boolean,
            GGUFValueType.STRING: self.string,
            GGUFValueType.ARRAY: self.array,
        }
        return dispatch[typ]()


class GGUFMetadata:
    """Typed access over the metadata KV map (gguf.rs:427-490)."""

    def __init__(self, kv: dict[str, Any], kv_types: dict[str, Any] | None = None):
        self._kv = kv
        # original wire types, preserved so a re-written file keeps typed
        # keys byte-compatible (strict readers assert gguf_get_val_* types)
        self._types = kv_types or {}

    def as_dict(self) -> dict[str, Any]:
        return self._kv

    def get(self, key: str, default=None):
        return self._kv.get(key, default)

    def get_str(self, key: str, default: str | None = None) -> str | None:
        v = self._kv.get(key, default)
        return v

    def get_int(self, key: str, default: int | None = None) -> int | None:
        v = self._kv.get(key)
        return int(v) if v is not None else default

    def get_float(self, key: str, default: float | None = None) -> float | None:
        v = self._kv.get(key)
        return float(v) if v is not None else default

    def value_type(self, key: str):
        return self._types.get(key)

    def __contains__(self, key: str) -> bool:
        return key in self._kv


class GGUFFile:
    """A parsed GGUF file with zero-copy tensor access.

    The reference computes each tensor's byte length from the *next* tensor's
    offset (gguf.rs:737-759); we compute it from dtype math and validate both
    against the file size, which catches truncated files and bad offsets.
    """

    def __init__(self, path: str | os.PathLike, mlock: bool = False):
        self.path = os.fspath(path)
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        if hasattr(self._mm, "madvise"):
            self._mm.madvise(mmap.MADV_WILLNEED)
        if mlock:
            # true mlock(2) on the mapping, like the reference's --mlock
            # (gguf.rs:795-827); best-effort — EPERM/ENOMEM are expected
            # without CAP_IPC_LOCK on multi-GB files
            try:
                import ctypes

                libc = ctypes.CDLL(None, use_errno=True)
                view = np.frombuffer(self._mm, np.uint8)  # read-only view
                addr = view.ctypes.data
                del view  # release the buffer export before close() can run
                if libc.mlock(ctypes.c_void_p(addr), ctypes.c_size_t(len(self._mm))) != 0:
                    import warnings

                    warnings.warn("mlock failed (need CAP_IPC_LOCK?); continuing unlocked")
            except (OSError, ValueError, AttributeError):
                pass
        try:
            self._parse()
        except GGUFError:
            raise
        except (struct.error, ValueError, OverflowError, MemoryError, IndexError) as e:
            # corrupt/truncated containers must fail typed, never leak the
            # parser's internal exception zoo
            raise GGUFError(f"malformed GGUF file {self.path!r}: {e}") from e

    # -- container parsing ----------------------------------------------------
    def _parse(self):
        r = _Reader(self._mm)
        magic = r.u32()
        if magic != GGUF_MAGIC:
            raise GGUFError(f"invalid GGUF magic 0x{magic:08x}")
        version = r.u32()
        if version not in (1, 2, 3):
            raise GGUFError(f"unsupported GGUF version {version}")
        self.version = version
        r.version = version

        tensor_count = r.length()
        metadata_kv_count = r.length()

        kv: dict[str, Any] = {}
        kv_types: dict[str, GGUFValueType] = {}
        for _ in range(metadata_kv_count):
            key = r.string()
            typ = GGUFValueType(r.u32())
            kv_types[key] = typ
            kv[key] = r.value(typ)
        self.metadata = GGUFMetadata(kv, kv_types)

        infos: list[GGUFTensorInfo] = []
        for _ in range(tensor_count):
            name = r.string()
            n_dims = r.u32()
            dims = tuple(r.length() for _ in range(n_dims))
            typ = GGMLType(r.u32())
            offset = r.u64()
            infos.append(GGUFTensorInfo(name, dims, typ, offset))

        align = self.alignment
        data_start = (r.pos + align - 1) // align * align
        self._data_start = data_start

        mv = memoryview(self._mm)
        file_size = len(self._mm)
        for info in infos:
            start = data_start + info.offset
            end = start + info.nbytes
            if end > file_size:
                raise GGUFError(
                    f"tensor {info.name!r} overruns file: [{start}, {end}) > {file_size}"
                )
            info.data = mv[start:end]

        self.tensor_infos = infos
        self._by_name = {i.name: i for i in infos}

    # -- public api -----------------------------------------------------------
    @property
    def alignment(self) -> int:
        return int(self.metadata.get("general.alignment", GGUF_DEFAULT_ALIGNMENT))

    @property
    def architecture(self) -> str:
        arch = self.metadata.get_str(KEY := "general.architecture")
        if arch is None:
            raise GGUFError(f"missing required metadata {KEY}")
        return arch

    def get_tensor_info(self, name: str) -> GGUFTensorInfo | None:
        return self._by_name.get(name)

    def __contains__(self, name: str) -> bool:
        return name in self._by_name

    def tensor_names(self) -> list[str]:
        return [i.name for i in self.tensor_infos]

    def close(self):
        for i in self.tensor_infos:
            i.data = None
        self._by_name = {}
        self.tensor_infos = []
        self._mm.close()
        self._f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
