"""GGUF / GGML format constants.

TPU-native re-implementation of the GGUF container format semantics exercised by
the reference engine (see /root/reference/crabml-core/src/gguf.rs:15-108 for the
magic, version, dtype and metadata-type tables this mirrors). The *data layout*
knowledge lives here; everything else (parsing, resharding) is built TPU-first.
"""

from __future__ import annotations

import enum

GGUF_MAGIC = 0x46554747  # b"GGUF" little-endian
GGUF_DEFAULT_ALIGNMENT = 32

# --- metadata keys (gguf.rs:18-64) -------------------------------------------
KEY_GENERAL_ARCHITECTURE = "general.architecture"
KEY_GENERAL_ALIGNMENT = "general.alignment"
KEY_GENERAL_NAME = "general.name"
KEY_GENERAL_QUANTIZATION_VERSION = "general.quantization_version"


class GGMLType(enum.IntEnum):
    """ggml tensor dtypes; ids are wire-format (gguf.rs:84-108)."""

    F32 = 0
    F16 = 1
    Q4_0 = 2
    Q4_1 = 3
    # 4, 5 were Q4_2 / Q4_3, removed from ggml
    Q5_0 = 6
    Q5_1 = 7
    Q8_0 = 8
    Q8_1 = 9
    Q2_K = 10
    Q3_K = 11
    Q4_K = 12
    Q5_K = 13
    Q6_K = 14
    Q8_K = 15
    I8 = 16
    I16 = 17
    I32 = 18


class GGUFValueType(enum.IntEnum):
    """Metadata value wire types (gguf.rs:149-178)."""

    U8 = 0
    I8 = 1
    U16 = 2
    I16 = 3
    U32 = 4
    I32 = 5
    F32 = 6
    BOOL = 7
    STRING = 8
    ARRAY = 9
    U64 = 10
    I64 = 11
    F64 = 12


# Super-block size for K-quants.
QK_K = 256

# (elements per block, bytes per block) for every dtype.
# Block sizes are the packed ggml wire sizes; f16 = 2 bytes.
GGML_BLOCK_SIZES: dict[GGMLType, tuple[int, int]] = {
    GGMLType.F32: (1, 4),
    GGMLType.F16: (1, 2),
    GGMLType.Q4_0: (32, 2 + 16),            # d:f16, qs:u8[16]
    GGMLType.Q4_1: (32, 2 + 2 + 16),        # d:f16, m:f16, qs:u8[16]
    GGMLType.Q5_0: (32, 2 + 4 + 16),        # d:f16, qh:u8[4], qs:u8[16]
    GGMLType.Q5_1: (32, 2 + 2 + 4 + 16),    # d:f16, m:f16, qh:u8[4], qs:u8[16]
    GGMLType.Q8_0: (32, 2 + 32),            # d:f16, qs:i8[32]
    GGMLType.Q8_1: (32, 2 + 2 + 32),        # d:f16, s:f16, qs:i8[32]
    GGMLType.Q2_K: (QK_K, 16 + 64 + 2 + 2),          # scales[16], qs[64], d, dmin
    GGMLType.Q3_K: (QK_K, 32 + 64 + 12 + 2),         # hmask[32], qs[64], scales[12], d
    GGMLType.Q4_K: (QK_K, 2 + 2 + 12 + 128),         # d, dmin, scales[12], qs[128]
    GGMLType.Q5_K: (QK_K, 2 + 2 + 12 + 32 + 128),    # d, dmin, scales[12], qh[32], qs[128]
    GGMLType.Q6_K: (QK_K, 128 + 64 + 16 + 2),        # ql[128], qh[64], scales:i8[16], d
    GGMLType.Q8_K: (QK_K, 4 + 256 + 2 * 16),         # d:f32, qs:i8[256], bsums:i16[16]
    GGMLType.I8: (1, 1),
    GGMLType.I16: (1, 2),
    GGMLType.I32: (1, 4),
}


def ggml_type_size(typ: GGMLType) -> tuple[int, int]:
    """(block_elems, block_bytes) for dtype `typ`."""
    return GGML_BLOCK_SIZES[typ]


def tensor_nbytes(typ: GGMLType, n_elems: int) -> int:
    blk, nbytes = GGML_BLOCK_SIZES[typ]
    if n_elems % blk != 0:
        # typed, not assert: a corrupt container can request an impossible
        # shape/dtype combination (found by the hypothesis fuzzer)
        from ..errors import FormatError

        raise FormatError(
            f"{n_elems} elements not a multiple of {typ.name} block size {blk}"
        )
    return (n_elems // blk) * nbytes


# Activation-quantization partner for integer-dot matmuls
# (mirrors vec_dot_rhs_dtype, crabml-core/src/cpu/buf/api.rs:142-159).
VEC_DOT_PARTNER: dict[GGMLType, GGMLType] = {
    GGMLType.F32: GGMLType.F32,
    GGMLType.F16: GGMLType.F16,
    GGMLType.Q4_0: GGMLType.Q8_0,
    GGMLType.Q5_0: GGMLType.Q8_0,
    GGMLType.Q8_0: GGMLType.Q8_0,
    GGMLType.Q4_1: GGMLType.Q8_1,
    GGMLType.Q5_1: GGMLType.Q8_1,
    GGMLType.Q8_1: GGMLType.Q8_1,
    GGMLType.Q2_K: GGMLType.Q8_K,
    GGMLType.Q3_K: GGMLType.Q8_K,
    GGMLType.Q4_K: GGMLType.Q8_K,
    GGMLType.Q5_K: GGMLType.Q8_K,
    GGMLType.Q6_K: GGMLType.Q8_K,
    GGMLType.Q8_K: GGMLType.Q8_K,
}
