"""Quantized matmul dispatch.

`qmatmul(x, qt)` computes x @ W^T for a QTensor W of logical shape (m, k),
x: (..., k) -> (..., m). Backend selection:

- "xla": dequantize planes -> dense (fused by XLA into the matmul). Good
  baseline; optimal for prefill where the matmul is MXU-bound anyway.
- "pallas": fused dequant+matmul kernel streaming packed planes from HBM
  (crabml_tpu.ops.pallas) — the HBM-roofline decode path.

The reference's analogue is matmul_vec + vec_dot per scheme
(crabml-core/src/cpu/primitives/matmul_vec.rs:9-78); there the activation is
integer-quantized per block. On TPU the MXU consumes bf16/f32 directly, so we
dequantize weights instead — same math, no activation quantization error.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..gguf.constants import GGMLType
from ..quant.jnp_dequant import dequant_jnp
from ..quant.planar import QTensor

# set by runtime config; "pallas" routes eligible shapes to fused kernels,
# "w4a8" additionally int8-quantizes activations per group (int8 MXU dots)
_BACKEND = "xla"
_ACT_QUANT = False


def set_backend(name: str):
    global _BACKEND, _ACT_QUANT
    assert name in ("xla", "pallas", "auto", "w4a8")
    if name == "auto":
        import jax

        # fused kernels are strictly faster on real TPUs (3.5x decode at
        # 7B); on CPU they run in interpret mode, where XLA dequant wins
        name = "pallas" if jax.default_backend() == "tpu" else "xla"
    _ACT_QUANT = name == "w4a8"
    _BACKEND = "pallas" if name == "w4a8" else name


def get_backend() -> str:
    """Resolved backend name ("xla" or "pallas") after set_backend."""
    return _BACKEND


def qmatmul(x, qt: QTensor, compute_dtype=jnp.float32, layer=None):
    """x: (..., k) @ qt(m, k)^T -> (..., m).

    `layer`: traced layer index selecting one layer of a stacked
    (L, m, k) QTensor — the Pallas path picks it via scalar prefetch
    (no plane copies inside lax.scan); the XLA path dynamic-indexes.
    """
    if _BACKEND == "pallas":
        from .pallas import gemm_quant

        out = gemm_quant.qmatmul_pallas(x, qt, compute_dtype, layer=layer,
                                        act_quant=_ACT_QUANT)
        if out is not None:
            return out
        if qt.kind in gemm_quant.SCHEMES:  # f32/f16 are XLA-path by design
            from ..utils import log_fallback

            log_fallback(
                "qmatmul",
                f"{qt.kind.name} shape={tuple(qt.shape)} "
                f"{'no kernel layout' if not gemm_quant.is_repacked(qt) else 'shape ineligible'}",
            )
    if layer is not None:
        qt = QTensor(
            qt.kind,
            tuple(qt.shape[1:]),
            {n: jnp.asarray(p)[layer] for n, p in qt.planes.items()},
        )
    w = dequant_jnp(qt, compute_dtype)
    # f32 compute must be real f32 on the MXU (default TPU matmul is bf16)
    prec = "highest" if compute_dtype == jnp.float32 else None
    return jnp.dot(
        x.astype(compute_dtype),
        w.T,
        preferred_element_type=compute_dtype,
        precision=prec,
    ).astype(x.dtype)


def embedding_lookup(qt: QTensor, tokens, compute_dtype=jnp.float32):
    """Row gather + dequantize-only-the-rows (token_embd may be quantized).

    Mirrors copy_rows_from + dequantize (cpu_tensor.rs:306-331) but gathers
    packed planes first so only (B*T, k) elements are dequantized.
    """
    sub_planes = {n: p[tokens] for n, p in qt.planes.items()}
    flat_shape = tokens.shape + (qt.k,)
    m = 1
    for d in tokens.shape:
        m *= d
    sub = QTensor(qt.kind, (m, qt.k), {n: p.reshape((m,) + p.shape[len(tokens.shape):]) for n, p in sub_planes.items()})
    return dequant_jnp(sub, compute_dtype).reshape(flat_shape)
