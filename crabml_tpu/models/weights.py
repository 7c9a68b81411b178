"""GGUF -> planar weight pytree.

Loads the per-architecture tensor-name schemas of the reference
(crabml-llama2/src/model.rs:200-460): llama/gemma, qwen2 (+q/k/v bias), phi2
(fused qkv split into q/k/v rows at load — row slicing is safe because quant
blocks run along k). Norm weights are dequantized to f32 eagerly (as the
reference does, model.rs:267-282); matmul weights stay quantized as planar
QTensors, stacked across layers for lax.scan.
"""

from __future__ import annotations

import numpy as np

from ..gguf.constants import GGMLType
from ..gguf.reader import GGUFFile
from ..quant.codecs import dequantize
from ..quant.planar import QTensor, stack_qtensors, to_planar
from .config import ModelConfig


def _dense_f32(gf: GGUFFile, name: str) -> np.ndarray:
    info = gf.get_tensor_info(name)
    if info is None:
        raise KeyError(f"tensor not found: {name}")
    return dequantize(info.typ, info.to_numpy(), info.n_elems).reshape(info.shape)


def _qtensor(gf: GGUFFile, name: str) -> QTensor:
    info = gf.get_tensor_info(name)
    if info is None:
        raise KeyError(f"tensor not found: {name}")
    return to_planar(info.typ, info.to_numpy(), info.shape)


def _qtensor_opt(gf: GGUFFile, name: str) -> QTensor | None:
    return _qtensor(gf, name) if name in gf else None


def _qtensor_kernel(gf: GGUFFile, name: str, scale_dtype=np.float32) -> QTensor:
    """Load a matmul weight directly in the Pallas kernel plane layout.

    Uses the native C++ single-pass repack (crabml_tpu.native) when built;
    otherwise canonical planar + the Python repack. Falls back to canonical
    planes (XLA dequant path) for unsupported shapes — qmatmul dispatches
    per-tensor on is_repacked()."""
    from .. import native
    from ..ops.pallas.gemm_quant import repack

    info = gf.get_tensor_info(name)
    if info is None:
        raise KeyError(f"tensor not found: {name}")
    shape = info.shape
    m = int(np.prod(shape[:-1])) if len(shape) > 1 else 1
    k = int(shape[-1])
    if native.available():
        planes = native.repack_raw(info.typ, info.to_numpy(), m, k, scale_dtype)
        if planes is not None:
            return QTensor(info.typ, (m, k), planes)
    qt = to_planar(info.typ, info.to_numpy(), shape)
    r = repack(qt, scale_dtype)
    return r if r is not None else qt


def _slice_rows(qt: QTensor, start: int, stop: int) -> QTensor:
    """Row-slice a QTensor (all planes share the leading m axis)."""
    return QTensor(
        qt.kind, (stop - start, qt.k), {n: p[start:stop] for n, p in qt.planes.items()}
    )


def fuse_weights(weights: dict, cfg: ModelConfig) -> dict:
    """Load-time fusion: concat wq|wk|wv -> wqkv and ffn_gate|ffn_up -> wgu
    along the output (m) axis, so each decode layer issues one kernel call
    per fused group instead of three/two. Skipped per group when the parts
    have different quant kinds (e.g. Q4_K_M mixes Q6_K into attn_v) —
    forward handles both layouts. Biases fuse alongside their weights."""
    lw = dict(weights["layers"])

    def cat(names, out_name, bias_names, bias_out):
        qs = [lw.get(n) for n in names]
        if any(q is None for q in qs):
            return
        if len({q.kind for q in qs}) != 1 or len({q.k for q in qs}) != 1:
            return
        if len({frozenset(q.planes) for q in qs}) != 1:
            return  # mixed kernel/planar layouts (partial fallback)
        planes = {
            n: np.concatenate([q.planes[n] for q in qs], axis=1)
            for n in qs[0].planes
        }
        m_total = sum(q.shape[1] for q in qs)
        lw[out_name] = QTensor(qs[0].kind, (qs[0].shape[0], m_total, qs[0].k), planes)
        for n in names:
            del lw[n]
        if bias_names and all(b in lw for b in bias_names):
            lw[bias_out] = np.concatenate([lw[b] for b in bias_names], axis=1)
            for b in bias_names:
                del lw[b]

    cat(["wq", "wk", "wv"], "wqkv", ["bq", "bk", "bv"], "bqkv")
    if not cfg.no_ffn_gate:
        cat(["ffn_gate", "ffn_up"], "wgu", [], "_")
    out = dict(weights)
    out["layers"] = lw
    return out


def repack_weights(weights: dict, cfg: ModelConfig | None = None) -> dict:
    """Re-layout matmul weights for the Pallas kernels (ops.pallas.gemm_quant).

    token_embed stays canonical (the gather path dequantizes rows);
    unsupported shapes keep their canonical planes and fall back to XLA.
    """
    from ..ops.pallas.gemm_quant import TM, repack
    from ..quant.planar import stack_qtensors

    from ..ops.pallas.gemm_quant import is_repacked

    # ffn_down_exps is sliced per expert at trace time; repacked slicing
    # needs tile-aligned expert rows (see load_weights / _slice_expert)
    skip = set()
    if cfg is not None and cfg.n_experts and cfg.embedding_dim % TM:
        skip.add("ffn_down_exps")

    def rep_stacked(qt: QTensor) -> QTensor:
        if is_repacked(qt):
            return qt
        outs = []
        for l in range(qt.shape[0]):
            one = QTensor(qt.kind, tuple(qt.shape[1:]), {n: p[l] for n, p in qt.planes.items()})
            r = repack(one)
            if r is None:
                return qt
            outs.append(r)
        return stack_qtensors(outs)

    out = dict(weights)
    out["layers"] = {
        name: (
            rep_stacked(val)
            if isinstance(val, QTensor) and name not in skip
            else val
        )
        for name, val in weights["layers"].items()
    }
    if weights.get("output") is not None and not is_repacked(weights["output"]):
        r = repack(weights["output"])
        out["output"] = r if r is not None else weights["output"]
    return out


def w8_plane_bytes(qt: QTensor) -> int:
    """HBM bytes augment_w8 would add to this tensor: one int8/weight plus
    one f32 scale per (column, W8_KSC-chunk)."""
    from ..ops.pallas.gemm_quant import W8_KSC

    n = 1
    for d in qt.shape:
        n *= d
    return int(n * (1 + 4 / W8_KSC))


def augment_w8_weights(weights: dict, budget_bytes: int | None = None) -> dict:
    """Attach W8 prefill planes (int8 weights + per-chunk scales) to the
    repacked layer matmuls + the output head — the unpack-free prefill path
    (ops.pallas.gemm_quant.augment_w8). token_embed stays untouched (gather
    path). Costs +8 bits/weight of HBM.

    `budget_bytes` caps the added HBM: tensors augment LARGEST-first until
    the budget runs out (partial W8 — e.g. a 13B model on a 16 GB chip
    augments the tensors that fit; the rest prefill through the bf16
    dequant kernels, since the matmul dispatch keys on per-tensor plane
    presence). None = augment everything (the legacy full opt-in)."""
    from ..ops.pallas.gemm_quant import augment_w8

    out = dict(weights)
    layers = dict(weights["layers"])
    cands = [(n, v) for n, v in layers.items() if isinstance(v, QTensor)]
    if isinstance(weights.get("output"), QTensor):
        cands.append(("output", weights["output"]))
    # largest first: the prefill win per tensor tracks its byte share
    cands.sort(key=lambda kv: -w8_plane_bytes(kv[1]))
    spent = 0
    for name, qt in cands:
        cost = w8_plane_bytes(qt)
        if budget_bytes is not None and spent + cost > budget_bytes:
            continue  # keep trying smaller tensors
        new = augment_w8(qt)
        if new is not qt:  # augment_w8 no-ops on ineligible tensors
            spent += cost
            if name == "output":
                out["output"] = new
            else:
                layers[name] = new
    out["layers"] = layers
    return out


def load_weights(
    gf: GGUFFile, cfg: ModelConfig, layout: str = "planar", scale_dtype=np.float32
) -> dict:
    """layout="kernel" loads matmul weights pre-repacked for the Pallas
    kernels (native C++ single pass when available); "planar" keeps the
    canonical planes for the XLA dequant path. scale_dtype="bf16" halves
    kernel scale-plane bytes (Q4_K: 6.5 -> 5.5 bits/elem)."""
    arch = cfg.architecture
    L = cfg.n_layers
    dim = cfg.embedding_dim
    kv_dim = cfg.kv_dim
    if layout == "kernel":
        q_load = lambda gf, name: _qtensor_kernel(gf, name, scale_dtype)
    else:
        q_load = _qtensor

    layers: dict[str, object] = {}

    def stack_q(fmt: str) -> QTensor:
        return stack_qtensors([q_load(gf, fmt.format(l)) for l in range(L)])

    def stack_f32(fmt: str) -> np.ndarray:
        return np.stack([_dense_f32(gf, fmt.format(l)) for l in range(L)])

    if arch in ("llama", "gemma", "qwen2", "qwen3", "gemma2"):
        layers["wq"] = stack_q("blk.{}.attn_q.weight")
        layers["wk"] = stack_q("blk.{}.attn_k.weight")
        layers["wv"] = stack_q("blk.{}.attn_v.weight")
        layers["wo"] = stack_q("blk.{}.attn_output.weight")
        if cfg.n_experts:  # mixtral MoE: router + 3D expert tensors
            from ..ops.pallas.gemm_quant import TM

            layers["ffn_gate_inp"] = stack_f32("blk.{}.ffn_gate_inp.weight")
            layers["ffn_gate_exps"] = stack_q("blk.{}.ffn_gate_exps.weight")
            layers["ffn_up_exps"] = stack_q("blk.{}.ffn_up_exps.weight")
            # down_exps is sliced per expert (m = E*D folded): the kernel
            # layout is only safe when each expert's rows are tile-aligned
            # (E*D % TM can hold while D % TM doesn't — keep planar then)
            if cfg.embedding_dim % TM == 0:
                layers["ffn_down_exps"] = stack_q("blk.{}.ffn_down_exps.weight")
            else:
                layers["ffn_down_exps"] = stack_qtensors(
                    [_qtensor(gf, f"blk.{l}.ffn_down_exps.weight") for l in range(L)]
                )
        else:
            layers["ffn_gate"] = stack_q("blk.{}.ffn_gate.weight")
            layers["ffn_down"] = stack_q("blk.{}.ffn_down.weight")
            layers["ffn_up"] = stack_q("blk.{}.ffn_up.weight")
        layers["attn_norm"] = stack_f32("blk.{}.attn_norm.weight")
        layers["ffn_norm"] = stack_f32("blk.{}.ffn_norm.weight")
        if arch == "qwen2":
            layers["bq"] = stack_f32("blk.{}.attn_q.bias")
            layers["bk"] = stack_f32("blk.{}.attn_k.bias")
            layers["bv"] = stack_f32("blk.{}.attn_v.bias")
        if arch == "qwen3":  # per-head q/k RMS norms
            layers["q_norm"] = stack_f32("blk.{}.attn_q_norm.weight")
            layers["k_norm"] = stack_f32("blk.{}.attn_k_norm.weight")
        if arch == "gemma2":  # post-attention/post-ffn norms
            layers["post_attn_norm"] = stack_f32("blk.{}.post_attention_norm.weight")
            layers["post_ffn_norm"] = stack_f32("blk.{}.post_ffw_norm.weight")
    elif arch == "phi3":
        # llama.cpp build_phi3: fused qkv rows [q|k|v] (no bias) and fused
        # ffn_up rows [gate|up] (SWIGLU). Split at load — row slicing is
        # safe (quant blocks run along k) — so fusion/TP machinery sees
        # the standard llama schema.
        wq, wk, wv, gates, ups = [], [], [], [], []
        HD = cfg.hidden_dim
        for l in range(L):
            qkv = _qtensor(gf, f"blk.{l}.attn_qkv.weight")
            wq.append(_slice_rows(qkv, 0, dim))
            wk.append(_slice_rows(qkv, dim, dim + kv_dim))
            wv.append(_slice_rows(qkv, dim + kv_dim, dim + 2 * kv_dim))
            gu = _qtensor(gf, f"blk.{l}.ffn_up.weight")
            gates.append(_slice_rows(gu, 0, HD))
            ups.append(_slice_rows(gu, HD, 2 * HD))
        layers["wq"] = stack_qtensors(wq)
        layers["wk"] = stack_qtensors(wk)
        layers["wv"] = stack_qtensors(wv)
        layers["ffn_gate"] = stack_qtensors(gates)
        layers["ffn_up"] = stack_qtensors(ups)
        layers["wo"] = stack_q("blk.{}.attn_output.weight")
        layers["ffn_down"] = stack_q("blk.{}.ffn_down.weight")
        layers["attn_norm"] = stack_f32("blk.{}.attn_norm.weight")
        layers["ffn_norm"] = stack_f32("blk.{}.ffn_norm.weight")
    elif arch == "phi2":
        wq, wk, wv, bq, bk, bv = [], [], [], [], [], []
        for l in range(L):
            qkv = _qtensor(gf, f"blk.{l}.attn_qkv.weight")
            # fused rows: [q (dim), k (kv_dim), v (kv_dim)] (llama2.rs:369-390)
            wq.append(_slice_rows(qkv, 0, dim))
            wk.append(_slice_rows(qkv, dim, dim + kv_dim))
            wv.append(_slice_rows(qkv, dim + kv_dim, dim + 2 * kv_dim))
            bqkv = _dense_f32(gf, f"blk.{l}.attn_qkv.bias")
            bq.append(bqkv[0:dim])
            bk.append(bqkv[dim : dim + kv_dim])
            bv.append(bqkv[dim + kv_dim : dim + 2 * kv_dim])
        layers["wq"] = stack_qtensors(wq)
        layers["wk"] = stack_qtensors(wk)
        layers["wv"] = stack_qtensors(wv)
        layers["bq"] = np.stack(bq)
        layers["bk"] = np.stack(bk)
        layers["bv"] = np.stack(bv)
        layers["wo"] = stack_q("blk.{}.attn_output.weight")
        layers["bo"] = stack_f32("blk.{}.attn_output.bias")
        layers["ffn_down"] = stack_q("blk.{}.ffn_down.weight")
        layers["ffn_up"] = stack_q("blk.{}.ffn_up.weight")
        layers["ffn_down_b"] = stack_f32("blk.{}.ffn_down.bias")
        layers["ffn_up_b"] = stack_f32("blk.{}.ffn_up.bias")
        layers["attn_norm"] = stack_f32("blk.{}.attn_norm.weight")
        layers["attn_norm_b"] = stack_f32("blk.{}.attn_norm.bias")
    else:
        raise ValueError(f"unsupported architecture {arch}")

    # llama3.1-style per-frequency rope divisors from the file; YaRN
    # synthesizes equivalent divisors at load (position-independent, so it
    # IS a freq_factors tensor — ops.rope.yarn_freq_factors)
    rope_freqs = (
        _dense_f32(gf, "rope_freqs.weight") if "rope_freqs.weight" in gf else None
    )
    if rope_freqs is None and cfg.rope_scaling_type == "yarn":
        from ..ops.rope import yarn_freq_factors

        rope_freqs = yarn_freq_factors(
            cfg.effective_rope_dim, cfg.rope_base, cfg.rope_scaling_factor,
            cfg.rope_scaling_orig_ctx or cfg.seq_len,
        )

    weights = {
        "token_embed": _qtensor(gf, "token_embd.weight"),
        "rope_freqs": rope_freqs,
        "final_norm": _dense_f32(gf, "output_norm.weight"),
        "final_norm_b": _dense_f32(gf, "output_norm.bias") if arch == "phi2" else None,
        # gemma has no output.weight -> tied embeddings (model.rs:433-434)
        "output": (
            q_load(gf, "output.weight")
            if "output.weight" in gf
            else None
        ),
        # phi2's lm_head carries a bias (llama.cpp build_phi2 adds it)
        "output_b": (
            _dense_f32(gf, "output.bias") if "output.bias" in gf else None
        ),
        "layers": layers,
    }
    return weights
