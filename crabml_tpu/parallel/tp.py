"""Explicit tensor-parallel forward: shard_map + shard-local kernels + psum.

The GSPMD path (sharding.shard_weights + plain jit) lets XLA propagate
shardings and insert collectives — it works, but (a) Pallas kernels under
GSPMD would be partitioned opaquely, and (b) the collective schedule is
implicit. This module is the explicit alternative: the whole forward runs
under shard_map, every device executes the SAME Pallas/XLA kernels on its
local weight shards, and the two Megatron-style collectives are written
out — psum after the attention-output and FFN-down matmuls (their k dim is
column-sharded) and a tiled all_gather of the vocab-sharded logits.

Pytree subtlety this module exists to handle: QTensor is a registered
dataclass whose `shape` is static metadata. shard_map slices the *leaves*
(the plane arrays) but re-builds the tree with the GLOBAL treedef, so
inside the body every QTensor still claims its global (m, k) while holding
local planes. `_localize` rewrites the metadata to the local shapes before
calling the standard forward — everything downstream (qmatmul dispatch,
kernel TK inference, XLA dequant) then works unchanged on its shard.

Sharding recipe (sharding.py's, made explicit):
  row-sharded (m/tp): wq wk wv ffn_gate ffn_up + their biases, output head
  col-sharded (k/tp): wo, ffn_down          -> psum after their matmuls
  replicated: norms, token_embed
  KV cache: kv-heads over tp, batch over dp
Load-time QKV/gate-up fusion must be OFF under TP (a fused matrix's row
shards would straddle the q|k|v boundaries).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.config import ModelConfig
from ..models.forward import KVCache, forward
from ..quant.planar import QTensor

ROW = {"wq", "wk", "wv", "ffn_gate", "ffn_up"}
COL = {"wo", "ffn_down"}
ROW_BIAS = {"bq", "bk", "bv", "ffn_up_b"}


def _is_kernel_layout(qt: QTensor) -> bool:
    return "dsub" in qt.planes or (
        "q0" in qt.planes and "w" not in qt.planes and "qs" not in qt.planes
    )


def _plane_spec(qt: QTensor, axis: str | None, plane: str, arr) -> P:
    """PartitionSpec for one plane of a QTensor under row/col/None sharding.

    Canonical planes: (L?, m, k-derived) — row shards axis -2, col axis -1.
    Kernel planes: q* are (L?, MT, rows, TM), scales (L?, MT, S, G, TM) —
    row shards the MT axis (-3 / -4), col shards the k-step axis (-2 / -3).
    """
    nd = np.asarray(arr).ndim if not hasattr(arr, "ndim") else arr.ndim
    spec = [None] * nd
    if axis is None:
        return P(*spec)
    if _is_kernel_layout(qt):
        if plane.startswith("q"):
            spec[nd - 3 if axis == "row" else nd - 2] = "tp"
        else:  # dsub / msub
            spec[nd - 4 if axis == "row" else nd - 3] = "tp"
    else:
        spec[nd - 2 if axis == "row" else nd - 1] = "tp"
    return P(*spec)


def _axis_of(name: str) -> str | None:
    if name.endswith("_chunks"):
        name = name[: -len("_chunks")]
    return "row" if name in ROW else ("col" if name in COL else None)


def weight_specs(weights: dict) -> dict:
    """Pytree of PartitionSpecs mirroring the weights dict (per plane)."""

    def q_specs(qt: QTensor, axis):
        return QTensor(
            qt.kind, qt.shape,
            {n: _plane_spec(qt, axis, n, p) for n, p in qt.planes.items()},
        )

    out = {
        "token_embed": q_specs(weights["token_embed"], None),
        "final_norm": P(None),
        "final_norm_b": None if weights.get("final_norm_b") is None else P(None),
        # llama3.1-style rope factors ride along replicated (dropping them
        # here would silently disable rope scaling under explicit TP)
        "rope_freqs": None if weights.get("rope_freqs") is None else P(None),
        "output": None if weights.get("output") is None else q_specs(weights["output"], "row"),
        # phi2 lm_head bias shards with output's vocab rows, so the local
        # forward adds its own shard before the logits all_gather
        "output_b": None if weights.get("output_b") is None else P("tp"),
        "layers": {},
    }
    for name, val in weights["layers"].items():
        if isinstance(val, tuple):  # pre-chunked (parallel.overlap)
            out["layers"][name] = tuple(q_specs(q, _axis_of(name)) for q in val)
        elif isinstance(val, QTensor):
            out["layers"][name] = q_specs(val, _axis_of(name))
        elif name in ROW_BIAS:
            out["layers"][name] = P(None, "tp")
        else:
            out["layers"][name] = P(*([None] * np.asarray(val).ndim))
    return out


def _localize_qt(qt: QTensor, axis: str | None, tp: int) -> QTensor:
    if axis is None:
        return qt
    shape = list(qt.shape)
    shape[-2 if axis == "row" else -1] //= tp
    return QTensor(qt.kind, tuple(shape), qt.planes)


def _localize(weights: dict, cfg: ModelConfig, tp: int) -> tuple[dict, ModelConfig]:
    """Rewrite QTensor static shapes (and head counts) to per-device values."""
    out = dict(weights)
    out["output"] = (
        _localize_qt(weights["output"], "row", tp)
        if weights.get("output") is not None
        else None
    )
    layers = {}
    for name, val in weights["layers"].items():
        if isinstance(val, tuple):
            layers[name] = tuple(_localize_qt(q, _axis_of(name), tp) for q in val)
        elif isinstance(val, QTensor):
            layers[name] = _localize_qt(val, _axis_of(name), tp)
        else:
            layers[name] = val
    out["layers"] = layers
    lcfg = cfg.with_overrides(
        n_heads=cfg.n_heads // tp,
        n_kv_heads=cfg.n_kv_heads // tp,
        hidden_dim=cfg.hidden_dim // tp,
        head_dim_override=cfg.head_dim,  # per-head size is TP-invariant
        # embedding_dim stays global: x is replicated between blocks
    )
    return out, lcfg


def validate_tp_strict(weights: dict, cfg: ModelConfig, tp: int):
    """shard_map needs every shard to be a self-consistent kernel/planar
    layout — no silent replicate-fallback like the GSPMD path allows."""
    from .sharding import validate_tp

    validate_tp(cfg, tp)
    for name in COL:
        qt = weights["layers"].get(name)
        if qt is None:
            continue
        if _is_kernel_layout(qt):
            n_steps = qt.planes["dsub"].shape[-3]
            assert n_steps % tp == 0, (
                f"{name}: k-steps {n_steps} not divisible by tp={tp}"
            )
        else:
            from ..gguf.constants import GGML_BLOCK_SIZES

            blk = GGML_BLOCK_SIZES[qt.kind][0]
            assert (qt.k // tp) % blk == 0, (
                f"{name}: k/tp={qt.k // tp} breaks {qt.kind.name} blocks"
            )


def localize_tree(w: dict, local_template: dict) -> dict:
    """Rebuild per-device QTensor metadata inside a shard_map body: the
    tree arrives with GLOBAL QTensor shapes over LOCAL planes; stamp the
    local shapes from `local_template` (built by `_localize`). Shared by
    make_tp_forward and the sp x tp runner."""
    return {
        "token_embed": w["token_embed"],
        "final_norm": w["final_norm"],
        "final_norm_b": w.get("final_norm_b"),
        "rope_freqs": w.get("rope_freqs"),
        "output_b": w.get("output_b"),
        "output": (
            QTensor(w["output"].kind, local_template["output"].shape,
                    w["output"].planes)
            if w.get("output") is not None else None
        ),
        "layers": {
            n: (
                tuple(
                    QTensor(q.kind, local_template["layers"][n][i].shape, q.planes)
                    for i, q in enumerate(v)
                )
                if isinstance(v, tuple)
                else QTensor(v.kind, local_template["layers"][n].shape, v.planes)
                if isinstance(v, QTensor)
                else v
            )
            for n, v in w["layers"].items()
        },
    }


def _forward_local(weights, cache, tokens, pos, *, cfg, lcfg, compute_dtype,
                   gather_logits):
    """Runs on each device inside shard_map."""
    x_logits, new_cache = forward(weights, cache, tokens, pos, lcfg, compute_dtype,
                                  tp_axis="tp")
    if gather_logits:
        x_logits = jax.lax.all_gather(x_logits, "tp", axis=2, tiled=True)
    return x_logits, new_cache


def make_tp_forward(weights: dict, mesh: Mesh, cfg: ModelConfig, compute_dtype,
                    overlap_collectives: bool = False):
    """Returns (fn, sharded_weights): fn(weights, cache, tokens, pos) ->
    (logits, cache), jit-compiled shard_map over `mesh` with donated cache.

    `weights` must be UNFUSED (load with fuse=False / skip fuse_weights).
    """
    from jax.experimental.shard_map import shard_map

    tp = mesh.shape["tp"]
    validate_tp_strict(weights, cfg, tp)
    assert "wqkv" not in weights["layers"], "disable QKV fusion under TP"

    if overlap_collectives:
        # pre-chunk the column-sharded weights ONCE so the overlapped psum
        # never slices planes inside the scan (see parallel.overlap)
        from .overlap import chunk_qtensor

        weights = dict(weights)
        weights["layers"] = dict(weights["layers"])
        for name in ("wo", "ffn_down"):
            chunks = chunk_qtensor(weights["layers"][name], tp)
            if chunks is not None:
                weights["layers"][name + "_chunks"] = chunks
                del weights["layers"][name]

    specs = weight_specs(weights)
    local_template, lcfg = _localize(weights, cfg, tp)
    gather_logits = weights.get("output") is not None

    # place global arrays according to the specs
    def put(w, s):
        if w is None:
            return None
        if isinstance(w, QTensor):
            return QTensor(
                w.kind, w.shape,
                {n: jax.device_put(p, NamedSharding(mesh, s.planes[n]))
                 for n, p in w.planes.items()},
            )
        return jax.device_put(w, NamedSharding(mesh, s))

    sharded = {
        "token_embed": put(weights["token_embed"], specs["token_embed"]),
        "final_norm": put(weights["final_norm"], specs["final_norm"]),
        "final_norm_b": put(weights.get("final_norm_b"), specs["final_norm_b"]),
        "rope_freqs": put(weights.get("rope_freqs"), specs["rope_freqs"]),
        "output": put(weights.get("output"), specs["output"]),
        "output_b": put(weights.get("output_b"), specs["output_b"]),
        "layers": {
            n: (
                tuple(put(q, s) for q, s in zip(v, specs["layers"][n]))
                if isinstance(v, tuple)
                else put(v, specs["layers"][n])
            )
            for n, v in weights["layers"].items()
        },
    }

    # shard_map spec pytrees: same structure as the args, specs at leaves
    def spec_tree(s):
        return s  # QTensor-of-specs flattens alongside QTensor-of-arrays

    cache_spec = P(None, "dp", "tp", None, None)
    tok_spec = P("dp", None)
    pos_spec = P("dp")

    # rebuild local QTensor metadata inside the body
    def body(w, cache, tokens, pos):
        wl = localize_tree(w, local_template)
        return _forward_local(
            wl, KVCache(cache.k, cache.v, cache.k_scale, cache.v_scale), tokens, pos,
            cfg=cfg, lcfg=lcfg, compute_dtype=compute_dtype,
            gather_logits=gather_logits,
        )

    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(
            specs,
            KVCache(cache_spec, cache_spec,
                    P(None, "dp", "tp", None, None), P(None, "dp", "tp", None, None)),
            tok_spec,
            pos_spec,
        ),
        out_specs=(
            P("dp", None, None),
            KVCache(cache_spec, cache_spec,
                    P(None, "dp", "tp", None, None), P(None, "dp", "tp", None, None)),
        ),
        check_rep=False,
    )
    jfn = jax.jit(fn, donate_argnums=(1,))
    return jfn, sharded
