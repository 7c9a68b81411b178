"""Tensor-parallel weight shardings (Megatron-style, GSPMD-propagated).

Layout per transformer layer over the "tp" mesh axis:
- wq/wk/wv, ffn_gate/ffn_up: ROW-sharded (output heads / hidden dim split);
  every QTensor plane shares the leading m axis, so one PartitionSpec covers
  qs/scale planes alike. Quant blocks run along k, so row sharding never
  splits a block.
- wo, ffn_down: COLUMN-sharded (k split) → XLA inserts the psum after the
  matmul. k/tp must stay a multiple of the quant superblock (256 for
  K-quants); `validate_tp` checks this.
- biases of row-sharded matmuls: sharded on the same axis. Norms: replicated.
- output head: row-sharded over vocab (logits all-gather before sampling).
- token embedding: replicated (gathered rows are tiny).
- KV cache: sharded over kv heads; batch over "dp".

The reference has no parallelism to mirror (SURVEY §2.12) — this follows the
standard TP recipe of the scaling literature instead.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gguf.constants import GGML_BLOCK_SIZES
from ..models.config import ModelConfig
from ..quant.planar import QTensor


def _q_sharding(mesh: Mesh, qt: QTensor, axis: int | None, name: str | None):
    """NamedSharding for each plane of a (possibly stacked) QTensor.

    axis: which *logical* axis of (L, m, k) carries "tp" (1=row, 2=col), or
    None for replicated. Plane arrays all share the leading axes; only the
    trailing (k-derived) axis differs, so the same spec applies to each.
    """
    ndim = len(qt.shape)
    spec = [None] * ndim
    if axis is not None:
        spec[axis] = name
    return NamedSharding(mesh, P(*spec))


def validate_tp(cfg: ModelConfig, tp: int):
    assert cfg.n_heads % tp == 0, f"n_heads {cfg.n_heads} % tp {tp} != 0"
    assert cfg.n_kv_heads % tp == 0, (
        f"n_kv_heads {cfg.n_kv_heads} % tp {tp} != 0 "
        "(KV-head replication not implemented yet)"
    )
    assert cfg.hidden_dim % tp == 0
    assert cfg.vocab_size % tp == 0, "vocab must divide tp for output sharding"


def _block_elems(qt: QTensor) -> int:
    return GGML_BLOCK_SIZES[qt.kind][0]


def shard_weights(weights: dict, mesh: Mesh, cfg: ModelConfig, _put=None) -> dict:
    """device_put the weight pytree with TP shardings over `mesh`.

    `_put(array, sharding)` overrides the placement primitive — the
    multi-host loader (parallel.distributed.shard_weights_local) passes a
    make_array_from_callback-based put so each process materializes only
    its own shards."""
    put = _put or jax.device_put
    tp = mesh.shape["tp"]
    validate_tp(cfg, tp)

    row = {"wq", "wk", "wv", "wqkv", "ffn_gate", "ffn_up", "wgu"}
    col = {"wo", "ffn_down"}
    row_bias = {"bq", "bk", "bv", "bqkv", "ffn_up_b"}

    def put_q(qt: QTensor, axis: str | None) -> QTensor:
        # axis: "row" (m), "col" (k), or None; resolved per QTensor rank so
        # stacked (L, m, k) and unstacked (m, k) tensors both work
        ndim = len(qt.shape)
        if axis == "col" and (qt.k // tp) % _block_elems(qt) != 0:
            # can't split quant blocks across shards: replicate instead
            axis = None
        ax = {None: None, "row": ndim - 2, "col": ndim - 1}[axis]
        sh = _q_sharding(mesh, qt, ax, "tp")
        return QTensor(
            qt.kind, qt.shape, {n: put(p, sh) for n, p in qt.planes.items()}
        )

    rep = NamedSharding(mesh, P())

    out = {}
    out["token_embed"] = put_q(weights["token_embed"], None)
    out["final_norm"] = put(weights["final_norm"], rep)
    out["final_norm_b"] = (
        put(weights["final_norm_b"], rep)
        if weights.get("final_norm_b") is not None
        else None
    )
    out["output"] = (
        put_q(weights["output"], "row") if weights.get("output") is not None else None
    )
    out["output_b"] = (  # phi2 lm_head bias: vocab-sharded like output rows
        put(weights["output_b"], NamedSharding(mesh, P("tp")))
        if weights.get("output_b") is not None
        else None
    )

    layers = {}
    for name, val in weights["layers"].items():
        if isinstance(val, QTensor):
            axis = "row" if name in row else ("col" if name in col else None)
            layers[name] = put_q(val, axis)
        else:  # stacked (L, d) arrays: biases / norms
            if name in row_bias:
                layers[name] = put(val, NamedSharding(mesh, P(None, "tp")))
            else:
                layers[name] = put(val, rep)
    out["layers"] = layers
    return out


def cache_sharding(mesh: Mesh) -> NamedSharding:
    """KV cache (L, B, KV, S, hd): batch over dp, kv heads over tp."""
    return NamedSharding(mesh, P(None, "dp", "tp", None, None))


def token_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("dp", None))
