"""Expert parallelism: MoE expert planes sharded over an "ep" mesh axis.

Dense MoE replicates every expert's weights on every device; at mixtral
scale (8x the FFN weights) that caps model size at one chip's HBM. Here
each device owns E/ep experts — expert-stacked planes shard on their
m axis (contiguous expert blocks, so the slice is layout-exact for both
the canonical planar and kernel layouts when per-expert rows are
tile-aligned) — and the FFN output psums over "ep":

- routing (the small (E, D) router) is replicated: every device computes
  the same top-k selection;
- each device computes ONLY its local experts, weighted by the routing
  weights of those the top-k selected (zero for unselected — their
  compute is masked off by the weight, and with k << E most devices
  contribute nothing for a given token but still stream only their OWN
  experts' planes);
- one psum("ep") merges the expert contributions.

`expert_parallel_ffn` is the shard_map body; `ep_weight_specs` /
`localize_experts` produce the sharding specs and per-device QTensor
metadata (same pytree trick as parallel.tp). Composes with "dp" for
batch and (orthogonally) "tp" applied to the non-expert weights.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..models.forward import _activation
from ..ops.matmul import qmatmul
from ..quant.planar import QTensor

EXPERT_TENSORS = ("ffn_gate_exps", "ffn_up_exps", "ffn_down_exps")


def ep_weight_specs(qt: QTensor, axis: str = "ep") -> QTensor:
    """PartitionSpecs sharding an expert-stacked QTensor's m axis (plane
    axis 1, after the layer axis) over `axis`."""
    specs = {}
    for n, p in qt.planes.items():
        nd = p.ndim
        s = [None] * nd
        s[1] = axis  # m / m-tile axis of (L, m-ish, ...) planes
        specs[n] = P(*s)
    return QTensor(qt.kind, qt.shape, specs)


def localize_experts(qt: QTensor, ep: int) -> QTensor:
    """Per-device QTensor metadata: E*M rows -> (E/ep)*M rows."""
    L, m, k = qt.shape
    return QTensor(qt.kind, (L, m // ep, k), qt.planes)


def expert_parallel_ffn(lw, l, ffn_in, cfg, compute_dtype, axis: str = "ep"):
    """MoE FFN over ep-sharded experts (call inside shard_map).

    `lw` holds LOCAL expert planes (metadata localized via
    `localize_experts`) and a replicated router. Semantically identical
    to models.forward.moe_ffn's dense path: every routed expert
    contributes exactly once, across whichever device owns it.
    """
    E, K = cfg.n_experts, cfg.n_experts_used
    ep = jax.lax.psum(1, axis)
    p = jax.lax.axis_index(axis)
    E_l = E // ep
    HD, D = cfg.hidden_dim, cfg.embedding_dim

    router_w = jnp.asarray(lw["ffn_gate_inp"])[l].astype(compute_dtype)  # (E, D)
    r_logits = (ffn_in @ router_w.T).astype(jnp.float32)
    topv, topi = jax.lax.top_k(r_logits, K)
    topw = jax.nn.softmax(topv, axis=-1)
    route = (jax.nn.one_hot(topi, E, dtype=jnp.float32) * topw[..., None]).sum(-2)
    # this device's experts' routing weights: (..., E_l)
    route_l = jax.lax.dynamic_slice_in_dim(route, p * E_l, E_l, axis=-1)

    gate = qmatmul(ffn_in, lw["ffn_gate_exps"], compute_dtype, layer=l)
    up = qmatmul(ffn_in, lw["ffn_up_exps"], compute_dtype, layer=l)
    gshape = gate.shape[:-1] + (E_l, HD)
    h = _activation(gate.reshape(gshape), cfg.act) * up.reshape(gshape)

    out = None
    from ..models.forward import _slice_expert

    for e in range(E_l):
        de = _slice_expert(lw["ffn_down_exps"], e, D)
        ye = qmatmul(h[..., e, :], de, compute_dtype, layer=l)
        ye = ye * route_l[..., e : e + 1].astype(ye.dtype)
        out = ye if out is None else out + ye
    return jax.lax.psum(out, axis)
