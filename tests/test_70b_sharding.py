"""Llama-2-70B tensor-parallel sharding, validated abstractly (AOT).

BASELINE/SURVEY §7 item 7 names the 70B sharded config as the scale
target. 70B Q4_K weights (~39 GB) can't be materialized in this
environment, but the sharding design can still be PROVEN to partition:
build the full weight pytree as jax.ShapeDtypeStructs carrying the real
TP NamedShardings (plane shapes from quant.planar.plane_spec — the same
source of truth the loader uses), then lower AND compile the forward
step through GSPMD on the virtual 8-device mesh. Compilation runs the
full SPMD partitioner: any plane whose tp split broke a quant block, any
dim that doesn't divide the mesh, or any collective XLA can't lay out
would fail here.

No reference counterpart (SURVEY §2.12: the reference has no multi-device
anything); recipe follows the Megatron TP layout in parallel/sharding.py.
"""

import numpy as np
import jax
import jax.numpy as jnp

from crabml_tpu.gguf.constants import GGMLType
from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig
from crabml_tpu.models.forward import KVCache, forward
from crabml_tpu.parallel import (cache_sharding, make_mesh, shard_weights,
                                 token_sharding)
from crabml_tpu.quant.planar import QTensor, plane_spec


def llama70b_config() -> ModelConfig:
    """Llama-2-70B dims (GQA kv8, 28672 FFN)."""
    return ModelConfig(
        architecture="llama", model_name="llama-2-70b",
        embedding_dim=8192, hidden_dim=28672, n_layers=80, n_heads=64,
        n_kv_heads=8, vocab_size=32000, seq_len=4096, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"],
    )


def abstract_q(typ: GGMLType, shape, L: int | None = None) -> QTensor:
    m = int(np.prod(shape[:-1]))
    k = int(shape[-1])
    planes = {
        name: jax.ShapeDtypeStruct((L, *ps) if L else ps, dt)
        for name, (ps, dt) in plane_spec(typ, m, k).items()
    }
    qshape = (L, m, k) if L else (m, k)
    return QTensor(typ, qshape, planes)


def abstract_weights(cfg: ModelConfig, typ: GGMLType) -> dict:
    """ShapeDtypeStruct twin of models.synthetic.make_weights."""
    D, HD, V, L = (cfg.embedding_dim, cfg.hidden_dim, cfg.vocab_size,
                   cfg.n_layers)
    kv = cfg.kv_dim
    ones = lambda *s: jax.ShapeDtypeStruct(s, np.float32)  # noqa: E731
    return {
        "token_embed": abstract_q(typ, (V, D)),
        "final_norm": ones(D),
        "final_norm_b": None,
        "output": abstract_q(typ, (V, D)),
        "output_b": None,
        "layers": {
            "wq": abstract_q(typ, (D, D), L),
            "wk": abstract_q(typ, (kv, D), L),
            "wv": abstract_q(typ, (kv, D), L),
            "wo": abstract_q(typ, (D, D), L),
            "ffn_gate": abstract_q(typ, (HD, D), L),
            "ffn_up": abstract_q(typ, (HD, D), L),
            "ffn_down": abstract_q(typ, (D, HD), L),
            "attn_norm": ones(L, D),
            "ffn_norm": ones(L, D),
        },
    }


def _plane_bytes(tree) -> int:
    return sum(
        int(np.prod(l.shape)) * np.dtype(l.dtype).itemsize
        for l in jax.tree.leaves(tree)
        if hasattr(l, "shape")
    )


def test_70b_q4k_tp8_compiles_and_fits():
    cfg = llama70b_config()
    tp = 8
    mesh = make_mesh(tp=tp, dp=1, devices=jax.devices()[:tp])

    weights = abstract_weights(cfg, GGMLType.Q4_K)
    sds_put = lambda a, sh: jax.ShapeDtypeStruct(  # noqa: E731
        a.shape, a.dtype, sharding=sh)
    sharded = shard_weights(weights, mesh, cfg, _put=sds_put)

    # the Megatron layout must actually split the big matmuls 8 ways:
    # every per-device weight shard must fit a 16 GB v5e chip with room
    # for the KV cache and activations
    total = _plane_bytes(sharded)
    assert total > 35e9  # really 70B-scale (Q4_K ~0.56 B/param)
    per_dev = sum(
        int(np.prod(l.sharding.shard_shape(l.shape)))
        * np.dtype(l.dtype).itemsize
        for l in jax.tree.leaves(sharded)
        if hasattr(l, "sharding")
    )
    assert per_dev < 6.5e9, f"per-device shard {per_dev/1e9:.1f} GB"

    cache = jax.eval_shape(
        lambda: KVCache.create(cfg, batch=1, seq_len=512, dtype=jnp.bfloat16)
    )
    cache = jax.tree.map(
        lambda l: jax.ShapeDtypeStruct(
            l.shape, l.dtype,
            sharding=cache_sharding(mesh) if l.ndim == 5 else None),
        cache,
    )
    tokens = jax.ShapeDtypeStruct((1, 8), np.int32, sharding=token_sharding(mesh))
    pos = jax.ShapeDtypeStruct((1,), np.int32)

    step = jax.jit(
        lambda w, c, t, p: forward(w, c, t, p, cfg, jnp.bfloat16),
        donate_argnames=("c",),
    )
    compiled = step.lower(sharded, cache, tokens, pos).compile()

    # the SPMD partitioner ran: logits come back vocab-sharded over tp
    # (P("tp") on the last axis) or replicated after the all-gather —
    # either way the executable exists and input shardings survived
    in_sh = compiled.input_shardings[0]
    flat, _ = jax.tree.flatten(in_sh)
    assert len(flat) > 0
    mem = compiled.memory_analysis()
    if mem is not None:  # per-device argument bytes = one shard, not 39 GB
        assert mem.argument_size_in_bytes < 8e9
