"""Worker for test_distributed_two_process: one JAX process of a
2-process CPU 'cluster' (2 local virtual devices each -> global mesh
dp=2 x tp=2). Loads the 260k fixture, shards weights with the REAL
multi-process path (make_array_from_callback in shard_weights_local),
runs one jitted GSPMD prefill step whose tp collectives cross processes,
and checks the globally-gathered logits against a locally-computed
single-device reference. Prints DIST-OK on success.

Usage: python _dist_worker.py <coordinator> <process_id> <gguf>
"""

import os
import sys


def main():
    coord, pid, gguf = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=2"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon sitecustomize override
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    from crabml_tpu.parallel.distributed import global_mesh, init_distributed

    n = init_distributed(coord, num_processes=2, process_id=pid)
    assert n == 2, n
    assert len(jax.devices()) == 4

    import jax.numpy as jnp
    import numpy as np
    from functools import partial

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.weights import load_weights
    from crabml_tpu.parallel.distributed import shard_weights_local
    from crabml_tpu.parallel.sharding import cache_sharding, token_sharding

    gf = GGUFFile(gguf)
    cfg = config_from_gguf(gf.metadata)
    host_weights = load_weights(gf, cfg, "planar", np.float32)

    mesh = global_mesh(tp=2, dp=2)
    sharded = shard_weights_local(host_weights, mesh, cfg)
    cache = jax.device_put(
        KVCache.create(cfg, batch=2, seq_len=32), cache_sharding(mesh)
    )
    tokens_np = np.array(
        [[1, 5, 9, 13, 17, 21, 25, 29], [1, 4, 8, 12, 16, 20, 24, 28]],
        np.int32,
    )
    # dp-sharded global batch: each process owns one row's shards
    tokens = jax.make_array_from_callback(
        tokens_np.shape, token_sharding(mesh), lambda idx: tokens_np[idx]
    )
    pos = jnp.zeros(2, jnp.int32)

    step = jax.jit(partial(forward, cfg=cfg))
    logits, _ = step(sharded, cache, tokens, pos)

    from jax.experimental import multihost_utils

    global_logits = np.asarray(multihost_utils.process_allgather(
        logits, tiled=True))

    # independent single-device reference on this process's own devices
    ref_cache = KVCache.create(cfg, batch=2, seq_len=32)
    ref_logits, _ = jax.jit(partial(forward, cfg=cfg))(
        jax.tree.map(
            lambda a: jax.device_put(np.asarray(a), jax.local_devices()[0])
            if hasattr(a, "shape") else a,
            host_weights,
        ),
        ref_cache, jnp.asarray(tokens_np), pos,
    )
    ref = np.asarray(ref_logits)
    diff = float(np.max(np.abs(global_logits - ref)))
    assert global_logits.shape == ref.shape, (global_logits.shape, ref.shape)
    assert diff < 2e-4, diff
    print(f"DIST-OK pid={pid} maxdiff={diff:.2e}", flush=True)


if __name__ == "__main__":
    main()
