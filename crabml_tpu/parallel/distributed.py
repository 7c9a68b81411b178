"""Multi-host distribution over DCN.

The reference has no distributed execution at all (SURVEY §2.12 — no
MPI/NCCL/gloo anywhere in the tree); this is the TPU-native scaling layer
BASELINE.json requires. The model:

- ONE JAX process per host, each attached to its local TPU chips
  (`jax.distributed.initialize` wires the coordination service over DCN).
- A GLOBAL mesh across all hosts: "tp" maps onto ICI within a slice (fast,
  weights + KV sharded there); "dp" maps across hosts/slices over DCN
  (requests/batches — only activations-sized traffic crosses DCN).
- Weight loading is host-local: every process reads its own GGUF copy and
  device_puts only its addressable shards (jax.make_array_from_callback),
  so a 70B load never ships weights over DCN.
- Serving: one ServingEngine per model replica (= one TP group); an HTTP
  front-end per replica behind any LB (serving.http). Continuous batching
  stays replica-local, so no cross-host coordination in the decode loop.

Single-chip and CPU-mesh runs never need this module; everything here
degrades to no-ops when world_size == 1.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def init_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> int:
    """Initialize multi-host JAX (idempotent; no-op for single process).

    With no arguments, defers to cluster auto-detection (TPU metadata /
    JAX_COORDINATOR_ADDRESS, JAX_NUM_PROCESSES, JAX_PROCESS_ID env vars).
    Returns the number of processes.
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    n = num_processes if num_processes is not None else int(
        os.environ.get("JAX_NUM_PROCESSES", "1")
    )
    if explicit and n > 1:
        jax.distributed.initialize(
            coordinator_address=explicit,
            num_processes=n,
            process_id=process_id
            if process_id is not None
            else int(os.environ.get("JAX_PROCESS_ID", "0")),
        )
    return jax.process_count()


def global_mesh(tp: int | None = None, dp: int | None = None) -> Mesh:
    """Mesh over ALL processes' devices: ("dp", "tp"), tp innermost so it
    rides ICI within each host/slice and dp crosses DCN.

    Defaults: tp = devices-per-process (whole local slice), dp = process
    count — the standard serving layout (one model replica per host group).
    """
    devs = np.asarray(jax.devices())
    n = devs.size
    if tp is None:
        tp = max(1, jax.local_device_count())
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != device count ({n})"
    return Mesh(devs.reshape(dp, tp), ("dp", "tp"))


def shard_weights_local(weights, mesh: Mesh, cfg):
    """Weight sharding for multi-host meshes, from a HOST-MATERIALIZED
    pytree: make_array_from_callback keeps device HBM per process bounded
    to its own shards, but every process still holds the full host copy —
    fine for 7B-class models where host RAM >> model size.

    For models that do NOT fit per-host RAM (70B), load from the GGUF
    instead with `shard_weights_from_gguf` (parallel.lazy_load): it slices
    each shard's bytes straight out of the mmap, so per-process host
    memory is bounded by (weights / tp).
    """
    from .sharding import shard_weights

    if jax.process_count() == 1:
        return shard_weights(weights, mesh, cfg)

    def put(arr, sharding):
        a = np.asarray(arr)
        return jax.make_array_from_callback(a.shape, sharding, lambda idx: a[idx])

    sharded = shard_weights(weights, mesh, cfg, _put=put)
    return sharded


def shard_weights_from_gguf(gf, cfg, mesh: Mesh):
    """GGUF -> sharded pytree with per-process host memory bounded by the
    process's own shards (lazy mmap slicing; parallel.lazy_load)."""
    from .lazy_load import load_weights_sharded

    return load_weights_sharded(gf, cfg, mesh)
