"""Collective/compute overlap: ring-pipelined psum for column-sharded matmuls.

BASELINE.json calls for "collective-overlapped quantized matmuls" — hiding
the TP all-reduce after wo/ffn_down behind the matmul itself. The plain
shard_map path (parallel.tp) computes the full local partial and then
psums it: compute, THEN an idle all-reduce.

This module fuses them: the output is split into `tp` chunks and reduced
around the ring — at step i every device computes the local partial for
ONE chunk (a shard-local quantized kernel call) and adds the accumulator
arriving from its neighbor, then forwards it. The ppermute of chunk c
rides the ICI links while the matmul of chunk c+1 occupies the MXU —
XLA schedules the ppermute DMA asynchronously, so each step's collective
hides behind the next step's compute. After tp steps each device owns one
fully-reduced chunk (a reduce-scatter fused with the matmul); a tiled
all_gather rebuilds the replicated activation.

Cost model vs compute-then-psum: same FLOPs and same bytes moved, but the
(tp-1) sequential ICI hops overlap the matmul chunks instead of following
them — on a bandwidth-balanced step this removes nearly the whole
all-reduce latency. (Single-chip environments can't measure it; the
8-device CPU-mesh test pins correctness, and the schedule is visible in
the compiled HLO as ppermutes interleaved between the kernel calls.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.matmul import qmatmul
from ..quant.planar import QTensor


def overlapped_psum_matmul(x, qt: QTensor, compute_dtype, axis_name: str,
                           tp: int, layer=None):
    """x: (..., k_local) @ qt_local(m, k_local)^T, summed over `axis_name`,
    with the reduction pipelined against per-chunk matmuls.

    Equivalent to jax.lax.psum(qmatmul(x, qt, ...), axis_name) with the
    all-reduce latency hidden. `qt` is this device's column shard; its m
    (global) must divide tp * the kernel's m tile. Call inside shard_map.
    """
    m = qt.shape[-2]
    if tp == 1 or m % (tp * 256):  # chunk must stay kernel-tile aligned
        out = qmatmul(x, qt, compute_dtype, layer=layer)
        return jax.lax.psum(out, axis_name) if tp > 1 else out

    p = jax.lax.axis_index(axis_name)
    chunk = m // tp
    perm = [(j, (j + 1) % tp) for j in range(tp)]

    def row_slice(q: QTensor, c0: int) -> QTensor:
        """Static m-chunk of a (possibly layer-stacked) QTensor.

        Works for both layouts: canonical planes are (L?, m, ...) and
        kernel planes are (L?, m/TM, ...) — both slice on the m-derived
        axis (0 after the optional layer axis)."""
        stacked = len(q.shape) == 3
        ax = 1 if stacked else 0
        from ..ops.pallas.gemm_quant import TM, is_repacked

        step = chunk // TM if is_repacked(q) else chunk
        lo = (c0 // TM if is_repacked(q) else c0)
        planes = {
            n: jax.lax.slice_in_dim(pl, lo, lo + step, axis=ax)
            for n, pl in q.planes.items()
        }
        shape = list(q.shape)
        shape[-2] = chunk
        return QTensor(q.kind, tuple(shape), planes)

    # step i: compute the chunk destined for device (p - i) mod tp, add the
    # accumulator that just arrived, pass it on. Unrolled python loop: tp is
    # small and static, and unrolling lets XLA interleave ppermute with the
    # next chunk's kernel.
    acc = None
    for i in range(tp):
        # which chunk index does this device compute at step i?
        # accumulator travels p -> p+1; after tp steps chunk c is complete
        # at device (c + tp - 1) ... equivalently device p computes chunk
        # (p - i) mod tp at step i.
        c = (p - i) % tp
        # dynamic chunk start => use lax.switch over static slices so each
        # branch keeps static shapes for the kernels
        branches = [
            (lambda cc: lambda: qmatmul(
                x, row_slice(qt, cc * chunk), compute_dtype, layer=layer
            ))(cc)
            for cc in range(tp)
        ]
        part = jax.lax.switch(c, branches)
        acc = part if acc is None else acc + part
        if i != tp - 1:
            acc = jax.lax.ppermute(acc, axis_name, perm)
    # device p now holds the fully-reduced chunk (p + 1) % tp
    gathered = jax.lax.all_gather(acc, axis_name, axis=x.ndim - 1, tiled=True)
    # gathered layout: concat over devices p of chunk (p+1)%tp -> roll back
    gathered = jnp.roll(gathered, shift=chunk, axis=-1)
    return gathered
