"""Collective/compute overlap: chunked psum for column-sharded matmuls.

BASELINE.json calls for "collective-overlapped quantized matmuls" — hiding
the TP all-reduce after wo/ffn_down behind the matmul itself. The plain
shard_map path (parallel.tp) computes the full local partial and then
psums it: compute, THEN an idle all-reduce.

Overlapped form: the weight is pre-split into `tp` m-chunks AT SETUP
(`chunk_qtensor` — no slicing inside the scan body; a v1 of this module
sliced planes per ring step, re-introducing exactly the per-step plane
copies the kernel layer's scalar-prefetch design exists to avoid). The
forward then runs chunk c's shard-local quantized matmul and starts its
psum while chunk c+1's matmul occupies the MXU — XLA's async collectives
overlap the all-reduce of each chunk with the next chunk's compute. Same
FLOPs, same bytes on the wire; the (tp-1)/tp of all-reduce latency that
used to trail the matmul now hides under it.

Single-chip environments can't measure the overlap; the 8-device CPU-mesh
test pins the result logits-exact against the unchunked psum path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.matmul import qmatmul
from ..quant.planar import QTensor


def chunk_qtensor(qt: QTensor, n: int) -> tuple[QTensor, ...] | None:
    """Split a (possibly layer-stacked) QTensor into n equal m-chunks at
    load/setup time, or None if m doesn't split tile-aligned.

    Works for both plane layouts: canonical planes are (L?, m, ...) and
    kernel planes are (L?, m/TM, ...) — both chunk on the axis right after
    the optional layer axis."""
    from ..ops.pallas.gemm_quant import TM, is_repacked

    m = qt.shape[-2]
    if n <= 1 or m % n:
        return None
    chunk = m // n
    if is_repacked(qt) and chunk % TM:
        return None
    stacked = len(qt.shape) == 3
    ax = 1 if stacked else 0
    rows = chunk // TM if is_repacked(qt) else chunk
    shape = list(qt.shape)
    shape[-2] = chunk

    out = []
    for c in range(n):
        planes = {
            name: p[(slice(None),) * ax + (slice(c * rows, (c + 1) * rows),)]
            for name, p in qt.planes.items()
        }
        out.append(QTensor(qt.kind, tuple(shape), planes))
    return tuple(out)


def overlapped_psum_matmul(x, chunks, compute_dtype, axis_name: str, layer=None):
    """x @ concat(chunks)^T with each chunk's psum overlapping the next
    chunk's matmul. `chunks` come from chunk_qtensor (shard-local column
    shards). Call inside shard_map; equivalent to
    psum(qmatmul(x, whole, ...), axis_name)."""
    outs = []
    for qt in chunks:
        part = qmatmul(x, qt, compute_dtype, layer=layer)
        # issue the reduction immediately: XLA schedules it asynchronously,
        # so it rides ICI while the next chunk's kernel runs on the MXU
        outs.append(jax.lax.psum(part, axis_name))
    return jnp.concatenate(outs, axis=-1)
