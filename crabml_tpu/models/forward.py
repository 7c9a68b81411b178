"""The transformer forward pass, TPU-first.

One pure function covers all four reference architectures
(forward_llama/qwen2/phi2/gemma, crabml-llama2/src/llama2.rs:213-524) via
ModelConfig feature flags. Key departures from the reference, by design:

- Fixed shapes everywhere: the KV cache is a pre-allocated
  (L, B, S, n_kv_heads, head_dim) array updated with dynamic_update_slice,
  instead of the reference's grow-by-concatenate strider trick
  (llama2.rs:65-86). XLA requires static shapes; masking handles validity.
- Batched prefill: the whole prompt goes through one jit'd call (the
  reference loops tokens one at a time, llama2.rs:126-129).
- lax.scan over stacked per-layer weights: one compiled layer body instead of
  L inlined copies — fast compiles at 7B/70B depth.
- GQA via reshape to (KV, G) head groups, no materialized head broadcast
  (reference: batch_matmul stride tricks, batch_matmul.rs:89-103).
- Everything lives in one jit; no per-op dispatch boundaries.

Attention softmax subtracts the running max and exponentiates in f32 (the
reference uses an f16 exp LUT, softmax.rs:44-52 — we use exact exp).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.matmul import embedding_lookup, qmatmul
from ..ops.norm import layer_norm, rms_norm
from ..ops.rope import apply_rope
from ..quant.planar import QTensor
from .config import ModelConfig

# plain float: a jnp scalar here would initialize the JAX backend at import
# time, locking the platform before callers (tests, dryrun) can choose it
NEG_INF = -1e30


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["k", "v", "k_scale", "v_scale"],
    meta_fields=[],
)
@dataclass
class KVCache:
    """k, v: (L, B, n_kv_heads, S, head_dim) — head-major so attention
    kernels see (S, head_dim) as the trailing (tile-aligned) dims.

    dtype=jnp.int8 stores a QUANTIZED cache: k/v hold symmetric int8 values
    with per-(token, head) f32 scales in k_scale/v_scale (L, B, KV, S, 1) —
    8.25 bits/entry, halving cache HBM vs bf16 (the low-bit-KV recipe of
    the BitDecoding/InnerQ line of work, simplified to tuning-free
    per-vector max-abs scaling). Float caches keep k_scale/v_scale = None.
    """

    k: jnp.ndarray
    v: jnp.ndarray
    k_scale: jnp.ndarray | None = None
    v_scale: jnp.ndarray | None = None

    @staticmethod
    def create(cfg: ModelConfig, batch: int, seq_len: int | None = None,
               dtype=jnp.float32, lane_pad: bool = False):
        """`lane_pad=True` rounds head_dim up to the 128-lane tile so
        odd-head models (phi2 hd=80, tiny fixtures hd=64) store a cache
        the decode-attention kernel can DMA (it cannot slice partial lane
        tiles — see ops/pallas/decode_attention). forward() detects the
        padded width from the cache itself: k/v pad with zeros on write
        (zero lanes don't change q·k scores or the int8 per-vector
        scales), q pads at attention, outputs slice back. Costs
        ceil(hd/128)*128/hd of cache HBM; off by default."""
        s = seq_len or cfg.seq_len
        hd = cfg.head_dim
        if lane_pad and hd % 128:
            hd = -(-hd // 128) * 128
        shape = (cfg.n_layers, batch, cfg.n_kv_heads, s, hd)
        if dtype == jnp.int8:
            sshape = shape[:-1] + (1,)
            return KVCache(
                jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8),
                jnp.ones(sshape, jnp.float32), jnp.ones(sshape, jnp.float32),
            )
        return KVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None

    @property
    def seq_len(self) -> int:
        return self.k.shape[3]


def _scatter_new_kv(cache: KVCache, news, pos, T: int) -> KVCache:
    """Write ALL layers' step tokens into the cache in one batched scatter
    per array. Update bytes are (L, B, KV, T, d) — independent of S — vs
    the old per-layer scan xs->ys route which streamed the ENTIRE cache
    through HBM every decode step (the B=32 serving glue gap, ~20 ms/step
    at S=512 bf16). Indices (b, pos[b]+t) are unique by construction;
    like the dynamic_update_slice it replaces, callers guarantee
    pos + T <= S (scatter drops out-of-bounds rows where DUS clamps)."""
    B = cache.k.shape[1]
    zero = jnp.int32(0)

    def wr(arr, upd):  # arr (L, B, KV, S, d); upd (L, B, KV, T, d)
        # unrolled per-slot dynamic_update_slice instead of one scatter:
        # XLA scatter on this operand picks a non-default layout and
        # wraps itself in FULL-CACHE layout-conversion copies (measured:
        # 6 extra (L,B,KV,S,hd) copies per step); chained DUS writes are
        # layout-neutral and in-place on the donated decode-loop carry
        for b in range(B):
            arr = jax.lax.dynamic_update_slice(
                arr, jax.lax.dynamic_slice_in_dim(upd, b, 1, axis=1),
                (zero, jnp.int32(b), zero, pos[b], zero))
        return arr

    if cache.quantized:
        kq, vq, ks, vs = news
        return KVCache(wr(cache.k, kq), wr(cache.v, vq),
                       wr(cache.k_scale, ks), wr(cache.v_scale, vs))
    kn, vn = news
    return KVCache(wr(cache.k, kn), wr(cache.v, vn))


def _activation(x, kind: str):
    if kind == "silu":
        return x * jax.nn.sigmoid(x)
    if kind == "gelu":
        # tanh approximation: what the gelu archs' checkpoints train with
        # (HF gelu_new / gelu_pytorch_tanh for phi2 + gemma) AND what
        # ggml's GELU table computes — exact-erf gelu would deviate
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(kind)


def apply_final_norm(weights, x, cfg):
    """Final (pre-lm-head) norm: true LayerNorm for phi2, RMS otherwise.
    Shared by the dense, paged, and sequence-parallel logits paths."""
    f = layer_norm if cfg.full_layer_norm else rms_norm
    return f(x, weights["final_norm"], cfg.rms_norm_eps,
             weights.get("final_norm_b"))


def layer_norm_in(lw, l, x, cfg):
    """Pre-attention norm of layer l (shared by the dense and paged steps)."""
    f = layer_norm if cfg.full_layer_norm else rms_norm
    return f(
        x, jnp.asarray(lw["attn_norm"])[l], cfg.rms_norm_eps,
        jnp.asarray(lw["attn_norm_b"])[l] if "attn_norm_b" in lw else None,
    )


def project_qkv(lw, l, h, cfg, compute_dtype):
    """QKV projection of layer l: handles the fused wqkv layout and the
    qwen2/phi2 biases. Returns flat (…, H*hd), (…, kv_dim), (…, kv_dim)."""
    D = cfg.n_heads * cfg.head_dim  # == embedding_dim unless hd decoupled
    kvd = cfg.n_kv_heads * cfg.head_dim

    def arr(name):
        return jnp.asarray(lw[name])[l].astype(compute_dtype)

    if "wqkv" in lw:  # load-time fusion: one kernel call for q|k|v
        qkv = qmatmul(h, lw["wqkv"], compute_dtype, layer=l)
        if "bqkv" in lw:
            qkv = qkv + arr("bqkv")
        return qkv[..., :D], qkv[..., D : D + kvd], qkv[..., D + kvd :]
    q = qmatmul(h, lw["wq"], compute_dtype, layer=l)
    k = qmatmul(h, lw["wk"], compute_dtype, layer=l)
    v = qmatmul(h, lw["wv"], compute_dtype, layer=l)
    if "bq" in lw:
        q = q + arr("bq")
        k = k + arr("bk")
        v = v + arr("bv")
    return q, k, v


def _slice_expert(qt: QTensor, e: int, rows_per_expert: int) -> QTensor:
    """Static row-slice of expert `e` out of stacked expert planes.

    Works for both canonical planar (m on plane axis 1 after the L axis)
    and kernel layouts (m tiled: MT axis 1) — expert boundaries must stay
    tile-aligned, so the kernel layout requires rows_per_expert % TM == 0
    (E*D % TM alone is not enough: repack sees only the folded m)."""
    L, m, k = qt.shape
    from ..ops.pallas.gemm_quant import TM, is_repacked

    if is_repacked(qt):
        if rows_per_expert % TM:
            raise ValueError(
                f"expert row count {rows_per_expert} not a multiple of the "
                f"kernel m-tile {TM}; keep this tensor on the planar path"
            )
        mt_per = rows_per_expert // TM
        # w8/dw prefill planes use a wider m-tile (2048) — slicing them by
        # TM units would corrupt them; drop them so expert slices ride the
        # regular quant kernels (same exclusion as _expert_view)
        planes = {
            n: p[:, e * mt_per : (e + 1) * mt_per]
            for n, p in qt.planes.items()
            if n not in ("w8", "dw")
        }
    else:
        planes = {
            n: p[:, e * rows_per_expert : (e + 1) * rows_per_expert]
            for n, p in qt.planes.items()
            if n not in ("w8", "dw")
        }
    return QTensor(qt.kind, (L, rows_per_expert, k), planes)


def _expert_view(qt: QTensor, n_experts: int) -> QTensor:
    """View stacked expert planes (L, E*M, k) as (L*E, M, k) — a FREE
    reshape (row-major contiguity holds for both the canonical planar
    layout, m on plane axis 1, and the kernel layout, m-tiles on axis 1).
    The flattened index l*E + e then selects one expert of one layer
    through the SAME scalar-prefetch path the layer index uses — the
    layer-stacking trick generalized to experts (VERDICT r2 #3).

    W8 prefill planes ride along when their (wider) m-tile count divides
    per expert — then the grouped MoE prefill runs the W8 kernel (2x the
    bf16-dequant rate) on top of the top-k FLOP cut; otherwise they are
    dropped and the view stays eligible for the base quant kernels."""
    L, m, k = qt.shape
    Me = m // n_experts
    planes = {}
    for n, p in qt.planes.items():
        if n in ("w8", "dw") and p.shape[1] % n_experts:
            continue  # W8 lane tiles don't align to expert boundaries
        planes[n] = p.reshape(
            (L * n_experts, p.shape[1] // n_experts) + tuple(p.shape[2:])
        )
    return QTensor(qt.kind, (L * n_experts, Me, k), planes)


def moe_ffn(lw, l, ffn_in, cfg, compute_dtype):
    """Mixtral-style MoE FFN: softmax(top-k) routing over n_experts
    SiLU-gated experts (the reference has no MoE at all; semantics follow
    llama.cpp's build_moe_ffn).

    Three regimes, by flattened row count B:
    - B == 1 (single-row decode): GATHER the top-k experts — each
      selected expert's planes are addressed via the flattened
      layer*E + expert scalar-prefetch index (`_expert_view`), so weight
      traffic is k/E of the dense path (the bandwidth term that dominates
      B=1 decode).
    - 1 < B, B*K < E (batched decode on a wide-expert model): static
      unroll over ALL experts, each expert's three matmuls under a
      `lax.cond` on "any row routed here" — an unselected expert's
      weights are never read, so HBM traffic ∝ distinct experts used
      (≤ min(B*K, E); the guard B*K < E makes it a guaranteed win).
    - otherwise (prefill / big batch): all experts compute in fused
      calls and mix by routing weight (rows route to different experts,
      so a shared gather index does not exist and every expert is
      almost surely used anyway).
    """
    E, K = cfg.n_experts, cfg.n_experts_used
    HD, D = cfg.hidden_dim, cfg.embedding_dim
    router_w = jnp.asarray(lw["ffn_gate_inp"])[l].astype(compute_dtype)  # (E, D)
    r_logits = (ffn_in @ router_w.T).astype(jnp.float32)  # (..., E)
    topv, topi = jax.lax.top_k(r_logits, K)
    topw = jax.nn.softmax(topv, axis=-1)  # normalize over the selected k

    lead = ffn_in.shape[:-1]
    rows = 1
    for d in lead:
        rows *= d
    from ..ops.pallas.gemm_quant import TM

    # expert views need tile-aligned per-expert rows under the kernel
    # layout; planar planes view freely but keep one rule for both
    aligned = HD % TM == 0 and D % TM == 0
    if rows == 1 and aligned:
        gv = _expert_view(lw["ffn_gate_exps"], E)
        uv = _expert_view(lw["ffn_up_exps"], E)
        dv = _expert_view(lw["ffn_down_exps"], E)
        ew = topi.reshape(K)
        rw = topw.reshape(K)
        out = None
        for j in range(K):  # static unroll over the top-k selection
            idx = l * E + ew[j]
            g = qmatmul(ffn_in, gv, compute_dtype, layer=idx)
            u = qmatmul(ffn_in, uv, compute_dtype, layer=idx)
            hj = _activation(g, cfg.act) * u
            yj = qmatmul(hj, dv, compute_dtype, layer=idx)
            yj = yj * rw[j].astype(yj.dtype)
            out = yj if out is None else out + yj
        return out

    route = (jax.nn.one_hot(topi, E, dtype=jnp.float32) * topw[..., None]).sum(-2)

    if rows * K < E and aligned:
        return _moe_cond_experts(lw, l, ffn_in, route, cfg, compute_dtype)

    # CRABML_MOE_PREFILL=all forces the all-experts path (measurement
    # baseline for the grouped kernel's E/K win; not a user knob)
    import os as _os

    if (rows >= _GROUPED_MIN_ROWS and K < E and aligned
            and _os.environ.get("CRABML_MOE_PREFILL") != "all"):
        from ..ops import matmul as _mm

        # both kernel backends share the layout qmatmul_grouped reads
        # (bf16-dequant planes, or W8 planes when attached); w4a8's int8
        # activation path is decode-only so prefill rows land here too
        if _mm.get_backend() in ("pallas", "w4a8") and all(
            _is_groupable(lw[n])
            for n in ("ffn_gate_exps", "ffn_up_exps", "ffn_down_exps")
        ):
            return _moe_grouped(lw, l, ffn_in, topi, topw, cfg, compute_dtype)

    return _moe_all_experts(lw, l, ffn_in, route, cfg, compute_dtype)


_GROUPED_MIN_ROWS = 64  # below this, all-experts fused reads win (few tiles)


def _is_groupable(qt) -> bool:
    from ..ops.pallas.gemm_quant import SCHEMES, is_repacked

    return qt.kind in SCHEMES and is_repacked(qt)


def _grouped_tb(rows: int, E: int) -> int:
    """Row-tile for the grouped kernel: ~the average per-expert row count
    (padding per expert stays under one tile), clamped to [128, 512] —
    128 keeps 4-bit weights above the MXU compute ridge, 512 bounds the
    (TB, tk) x-block VMEM like `_run`'s prefill tile."""
    t = 128
    while t * 2 <= rows // max(E, 1) and t < 512:
        t *= 2
    return t


def _moe_grouped(lw, l, ffn_in, topi, topw, cfg, compute_dtype):
    """Prefill-regime MoE via the grouped (ragged) kernel: rows sort by
    routed expert, each expert's segment pads to a TB-multiple, and every
    TB-row tile multiplies ONLY its expert's planes (gemm_quant.
    _run_grouped). Compute is rows*K expert-applications instead of the
    all-experts path's rows*E — an E/K-fold FLOP cut (4x for mixtral
    top-2-of-8) in the regime where the MoE FFN is MXU-bound. The sort /
    scatter / gather glue is O(rows*(K+D)) jnp and fuses under XLA;
    numerics match the dense mix because each row's expert compute is
    the same dot, just batched by expert instead of by token."""
    E, K = cfg.n_experts, cfg.n_experts_used
    D = cfg.embedding_dim
    from ..ops.pallas.gemm_quant import qmatmul_grouped

    lead = ffn_in.shape[:-1]
    R = 1
    for d in lead:
        R *= d
    xf = ffn_in.reshape(R, D)
    RK = R * K
    fe = topi.reshape(RK).astype(jnp.int32)  # expert of each (row, slot)
    fw = topw.reshape(RK)
    src = jnp.arange(RK, dtype=jnp.int32) // K

    order = jnp.argsort(fe)  # stable: rows stay in token order per expert
    se = fe[order]
    sw = fw[order]
    ssrc = src[order]

    TB = _grouped_tb(RK, E)
    counts = jnp.bincount(fe, length=E)
    padded = -(-counts // TB) * TB  # per-expert segment, TB-aligned
    pstart = jnp.concatenate([jnp.zeros(1, padded.dtype),
                              jnp.cumsum(padded)[:-1]])
    rstart = jnp.concatenate([jnp.zeros(1, counts.dtype),
                              jnp.cumsum(counts)[:-1]])
    # dest of sorted entry i: its expert's padded start + rank within it
    idx = jnp.arange(RK, dtype=jnp.int32)
    dest = (pstart[se] + (idx - rstart[se])).astype(jnp.int32)

    P = -(-(RK + E * (TB - 1)) // TB) * TB  # static worst-case padded rows
    xs = jnp.zeros((P, D), compute_dtype).at[dest].set(
        xf[ssrc].astype(compute_dtype)
    )
    # tile t's expert: the segment covering row t*TB (trailing slack tiles
    # clamp to a valid id — their rows are zero and never gathered back)
    tile_expert = jnp.searchsorted(
        jnp.cumsum(padded), jnp.arange(P // TB, dtype=padded.dtype) * TB,
        side="right",
    )
    plane_idx = (l * E + jnp.clip(tile_expert, 0, E - 1)).astype(jnp.int32)

    gv = _expert_view(lw["ffn_gate_exps"], E)
    uv = _expert_view(lw["ffn_up_exps"], E)
    dv = _expert_view(lw["ffn_down_exps"], E)
    g = qmatmul_grouped(xs, gv, plane_idx, TB, compute_dtype)
    u = qmatmul_grouped(xs, uv, plane_idx, TB, compute_dtype)
    h = _activation(g, cfg.act) * u
    y = qmatmul_grouped(h.astype(compute_dtype), dv, plane_idx, TB,
                        compute_dtype)  # (P, D)
    yr = y[dest] * sw[:, None].astype(y.dtype)  # real rows, sorted order
    out = jnp.zeros((R, D), y.dtype).at[ssrc].add(yr)
    return out.reshape(lead + (D,)).astype(compute_dtype)


def _moe_cond_experts(lw, l, ffn_in, route, cfg, compute_dtype):
    """Batched-decode expert gather (ROADMAP #6): per-expert compute
    under `lax.cond(any row routed to e)`.  XLA conditionals on TPU
    execute only the taken branch, so an expert no row selected costs
    zero weight reads — decode weight traffic is bounded by the number
    of DISTINCT experts the batch uses instead of E.  Rows not routed to
    expert e carry routing weight 0 and contribute nothing; compute per
    executed expert is a full-batch GEMM, which is noise at decode-class
    row counts (the regime's matmuls are bandwidth-bound)."""
    E = cfg.n_experts
    D = cfg.embedding_dim
    lead = ffn_in.shape[:-1]
    gv = _expert_view(lw["ffn_gate_exps"], E)
    uv = _expert_view(lw["ffn_up_exps"], E)
    dv = _expert_view(lw["ffn_down_exps"], E)

    def _zero():
        return jnp.zeros(lead + (D,), compute_dtype)

    out = _zero()
    for e in range(E):  # static unroll; e is a static plane index
        w_e = route[..., e]  # (...,) 0.0 for rows not routed to e

        def _used(e=e, w_e=w_e):
            idx = l * E + e
            g = qmatmul(ffn_in, gv, compute_dtype, layer=idx)
            u = qmatmul(ffn_in, uv, compute_dtype, layer=idx)
            hj = _activation(g, cfg.act) * u
            yj = qmatmul(hj, dv, compute_dtype, layer=idx)
            return (yj * w_e[..., None].astype(yj.dtype)).astype(compute_dtype)

        out = out + jax.lax.cond(jnp.any(w_e != 0.0), _used, _zero)
    return out


def _moe_all_experts(lw, l, ffn_in, route, cfg, compute_dtype):
    """All-experts mix: fused gate/up over (E*HD) columns, static unroll
    of the down projection over expert row slices. The prefill path —
    at large row counts every expert is used, so fused full reads beat
    per-expert dispatch."""
    E = cfg.n_experts
    HD, D = cfg.hidden_dim, cfg.embedding_dim

    # gate/up for ALL experts in one fused call each: (..., E*HD)
    gate = qmatmul(ffn_in, lw["ffn_gate_exps"], compute_dtype, layer=l)
    up = qmatmul(ffn_in, lw["ffn_up_exps"], compute_dtype, layer=l)
    gshape = gate.shape[:-1] + (E, HD)
    h = _activation(gate.reshape(gshape), cfg.act) * up.reshape(gshape)

    out = None
    for e in range(E):  # static unroll; down_e is a static plane slice
        de = _slice_expert(lw["ffn_down_exps"], e, D)
        ye = qmatmul(h[..., e, :], de, compute_dtype, layer=l)
        ye = ye * route[..., e : e + 1].astype(ye.dtype)
        out = ye if out is None else out + ye
    return out


def project_ffn(lw, l, ffn_in, cfg, compute_dtype, down_proj=None):
    """FFN of layer l: gated (llama/gemma/qwen2), fused gate|up, the
    phi2 gateless+bias variant, or MoE routing (mixtral). `down_proj`
    overrides the down matmul (the TP path injects its psum/overlap
    there); default is plain."""
    if cfg.n_experts:
        return moe_ffn(lw, l, ffn_in, cfg, compute_dtype)

    def arr(name):
        return jnp.asarray(lw[name])[l].astype(compute_dtype)

    if down_proj is None:
        def down_proj(h_act):
            return qmatmul(h_act, lw["ffn_down"], compute_dtype, layer=l)

    if cfg.no_ffn_gate:
        up = qmatmul(ffn_in, lw["ffn_up"], compute_dtype, layer=l)
        if "ffn_up_b" in lw:
            up = up + arr("ffn_up_b")
        down = down_proj(_activation(up, cfg.act))
        if "ffn_down_b" in lw:
            down = down + arr("ffn_down_b")
        return down
    if "wgu" in lw:  # load-time fusion: one kernel call for gate|up
        gu = qmatmul(ffn_in, lw["wgu"], compute_dtype, layer=l)
        gate, up = gu[..., : cfg.hidden_dim], gu[..., cfg.hidden_dim :]
    else:
        gate = qmatmul(ffn_in, lw["ffn_gate"], compute_dtype, layer=l)
        up = qmatmul(ffn_in, lw["ffn_up"], compute_dtype, layer=l)
    return down_proj(_activation(gate, cfg.act) * up)


def _window_eff(local_window: int, use_local):
    """Per-call effective sliding window for the Pallas kernels: int32
    scalar, 0 = global attention. `use_local` may be traced (gemma2's
    alternating layers toggle it inside the scanned layer body)."""
    if not local_window:
        return None
    if use_local is None:
        return jnp.int32(local_window)
    return jnp.where(use_local, jnp.int32(local_window), jnp.int32(0))


def attention(q, k_cache, v_cache, pos, t_new, scale, probe=None, window=None,
              softcap: float = 0.0, local_window: int = 0, use_local=None):
    """Masked GQA attention over the full cache.

    q: (B, T, H, hd); k_cache/v_cache: (B, KV, S, hd); pos: (B,) int32 —
    number of valid cache entries before this call's tokens.

    `softcap`: gemma2 attention-logit soft capping (cap*tanh(s/cap); 0=off).
    `local_window`/`use_local`: sliding-window width and a (traced) bool
    enabling it — gemma2 alternates local/global layers inside one scan.
    Both ride the Pallas kernels (softcap static, window via scalar
    prefetch); only `probe` forces the XLA path.
    """
    B, T, H, hd = q.shape
    KV, S = k_cache.shape[1], k_cache.shape[2]
    G = H // KV

    w_eff = _window_eff(local_window, use_local)
    if probe is None:
        from ..ops import matmul as _mm

        if _mm._BACKEND == "pallas":
            from ..ops.pallas.decode_attention import MAX_T

            if T > MAX_T:  # prefill: flash kernel (O(1) score memory)
                from ..ops.pallas.flash_attention import flash_attention

                out = flash_attention(q, k_cache, v_cache, pos, scale,
                                      s_limit=window, softcap=softcap,
                                      local_window=w_eff)
                if out is not None:
                    return out
            else:  # decode (T=1) / speculative verify (T<=MAX_T): manual-
                #    DMA kernel reads only each sequence's live prefix
                from ..ops.pallas.decode_attention import decode_attention

                out = decode_attention(q, k_cache, v_cache, pos, scale,
                                       softcap=softcap, local_window=w_eff)
                if out is not None:
                    return out

    if window is not None and window < S:  # XLA path: bounded static slice
        k_cache = k_cache[:, :, :window]
        v_cache = v_cache[:, :, :window]
        S = window

    qg = q.reshape(B, T, KV, G, hd)

    # bf16 compute keeps the MXU in bf16 (f32 accumulation via
    # preferred_element_type); "highest" fp32 passes are reserved for the
    # exact-f32 path (8x slower on the MXU and only needed by golden tests)
    mm_dt = jnp.float32 if q.dtype == jnp.float32 else jnp.bfloat16
    prec = "highest" if mm_dt == jnp.float32 else None
    scores = jnp.einsum(
        "btkgh,bksh->bkgts", qg.astype(mm_dt), k_cache.astype(mm_dt),
        preferred_element_type=jnp.float32, precision=prec,
    ) * scale
    if softcap:
        scores = jnp.float32(softcap) * jnp.tanh(scores / jnp.float32(softcap))

    # causal/validity mask: token t (absolute pos[b]+t) sees cache cols <= pos[b]+t
    col = jnp.arange(S)[None, None, :]  # (1, 1, S)
    row_abs = pos[:, None, None] + jnp.arange(T)[None, :, None]  # (B, T, 1)
    mask = col <= row_abs  # (B, T, S)
    if local_window:
        near = col > row_abs - local_window  # sliding window: last W cols
        if use_local is None:
            mask = mask & near
        else:  # traced per-layer toggle (gemma2 alternating layers)
            mask = mask & jnp.where(use_local, near, True)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)

    scores = scores - scores.max(axis=-1, keepdims=True)
    probs = jnp.exp(scores)
    probs = probs / probs.sum(axis=-1, keepdims=True)
    if probe is not None:
        probe["attn_probs"] = probs

    out = jnp.einsum(
        "bkgts,bksh->btkgh", probs.astype(mm_dt), v_cache.astype(mm_dt),
        preferred_element_type=jnp.float32, precision=prec,
    )
    return out.reshape(B, T, H * hd)


def forward(
    weights: dict,
    cache: KVCache,
    tokens: jnp.ndarray,  # (B, T) int32
    pos: jnp.ndarray,  # (B,) int32 — valid cache length per sequence
    cfg: ModelConfig,
    compute_dtype=jnp.float32,
    collect_probes: bool = False,
    tp_axis: str | None = None,
    attn_window: int | None = None,
):
    """Returns (logits (B, T, vocab), updated KVCache[, probes]).

    `attn_window` (static): attention reads only the first attn_window
    cache slots — the caller guarantees every sequence's pos + T fits.
    Callers bucket it (runner/serving), so decode cost tracks the LIVE
    context length instead of the full preallocated S (the reference gets
    this for free from its grow-by-concat cache, llama2.rs:541-555; with a
    fixed-shape cache it must be explicit).

    `tp_axis`: mesh axis name when running shard-local under shard_map
    (parallel.tp) — inserts the Megatron psums after the column-sharded
    wo/ffn_down matmuls. `cfg` must then carry PER-DEVICE head/hidden
    counts (parallel.tp._localize builds it).

    `collect_probes=True` (static) additionally returns a dict of named
    intermediates — per-layer tensors stacked (L, ...) by the scan, plus
    top-level embed/final_rmsnorm — the TPU equivalent of the reference's
    debug_named_tensors instrument (cpu_device.rs:126-132, llama2.rs:737-797
    uses it to cross-check backends at named probes). Used by
    tests to pin the XLA and Pallas compute paths against each other."""
    B, T = tokens.shape
    D = cfg.embedding_dim
    H, KV, hd = cfg.n_heads, cfg.n_kv_heads, cfg.head_dim
    rope_dim = cfg.effective_rope_dim
    positions = pos[:, None] + jnp.arange(T, dtype=pos.dtype)[None, :]  # (B, T)

    with jax.named_scope("embed"):
        x = embedding_lookup(weights["token_embed"], tokens, compute_dtype)  # (B,T,D)
    if cfg.scale_embedding:  # gemma (llama2.rs:464-466)
        x = x * jnp.sqrt(jnp.float32(D)).astype(compute_dtype)

    lw = weights["layers"]
    L = cfg.n_layers

    quantized_kv = cache.quantized

    # Fused decode path (VERDICT r4 #1): at decode/verify widths with
    # kernel-eligible shapes, the KV cache stays OUT of the layer scan —
    # the decode kernel reads the full stacked cache via a prefetched
    # layer scalar and attends the step's new tokens from VMEM; all
    # layers' writes batch into ONE small scatter after the scan. The old
    # path streamed the whole cache through the scan's xs->ys every step
    # (~20 ms of HBM traffic at B=32 S=512 bf16 — the serving glue gap).
    from ..ops import matmul as _mm
    from ..ops.pallas.decode_attention import fused_decode_eligible

    hd_cache = cache.k.shape[-1]  # lane-padded width when lane_pad=True
    fused_kv = (
        _mm._BACKEND in ("pallas", "w4a8")
        and not collect_probes
        and fused_decode_eligible(T, H, KV, hd_cache, cache.seq_len)
    )

    def layer_step(x, per_layer):
        if fused_kv:
            l = per_layer
            k_l = v_l = ks_l = vs_l = None
        elif quantized_kv:
            l, k_l, v_l, ks_l, vs_l = per_layer
        else:
            l, k_l, v_l = per_layer
            ks_l = vs_l = None

        def arr(name):  # (L, d) stacked plain array, layer-indexed
            return jnp.asarray(lw[name])[l].astype(compute_dtype)

        with jax.named_scope("attn_norm"):
            h = layer_norm_in(lw, l, x, cfg)
        with jax.named_scope("qkv_proj"):
            q, k, v = project_qkv(lw, l, h, cfg, compute_dtype)

        q = q.reshape(B, T, H, hd)
        k = k.reshape(B, T, KV, hd)
        v = v.reshape(B, T, KV, hd)
        if cfg.qk_norm:  # qwen3: per-head RMS norm before rope
            q = rms_norm(q, jnp.asarray(lw["q_norm"])[l], cfg.rms_norm_eps)
            k = rms_norm(k, jnp.asarray(lw["k_norm"])[l], cfg.rms_norm_eps)
        with jax.named_scope("rope"):
            ff = weights.get("rope_freqs")
            ps = (1.0 / cfg.rope_scaling_factor
                  if cfg.rope_scaling_type == "linear" else 1.0)
            q = apply_rope(q, positions, rope_dim, cfg.rope_mode, cfg.rope_base,
                           freq_factors=ff, pos_scale=ps, mscale=cfg.rope_mscale)
            k = apply_rope(k, positions, rope_dim, cfg.rope_mode, cfg.rope_base,
                           freq_factors=ff, pos_scale=ps, mscale=cfg.rope_mscale)

        k_t = k.transpose(0, 2, 1, 3)  # (B, KV, T, hd)
        v_t = v.transpose(0, 2, 1, 3)
        # lane-padded cache (KVCache.create(lane_pad=True)): store k/v/q
        # zero-extended to the cache's lane width so the attention kernels
        # see full 128-lane tiles; scores and int8 scales are unchanged
        lane_pad = hd_cache - hd
        if lane_pad:
            padw = ((0, 0), (0, 0), (0, 0), (0, lane_pad))
            k_t = jnp.pad(k_t, padw)
            v_t = jnp.pad(v_t, padw)
            q = jnp.pad(q, padw)

        def q8(a):  # symmetric per-(head, token) int8
            s_ = jnp.max(jnp.abs(a), axis=-1, keepdims=True) / 127.0
            s_ = jnp.maximum(s_.astype(jnp.float32), 1e-12)
            qv = jnp.clip(jnp.round(a.astype(jnp.float32) / s_), -127, 127)
            return qv.astype(jnp.int8), s_

        scale = cfg.attn_scale  # 1/sqrt(hd) unless overridden (gemma2-27b)

        if fused_kv:
            # attention BEFORE the cache write: the kernel reads the live
            # prefix from the full stacked cache (layer via scalar
            # prefetch) and this step's tokens from VMEM; the write
            # happens once, after the layer scan (_scatter_new_kv)
            from ..ops.pallas.decode_attention import decode_attention_fused

            w_eff_l = _window_eff(
                cfg.sliding_window,
                (l % 2 == 0) if cfg.alternating_window else None,
            )
            with jax.named_scope("cache_q8"):
                if quantized_kv:
                    kq, ks_new = q8(k_t)
                    vq, vs_new = q8(v_t)
                    new_kv = (kq, vq, ks_new, vs_new)
                else:
                    kq = k_t.astype(cache.k.dtype)
                    vq = v_t.astype(cache.v.dtype)
                    ks_new = vs_new = None
                    new_kv = (kq, vq)
            _attn_scope = jax.named_scope("attention")
            _attn_scope.__enter__()
            attn = decode_attention_fused(
                q, cache.k, cache.v, l, pos, scale, k_new=kq, v_new=vq,
                k_scale=cache.k_scale, v_scale=cache.v_scale,
                ks_new=ks_new, vs_new=vs_new,
                softcap=cfg.attn_logit_softcap, local_window=w_eff_l,
            )
        else:
            new_kv = None
            # write new k/v into the cache at each sequence's own offset
            def upd(cache_b, new_b, p):  # (KV, S, hd) <- (KV, T, hd) at p
                return jax.lax.dynamic_update_slice(cache_b, new_b, (0, p, 0))

            _cache_scope = jax.named_scope("cache_update")
            _cache_scope.__enter__()
            if quantized_kv:
                kq, ks_new = q8(k_t)
                vq, vs_new = q8(v_t)
                k_l = jax.vmap(upd)(k_l, kq, pos)
                v_l = jax.vmap(upd)(v_l, vq, pos)
                ks_l = jax.vmap(upd)(ks_l, ks_new, pos)
                vs_l = jax.vmap(upd)(vs_l, vs_new, pos)
            else:
                k_l = jax.vmap(upd)(k_l, k_t.astype(k_l.dtype), pos)
                v_l = jax.vmap(upd)(v_l, v_t.astype(v_l.dtype), pos)
            _cache_scope.__exit__(None, None, None)

            _attn_scope = jax.named_scope("attention")
            _attn_scope.__enter__()
        if fused_kv:
            pass  # attn computed above
        elif quantized_kv:
            from ..ops import matmul as _mm

            attn = None
            if _mm._BACKEND == "pallas":
                # decode kernel reads the int8 cache + scales directly:
                # half the bytes of bf16, and only the live prefix;
                # gemma2 softcap/sliding-window ride the kernel too.
                # T in 2..MAX_T (the speculative verify) rides it as well —
                # the kernel folds the T tokens into its row dim with
                # per-row causal bounds; wider T falls through (returns
                # None) to the windowed-dequant prefill path below
                from ..ops.pallas.decode_attention import decode_attention

                attn = decode_attention(
                    q, k_l, v_l, pos, scale, k_scale=ks_l, v_scale=vs_l,
                    softcap=cfg.attn_logit_softcap,
                    local_window=_window_eff(
                        cfg.sliding_window,
                        (l % 2 == 0) if cfg.alternating_window else None,
                    ),
                )
            if attn is None:
                # dequantize only the windowed view, then attend over it —
                # in the COMPUTE dtype: the attention einsum runs bf16
                # anyway (see attention()), and an f32 intermediate here
                # doubles the dominant HBM traffic of a T>1 verify step
                # (measured ~1.6 GB/round at B=8 win=768; int8 values are
                # exact in bf16, only the scale multiply rounds)
                win = attn_window if attn_window is not None else k_l.shape[2]
                dq = q.dtype  # f32 on the exact-f32 (golden-test) path
                k_att = k_l[:, :, :win].astype(dq) * ks_l[:, :, :win].astype(dq)
                v_att = v_l[:, :, :win].astype(dq) * vs_l[:, :, :win].astype(dq)
                attn = attention(
                    q, k_att, v_att, pos, T, scale,
                    softcap=cfg.attn_logit_softcap,
                    local_window=cfg.sliding_window,
                    use_local=(l % 2 == 0) if cfg.alternating_window else None,
                )
        else:
            # full cache + window bound: the pallas kernels gate their own
            # reads (grid bound / per-seq DMA), the XLA path slices
            attn = attention(
                q, k_l, v_l, pos, T, scale, window=attn_window,
                softcap=cfg.attn_logit_softcap,
                local_window=cfg.sliding_window,
                use_local=(l % 2 == 0) if cfg.alternating_window else None,
            )
        _attn_scope.__exit__(None, None, None)
        if lane_pad:  # drop the zero lanes before wo
            attn = attn.reshape(B, T, H, hd + lane_pad)[..., :hd]
            attn = attn.reshape(B, T, H * hd)
        _wo_scope = jax.named_scope("wo_proj")
        _wo_scope.__enter__()
        if tp_axis is not None and "wo_chunks" in lw:
            # pre-chunked at setup (parallel.overlap): each chunk's psum
            # overlaps the next chunk's matmul
            from ..parallel.overlap import overlapped_psum_matmul

            attn_out = overlapped_psum_matmul(
                attn.astype(compute_dtype), lw["wo_chunks"], compute_dtype,
                tp_axis, layer=l,
            )
        else:
            attn_out = qmatmul(attn.astype(compute_dtype), lw["wo"], compute_dtype, layer=l)
            if tp_axis is not None:  # wo is column-sharded: partial sums over k
                attn_out = jax.lax.psum(attn_out, tp_axis)
        if "bo" in lw:
            attn_out = attn_out + arr("bo")
        if cfg.post_norms:  # gemma2: norm the block OUTPUT before residual
            attn_out = rms_norm(
                attn_out, jnp.asarray(lw["post_attn_norm"])[l], cfg.rms_norm_eps
            )
        _wo_scope.__exit__(None, None, None)

        if cfg.parallel_residual:
            # phi2: ffn reads the *attention-normed* input; both add to residual
            # (llama2.rs:420-436)
            ffn_in = h
        else:
            with jax.named_scope("ffn_norm"):
                x = x + attn_out
                ffn_in = rms_norm(x, jnp.asarray(lw["ffn_norm"])[l], cfg.rms_norm_eps)

        def down_proj(h_act):
            if tp_axis is not None and "ffn_down_chunks" in lw:
                from ..parallel.overlap import overlapped_psum_matmul

                return overlapped_psum_matmul(
                    h_act, lw["ffn_down_chunks"], compute_dtype, tp_axis, layer=l
                )
            d = qmatmul(h_act, lw["ffn_down"], compute_dtype, layer=l)
            if tp_axis is not None:
                d = jax.lax.psum(d, tp_axis)
            return d

        with jax.named_scope("ffn"):
            down = project_ffn(lw, l, ffn_in, cfg, compute_dtype, down_proj=down_proj)
        if cfg.post_norms:
            down = rms_norm(
                down, jnp.asarray(lw["post_ffn_norm"])[l], cfg.rms_norm_eps
            )

        if cfg.parallel_residual:
            x = x + attn_out + down
        else:
            x = x + down
        probe = (
            {"attn_rmsnorm": h, "attn_out": attn_out, "ffn_down": down, "layer_out": x}
            if collect_probes
            else {}
        )
        if fused_kv:
            return x, new_kv
        if quantized_kv:
            return x, (k_l, v_l, ks_l, vs_l, probe)
        return x, (k_l, v_l, probe)

    x0 = x
    idx = jnp.arange(L, dtype=jnp.int32)
    if fused_kv:
        x, news = jax.lax.scan(layer_step, x, idx)
        with jax.named_scope("cache_write"):
            new_cache = _scatter_new_kv(cache, news, pos, T)
        layer_probes = {}
    elif quantized_kv:
        x, (k_new, v_new, ks_new, vs_new, layer_probes) = jax.lax.scan(
            layer_step, x, (idx, cache.k, cache.v, cache.k_scale, cache.v_scale)
        )
        new_cache = KVCache(k_new, v_new, ks_new, vs_new)
    else:
        x, (k_new, v_new, layer_probes) = jax.lax.scan(
            layer_step, x, (idx, cache.k, cache.v)
        )
        new_cache = KVCache(k_new, v_new, None, None)

    with jax.named_scope("final_norm"):
        x = apply_final_norm(weights, x, cfg)

    out_w = weights["output"] if weights["output"] is not None else weights["token_embed"]
    with jax.named_scope("lm_head"):
        logits = qmatmul(x, out_w, compute_dtype)  # (B, T, vocab)
    if weights.get("output_b") is not None:  # phi2 lm_head bias
        logits = logits + jnp.asarray(weights["output_b"]).astype(logits.dtype)
    if cfg.final_logit_softcap:
        cap = jnp.float32(cfg.final_logit_softcap)
        logits = cap * jnp.tanh(logits.astype(jnp.float32) / cap)
    if collect_probes:
        probes = {"embed": x0, "final_rmsnorm": x, **layer_probes}
        return logits.astype(jnp.float32), new_cache, probes
    return logits.astype(jnp.float32), new_cache
