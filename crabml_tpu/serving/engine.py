"""Continuous-batching serving engine.

The reference is a single-sequence CLI engine (SURVEY §2.12: no serving
daemon, no batching); BASELINE.json makes continuous batching across hosts a
first-class requirement of the TPU build. This engine is the single-host
core: a fixed pool of KV-cache *slots* (the jit-static batch dimension),
requests admitted into free slots as soon as they open, one compiled decode
step advancing every active slot per tick.

TPU-shaped decisions:
- The slot pool IS the batch: the decode step is jitted once for
  (n_slots, 1) shapes and never recompiles as requests come and go.
- Prefill runs per-request on a single slot *sliced out* of the pooled cache
  (dynamic_slice on the batch axis) and scattered back — admitting a request
  never recompiles the decode step or touches other slots' state. Prompt
  lengths pad to power-of-two buckets to bound prefill compile count.
- Sampling params (temperature/top-p) are *traced* (B,) vectors, so mixed
  greedy/sampled requests share one compiled step (runtime.sampler.sample_batch).
- Inactive slots still step (cheap: they re-write cache position 0, which
  the next admission's prefill overwrites); the host just ignores their
  token. No gather/scatter of live slots per tick.
"""

from __future__ import annotations

import itertools
import queue
import threading
import time
from dataclasses import dataclass, field
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.forward import KVCache, forward
from ..runtime.sampler import sample_batch
from ..tokenizer import Utf8Buf
from ..utils import bucket as _bucket


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype"),
    donate_argnames=("cache",),
)
def _prefill_slot(weights, cache: KVCache, tokens, slot, pos0, cfg, compute_dtype):
    """Forward `tokens` (1, Tpad) through slot `slot` starting at `pos0`.

    Slices the slot's (L, 1, S, KV, hd) cache out of the pool, runs the
    normal forward, scatters it back. Returns (logits (1, Tpad, V), cache).
    """
    def slot_slice(a):
        return (
            None if a is None
            else jax.lax.dynamic_slice_in_dim(a, slot, 1, axis=1)
        )

    small_in = KVCache(*(slot_slice(a) for a in (cache.k, cache.v, cache.k_scale, cache.v_scale)))
    logits, small = forward(weights, small_in, tokens, pos0[None], cfg, compute_dtype)

    def slot_update(full, part):
        return (
            None if full is None
            else jax.lax.dynamic_update_slice_in_dim(full, part, slot, axis=1)
        )

    return logits, KVCache(
        slot_update(cache.k, small.k),
        slot_update(cache.v, small.v),
        slot_update(cache.k_scale, small.k_scale),
        slot_update(cache.v_scale, small.v_scale),
    )


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "attn_window"),
    donate_argnames=("cache",),
)
def _decode_step(weights, cache: KVCache, tokens, pos, key, temp, topp,
                 minp, recent, rep_pen, freq_pen, pres_pen, bias, cfg,
                 compute_dtype, attn_window=None):
    """One batched decode tick: forward all slots, sample per-slot.
    Per-token logprobs ride along (host fetches them only when a live
    request asked for them — computing is cheap, fetching is a round trip)."""
    logits, cache = forward(weights, cache, tokens[:, None], pos, cfg, compute_dtype,
                            attn_window=attn_window)
    nxt, lp = sample_batch(logits[:, 0], key, temp, topp, minp=minp,
                           recent_tokens=recent, repetition_penalty=rep_pen,
                           frequency_penalty=freq_pen, presence_penalty=pres_pen,
                           logit_bias=bias, with_logprobs=True)
    return nxt, lp, cache


@partial(
    jax.jit,
    static_argnames=("steps", "cfg", "compute_dtype", "attn_window"),
    donate_argnames=("cache",),
)
def _decode_scan(weights, cache, tokens, pos, key, temp, topp, minp, recent,
                 rep_pen, freq_pen, pres_pen, bias, steps, cfg, compute_dtype,
                 attn_window=None):
    """`steps` decode ticks fused in one executable (multi-token ticks):
    on high-RTT links the per-dispatch round trip dominates single-token
    ticks, so batching ticks multiplies serving throughput. EOS/max_tokens
    are handled by the host afterwards (a slot that finishes mid-scan just
    wastes its remaining lanes; its cache is overwritten on reuse).
    The repetition-penalty window `recent` shifts in-scan so tokens
    generated earlier in the same tick are penalized too."""

    def body(carry, _):
        cache, tok, p, key, rec = carry
        key, sub = jax.random.split(key)
        logits, cache = forward(weights, cache, tok[:, None], p, cfg,
                                compute_dtype, attn_window=attn_window)
        nxt, lp = sample_batch(logits[:, 0], sub, temp, topp, minp=minp,
                               recent_tokens=rec, repetition_penalty=rep_pen,
                               frequency_penalty=freq_pen, presence_penalty=pres_pen,
                               logit_bias=bias, with_logprobs=True)
        rec = jnp.concatenate([rec[:, 1:], nxt[:, None]], axis=1)
        return (cache, nxt, p + 1, key, rec), (nxt, *lp)

    (cache, _, _, _, _), (toks, tok_lp, top_lp, top_id) = jax.lax.scan(
        body, (cache, tokens, pos, key, recent), length=steps
    )
    # (steps, B[, K]) -> (B, steps[, K])
    lp = (tok_lp.T, jnp.swapaxes(top_lp, 0, 1), jnp.swapaxes(top_id, 0, 1))
    return toks.T, lp, cache  # (B, steps)


@dataclass
class Request:
    prompt: str
    max_tokens: int = 256
    temperature: float = 0.0
    topp: float = 0.9
    minp: float = 0.0  # min-p filter (0 = off)
    repetition_penalty: float = 1.0  # llama.cpp repeat penalty (1 = off)
    frequency_penalty: float = 0.0  # OpenAI-style, over the recent window
    presence_penalty: float = 0.0
    # OpenAI logit_bias: sparse (token_id, bias) pairs added to the logits
    # every step (scattered into a device-resident dense row per slot)
    logit_bias: tuple[tuple[int, float], ...] = ()
    stop_token_ids: tuple[int, ...] = ()
    stop: tuple[str, ...] = ()  # stop strings (merged across token pieces)
    # OpenAI logprobs: None = off; N >= 0 records each sampled token's
    # logprob plus the top-N alternatives (N <= sampler.LOGPROB_TOPK)
    logprobs: int | None = None
    request_id: int = field(default_factory=itertools.count().__next__)

    # filled by the engine
    prompt_tokens: list[int] = field(default_factory=list, repr=False)
    output_tokens: list[int] = field(default_factory=list, repr=False)
    # aligned with output_tokens when logprobs is set: the sampled token's
    # logprob, and the top-N [(token_id, logprob), ...] per position
    output_logprobs: list[float] = field(default_factory=list, repr=False)
    output_top_logprobs: list[list[tuple[int, float]]] = field(
        default_factory=list, repr=False)
    finish_reason: str | None = None
    output_text: str | None = None  # decoded + stop-trimmed (when stop set)
    cancelled: bool = field(default=False, repr=False)  # set via engine.cancel
    _t_submit: float = field(default=0.0, repr=False)
    _t_first: float = field(default=0.0, repr=False)  # first delivered token
    _t_finish: float = field(default=0.0, repr=False)
    _stream: "queue.SimpleQueue[str | None] | None" = field(default=None, repr=False)
    _utf8: Utf8Buf = field(default_factory=Utf8Buf, repr=False)

    @property
    def done(self) -> bool:
        return self.finish_reason is not None


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "attn_window"),
    donate_argnames=("cache",),
)
def _spec_verify_step(weights, cache, tokens, pos, key, temp, topp, minp,
                      recent, rep_pen, freq_pen, pres_pen, bias, cfg,
                      compute_dtype, attn_window=None):
    """Speculative verify: forward (B, K+1) tokens (each slot's current
    token + its K drafted tokens) in ONE dispatch, greedy argmax at every
    position. Rejected drafts' KV writes land PAST the slot's accepted
    position, where the causal mask (col <= pos) hides them until the
    sequential decode overwrites each position — no cache rollback.

    Position 0 is ADDITIONALLY sampled with the full per-slot sampling
    params (exactly what a plain tick computes): slots that can't
    speculate exactly (temperature, penalties, bias, logprobs) take this
    one token from the same dispatch, so mixed greedy/sampled traffic
    keeps speculating instead of disabling the tick for everyone."""
    logits, cache = forward(weights, cache, tokens, pos, cfg, compute_dtype,
                            attn_window=attn_window)
    nxt, lp = sample_batch(logits[:, 0], key, temp, topp, minp=minp,
                           recent_tokens=recent, repetition_penalty=rep_pen,
                           frequency_penalty=freq_pen, presence_penalty=pres_pen,
                           logit_bias=bias, with_logprobs=True)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), nxt, lp, cache


@partial(
    jax.jit,
    static_argnames=("steps", "cfg", "compute_dtype", "attn_window"),
    donate_argnames=("cache",),
)
def _draft_scan(weights, cache, tok, pos, steps, cfg, compute_dtype,
                attn_window=None):
    """Greedy draft chain for two-model speculative serving: `steps`
    fused decode steps on the (small) draft model, batched over all
    slots. Returns (B, steps) tokens; the cache gains `steps` KV entries
    per slot (inputs t0, d1, ..., d_{steps-1}) — one MORE than the drafts
    used, so on a full accept the draft cache already holds the last
    accepted draft's KV and the next tick continues seamlessly."""

    def body(carry, _):
        cache, t, p = carry
        logits, cache = forward(weights, cache, t[:, None], p, cfg,
                                compute_dtype, attn_window=attn_window)
        nxt = jnp.argmax(logits[:, 0], -1).astype(jnp.int32)
        return (cache, nxt, p + 1), nxt

    (cache, _, _), toks = jax.lax.scan(body, (cache, tok, pos), length=steps)
    return toks.T, cache  # (B, steps)


@partial(
    jax.jit,
    static_argnames=("cfg", "compute_dtype", "attn_window"),
    donate_argnames=("cache",),
)
def _draft_sync(weights, cache, tokens, pos, cfg, compute_dtype,
                attn_window=None):
    """Teacher-forced draft-cache catch-up: write the TARGET's emitted
    tokens' KV into the draft cache after a plain (non-speculative) tick,
    so the draft's context never develops gaps that degrade acceptance."""
    _, cache = forward(weights, cache, tokens, pos, cfg, compute_dtype,
                       attn_window=attn_window)
    return cache


def _draft_2gram_one(h, t, p, *, draft: int, match_len: int):
    """Most-recent 2-gram match over one slot's history (B=1 logic from
    runtime.speculative.speculative_loop verbatim). vmap over slots."""
    S = h.shape[0]
    idx = jnp.arange(S, dtype=jnp.int32)
    h = h.at[p].set(t)
    match = jnp.ones(S, dtype=bool)
    for off in range(match_len):
        suffix_tok = h[p - off]
        shifted = jnp.roll(h, off)
        match = match & (shifted == suffix_tok) & (idx >= off)
    match = match & (idx < p)
    j = jnp.max(jnp.where(match, idx, -1))
    start = jnp.where(j < 0, p, j + 1)
    return jax.lax.dynamic_slice(h, (start,), (draft,)), h


def _accept_round(g, dr, nxt, token, active, eligible, draft: int):
    """Greedy-exact acceptance for one fused round (shared by the dense
    and paged spec scans): eligible slots take their longest
    argmax-matching drafted prefix + bonus token; other ACTIVE slots take
    the round's position-0 sampled token. Returns (out (B, K+1) tokens to
    emit, count (B,) emitted per slot, token (B,) next input token)."""
    B = g.shape[0]
    ok = dr == g[:, :draft]
    n_acc = jnp.argmin(
        jnp.concatenate([ok, jnp.zeros((B, 1), bool)], axis=1), axis=1)
    n_acc = jnp.where(eligible, n_acc, 0)
    count = jnp.where(active, n_acc + 1, 0)
    chosen = jnp.take_along_axis(g, n_acc[:, None], 1)[:, 0]
    token_new = jnp.where(eligible, chosen, nxt)
    token = jnp.where(active, token_new, token)
    out = g.at[:, 0].set(jnp.where(eligible, g[:, 0], nxt))
    return out, count, token


@partial(
    jax.jit,
    static_argnames=("rounds", "draft", "match_len", "two_model", "cfg",
                     "dcfg", "compute_dtype", "attn_window"),
    donate_argnames=("cache", "dcache"),
)
def _spec_scan(weights, cache, hist, token, pos, active, eligible, key,
               temp, topp, minp, recent, rep_pen, freq_pen, pres_pen, bias,
               dweights, dcache, rounds, draft, cfg, compute_dtype,
               dcfg=None, match_len: int = 2, two_model: bool = False,
               attn_window=None):
    """`rounds` fused draft+verify rounds batched over the slot pool —
    the serving form of runtime.speculative.speculative_loop. A single
    speculative tick pays one dispatch round trip per K+1 tokens while
    the dense engine fuses tick_tokens steps per dispatch; on a high-RTT
    link that gap alone can eat speculation's win, so when no admission
    is pending the engine runs this scan instead: R rounds per dispatch,
    drafts computed ON DEVICE (vectorized 2-gram prompt lookup over a
    per-slot history buffer, or the draft model's fused greedy chain
    when `two_model`).

    active: (B,) bool — only active slots advance pos / emit (idle and
    mid-prefill rows still forward — the batch is the pool — writing
    junk KV at their fixed pos that admission later overwrites).
    eligible: (B,) bool — greedy-exact slots accept drafted prefixes +
    bonus token; other ACTIVE slots take each round's position-0 token
    sampled with their full per-slot params (1 token/round, exactly a
    plain tick). Junk history/cache entries above each accepted frontier
    are masked-until-overwritten (runtime.speculative's hygiene
    argument, per row).

    Returns (outs (R, B, K+1), counts (R, B), per-round pos-0 logprob
    arrays, cache, dcache)."""
    B, S = hist.shape
    draft_one = partial(_draft_2gram_one, draft=draft, match_len=match_len)

    def body(carry, key_r):
        cache, dcache, hist, token, pos, rec = carry
        if two_model:
            def dstep(dc, _):
                dcache, t, p = dc
                dlogits, dcache = forward(dweights, dcache, t[:, None], p,
                                          dcfg, compute_dtype,
                                          attn_window=attn_window)
                nt = jnp.argmax(dlogits[:, 0], -1).astype(jnp.int32)
                return (dcache, nt, p + 1), nt

            # draft+1 steps (not draft): on a full accept the LAST
            # accepted draft's KV must already be in the draft cache or
            # every later round drafts across a one-position hole and
            # acceptance collapses (the _draft_scan invariant)
            (dcache, _, _), dr = jax.lax.scan(
                dstep, (dcache, token, pos), length=draft + 1)
            dr = dr.T[:, :draft]  # (B, draft)
        else:
            dr, hist = jax.vmap(draft_one)(hist, token, pos)
        tok_seq = jnp.concatenate([token[:, None], dr], axis=1)  # (B, K+1)
        logits, cache = forward(weights, cache, tok_seq, pos, cfg,
                                compute_dtype, attn_window=attn_window)
        g = jnp.argmax(logits, -1).astype(jnp.int32)  # (B, K+1)
        nxt, lp = sample_batch(logits[:, 0], key_r, temp, topp, minp=minp,
                               recent_tokens=rec, repetition_penalty=rep_pen,
                               frequency_penalty=freq_pen,
                               presence_penalty=pres_pen, logit_bias=bias,
                               with_logprobs=True)
        out, count, token = _accept_round(g, dr, nxt, token, active,
                                          eligible, draft)
        # history gains this round's emissions at pos+1.. (per-row junk
        # past the frontier is rewritten by the round that passes it)
        hist = jax.vmap(
            lambda h, row, p: jax.lax.dynamic_update_slice(h, row, (p + 1,))
        )(hist, out, pos)
        rec = jnp.concatenate([rec[:, 1:], token[:, None]], axis=1)
        pos = pos + count
        return (cache, dcache, hist, token, pos, rec), (out, count, *lp)

    keys = jax.random.split(key, rounds)
    (cache, dcache, _, _, _, _), (outs, counts, tok_lp, top_lp, top_id) = (
        jax.lax.scan(body, (cache, dcache, hist, token, pos, recent), keys)
    )
    return outs, counts, (tok_lp, top_lp, top_id), cache, dcache


def _lookup_draft(ctx, K: int) -> list:
    """Prompt-lookup drafting (host-side): find the most recent earlier
    occurrence of the context's last 2-gram and propose the K tokens that
    followed it. No match -> zeros (the verify still emits its bonus
    token, so a tick never regresses below 1 token/slot).

    Vectorized: the scan over the context runs as one numpy comparison,
    not a Python loop — O(ctx) python per slot per tick was measurable at
    serving batch sizes (VERDICT r3 #10)."""
    c = np.asarray(ctx, np.int32)
    n = c.size
    if n >= 3:
        a, b = c[-2], c[-1]
        # candidate starts i in [0, n-3]: match of the trailing 2-gram
        hits = np.nonzero((c[:-2] == a) & (c[1:-1] == b))[0]
        if hits.size:
            i = int(hits[-1])  # most recent earlier occurrence
            d = c[i + 2 : i + 2 + K].tolist()
            return d + [0] * (K - len(d))
    return [0] * K


class LatencyHistogram:
    """Prometheus-style cumulative histogram (fixed buckets, host-side)."""

    BUCKETS = (0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0, 30.0, 60.0)

    def __init__(self):
        self.counts = [0] * (len(self.BUCKETS) + 1)
        self.sum = 0.0
        self.n = 0

    def observe(self, v: float):
        self.sum += v
        self.n += 1
        for i, le in enumerate(self.BUCKETS):
            if v <= le:
                self.counts[i] += 1
                return
        self.counts[-1] += 1

    def render(self, name: str) -> str:
        out = [f"# TYPE {name} histogram"]
        c = 0
        for le, k in zip(self.BUCKETS, self.counts):
            c += k
            out.append(f'{name}_bucket{{le="{le}"}} {c}')
        out.append(f'{name}_bucket{{le="+Inf"}} {self.n}')
        out.append(f"{name}_sum {round(self.sum, 6)}")
        out.append(f"{name}_count {self.n}")
        return "\n".join(out) + "\n"


class ServingEngine:
    """Slot-pool continuous batching on one host (one chip or one TP mesh).

    Drive it either synchronously — `submit()` then `step()` until done, or
    `generate(prompts)` — or via `run_forever()` on a thread with `enqueue()`
    from request handlers (serving.http does this).

    Frequency/presence penalties count only the most recent REPEAT_WINDOW
    output tokens (the in-scan window), not the whole context as OpenAI's
    semantics do — documented divergence, keeps the penalty state O(window).
    """

    REPEAT_WINDOW = 64
    SPEC_FUSED_DEFAULT = True  # see self.spec_fused in __init__

    def __init__(
        self,
        runner=None,
        *,
        weights=None,
        cfg=None,
        tokenizer=None,
        n_slots: int = 8,
        seq_len: int | None = None,
        compute_dtype=jnp.float32,
        kv_dtype=None,
        seed: int = 0,
        tick_tokens: int = 1,
        prefill_chunk: int | None = 256,
        kv_lane_pad: bool = False,
        speculative: int = 0,
        draft_runner=None,
        repeat_window: int | None = None,
        spec_fused: bool | None = None,
    ):
        self.mesh = None
        self.kv_lane_pad = kv_lane_pad
        if repeat_window is not None:
            # instance override of the class default (llama.cpp's
            # repeat_last_n; VERDICT r3 #10 asked for this as a flag)
            self.REPEAT_WINDOW = max(1, int(repeat_window))
        if runner is not None:
            weights, cfg, tokenizer = runner.weights, runner.cfg, runner.tokenizer
            compute_dtype = runner.compute_dtype
            kv_dtype = kv_dtype or runner.kv_dtype
            self.kv_lane_pad = kv_lane_pad or getattr(
                runner, "kv_lane_pad", False)
            # Runner(draft_model=...) carries a small draft Runner: inherit
            # it (and its draft length) for two-model speculative serving
            if draft_runner is None:
                draft_runner = getattr(runner, "_draft", None)
                if draft_runner is not None and not speculative:
                    # Runner(draft_model=...) defaults its own speculative
                    # draft length (runner.py); inherit the same K
                    speculative = getattr(runner, "speculative", 0)
            # a GSPMD-sharded Runner (sharding=make_mesh(tp=...)) carries
            # its mesh here so the engine's cache shards over it too
            self.mesh = getattr(runner, "_sharding", None)
        assert weights is not None and cfg is not None
        self.weights = weights
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.n_slots = n_slots
        self.seq_len = min(seq_len or cfg.seq_len, cfg.seq_len)
        self.compute_dtype = compute_dtype
        self.kv_dtype = kv_dtype or compute_dtype

        self.cache = self._make_cache()
        self.slots: list[Request | None] = [None] * n_slots
        # host-side per-slot state (device copies made fresh each step; see
        # runner.py's note on async-transfer races)
        self.pos = np.zeros(n_slots, np.int32)
        self.cur_tok = np.zeros(n_slots, np.int32)
        self.temp = np.zeros(n_slots, np.float32)
        self.topp = np.ones(n_slots, np.float32)
        self.minp = np.zeros(n_slots, np.float32)
        self.rep_pen = np.ones(n_slots, np.float32)
        self.freq_pen = np.zeros(n_slots, np.float32)
        self.pres_pen = np.zeros(n_slots, np.float32)
        # repetition-penalty window (last REPEAT_WINDOW context tokens,
        # -1 padded) — llama.cpp's repeat_last_n, default 64
        self.recent = np.full((n_slots, self.REPEAT_WINDOW), -1, np.int32)
        # per-slot dense logit-bias rows, DEVICE-resident: updated only on
        # admit/finish (a host mirror re-uploaded per tick would ship
        # n_slots x vocab floats over the link every step)
        self._bias_dev = None  # lazily jnp.zeros((n_slots, vocab))
        self.pending: "queue.SimpleQueue[Request]" = queue.SimpleQueue()
        self._key = jax.random.PRNGKey(seed)
        self._stop = threading.Event()
        self.steps = 0
        # >1: run_forever fuses this many decode steps per dispatch while
        # the admission queue is empty (multi-token ticks; see _decode_scan)
        self.tick_tokens = max(1, tick_tokens)
        # chunked-prefill admission: each step() forwards at most this many
        # prompt tokens of ONE admitting request before the decode tick, so
        # admission never head-of-line-blocks running requests for longer
        # than a chunk. None = legacy synchronous (whole prompt at admit).
        self.prefill_chunk = prefill_chunk
        # slot -> (remaining_tokens, n_filled) for mid-prefill requests;
        # such slots are claimed (self.slots[slot] set) but NOT decoded
        self._prefilling: dict[int, tuple[list[int], int]] = {}
        self.tokens_generated = 0
        self.requests_submitted = 0
        self.requests_completed = 0  # by finish reason, see _finish
        # speculative serving: draft length per verify tick (0 = off).
        # Drafts come from prompt lookup, or from `draft_runner`'s small
        # model (two-model). Engages only when EVERY active slot is
        # plain-greedy (exactness requires argmax verify without
        # penalties/bias).
        self.speculative = speculative
        # fused multi-round scan engagement: measured per engine on the
        # v5e (same-process A/B, benchmarks/r4/spec_ab_*.json) — the dense
        # engine's fused scan beats single-dispatch ticks 0.78x-vs-0.57x
        # of plain at accept~0 (RTT amortized, cache carry aliases fine),
        # while the paged engine's LOSES 0.47x-vs-0.62x (the page pool
        # carried through the rounds-scan costs more than the saved RTT),
        # so each class carries its measured default; the kwarg overrides.
        self.spec_fused = (self.SPEC_FUSED_DEFAULT if spec_fused is None
                           else spec_fused)
        self.spec_ticks = 0
        self.spec_tokens = 0  # tokens emitted by speculative ticks
        self._draft_w = self._draft_cfg = self._draft_dtype = None
        self._draft_cache = None
        if draft_runner is not None and speculative:
            if draft_runner.cfg.vocab_size != self.cfg.vocab_size:
                from ..errors import UnsupportedError

                raise UnsupportedError(
                    "draft/target vocab mismatch — speculative verify "
                    "requires a shared tokenizer")
            self._draft_w = draft_runner.weights
            self._draft_cfg = draft_runner.cfg
            self._draft_dtype = draft_runner.compute_dtype
            self._draft_kv_dtype = draft_runner.kv_dtype
            # slot-pool cache for the draft model, positions in lockstep
            # with the target's (admission prefills both; accepted tokens
            # advance both; rejected KV is masked until overwritten)
            self._draft_cache = KVCache.create(
                self._draft_cfg, n_slots, self.seq_len, self._draft_kv_dtype)
        self.ttft_hist = LatencyHistogram()  # submit -> first token
        self.e2e_hist = LatencyHistogram()  # submit -> finish
        self._started = None  # first-step timestamp (serving uptime)

    def _reset_device_state(self):
        """Crash-recovery hook: rebuild the (possibly donated-and-dead)
        cache and per-slot device inputs. Subclasses owning extra state
        (page pools) must override and reset it too."""
        self.cache = self._make_cache()
        if self._draft_cache is not None:
            self._draft_cache = KVCache.create(
                self._draft_cfg, self.n_slots, self.seq_len,
                self._draft_kv_dtype)
        self.pos = np.zeros(self.n_slots, np.int32)
        self.cur_tok = np.zeros(self.n_slots, np.int32)
        self.minp = np.zeros(self.n_slots, np.float32)
        self.rep_pen = np.ones(self.n_slots, np.float32)
        self.freq_pen = np.zeros(self.n_slots, np.float32)
        self.pres_pen = np.zeros(self.n_slots, np.float32)
        self.recent = np.full((self.n_slots, self.REPEAT_WINDOW), -1, np.int32)
        self._bias_dev = None
        self._prefilling = {}

    def _bias(self):
        import jax.numpy as jnp

        if self._bias_dev is None:
            self._bias_dev = jnp.zeros(
                (self.n_slots, self.cfg.vocab_size), jnp.float32
            )
        return self._bias_dev

    def _set_slot_bias(self, slot: int, req: "Request"):
        import jax.numpy as jnp

        if not req.logit_bias and self._bias_dev is None:
            return  # nothing set anywhere yet: keep the zeros row
        b = self._bias()
        row = np.zeros(self.cfg.vocab_size, np.float32)
        for tid, val in req.logit_bias:
            if 0 <= int(tid) < self.cfg.vocab_size:
                row[int(tid)] = float(val)
        self._bias_dev = b.at[slot].set(jnp.asarray(row))

    def _make_cache(self):
        """Cache-construction hook (PagedServingEngine overrides: the slot
        pool's dense n_slots x seq_len allocation must never happen there)."""
        cache = KVCache.create(self.cfg, self.n_slots, self.seq_len,
                               self.kv_dtype, lane_pad=self.kv_lane_pad)
        if self.mesh is not None:
            from ..parallel.sharding import cache_sharding

            cache = jax.device_put(cache, cache_sharding(self.mesh))
        return cache

    # -- admission ----------------------------------------------------------

    def submit(self, req: Request) -> Request:
        """Queue a request (thread-safe). It is admitted to a slot on the
        next step() with a free slot."""
        if not req.prompt_tokens:
            req.prompt_tokens = self.tokenizer.encode(req.prompt, bos=True)
        req.stop = tuple(s for s in req.stop if isinstance(s, str) and s)
        self.requests_submitted += 1
        req._t_submit = time.monotonic()
        self.pending.put(req)
        return req

    def _free_slots(self) -> list[int]:
        return [i for i, r in enumerate(self.slots) if r is None]

    def cancel(self, req: Request):
        """Abort a request (e.g. the HTTP client disconnected): it finishes
        with reason "cancelled" at its next queue pop / prefill chunk /
        delivered token, freeing its slot (and pages) instead of decoding
        to max_tokens for nobody."""
        req.cancelled = True

    def _admit(self):
        free = self._free_slots()
        while free:
            try:
                req = self.pending.get_nowait()
            except queue.Empty:
                break
            if req.cancelled:  # never claimed a slot: close it directly
                req.finish_reason = "cancelled"
                self.requests_completed += 1
                if req._t_submit:
                    self.e2e_hist.observe(time.monotonic() - req._t_submit)
                if req._stream is not None:
                    req._stream.put(None)
                continue
            slot = free.pop(0)
            if self.prefill_chunk is None:
                self._prefill_into(slot, req)
            else:
                self._claim_for_prefill(slot, req)

    def _trim_prompt(self, req: Request) -> list[int]:
        toks = req.prompt_tokens
        limit = self.seq_len - 1
        if len(toks) > limit:
            toks = toks[-limit:]  # keep the tail, like a sliding window
        return toks

    # -- chunked admission (default): prompt forwards in bounded chunks
    #    interleaved with decode ticks, so a long admission never stalls
    #    running requests for more than one chunk's latency ---------------

    def _claim_for_prefill(self, slot: int, req: Request):
        """Claim the slot host-side only; chunks run in later step()s.
        While mid-prefill, pos[slot] == n_filled: the decode tick still
        steps the slot (the batch is the whole pool) and writes garbage KV
        at that position — which the NEXT chunk (whose window starts there)
        or the first real decode token overwrites before any attention can
        read it (attention only reads cols <= the reader's own position)."""
        self.slots[slot] = req
        self._prefilling[slot] = (self._trim_prompt(req), 0)
        self.pos = self.pos.copy()
        self.pos[slot] = 0

    def _prefill_tick(self):
        """Forward ONE chunk of the oldest mid-prefill request."""
        if not self._prefilling:
            return
        slot = next(iter(self._prefilling))
        if self.slots[slot].cancelled:  # client gone mid-admission
            self._finish(slot, "cancelled")
            return
        toks, filled = self._prefilling[slot]
        chunk = toks[filled : filled + self.prefill_chunk]
        logits = self._prefill_chunk_device(slot, chunk, filled)
        filled += len(chunk)
        self.pos = self.pos.copy()
        self.pos[slot] = filled
        if filled < len(toks):
            self._prefilling[slot] = (toks, filled)
            return
        del self._prefilling[slot]
        self._prefill_complete(slot)
        req = self.slots[slot]
        self._key, sub = jax.random.split(self._key)
        rec = np.full((1, self.REPEAT_WINDOW), -1, np.int32)
        tail = self._trim_prompt(req)[-self.REPEAT_WINDOW:]
        rec[0, -len(tail):] = tail
        self._set_slot_bias(slot, req)
        first, first_lp = sample_batch(
            logits[:, len(chunk) - 1],
            sub,
            jnp.asarray([req.temperature], jnp.float32),
            jnp.asarray([req.topp], jnp.float32),
            minp=jnp.asarray([req.minp], jnp.float32),
            recent_tokens=jnp.asarray(rec),
            repetition_penalty=jnp.asarray([req.repetition_penalty], jnp.float32),
            frequency_penalty=jnp.asarray([req.frequency_penalty], jnp.float32),
            presence_penalty=jnp.asarray([req.presence_penalty], jnp.float32),
            logit_bias=self._bias()[slot][None] if req.logit_bias else None,
            with_logprobs=True,
        )
        self.temp = self.temp.copy()
        self.topp = self.topp.copy()
        self.minp = self.minp.copy()
        self.rep_pen = self.rep_pen.copy()
        self.recent = self.recent.copy()
        self.temp[slot] = req.temperature
        self.topp[slot] = req.topp
        self.minp[slot] = req.minp
        self.rep_pen[slot] = req.repetition_penalty
        self.freq_pen = self.freq_pen.copy()
        self.pres_pen = self.pres_pen.copy()
        self.freq_pen[slot] = req.frequency_penalty
        self.pres_pen[slot] = req.presence_penalty
        self.recent[slot] = rec[0]
        self._deliver_first(slot, req, first, first_lp)

    def _prefill_chunk_device(self, slot: int, chunk: list[int], filled: int):
        """Forward `chunk` into the slot's cache at position `filled`;
        returns logits (1, t_pad, V). Hook for PagedServingEngine."""
        t_pad = min(_bucket(len(chunk)), self.seq_len - filled)
        padded = np.zeros((1, t_pad), np.int32)
        padded[0, : len(chunk)] = chunk
        logits, self.cache = _prefill_slot(
            self.weights,
            self.cache,
            jnp.asarray(padded),
            jnp.int32(slot),
            jnp.int32(filled),
            self.cfg,
            self.compute_dtype,
        )
        if self._draft_cache is not None:  # two-model speculation: the
            # draft model must hold the prompt's KV too
            self._draft_prefill(slot, chunk, filled)
        return logits

    def _draft_prefill(self, slot: int, chunk: list[int], filled: int):
        """Write `chunk`'s KV into the draft model's dense slot cache at
        position `filled` — two-model speculation keeps the draft cache in
        positional lockstep with the target's (the paged engine calls this
        too: the draft rides a plain dense slot cache either way)."""
        t_pad = min(_bucket(len(chunk)), self.seq_len - filled)
        padded = np.zeros((1, t_pad), np.int32)
        padded[0, : len(chunk)] = chunk
        _, self._draft_cache = _prefill_slot(
            self._draft_w, self._draft_cache, jnp.asarray(padded),
            jnp.int32(slot), jnp.int32(filled),
            self._draft_cfg, self._draft_dtype,
        )

    def _prefill_complete(self, slot: int):
        """Called once a slot's whole prompt is in cache (before its first
        sample). Hook for PagedServingEngine's page scatter."""

    # -- legacy synchronous admission (prefill_chunk=None) -----------------

    def _prefill_into(self, slot: int, req: Request):
        toks = self._trim_prompt(req)
        # clamp like Runner._forward_chunk: with a non-power-of-two seq_len
        # the bucket can exceed the cache, and forward's dynamic_update_slice
        # would then fail at trace time (update larger than operand)
        t_pad = min(_bucket(len(toks)), self.seq_len)
        padded = np.zeros((1, t_pad), np.int32)
        padded[0, : len(toks)] = toks
        # claim the slot BEFORE device work: if prefill raises, run_forever's
        # recovery finds the request in self.slots and closes its stream
        self.slots[slot] = req
        logits, self.cache = _prefill_slot(
            self.weights,
            self.cache,
            jnp.asarray(padded),
            jnp.int32(slot),
            jnp.int32(0),
            self.cfg,
            self.compute_dtype,
        )
        if self._draft_cache is not None:
            self._draft_prefill(slot, toks, 0)
        self._key, sub = jax.random.split(self._key)
        rec = np.full((1, self.REPEAT_WINDOW), -1, np.int32)
        tail = toks[-self.REPEAT_WINDOW:]
        rec[0, -len(tail):] = tail
        self._set_slot_bias(slot, req)
        first, first_lp = sample_batch(
            logits[:, len(toks) - 1],
            sub,
            jnp.asarray([req.temperature], jnp.float32),
            jnp.asarray([req.topp], jnp.float32),
            minp=jnp.asarray([req.minp], jnp.float32),
            recent_tokens=jnp.asarray(rec),
            repetition_penalty=jnp.asarray([req.repetition_penalty], jnp.float32),
            frequency_penalty=jnp.asarray([req.frequency_penalty], jnp.float32),
            presence_penalty=jnp.asarray([req.presence_penalty], jnp.float32),
            logit_bias=self._bias()[slot][None] if req.logit_bias else None,
            with_logprobs=True,
        )
        self.pos = self.pos.copy()
        self.cur_tok = self.cur_tok.copy()
        self.temp = self.temp.copy()
        self.topp = self.topp.copy()
        self.minp = self.minp.copy()
        self.rep_pen = self.rep_pen.copy()
        self.recent = self.recent.copy()
        self.pos[slot] = len(toks)
        self.temp[slot] = req.temperature
        self.topp[slot] = req.topp
        self.minp[slot] = req.minp
        self.rep_pen[slot] = req.repetition_penalty
        self.freq_pen = self.freq_pen.copy()
        self.pres_pen = self.pres_pen.copy()
        self.freq_pen[slot] = req.frequency_penalty
        self.pres_pen[slot] = req.presence_penalty
        self.recent[slot] = rec[0]
        self._deliver_first(slot, req, first, first_lp)

    # -- the tick -----------------------------------------------------------

    def step(self, multi: int = 1) -> int:
        """Admit pending requests, run one prefill chunk (if any request is
        mid-admission), run `multi` fused decode ticks. Returns the number
        of occupied slots afterwards."""
        self._admit()
        self._prefill_tick()
        active = [
            i for i, r in enumerate(self.slots)
            if r is not None and i not in self._prefilling
        ]
        if not active:
            return sum(r is not None for r in self.slots)
        snapshot = list(self.slots)  # which request owned each slot at scan time
        pos0 = self.pos  # positions at scan start (per-token length checks)
        # cap the scan so no active slot's in-scan writes pass seq_len-1
        # (an uncapped scan would scatter into clamped/last positions,
        # corrupting live KV mid-scan — the tokens LOOK discarded host-side
        # but the cache damage would be real)
        # cap over ALL slots, not just active: a mid-prefill slot also gets
        # multi KV writes at its filled offset; past seq_len they'd CLAMP
        # and overwrite its real prompt KV backwards
        pmax = int(self.pos.max())
        multi = max(1, min(multi, self.seq_len - 1 - pmax))

        if self.speculative:
            n = None
            if multi > 1 and self.spec_fused:  # idle: fuse rounds per dispatch
                n = self._spec_scan_tick(active, snapshot, pos0, pmax, multi)
            if n is None:
                n = self._spec_tick(active, snapshot, pos0, pmax)
            if n is not None:
                return n

        self._key, sub = jax.random.split(self._key)
        win = min(_bucket(int(self.pos.max()) + multi, 128), self.seq_len)
        if multi == 1:
            nxt, lp, self.cache = _decode_step(
                self.weights, self.cache,
                jnp.asarray(self.cur_tok), jnp.asarray(self.pos), sub,
                jnp.asarray(self.temp), jnp.asarray(self.topp),
                jnp.asarray(self.minp), jnp.asarray(self.recent),
                jnp.asarray(self.rep_pen), jnp.asarray(self.freq_pen),
                jnp.asarray(self.pres_pen), self._bias(),
                self.cfg, self.compute_dtype, attn_window=win,
            )
            toks = np.asarray(nxt)[:, None]
            lp = tuple(a[:, None] for a in lp)
        else:
            toks, lp, self.cache = _decode_scan(
                self.weights, self.cache,
                jnp.asarray(self.cur_tok), jnp.asarray(self.pos), sub,
                jnp.asarray(self.temp), jnp.asarray(self.topp),
                jnp.asarray(self.minp), jnp.asarray(self.recent),
                jnp.asarray(self.rep_pen), jnp.asarray(self.freq_pen),
                jnp.asarray(self.pres_pen), self._bias(),
                multi, self.cfg, self.compute_dtype, attn_window=win,
            )
            toks = np.asarray(toks)
        if self._draft_cache is not None:
            # teacher-forced catch-up: the plain tick's emitted tokens
            # must reach the draft cache too (review finding: without
            # this, any fallback tick leaves a permanent KV gap that
            # degrades draft acceptance for the rest of the request)
            inputs = np.concatenate([self.cur_tok[:, None], toks[:, :-1]],
                                    axis=1)
            self._draft_cache = _draft_sync(
                self._draft_w, self._draft_cache, jnp.asarray(inputs),
                jnp.asarray(self.pos), self._draft_cfg, self._draft_dtype,
                attn_window=win,
            )
        # fetch the logprob arrays only when a live request asked for them
        # (computing them on device is cheap; each np.asarray fetch is a
        # round trip on this link, so default serving pays nothing extra)
        if any(snapshot[i] is not None and snapshot[i].logprobs is not None
               for i in active):
            tok_lp, top_lp, top_id = (np.asarray(a) for a in lp)
        else:
            tok_lp = top_lp = top_id = None
        active_set = set(active)
        self.pos = self.pos + np.asarray(
            [multi if i in active_set else 0 for i in range(self.n_slots)],
            np.int32,
        )
        self.steps += multi
        self.tokens_generated += len(active) * multi
        if self._started is None:
            self._started = time.monotonic()
        for j in range(multi):
            for i in active:
                if self.slots[i] is not snapshot[i]:
                    continue  # finished (or replaced) earlier in this tick
                self._deliver(
                    i, int(toks[i, j]), pos_after=int(pos0[i]) + j + 1,
                    logprob=None if tok_lp is None else float(tok_lp[i, j]),
                    top=None if top_id is None else (top_id[i, j], top_lp[i, j]),
                )
        return sum(r is not None for r in self.slots)

    @staticmethod
    def _spec_eligible(r: Request) -> bool:
        """Can this request's tokens be speculated exactly? Requires
        argmax-only decoding: temperature 0, no penalties/bias (they alter
        the chosen token, which argmax verify can't reproduce) and no
        logprobs (accepted positions have no sampled-logprob record)."""
        return (r.temperature == 0.0 and not r.logit_bias
                and r.logprobs is None and r.repetition_penalty == 1.0
                and not r.frequency_penalty and not r.presence_penalty)

    def _spec_tick(self, active, snapshot, pos0, pmax) -> int | None:
        """One speculative verify tick (see _spec_verify_step). Returns the
        occupied-slot count, or None when ineligible (NO active slot can
        speculate, or the scan would cross the seq_len edge) — the caller
        then runs the plain tick.

        Eligibility is PER SLOT (VERDICT r3 #4): greedy slots accept their
        drafted prefix + bonus token; sampled/penalized/logprobs slots take
        the verify dispatch's position-0 sampled token (computed in-device
        with their full sampling params — exactly a plain tick's step), so
        a production mix of greedy and sampled traffic still speculates."""
        K = self.speculative
        # pmax covers ALL slots (see step()): the verify writes K+1
        # positions for idle and mid-prefill slots too
        if pmax + K + 1 > self.seq_len - 1:
            return None
        spec_slots = [i for i in active if self._spec_eligible(snapshot[i])]
        if not spec_slots:
            return None  # nothing can speculate: a plain tick is cheaper

        if not self._spec_prepare(active, K):
            return None  # subclass veto (paged: page pre-allocation)

        tokens_in = np.zeros((self.n_slots, K + 1), np.int32)
        tokens_in[:, 0] = self.cur_tok
        drafts = self._make_drafts(spec_slots, snapshot, K)
        for i in spec_slots:
            tokens_in[i, 1:] = drafts[i]
        self._key, sub = jax.random.split(self._key)
        out, nxt, lp = self._spec_verify(tokens_in, sub)
        out = np.asarray(out)  # (n_slots, K+1)
        nxt = np.asarray(nxt)  # (n_slots,) position-0 sampled tokens

        spec_set = set(spec_slots)
        # accept the longest drafted prefix the model agrees with, plus
        # the bonus token (out[m]) — standard greedy-exact acceptance.
        # Non-eligible slots advance exactly one (their sampled token).
        acc = {}
        for i in active:
            m = 0
            if i in spec_set:
                while m < K and tokens_in[i, m + 1] == out[i, m]:
                    m += 1
            acc[i] = m
        # fetch logprobs only when a live non-eligible slot asked (same
        # lazy-fetch policy as the plain tick)
        if any(snapshot[i] is not None and snapshot[i].logprobs is not None
               for i in active if i not in spec_set):
            tok_lp, top_lp, top_id = (np.asarray(a) for a in lp)
        else:
            tok_lp = top_lp = top_id = None
        self.pos = self.pos + np.asarray(
            [acc.get(i, -1) + 1 for i in range(self.n_slots)], np.int32,
        )
        self.steps += 1
        self.spec_ticks += 1
        if self._started is None:
            self._started = time.monotonic()
        for j in range(K + 1):
            for i in active:
                if j > acc[i] or self.slots[i] is not snapshot[i]:
                    continue  # rejected tail / finished earlier this tick
                # count only tokens actually delivered (a slot finishing
                # mid-tick drops its remaining accepted tokens)
                self.tokens_generated += 1
                if i in spec_set:
                    self.spec_tokens += 1
                    self._deliver(i, int(out[i, j]),
                                  pos_after=int(pos0[i]) + j + 1)
                else:  # j == 0 only (acc == 0): the sampled token
                    self._deliver(
                        i, int(nxt[i]), pos_after=int(pos0[i]) + 1,
                        logprob=None if tok_lp is None else float(tok_lp[i]),
                        top=None if top_id is None else (top_id[i], top_lp[i]),
                    )
        return sum(r is not None for r in self.slots)

    def _spec_scan_tick(self, active, snapshot, pos0, pmax,
                        multi: int) -> int | None:
        """Fused multi-round speculative tick (_spec_scan): when admission
        is idle, up to `multi` draft+verify rounds run in ONE dispatch with
        ON-DEVICE drafting — the single-tick path pays a dispatch round
        trip per K+1 tokens, which on a high-RTT link can cost more than
        speculation wins. Returns the occupied-slot count, or None when
        not applicable (too close to the seq_len edge for >=2 rounds, no
        eligible slot, subclass without a fused path) — the caller then
        tries the single-dispatch spec tick."""
        K = self.speculative
        rounds = min(multi, (self.seq_len - 1 - pmax) // (K + 1))
        # every round emits >=1 token/slot, so no slot needs more rounds
        # than its remaining budget — cap to curb wasted tail rounds
        rem = max(snapshot[i].max_tokens - len(snapshot[i].output_tokens)
                  for i in active)
        rounds = min(rounds, max(rem, 1))
        if rounds < 2:
            return None
        spec_slots = [i for i in active if self._spec_eligible(snapshot[i])]
        if not spec_slots:
            return None
        if not self._spec_prepare(active, rounds * (K + 1)):
            return None
        B = self.n_slots
        hist = np.zeros((B, self.seq_len), np.int32)
        for i in active:
            r = snapshot[i]
            consumed = list(self._trim_prompt(r)) + r.output_tokens[:-1]
            consumed = consumed[: int(pos0[i])]
            hist[i, : len(consumed)] = consumed
        eligible = np.zeros(B, bool)
        eligible[spec_slots] = True
        active_m = np.zeros(B, bool)
        active_m[active] = True
        outs, counts, lp = self._run_spec_scan(hist, active_m, eligible,
                                               rounds, K, pmax)
        outs = np.asarray(outs)  # (R, B, K+1)
        counts = np.asarray(counts)  # (R, B)
        spec_set = set(spec_slots)
        if any(snapshot[i] is not None and snapshot[i].logprobs is not None
               for i in active if i not in spec_set):
            tok_lp, top_lp, top_id = (np.asarray(a) for a in lp)
        else:
            tok_lp = top_lp = top_id = None
        self.pos = self.pos + counts.sum(axis=0).astype(np.int32)
        self.steps += rounds
        self.spec_ticks += rounds
        if self._started is None:
            self._started = time.monotonic()
        off = dict.fromkeys(active, 0)
        for r in range(rounds):
            for i in active:
                c = int(counts[r, i])
                for j in range(c):
                    if self.slots[i] is not snapshot[i]:
                        break  # finished earlier this scan
                    self.tokens_generated += 1
                    if i in spec_set:
                        self.spec_tokens += 1
                        self._deliver(i, int(outs[r, i, j]),
                                      pos_after=int(pos0[i]) + off[i] + j + 1)
                    else:  # c == 1: the round's pos-0 sampled token
                        self._deliver(
                            i, int(outs[r, i, 0]),
                            pos_after=int(pos0[i]) + off[i] + 1,
                            logprob=(None if tok_lp is None
                                     else float(tok_lp[r, i])),
                            top=(None if top_id is None
                                 else (top_id[r, i], top_lp[r, i])),
                        )
                off[i] += c
        return sum(r is not None for r in self.slots)

    def _spec_prepare(self, active, K: int) -> bool:
        """Subclass hook run before a speculative tick (paged: allocate
        every page positions pos..pos+K can touch). True = proceed."""
        return True

    def _make_drafts(self, spec_slots, snapshot, K: int) -> np.ndarray:
        """(n_slots, K) drafted tokens: the small draft model's greedy
        chain when one is attached, else host-side prompt lookup (only
        speculation-eligible slots need drafts; the rest stay zeros)."""
        if self._draft_w is not None:
            win = min(_bucket(int(self.pos.max()) + K + 1, 128), self.seq_len)
            toks, self._draft_cache = _draft_scan(
                self._draft_w, self._draft_cache,
                jnp.asarray(self.cur_tok), jnp.asarray(self.pos),
                K + 1, self._draft_cfg, self._draft_dtype, attn_window=win,
            )
            return np.asarray(toks)[:, :K]
        drafts = np.zeros((self.n_slots, K), np.int32)
        for i in spec_slots:
            r = snapshot[i]
            drafts[i] = _lookup_draft(
                np.concatenate([np.asarray(r.prompt_tokens, np.int32),
                                np.asarray(r.output_tokens, np.int32)])
                if r.output_tokens else r.prompt_tokens, K)
        return drafts

    def _run_spec_scan(self, hist, active_m, eligible, rounds: int,
                       K: int, pmax: int):
        """Device half of the fused multi-round tick: run `rounds`
        draft+verify rounds in one dispatch over the dense slot cache.
        Subclasses override to run the scan through their own cache
        (PagedServingEngine writes through the block table). Returns
        (outs (R, B, K+1), counts (R, B), lp) and updates self.cache
        (+ the draft cache when two-model)."""
        self._key, sub = jax.random.split(self._key)
        win = min(_bucket(pmax + rounds * (K + 1), 128), self.seq_len)
        two = self._draft_w is not None
        outs, counts, lp, self.cache, dcache = _spec_scan(
            self.weights, self.cache, jnp.asarray(hist),
            jnp.asarray(self.cur_tok), jnp.asarray(self.pos),
            jnp.asarray(active_m), jnp.asarray(eligible), sub,
            jnp.asarray(self.temp), jnp.asarray(self.topp),
            jnp.asarray(self.minp), jnp.asarray(self.recent),
            jnp.asarray(self.rep_pen), jnp.asarray(self.freq_pen),
            jnp.asarray(self.pres_pen), self._bias(),
            self._draft_w, self._draft_cache,
            rounds, K, self.cfg, self.compute_dtype,
            dcfg=self._draft_cfg, two_model=two, attn_window=win,
        )
        if two:
            self._draft_cache = dcache
        return outs, counts, lp

    def _spec_verify(self, tokens_in: np.ndarray, key):
        """Verify forward for the speculative tick: (n_slots, K+1) tokens
        -> ((n_slots, K+1) greedy ids, (n_slots,) pos-0 sampled tokens,
        pos-0 logprob arrays). Subclass hook (paged verifies through the
        page pool)."""
        win = min(_bucket(int(self.pos.max()) + tokens_in.shape[1], 128),
                  self.seq_len)
        out, nxt, lp, self.cache = _spec_verify_step(
            self.weights, self.cache, jnp.asarray(tokens_in),
            jnp.asarray(self.pos), key,
            jnp.asarray(self.temp), jnp.asarray(self.topp),
            jnp.asarray(self.minp), jnp.asarray(self.recent),
            jnp.asarray(self.rep_pen), jnp.asarray(self.freq_pen),
            jnp.asarray(self.pres_pen), self._bias(),
            self.cfg, self.compute_dtype, attn_window=win,
        )
        return out, nxt, lp

    def _deliver_first(self, slot: int, req: Request, first, first_lp):
        """Deliver a slot's first sampled token (from prefill logits),
        fetching its logprobs only when the request asked."""
        if req.logprobs is not None:
            self._deliver(
                slot, int(first[0]),
                logprob=float(np.asarray(first_lp[0])[0]),
                top=(np.asarray(first_lp[2])[0], np.asarray(first_lp[1])[0]),
            )
        else:
            self._deliver(slot, int(first[0]))

    def _deliver(self, slot: int, token: int, pos_after: int | None = None,
                 logprob: float | None = None, top=None):
        """Record a sampled token for slot; finish/free on EOS/limits.

        `pos_after`: the slot's cache position after this token (defaults to
        the current host position — correct for prefill/single ticks). The
        multi-tick delivery loop passes the PER-TOKEN position so output at
        the seq_len edge doesn't depend on the tick_tokens setting.
        `logprob`/`top` ((ids, logprobs) arrays): recorded aligned with
        output_tokens when the request asked for logprobs."""
        req = self.slots[slot]
        if req.cancelled:
            self._finish(slot, "cancelled")
            return
        if not req.output_tokens and req._t_submit:
            # first token ever for this request (preemption-safe: requeued
            # requests keep their output and don't re-observe)
            req._t_first = time.monotonic()
            self.ttft_hist.observe(req._t_first - req._t_submit)
        eos = self.tokenizer.eos_token if self.tokenizer else -1
        stop = req.stop_token_ids
        if token == eos or token in stop:
            self._finish(slot, "stop")
            return
        req.output_tokens.append(token)
        if req.logprobs is not None and logprob is not None:
            req.output_logprobs.append(logprob)
            if req.logprobs > 0 and top is not None:
                ids, lps = top
                req.output_top_logprobs.append(
                    [(int(t), float(l))
                     for t, l in zip(ids[: req.logprobs], lps[: req.logprobs])]
                )
        if (req._stream is not None or req.stop) and self.tokenizer:
            piece = self.tokenizer.decode(token, req._utf8)
            if req.stop and piece:
                # accumulate decoded text; stop strings may span token
                # boundaries and sit mid-piece. On a match, output_text is
                # trimmed AT the stop (OpenAI semantics) even though
                # output_tokens necessarily includes the matching token.
                req.output_text = (req.output_text or "") + piece
                hits = [req.output_text.find(s) for s in req.stop]
                hits = [h for h in hits if h >= 0]
                if hits:
                    req.output_text = req.output_text[: min(hits)]
                    self._finish(slot, "stop")
                    return
            if req._stream is not None and piece:
                req._stream.put(piece)
        self.cur_tok = self.cur_tok.copy()
        self.cur_tok[slot] = token
        self.recent = self.recent.copy()
        self.recent[slot] = np.concatenate([self.recent[slot][1:], [token]])
        if pos_after is None:
            pos_after = int(self.pos[slot])
        if len(req.output_tokens) >= req.max_tokens:
            self._finish(slot, "length")
        elif pos_after >= self.seq_len - 1:
            self._finish(slot, "length")

    def _finish(self, slot: int, reason: str):
        req = self.slots[slot]
        req.finish_reason = reason
        self.requests_completed += 1
        req._t_finish = time.monotonic()
        if req._t_submit:
            self.e2e_hist.observe(req._t_finish - req._t_submit)
        if req._stream is not None:
            req._stream.put(None)  # sentinel: stream closed
        self._clear_slot(slot)

    def _clear_slot(self, slot: int):
        """Reset a slot's host-side state without closing its request
        (shared by _finish and the paged engine's preemption path)."""
        self._prefilling.pop(slot, None)
        self.slots[slot] = None
        self.pos = self.pos.copy()
        self.pos[slot] = 0
        self.cur_tok = self.cur_tok.copy()
        self.cur_tok[slot] = 0
        self.temp = self.temp.copy()
        self.temp[slot] = 0.0
        self.topp = self.topp.copy()
        self.topp[slot] = 1.0
        self.minp = self.minp.copy()
        self.minp[slot] = 0.0
        self.rep_pen = self.rep_pen.copy()
        self.rep_pen[slot] = 1.0
        if self._bias_dev is not None:
            self._bias_dev = self._bias_dev.at[slot].set(0.0)
        self.freq_pen = self.freq_pen.copy()
        self.freq_pen[slot] = 0.0
        self.pres_pen = self.pres_pen.copy()
        self.pres_pen[slot] = 0.0
        self.recent = self.recent.copy()
        self.recent[slot] = -1

    # -- convenience drivers --------------------------------------------------

    def drain(self, max_steps: int | None = None):
        """Step until every queued + active request is finished."""
        n = 0
        while (
            any(self.slots) or not self.pending.empty()
        ) and (max_steps is None or n < max_steps):
            self.step()
            n += 1

    def generate(self, prompts: list[str], **kw) -> list[str]:
        """Batch API: submit all prompts, drain, return decoded outputs."""
        reqs = [self.submit(Request(prompt=p, **kw)) for p in prompts]
        self.drain()
        outs = []
        for r in reqs:
            if r.output_text is not None:
                outs.append(r.output_text)
                continue
            buf = Utf8Buf()
            outs.append("".join(self.tokenizer.decode(t, buf) for t in r.output_tokens))
        return outs

    def run_forever(self, idle_sleep: float = 0.005):
        """Engine loop for a serving thread; `enqueue` from other threads.

        A failing step must not kill the loop (handler threads block on
        their stream queues forever if it dies). Recovery: every in-flight
        request is failed with reason "error" and its stream closed (one
        compiled step advances all slots, so blame can't be attributed to
        one), the possibly-donated-and-dead KV cache is rebuilt, and the
        loop backs off before continuing."""
        import time
        import traceback

        while not self._stop.is_set():
            try:
                idle_admission = self.pending.empty() and not self._prefilling
                multi = self.tick_tokens if idle_admission else 1
                busy = self.step(multi)
            except Exception:
                traceback.print_exc()
                for i, r in enumerate(self.slots):
                    if r is not None:
                        self._finish(i, "error")
                # the failed step may have consumed (donated) the cache
                # buffer before dying — rebuild device state from scratch
                self._reset_device_state()
                time.sleep(idle_sleep)
                continue
            if busy == 0 and self.pending.empty():
                time.sleep(idle_sleep)

    def enqueue_streaming(self, req: Request) -> "queue.SimpleQueue[str | None]":
        """Submit with a live text stream (None sentinel terminates)."""
        req._stream = queue.SimpleQueue()
        self.submit(req)
        return req._stream

    def shutdown(self):
        self._stop.set()
