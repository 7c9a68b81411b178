"""Prompt-lookup speculative decoding, drafted and verified ON device.

Single-stream decode is weight-bandwidth-bound: one step streams every
weight byte to produce ONE token (BASELINE.md decode-gap analysis). A
verify step over `draft+1` tokens streams the same weight bytes — the
extra rows ride the already-paid HBM traffic — so every accepted draft
token is nearly free. The reference has no speculative path (it decodes
strictly one token per forward, llama2.rs:141-172); this is a
beyond-parity feature in the vLLM/TGI "prompt lookup / n-gram" family:
no draft model, drafts come from the sequence's own history.

TPU-shaped design decisions:
- The draft → verify → accept loop runs entirely inside one jit
  (`lax.scan` over rounds). On this environment's high-RTT link a
  host-driven draft loop would pay a dispatch round trip per round —
  the same wall that motivates the fused decode_loop.
- Drafting is an O(S) vector match over a fixed-size on-device history
  buffer (no data-dependent shapes): find the most recent earlier
  occurrence of the current `match_len`-token suffix, propose the
  `draft` tokens that followed it.
- Greedy-exact: acceptance compares the drafted token against the
  verify pass's own argmax, so the emitted stream is byte-identical to
  plain greedy decode (pinned by test). Temperature sampling falls back
  to the normal path (rejection-sampling speculation is future work).

Cache/history hygiene across partial accepts: a verify step writes KV
for all draft+1 positions, and the history write covers pos+1..pos+
draft+1. Entries above the accepted frontier are speculative junk, but
(a) attention masks positions ≥ the current pos, and (b) each round
rewrites pos+1.. from its own accepted frontier, so any position is
overwritten with the true token by the round whose accept advances past
it — junk is never read as valid history or attended as valid cache.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.forward import KVCache, forward


@partial(
    jax.jit,
    static_argnames=("rounds", "draft", "match_len", "cfg", "compute_dtype",
                     "attn_window"),
    donate_argnames=("cache",),
)
def speculative_loop(
    weights,
    cache: KVCache,
    hist,  # (S,) int32 — hist[i] = token consumed at position i (i < pos)
    token,  # () int32 — token to consume at `pos` (last sampled)
    pos,  # () int32 — current cache length
    rounds: int,
    draft: int,
    cfg,
    compute_dtype=jnp.float32,
    match_len: int = 2,
    attn_window: int | None = None,  # static; must cover pos + rounds*(draft+1)
):
    """Run `rounds` draft+verify rounds on device (B=1, greedy).

    Returns (outs (rounds, draft+1), counts (rounds,), cache, hist,
    token, pos). Round r emitted outs[r, :counts[r]]; the caller stops at
    EOS host-side and rolls `pos` back exactly like the ticked loop.
    """
    S = hist.shape[0]
    idx = jnp.arange(S, dtype=jnp.int32)

    def draft_tokens(hist, token, pos):
        """Most-recent-match prompt lookup: find the latest j < pos where
        hist[j-match_len+1..j] equals the current suffix (which ends with
        `token` at `pos`), and propose hist[j+1..j+draft]."""
        h = hist.at[pos].set(token)  # suffix includes the current token
        # match[j] = suffix ends at position j (j = match_len-1 .. S-1)
        match = jnp.ones(S, dtype=bool)
        for off in range(match_len):
            # compare hist[j-off] to suffix element at -1-off
            suffix_tok = h[pos - off]
            shifted = jnp.roll(h, off)  # shifted[j] = h[j-off] (j >= off)
            match = match & (shifted == suffix_tok) & (idx >= off)
        # only matches fully inside consumed history, excluding the
        # current suffix itself
        match = match & (idx < pos)
        j = jnp.max(jnp.where(match, idx, -1))  # -1: no match
        start = jnp.where(j < 0, pos, j + 1)  # fallback: draft repeats tail
        return jax.lax.dynamic_slice(h, (start,), (draft,)), h

    def body(carry, _):
        cache, hist, token, pos = carry
        dr, hist = draft_tokens(hist, token, pos)
        tok_seq = jnp.concatenate([token[None], dr])  # (draft+1,)
        logits, cache = forward(
            weights, cache, tok_seq[None, :], pos[None], cfg, compute_dtype,
            attn_window=attn_window,
        )
        g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (draft+1,)
        # n_acc = leading drafted tokens that match the model's own greedy
        ok = dr == g[:draft]
        n_acc = jnp.argmin(jnp.concatenate([ok, jnp.zeros(1, bool)]))
        # emitted this round: g[0..n_acc] — n_acc accepted drafts plus the
        # model's correction/extension token (standard bonus token)
        count = n_acc + 1
        # history: tokens consumed at pos+1.. are exactly the emitted ones;
        # entries past the frontier are speculative (see module docstring)
        hist = jax.lax.dynamic_update_slice(hist, g, (pos + 1,))
        token = g[n_acc]
        pos = pos + count
        return (cache, hist, token, pos), (g, count)

    (cache, hist, token, pos), (outs, counts) = jax.lax.scan(
        body, (cache, hist, token, pos), length=rounds
    )
    return outs, counts, cache, hist, token, pos


@partial(
    jax.jit,
    static_argnames=("rounds", "draft", "cfg", "dcfg", "compute_dtype",
                     "attn_window"),
    donate_argnames=("cache", "dcache"),
)
def draft_model_loop(
    weights,
    cache: KVCache,
    dweights,
    dcache: KVCache,
    token,  # () int32 — token to consume at `pos` (last sampled)
    pos,  # () int32 — current cache length (both models)
    rounds: int,
    draft: int,
    cfg,
    dcfg,
    compute_dtype=jnp.float32,
    attn_window: int | None = None,
):
    """Two-model speculative decoding, fully on device (B=1, greedy).

    A small DRAFT model autoregressively proposes `draft` tokens; the
    target verifies all draft+1 in one forward (streaming its weight
    bytes once) and accepts the longest prefix matching its own argmax,
    plus the standard bonus token. Emission is therefore byte-identical
    to plain greedy decode of the target — the draft model can only
    change SPEED, never output (pinned by test).

    Like the prompt-lookup loop above, all `rounds` draft+verify+accept
    rounds run inside one jit (host dispatch per round would pay the
    high-RTT round trip the fused loops exist to hide).

    Cache hygiene under partial accepts needs no correction pass:
    - target cache: verify writes draft+1 positions; entries above the
      accepted frontier are junk but masked (module docstring argument).
    - draft cache: round r writes positions pos..pos+draft-1 while
      drafting; entries above the new frontier pos' are junk, but round
      r+1's draft scan overwrites position p before any step attends it
      (step at p writes p, attends <= p), inductively from pos'.
    - a STALE draft cache (e.g. after a fallback segment) only lowers
      acceptance: wrong drafts are rejected by verify, and the bonus
      token is always the target's own greedy choice.
    """

    def body(carry, _):
        cache, dcache, token, pos = carry

        def dstep(dc, _):
            dcache, t, p = dc
            dlogits, dcache = forward(
                dweights, dcache, t[None, None], p[None], dcfg, compute_dtype,
                attn_window=attn_window,
            )
            nt = jnp.argmax(dlogits[0, 0]).astype(jnp.int32)
            return (dcache, nt, p + 1), nt

        # draft+1 steps (not draft): on a full accept pos advances by
        # draft+1, and without the extra step the draft cache would hold
        # a permanent one-position hole at the accepted frontier — every
        # later round would draft across it and acceptance degrades (the
        # serving engines' _draft_scan runs K+1 steps for the same reason)
        (dcache, _, _), dr = jax.lax.scan(
            dstep, (dcache, token, pos), length=draft + 1
        )
        dr = dr[:draft]
        tok_seq = jnp.concatenate([token[None], dr])  # (draft+1,)
        logits, cache = forward(
            weights, cache, tok_seq[None, :], pos[None], cfg, compute_dtype,
            attn_window=attn_window,
        )
        g = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (draft+1,)
        ok = dr == g[:draft]
        n_acc = jnp.argmin(jnp.concatenate([ok, jnp.zeros(1, bool)]))
        count = n_acc + 1  # accepted drafts + bonus/correction token
        token = g[n_acc]
        pos = pos + count
        return (cache, dcache, token, pos), (g, count)

    (cache, dcache, token, pos), (outs, counts) = jax.lax.scan(
        body, (cache, dcache, token, pos), length=rounds
    )
    return outs, counts, cache, dcache, token, pos
