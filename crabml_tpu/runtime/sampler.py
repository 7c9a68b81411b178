"""On-device sampling: greedy argmax / temperature softmax + top-p nucleus.

Functional analogue of Llama2Sampler (crabml-llama2/src/sampler.rs:27-116),
running on TPU so logits never cross to the host. Divergences (documented):
- exact exp, not the reference's f16 LUT (softmax.rs:44-52);
- top-p truncates the *descending* sorted distribution (llama2.c semantics);
  the reference sorts ascending (sampler.rs:85 — a bug inherited upstream).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class Sampler:
    temperature: float = 0.0
    topp: float = 0.9

    def sample(self, logits, key):
        """logits: (B, V) f32; key: PRNG key -> (B,) int32 tokens."""
        if self.temperature == 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return _sample_topp(logits, key, self.temperature, self.topp)


def nucleus_filter(probs, topp):
    """Zero out everything outside the smallest prefix of the descending
    sort with cumulative mass > topp. `topp` may be scalar or (B,)."""
    topp = jnp.asarray(topp, jnp.float32)
    t2 = topp if topp.ndim else topp[None]
    sorted_probs = jnp.sort(probs, axis=-1)[:, ::-1]
    csum = jnp.cumsum(sorted_probs, axis=-1)
    keep = (csum - sorted_probs) < t2[:, None]
    cutoff = jnp.where(keep, sorted_probs, 1.0).min(axis=-1, keepdims=True)
    use = ((t2 > 0.0) & (t2 < 1.0))[:, None]
    return jnp.where(~use | (probs >= cutoff), probs, 0.0)


def min_p_filter(probs, minp):
    """llama.cpp-style min-p: drop tokens whose probability is below
    minp * max_prob. `minp` scalar or (B,); 0 disables."""
    minp = jnp.asarray(minp, jnp.float32)
    m2 = minp if minp.ndim else minp[None]
    cutoff = probs.max(axis=-1, keepdims=True) * m2[:, None]
    use = (m2 > 0.0)[:, None]
    return jnp.where(~use | (probs >= cutoff), probs, 0.0)


def apply_repetition_penalty(logits, recent_tokens, penalty):
    """HF/llama.cpp repetition penalty over `recent_tokens` (B, W) int32
    (pad with -1): seen-token logits divide by `penalty` when positive,
    multiply when negative. `penalty` scalar or (B,); 1.0 disables."""
    penalty = jnp.asarray(penalty, jnp.float32)
    p2 = (penalty if penalty.ndim else penalty[None])[:, None]
    V = logits.shape[-1]
    tok = jnp.where(recent_tokens >= 0, recent_tokens, 0)
    seen = jnp.zeros(logits.shape, jnp.bool_)
    # max-scatter: -1 padding (mapped to index 0) must never CLEAR a
    # genuine sighting of token 0 written by another window entry
    seen = jax.vmap(lambda s, t, valid: s.at[t].max(valid))(
        seen, tok, recent_tokens >= 0
    )
    pen = jnp.where(logits > 0, logits / p2, logits * p2)
    return jnp.where(seen & (p2 != 1.0), pen, logits)


def apply_frequency_presence(logits, recent_tokens, freq_penalty, pres_penalty):
    """OpenAI-style penalties over the recent window: logits[t] -=
    freq * count(t) + pres * (count(t) > 0). Scalars or (B,); 0 disables."""
    fp = jnp.asarray(freq_penalty, jnp.float32)
    pp = jnp.asarray(pres_penalty, jnp.float32)
    fp2 = (fp if fp.ndim else fp[None])[:, None]
    pp2 = (pp if pp.ndim else pp[None])[:, None]
    tok = jnp.where(recent_tokens >= 0, recent_tokens, 0)
    counts = jnp.zeros(logits.shape, jnp.float32)
    counts = jax.vmap(
        lambda c, t, valid: c.at[t].add(valid.astype(jnp.float32))
    )(counts, tok, recent_tokens >= 0)
    return logits - fp2 * counts - pp2 * (counts > 0)


LOGPROB_TOPK = 8  # top-k carried per sampled token when logprobs requested


def sample_batch(logits, key, temperature, topp, minp=None, logit_bias=None,
                 recent_tokens=None, repetition_penalty=None,
                 frequency_penalty=None, presence_penalty=None,
                 with_logprobs: bool = False):
    """Vectorized per-sequence sampling for the serving engine.

    logits: (B, V) f32; temperature/topp (and optional minp /
    repetition_penalty): (B,) f32 — a slot with temperature 0 is greedy,
    others are temperature-softmax + nucleus [+ min-p]. `logit_bias`:
    (B, V) additive bias (sparse OpenAI-style biases scatter into it
    host-side); `recent_tokens`: (B, W) int32 window for the repetition
    penalty (-1 padding). Fully jittable with *traced* per-slot params
    (no recompile when a request with different settings lands in a slot).

    with_logprobs=True (static) additionally returns
    (token_logprob (B,), top_logprobs (B, LOGPROB_TOPK), top_ids): the
    log_softmax of the PROCESSED logits (post bias/penalties, PRE
    temperature/top-p) — the model's distribution after the request's
    logit processors, which is what OpenAI-style `logprobs` reports
    (temperature rescaling would make temp=0 logprobs degenerate).
    """
    if logit_bias is not None:
        logits = logits + logit_bias
    if recent_tokens is not None and repetition_penalty is not None:
        logits = apply_repetition_penalty(logits, recent_tokens,
                                          repetition_penalty)
    if recent_tokens is not None and (
        frequency_penalty is not None or presence_penalty is not None
    ):
        logits = apply_frequency_presence(
            logits, recent_tokens,
            0.0 if frequency_penalty is None else frequency_penalty,
            0.0 if presence_penalty is None else presence_penalty,
        )
    greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

    temp = jnp.maximum(temperature, 1e-6)[:, None]
    probs = jax.nn.softmax(logits / temp, axis=-1)
    filtered = nucleus_filter(probs, topp)
    if minp is not None:
        filtered = min_p_filter(filtered, minp)

    sampled = jax.random.categorical(key, jnp.log(filtered), axis=-1).astype(jnp.int32)
    nxt = jnp.where(temperature <= 0.0, greedy, sampled)
    if not with_logprobs:
        return nxt
    lsm = jax.nn.log_softmax(logits, axis=-1)
    tok_lp = jnp.take_along_axis(lsm, nxt[:, None], axis=-1)[:, 0]
    top_lp, top_id = jax.lax.top_k(lsm, LOGPROB_TOPK)
    return nxt, (tok_lp, top_lp, top_id.astype(jnp.int32))


@partial(jax.jit, static_argnums=(2, 3))
def _sample_topp(logits, key, temperature: float, topp: float):
    probs = jax.nn.softmax(logits / jnp.float32(temperature), axis=-1)
    if topp <= 0.0 or topp >= 1.0:
        return jax.random.categorical(key, jnp.log(probs), axis=-1).astype(jnp.int32)
    filtered = nucleus_filter(probs, topp)
    return jax.random.categorical(key, jnp.log(filtered), axis=-1).astype(jnp.int32)
