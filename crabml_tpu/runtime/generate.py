"""On-device multi-step decode loop.

The reference dispatches one op at a time per token and syncs logits to the
host for sampling every step (llama2.rs:203-209). Here the whole decode loop
— forward, sample, feed back — runs inside one jit via lax.scan, so the host
is touched once per N tokens. This is the production decode path for
benchmarks and batch serving; the token-by-token Runner path remains for
low-latency streaming.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..models.forward import KVCache, forward


@partial(
    jax.jit,
    static_argnames=("steps", "cfg", "compute_dtype", "temperature", "topp",
                     "attn_window"),
    donate_argnames=("cache",),
)
def decode_loop(
    weights,
    cache: KVCache,
    token,  # (B,) int32 — last sampled token per sequence
    pos,  # (B,) int32 — current cache length per sequence
    key,
    steps: int,
    cfg,
    compute_dtype=jnp.float32,
    temperature: float = 0.0,
    topp: float = 1.0,
    attn_window: int | None = None,  # static; must cover max(pos) + steps
):
    """Greedy/sampled decode of `steps` tokens entirely on device.

    Returns (tokens (B, steps), cache, key). EOS is not special-cased here —
    the caller truncates at EOS after the fact (cache slots past EOS are
    never attended once the caller resets pos).
    """

    def body(carry, _):
        cache, token, pos, key = carry
        logits, cache = forward(
            weights, cache, token[:, None], pos, cfg, compute_dtype,
            attn_window=attn_window,
        )
        step_logits = logits[:, 0]  # (B, V)
        if temperature == 0.0:
            nxt = jnp.argmax(step_logits, axis=-1).astype(jnp.int32)
        else:
            from .sampler import nucleus_filter

            key, sub = jax.random.split(key)
            probs = jax.nn.softmax(step_logits / temperature, axis=-1)
            if 0.0 < topp < 1.0:
                probs = nucleus_filter(probs, topp)
            nxt = jax.random.categorical(sub, jnp.log(probs), axis=-1).astype(jnp.int32)
        return (cache, nxt, pos + 1, key), nxt

    (cache, _, _, key), toks = jax.lax.scan(
        body, (cache, token, pos, key), length=steps
    )
    return toks.T, cache, key  # (B, steps)
