"""On-device decode loop vs the streaming Runner path, and synthetic GGUF
end-to-end (write -> load -> generate) in quantized schemes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crabml_tpu.gguf.constants import GGMLType
from crabml_tpu.models.config import config_from_gguf
from crabml_tpu.models.forward import KVCache, forward
from crabml_tpu.models.weights import load_weights
from crabml_tpu.gguf.reader import GGUFFile
from crabml_tpu.models.synthetic import tiny_config, write_synthetic_gguf
from crabml_tpu.runtime.generate import decode_loop
from crabml_tpu.runtime.runner import Runner


def test_decode_loop_matches_streaming(stories260k_path):
    gf = GGUFFile(stories260k_path)
    cfg = config_from_gguf(gf.metadata)
    weights = jax.tree.map(jax.device_put, load_weights(gf, cfg))

    prompt = [1, 365, 400, 430, 284]
    steps = 10

    # streaming: one forward per token, greedy
    cache = KVCache.create(cfg, 1, 64)
    logits, cache = forward(
        weights, cache, jnp.asarray([prompt], jnp.int32), jnp.zeros(1, jnp.int32), cfg
    )
    tok = int(jnp.argmax(logits[0, len(prompt) - 1]))
    want = [tok]
    pos = len(prompt)
    for _ in range(steps - 1):
        logits, cache = forward(
            weights, cache, jnp.asarray([[tok]], jnp.int32), jnp.asarray([pos]), cfg
        )
        tok = int(jnp.argmax(logits[0, 0]))
        want.append(tok)
        pos += 1

    # fused loop: prefill then scan-decode
    cache2 = KVCache.create(cfg, 1, 64)
    logits, cache2 = forward(
        weights, cache2, jnp.asarray([prompt], jnp.int32), jnp.zeros(1, jnp.int32), cfg
    )
    first = jnp.argmax(logits[:, len(prompt) - 1], axis=-1).astype(jnp.int32)
    toks, _, _ = decode_loop(
        weights,
        cache2,
        first,
        jnp.asarray([len(prompt)], jnp.int32),
        jax.random.PRNGKey(0),
        steps - 1,
        cfg,
    )
    got = [int(first[0])] + [int(t) for t in np.asarray(toks[0])]
    assert got == want


@pytest.mark.parametrize("typ", [GGMLType.Q8_0, GGMLType.Q4_0, GGMLType.Q4_K], ids=lambda t: t.name)
def test_synthetic_gguf_generates(tmp_path, typ):
    # K-quants need row length % 256 == 0 (superblock must not span rows)
    cfg = tiny_config(
        embedding_dim=256, hidden_dim=256, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=256,
    )
    path = str(tmp_path / f"syn-{typ.name}.gguf")
    write_synthetic_gguf(path, cfg, typ, seed=3)

    r = Runner(path, seq_len=64)
    assert r.cfg.architecture == "llama"
    out = "".join(r.prefill_and_generate("hello", steps=5))
    assert isinstance(out, str)  # random weights: any tokens, but must not crash
    # determinism across a reset
    r.reset()
    out2 = "".join(r.prefill_and_generate("hello", steps=5))
    assert out == out2


def test_session_save_restore(stories260k_path, tmp_path):
    """KV-cache session persists across Runner instances: the continuation
    after restore matches an uninterrupted generation."""
    r = Runner(stories260k_path, seq_len=64)
    _, _, tok = r.prefill("Lily is a cat", bos=True)
    full = [tok] + [None] * 0
    gen = r.generate(tok, steps=12)
    out_full = "".join(gen)

    r2 = Runner(stories260k_path, seq_len=64)
    _, _, tok2 = r2.prefill("Lily is a cat", bos=True)
    assert tok2 == tok
    path = str(tmp_path / "session.npz")
    r2.save_session(path)

    r3 = Runner(stories260k_path, seq_len=64)
    r3.load_session(path)
    assert r3.kv_cache_len() == r2.kv_cache_len()
    out_restored = "".join(r3.generate(tok, steps=12))
    assert out_restored == out_full


def test_chunked_prefill_matches_single_shot(stories260k_path):
    """A prompt longer than MAX_PREFILL_CHUNK prefills in pieces and yields
    the same next token + continuation as one-shot prefill."""
    r1 = Runner(stories260k_path, seq_len=96)
    prompt = "Lily is a cat. " * 4
    _, _, tok1 = r1.prefill(prompt, bos=True)
    out1 = "".join(r1.generate(tok1, steps=8))

    r2 = Runner(stories260k_path, seq_len=96)
    r2.MAX_PREFILL_CHUNK = 8  # force many chunks
    _, _, tok2 = r2.prefill(prompt, bos=True)
    assert tok2 == tok1
    out2 = "".join(r2.generate(tok2, steps=8))
    assert out2 == out1


def test_overlong_prompt_keeps_tail(stories260k_path):
    r = Runner(stories260k_path, seq_len=32)
    long_prompt = "cat dog " * 40  # way beyond 32 tokens
    pos, _, tok = r.prefill(long_prompt, bos=True)
    assert pos <= 31
    out = "".join(r.generate(tok, steps=4))
    assert isinstance(out, str)


def test_min_p_filter_semantics():
    """min-p drops tokens below minp * max_prob; 0 disables."""
    import numpy as np
    import jax.numpy as jnp

    from crabml_tpu.runtime.sampler import min_p_filter

    probs = jnp.asarray([[0.5, 0.3, 0.15, 0.05]])
    out = np.asarray(min_p_filter(probs, jnp.asarray([0.4])))
    np.testing.assert_allclose(out[0], [0.5, 0.3, 0.0, 0.0], atol=1e-7)
    out0 = np.asarray(min_p_filter(probs, jnp.asarray([0.0])))
    np.testing.assert_allclose(out0[0], np.asarray(probs)[0])


def test_repetition_penalty_semantics():
    """Seen-token logits divide by the penalty (positive) / multiply
    (negative); unseen and penalty=1 slots untouched."""
    import numpy as np
    import jax.numpy as jnp

    from crabml_tpu.runtime.sampler import apply_repetition_penalty

    logits = jnp.asarray([[2.0, -1.0, 3.0, 0.5]])
    recent = jnp.asarray([[0, 1, -1, -1]], jnp.int32)  # tokens 0 and 1 seen
    out = np.asarray(apply_repetition_penalty(logits, recent, jnp.asarray([2.0])))
    np.testing.assert_allclose(out[0], [1.0, -2.0, 3.0, 0.5], atol=1e-6)
    # penalty 1.0 is identity
    out1 = np.asarray(apply_repetition_penalty(logits, recent, jnp.asarray([1.0])))
    np.testing.assert_allclose(out1[0], np.asarray(logits)[0])


def test_repetition_penalty_prevents_loops(stories260k_path):
    """End-to-end: with a high repetition penalty the engine's sampled
    output contains fewer repeated tokens than without."""
    import numpy as np

    from crabml_tpu.runtime.runner import Runner
    from crabml_tpu.serving import Request, ServingEngine

    r = Runner(stories260k_path, seq_len=96)
    eng = ServingEngine(r, n_slots=1, seq_len=96)
    base = eng.submit(Request(prompt="One day", max_tokens=24,
                              temperature=0.0))
    eng.drain(max_steps=200)
    pen = eng.submit(Request(prompt="One day", max_tokens=24,
                             temperature=0.0, repetition_penalty=1.8))
    eng.drain(max_steps=200)

    def repeats(toks):
        return len(toks) - len(set(toks))

    assert base.done and pen.done
    assert repeats(pen.output_tokens) <= repeats(base.output_tokens)
    assert pen.output_tokens != base.output_tokens  # the penalty did bite


def test_runner_ticked_generation_matches_single(stories260k_path):
    """Fused multi-token decode ticks (Runner.generate(tick=N)) must
    produce exactly the single-step greedy output."""
    from crabml_tpu.runtime.runner import Runner

    r1 = Runner(stories260k_path, seq_len=96)
    _, _, tok = r1.prefill("Lily is a cat", bos=True)
    want = "".join(r1.generate(tok, steps=18, tick=1))

    r2 = Runner(stories260k_path, seq_len=96)
    _, _, tok2 = r2.prefill("Lily is a cat", bos=True)
    assert tok2 == tok
    got = "".join(r2.generate(tok2, steps=18, tick=4))
    assert got == want


def test_frequency_presence_penalty_semantics():
    import numpy as np
    import jax.numpy as jnp

    from crabml_tpu.runtime.sampler import apply_frequency_presence

    logits = jnp.asarray([[1.0, 2.0, 3.0, 4.0]])
    recent = jnp.asarray([[0, 0, 1, -1]], jnp.int32)  # token 0 twice, 1 once
    out = np.asarray(apply_frequency_presence(
        logits, recent, jnp.asarray([0.5]), jnp.asarray([0.25])
    ))
    # token0: -0.5*2 - 0.25 = -1.25; token1: -0.5 - 0.25 = -0.75; rest 0
    np.testing.assert_allclose(out[0], [1.0 - 1.25, 2.0 - 0.75, 3.0, 4.0],
                               atol=1e-6)
    # zeros disable
    out0 = np.asarray(apply_frequency_presence(
        logits, recent, jnp.asarray([0.0]), jnp.asarray([0.0])
    ))
    np.testing.assert_allclose(out0[0], np.asarray(logits)[0])
