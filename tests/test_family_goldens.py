"""COMMITTED HF logit goldens per post-reference arch family.

VERDICT r3 #6: gemma2/qwen3/phi3/mixtral correctness previously rested on
the self-written numpy oracle. These fixtures were generated ONCE by
transformers' own reference implementations on seeded tiny checkpoints
(crabml_tpu.tools.make_family_fixtures) and committed alongside their
logits — the engine is checked against HuggingFace's numerics on every
run, with no torch dependency at test time. Regenerate with:

    python -m crabml_tpu.tools.make_family_fixtures
"""

import os

import numpy as np
import pytest

FIXDIR = os.path.join(os.path.dirname(__file__), "fixtures")
FAMILIES = ["gemma2", "qwen3", "phi3", "mixtral"]


@pytest.mark.parametrize("family", FAMILIES)
def test_family_matches_committed_hf_golden(family):
    import jax.numpy as jnp

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.weights import load_weights

    gold = np.load(os.path.join(FIXDIR, f"{family}-tiny-golden.npz"))
    tokens = gold["tokens"].tolist()
    want = gold["logits"]

    gf = GGUFFile(os.path.join(FIXDIR, f"{family}-tiny-f32.gguf"))
    cfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, cfg)
    cache = KVCache.create(cfg, 1, 64)
    logits, _ = forward(w, cache, jnp.asarray([tokens], jnp.int32),
                        jnp.zeros(1, jnp.int32), cfg)
    got = np.asarray(logits[0])
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


@pytest.mark.parametrize("family", FAMILIES)
def test_family_golden_decode_path(family):
    """The same golden through the T=1 DECODE path (prefill T-1 tokens,
    decode the last): position handling + cache reads per family."""
    import jax.numpy as jnp

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.weights import load_weights

    gold = np.load(os.path.join(FIXDIR, f"{family}-tiny-golden.npz"))
    tokens = gold["tokens"].tolist()
    want_last = gold["logits"][-1]

    gf = GGUFFile(os.path.join(FIXDIR, f"{family}-tiny-f32.gguf"))
    cfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, cfg)
    cache = KVCache.create(cfg, 1, 64)
    _, cache = forward(w, cache, jnp.asarray([tokens[:-1]], jnp.int32),
                       jnp.zeros(1, jnp.int32), cfg)
    logits, _ = forward(w, cache, jnp.asarray([[tokens[-1]]], jnp.int32),
                        jnp.asarray([len(tokens) - 1], jnp.int32), cfg)
    got = np.asarray(logits[0, 0])
    np.testing.assert_allclose(got, want_last, rtol=5e-4, atol=5e-4)
