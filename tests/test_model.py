"""Model forward tests: differential vs an independent numpy reference,
prefill/decode consistency, and golden generation regression (the reference's
E2E golden-string strategy, llama2.rs:654-735, on the committed 260k model)."""

import jax.numpy as jnp
import numpy as np
import pytest

import ref_forward
from crabml_tpu.models.config import config_from_gguf
from crabml_tpu.models.forward import KVCache, forward
from crabml_tpu.models.weights import load_weights
from crabml_tpu.gguf.reader import GGUFFile
from crabml_tpu.runtime.runner import Runner

PROMPT_TOKENS = [1, 365, 400, 430, 284]  # "<s> ▁L ily ..." style short seq


@pytest.fixture(scope="module")
def model260(stories260k_path):
    gf = GGUFFile(stories260k_path)
    cfg = config_from_gguf(gf.metadata)
    weights = load_weights(gf, cfg)
    return gf, cfg, weights


def test_forward_matches_numpy_reference(stories260k_path, model260):
    _, cfg, weights = model260
    tokens = PROMPT_TOKENS
    want = ref_forward.run_tokens(stories260k_path, tokens)

    cache = KVCache.create(cfg, batch=1, seq_len=32)
    logits, _ = forward(
        weights,
        cache,
        jnp.asarray([tokens], dtype=jnp.int32),
        jnp.zeros(1, jnp.int32),
        cfg,
    )
    got = np.asarray(logits[0, len(tokens) - 1])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_batched_prefill_equals_tokenwise(model260):
    _, cfg, weights = model260
    tokens = PROMPT_TOKENS

    cache_a = KVCache.create(cfg, 1, 32)
    logits_a, _ = forward(
        weights, cache_a, jnp.asarray([tokens], jnp.int32), jnp.zeros(1, jnp.int32), cfg
    )

    cache = KVCache.create(cfg, 1, 32)
    pos = jnp.zeros(1, jnp.int32)
    last = None
    for i, t in enumerate(tokens):
        last, cache = forward(
            weights, cache, jnp.asarray([[t]], jnp.int32), pos + i, cfg
        )
    np.testing.assert_allclose(
        np.asarray(logits_a[0, -1]), np.asarray(last[0, 0]), rtol=1e-5, atol=1e-5
    )


def test_padded_prefill_matches_unpadded(model260):
    """Garbage in padded tail slots must never leak into attention."""
    _, cfg, weights = model260
    tokens = PROMPT_TOKENS

    cache = KVCache.create(cfg, 1, 32)
    logits, _ = forward(
        weights, cache, jnp.asarray([tokens], jnp.int32), jnp.zeros(1, jnp.int32), cfg
    )
    padded = tokens + [0, 0, 0]
    cache_b = KVCache.create(cfg, 1, 32)
    logits_b, _ = forward(
        weights, cache_b, jnp.asarray([padded], jnp.int32), jnp.zeros(1, jnp.int32), cfg
    )
    np.testing.assert_allclose(
        np.asarray(logits[0, len(tokens) - 1]),
        np.asarray(logits_b[0, len(tokens) - 1]),
        rtol=1e-6,
        atol=1e-6,
    )


def test_decode_continues_from_prefill_cache(model260):
    _, cfg, weights = model260
    tokens = PROMPT_TOKENS
    # full-sequence forward
    cache_a = KVCache.create(cfg, 1, 32)
    logits_a, _ = forward(
        weights, cache_a, jnp.asarray([tokens], jnp.int32), jnp.zeros(1, jnp.int32), cfg
    )
    # prefill first n-1 then decode last
    cache = KVCache.create(cfg, 1, 32)
    _, cache = forward(
        weights, cache, jnp.asarray([tokens[:-1]], jnp.int32), jnp.zeros(1, jnp.int32), cfg
    )
    logits_b, _ = forward(
        weights,
        cache,
        jnp.asarray([[tokens[-1]]], jnp.int32),
        jnp.asarray([len(tokens) - 1], jnp.int32),
        cfg,
    )
    np.testing.assert_allclose(
        np.asarray(logits_a[0, -1]), np.asarray(logits_b[0, 0]), rtol=1e-5, atol=1e-5
    )


# Self-generated golden (greedy, f32, 260k model). The reference's goldens use
# the 15m fixtures which are not committed upstream; this is the same gate on
# the committed model. Kept to 14 steps: around token ~18 this model hits a
# near-tie argmax that can flip under XLA-CPU thread-pool reassociation.
# Regenerate only for intentional numeric changes.
GOLDEN_260K = " named Jack. He loved to play with his to"


def test_golden_generation(stories260k_path):
    r = Runner(stories260k_path, seq_len=128)
    out = "".join(r.prefill_and_generate("Lily is a cat", steps=14))
    assert out == GOLDEN_260K


def test_golden_generation_is_deterministic(stories260k_path):
    r = Runner(stories260k_path, seq_len=128)
    out1 = "".join(r.prefill_and_generate("Lily is a cat", steps=12))
    r.reset()
    out2 = "".join(r.prefill_and_generate("Lily is a cat", steps=12))
    assert out1 == out2


def test_named_probes_cross_backend(tmp_path):
    """The named-probe instrument (reference: debug_named_tensors,
    llama2.rs:737-797): XLA vs Pallas paths must agree at every probe."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import make_weights, tiny_config
    from crabml_tpu.models.weights import repack_weights
    from crabml_tpu.ops import matmul as mm

    cfg = tiny_config(
        embedding_dim=512, hidden_dim=512, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=512, seq_len=64,
    )
    w = make_weights(cfg, GGMLType.Q8_0, seed=9)
    tokens = jnp.asarray([[1, 5, 9, 13]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)

    mm.set_backend("xla")
    cache = KVCache.create(cfg, 1, 64)
    logits_x, _, probes_x = forward(w, cache, tokens, pos, cfg, jnp.bfloat16,
                                    collect_probes=True)

    mm.set_backend("pallas")
    try:
        wk = repack_weights(w)
        cache = KVCache.create(cfg, 1, 64)
        logits_p, _, probes_p = forward(wk, cache, tokens, pos, cfg, jnp.bfloat16,
                                        collect_probes=True)
    finally:
        mm.set_backend("xla")

    assert set(probes_x) == {"embed", "final_rmsnorm", "attn_rmsnorm",
                             "attn_out", "ffn_down", "layer_out"}
    for name in probes_x:
        a, b = np.asarray(probes_x[name], np.float32), np.asarray(probes_p[name], np.float32)
        scale = max(np.abs(a).max(), 1e-6)
        assert np.abs(a - b).max() / scale < 0.05, f"probe {name} diverged"
    np.testing.assert_allclose(
        np.asarray(logits_x), np.asarray(logits_p),
        rtol=0.1, atol=0.1 * float(np.abs(np.asarray(logits_x)).max()),
    )


# per-arch config extras for the differential sweep; the last three go
# BEYOND the reference's four architectures (it stops at phi2):
# qwen3 = decoupled head_dim + qk norms; gemma2 = post-norms, softcaps,
# alternating sliding window; llama31 = llama + rope_freqs scaling tensor
ARCH_SWEEP = {
    "llama": {},
    "gemma": {},
    "qwen2": {},
    "phi2": {},
    "qwen3": dict(head_dim_override=24),
    "gemma2": dict(attn_logit_softcap=50.0, final_logit_softcap=30.0,
                   sliding_window=3),
    "llama31": dict(rope_scaling_type="rope_freqs"),
    "llama-linear-rope": dict(rope_scaling_type="linear",
                              rope_scaling_factor=4.0),
    "mixtral": dict(n_experts=4, n_experts_used=2),
}


@pytest.mark.parametrize("variant", list(ARCH_SWEEP))
def test_all_archs_match_numpy_reference(variant, tmp_path):
    """Differential test per architecture: jitted batched forward vs the
    independent token-at-a-time numpy reference (mirrors the reference's
    four forwards, llama2.rs:213-524, plus qwen3/gemma2/llama3.1-scaling
    which the reference cannot load at all)."""
    import numpy as np
    import jax.numpy as jnp

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights
    from crabml_tpu.gguf.reader import GGUFFile

    from ref_forward import run_tokens

    arch = {"llama31": "llama", "llama-linear-rope": "llama",
            "mixtral": "llama"}.get(variant, variant)
    cfg = ModelConfig(
        architecture=arch, model_name=f"syn-{variant}",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=64, rms_norm_eps=1e-5,
        **ARCH_FEATURES[arch],
        **ARCH_SWEEP[variant],
    )
    path = str(tmp_path / f"{variant}.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=17)

    tokens = [1, 7, 42, 99, 5]
    want = run_tokens(path, tokens)

    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    assert lcfg.architecture == arch
    if variant == "qwen3":
        assert lcfg.head_dim == 24  # decoupled from dim // n_heads == 16
    if variant == "gemma2":
        assert lcfg.attn_logit_softcap == 50.0 and lcfg.sliding_window == 3
    w = load_weights(gf, lcfg)
    if variant == "llama31":
        assert w["rope_freqs"] is not None
    cache = KVCache.create(lcfg, 1, 16)
    logits, _ = forward(
        w, cache, jnp.asarray([tokens], jnp.int32), jnp.zeros(1, jnp.int32), lcfg
    )
    got = np.asarray(logits[0, -1])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_int8_kv_cache_close_to_float(stories260k_path):
    """int8 KV cache: generation stays close to the f32-cache path and ppl
    degrades negligibly (per-vector max-abs scaling)."""
    import numpy as np

    from crabml_tpu.eval import perplexity
    from crabml_tpu.runtime.runner import Runner

    r_f = Runner(stories260k_path, seq_len=96)
    r_q = Runner(stories260k_path, seq_len=96, kv_dtype=jnp.int8)

    text = "Once upon a time there was a little cat named Lily."
    p_f = perplexity(r_f, text)["perplexity"]
    p_q = perplexity(r_q, text)["perplexity"]
    assert abs(p_q - p_f) / p_f < 0.02, (p_f, p_q)

    out_q = "".join(r_q.prefill_and_generate("Lily is a cat", steps=10))
    assert len(out_q) > 0


def test_partial_rotary_matches_numpy_reference(tmp_path):
    """rope_dim < head_dim (real-phi2 shape): ggml pairing/frequencies."""
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights

    from ref_forward import run_tokens

    cfg = ModelConfig(
        architecture="phi2", model_name="syn-phi2-partial",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=4,
        vocab_size=512, seq_len=64, rms_norm_eps=1e-5, rope_dim=8,  # hd=16
        **ARCH_FEATURES["phi2"],
    )
    path = str(tmp_path / "phi2-partial.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=23)

    tokens = [2, 11, 33, 77]
    want = run_tokens(path, tokens)

    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    assert lcfg.effective_rope_dim == 8 and lcfg.head_dim == 16
    w = load_weights(gf, lcfg)
    cache = KVCache.create(lcfg, 1, 16)
    logits, _ = forward(
        w, cache, jnp.asarray([tokens], jnp.int32), jnp.zeros(1, jnp.int32), lcfg
    )
    np.testing.assert_allclose(np.asarray(logits[0, -1]), want, rtol=2e-4, atol=2e-4)


def test_weight_cache_roundtrip(tmp_path):
    """Repacked-plane disk cache: cached load == fresh load, plane-exact,
    and generation from a cache-loaded Runner matches."""
    import numpy as np
    import jax.numpy as jnp

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.synthetic import tiny_config, write_synthetic_gguf
    from crabml_tpu.runtime import weight_cache as wc
    from crabml_tpu.runtime.runner import Runner

    cfg = tiny_config(
        embedding_dim=512, hidden_dim=512, n_layers=2, n_heads=8, n_kv_heads=4,
        vocab_size=512, seq_len=256,
    )
    path = str(tmp_path / "wcache.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.Q4_K, seed=11)

    import os
    os.environ["CRABML_WEIGHT_CACHE"] = str(tmp_path / "wcroot")
    try:
        r1 = Runner(path, seq_len=64, backend="pallas",
                    compute_dtype=jnp.bfloat16, weight_cache=True)
        out1 = "".join(r1.prefill_and_generate("hello", steps=6))
        assert r1.metrics.times_ns.get("load.cache_write", 0) > 0

        r2 = Runner(path, seq_len=64, backend="pallas",
                    compute_dtype=jnp.bfloat16, weight_cache=True)
        out2 = "".join(r2.prefill_and_generate("hello", steps=6))
        assert r2.metrics.times_ns.get("load.repack", 0) == 0  # cache hit
        assert out1 == out2

        def planes(w):
            out = {}
            for name, v in w["layers"].items():
                if hasattr(v, "planes"):
                    for pn, p in v.planes.items():
                        out[f"{name}.{pn}"] = np.asarray(p)
            return out

        p1, p2 = planes(r1.weights), planes(r2.weights)
        assert set(p1) == set(p2)
        for k in p1:
            np.testing.assert_array_equal(p1[k].view(np.uint8), p2[k].view(np.uint8), err_msg=k)
    finally:
        del os.environ["CRABML_WEIGHT_CACHE"]


def test_moe_runner_quantized_end_to_end(tmp_path):
    """MoE through the public Runner with quantized expert planes (q8_0),
    XLA and Pallas backends agreeing."""
    import jax.numpy as jnp

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.synthetic import tiny_config, write_synthetic_gguf
    from crabml_tpu.ops import matmul as mm

    cfg = tiny_config(
        embedding_dim=256, hidden_dim=512, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=128, n_experts=4, n_experts_used=2,
    )
    path = str(tmp_path / "moe.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.Q8_0, seed=3)

    r1 = Runner(path, seq_len=64, backend="xla", compute_dtype=jnp.bfloat16)
    out_xla = "".join(r1.prefill_and_generate("hello", steps=6))
    r2 = Runner(path, seq_len=64, backend="pallas", compute_dtype=jnp.bfloat16)
    out_pl = "".join(r2.prefill_and_generate("hello", steps=6))
    mm.set_backend("xla")
    assert out_xla == out_pl
    assert len(out_xla) > 0


def test_int8_kv_gemma2_keeps_softcap_and_window(tmp_path):
    """Advisor r2 (medium): the quantized-KV attention branch used to drop
    gemma2 softcap/sliding-window. With strong caps, the int8-KV logits
    must stay close to the f32-cache logits (omission moves them far)."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights

    cfg = ModelConfig(
        architecture="gemma2", model_name="syn-g2",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=64, rms_norm_eps=1e-5,
        **ARCH_FEATURES["gemma2"],
        attn_logit_softcap=1.0, final_logit_softcap=1.0, sliding_window=3,
    )
    path = str(tmp_path / "g2.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=31)
    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, lcfg)
    tokens = jnp.asarray([[1, 7, 42, 99, 5, 12, 63, 8]], jnp.int32)
    pos = jnp.zeros(1, jnp.int32)

    logits_f, cache_f = forward(w, KVCache.create(lcfg, 1, 32), tokens, pos, lcfg)
    logits_q, cache_q = forward(
        w, KVCache.create(lcfg, 1, 32, dtype=jnp.int8), tokens, pos, lcfg
    )
    a = np.asarray(logits_f[0, -1])
    b = np.asarray(logits_q[0, -1])
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.05

    # decode step (T=1) goes through the quantized decode branch
    nf, _ = forward(w, cache_f, tokens[:, :1] * 0 + 3, jnp.asarray([8]), lcfg)
    nq, _ = forward(w, cache_q, tokens[:, :1] * 0 + 3, jnp.asarray([8]), lcfg)
    a = np.asarray(nf[0, -1])
    b = np.asarray(nq[0, -1])
    assert np.abs(a - b).max() / max(np.abs(a).max(), 1e-6) < 0.05


def test_gemma2_27b_query_scale_override():
    """ONLY gemma2-27b (46 blocks, llama.cpp's identification) scales
    queries by 1/sqrt(n_embd/n_head); gemma2-2b/9b also decouple
    head_dim but keep 1/sqrt(head_dim) — over-applying the 27b rule
    mis-scales every attention score on those sizes."""
    import numpy as np

    from crabml_tpu.gguf.reader import GGUFMetadata
    from crabml_tpu.models.config import ModelConfig, config_from_gguf

    def g2_meta(n_layers):
        return GGUFMetadata({
            "general.architecture": "gemma2",
            "general.name": "g2",
            "gemma2.embedding_length": 96,
            "gemma2.feed_forward_length": 64,
            "gemma2.block_count": n_layers,
            "gemma2.attention.head_count": 4,
            "gemma2.attention.head_count_kv": 2,
            "gemma2.context_length": 64,
            "gemma2.attention.layer_norm_rms_epsilon": 1e-5,
            "gemma2.rope.freq_base": 10000.0,
            "gemma2.rope.dimension_count": 32,
            "gemma2.attention.key_length": 32,
            "tokenizer.ggml.tokens": ["<pad>"] * 300,
        })

    lcfg = config_from_gguf(g2_meta(46))  # 27b-shaped
    assert lcfg.head_dim == 32
    assert np.isclose(lcfg.attn_scale, 1.0 / np.sqrt(96 / 4))
    # 9b-shaped (42 blocks, decoupled head_dim): NO override
    lcfg9 = config_from_gguf(g2_meta(42))
    assert lcfg9.head_dim == 32
    assert np.isclose(lcfg9.attn_scale, 1.0 / np.sqrt(32))
    # plain config: no override
    assert np.isclose(
        ModelConfig(architecture="llama", embedding_dim=64, n_heads=4).attn_scale,
        1.0 / 4.0,
    )


def test_weight_cache_key_sees_content_mutation(tmp_path):
    """VERDICT r2 weak #8: a file mutated in place with preserved
    size+mtime must not serve stale cached planes — the key now carries a
    content fingerprint over the header."""
    import os

    from crabml_tpu.runtime import weight_cache as wc

    p = tmp_path / "m.gguf"
    p.write_bytes(b"GGUF" + b"\x00" * 4096)
    st = os.stat(p)
    k1 = wc.cache_key(str(p), "kernel", "bf16")
    # mutate a byte inside the hashed prefix, restore mtime exactly
    data = bytearray(p.read_bytes())
    data[100] ^= 0xFF
    p.write_bytes(bytes(data))
    os.utime(p, ns=(st.st_atime_ns, st.st_mtime_ns))
    k2 = wc.cache_key(str(p), "kernel", "bf16")
    assert k1 != k2


def test_moe_topk_gather_decode_matches_dense_and_oracle(tmp_path):
    """VERDICT r2 #3: B=1 decode gathers only the top-k experts via the
    flattened layer*E+expert prefetch index. Must equal (a) the all-experts
    dense path bit-for-bit at f32 and (b) the numpy oracle, on BOTH the
    XLA and kernel layouts."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights, repack_weights
    from crabml_tpu.ops import matmul as mm

    from ref_forward import run_tokens

    # dims tile-aligned (256) so the gather path engages on the kernel
    # layout too; E=4 experts, top-2
    cfg = ModelConfig(
        architecture="llama", model_name="syn-moe-gather",
        embedding_dim=256, hidden_dim=256, n_layers=2, n_heads=4,
        n_kv_heads=2, vocab_size=512, seq_len=64, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"], n_experts=4, n_experts_used=2,
    )
    path = str(tmp_path / "moe.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=41)

    tokens = [1, 7, 42, 99, 5]
    want = run_tokens(path, tokens)  # oracle logits after the last token

    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, lcfg)

    def run(weights):
        cache = KVCache.create(lcfg, 1, 16)
        # prefill T=4 (dense path: rows > 1), then decode the last token
        # (rows == 1: the gather path)
        logits_p, cache = forward(
            w if weights is None else weights, cache,
            jnp.asarray([tokens[:-1]], jnp.int32), jnp.zeros(1, jnp.int32), lcfg
        )
        logits_d, _ = forward(
            w if weights is None else weights, cache,
            jnp.asarray([[tokens[-1]]], jnp.int32), jnp.asarray([4]), lcfg
        )
        return np.asarray(logits_d[0, -1])

    got_xla = run(None)
    np.testing.assert_allclose(got_xla, want, rtol=2e-4, atol=2e-4)

    # kernel layout: Q8_0 so the pallas path has planes to gather
    path_q = str(tmp_path / "moe_q8.gguf")
    write_synthetic_gguf(path_q, cfg, GGMLType.Q8_0, seed=41)
    gf_q = GGUFFile(path_q)
    lcfg_q = config_from_gguf(gf_q.metadata)
    want_q = run_tokens(path_q, tokens)
    w_q = load_weights(gf_q, lcfg_q)
    mm.set_backend("pallas")
    try:
        wk = repack_weights(w_q, lcfg_q)
        cache = KVCache.create(lcfg_q, 1, 16)
        logits_p, cache = forward(wk, cache, jnp.asarray([tokens[:-1]], jnp.int32),
                                  jnp.zeros(1, jnp.int32), lcfg_q, jnp.bfloat16)
        logits_d, _ = forward(wk, cache, jnp.asarray([[tokens[-1]]], jnp.int32),
                              jnp.asarray([4]), lcfg_q, jnp.bfloat16)
    finally:
        mm.set_backend("xla")
    got_k = np.asarray(logits_d[0, -1])
    scale = max(np.abs(want_q).max(), 1e-6)
    assert np.abs(got_k - want_q).max() / scale < 0.05


def test_moe_batched_cond_gather_matches_single_row(tmp_path):
    """ROADMAP #6 (batched-decode expert gather): at 1 < B with B*K < E
    the per-expert lax.cond path must equal (a) B separate single-row
    top-k gather calls and (b) the all-experts dense path, on both the
    XLA layout (f32, through the scanned full forward) and the kernel
    layout (q8_0 pallas)."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward, moe_ffn
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights, repack_weights
    from crabml_tpu.ops import matmul as mm

    # E=16 top-2: B=4 rows give B*K=8 < 16, engaging the cond path;
    # dims tile-aligned (256) so the kernel layout engages too
    cfg = ModelConfig(
        architecture="llama", model_name="syn-moe-cond",
        embedding_dim=256, hidden_dim=256, n_layers=2, n_heads=4,
        n_kv_heads=2, vocab_size=512, seq_len=64, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"], n_experts=16, n_experts_used=2,
    )
    path = str(tmp_path / "moe16.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=43)
    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, lcfg)
    lw = w["layers"]
    D = lcfg.embedding_dim

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((4, D)).astype(np.float32) * 0.1)

    got = np.asarray(moe_ffn(lw, 1, x, lcfg, jnp.float32))  # cond path (rows=4)
    # (a) four single-row gather calls
    per_row = np.stack(
        [np.asarray(moe_ffn(lw, 1, x[b], lcfg, jnp.float32)) for b in range(4)]
    )
    np.testing.assert_allclose(got, per_row, rtol=1e-5, atol=1e-6)
    # (b) all-experts dense path: pad rows until B*K >= E, compare prefix
    x9 = jnp.concatenate([x, jnp.tile(x[:1], (5, 1))], axis=0)  # rows=9, 18>=16
    dense = np.asarray(moe_ffn(lw, 1, x9, lcfg, jnp.float32))[:4]
    np.testing.assert_allclose(got, dense, rtol=1e-4, atol=1e-5)

    # through the scanned full forward: B=4 decode vs per-sequence B=1
    toks = np.asarray([[5], [9], [250], [42]], np.int32)
    cache = KVCache.create(lcfg, 4, 16)
    lb, _ = forward(w, cache, jnp.asarray(toks), jnp.zeros(4, jnp.int32), lcfg)
    for b in range(4):
        c1 = KVCache.create(lcfg, 1, 16)
        l1, _ = forward(w, c1, jnp.asarray(toks[b : b + 1]),
                        jnp.zeros(1, jnp.int32), lcfg)
        np.testing.assert_allclose(
            np.asarray(lb[b]), np.asarray(l1[0]), rtol=2e-4, atol=2e-4)

    # kernel layout: q8_0 planes, pallas backend
    path_q = str(tmp_path / "moe16_q8.gguf")
    write_synthetic_gguf(path_q, cfg, GGMLType.Q8_0, seed=43)
    gf_q = GGUFFile(path_q)
    lcfg_q = config_from_gguf(gf_q.metadata)
    w_q = load_weights(gf_q, lcfg_q)
    mm.set_backend("pallas")
    try:
        wk = repack_weights(w_q, lcfg_q)
        lwk = wk["layers"]
        xb = x.astype(jnp.bfloat16)
        got_k = np.asarray(moe_ffn(lwk, 1, xb, lcfg_q, jnp.bfloat16), np.float32)
        per_row_k = np.stack(
            [np.asarray(moe_ffn(lwk, 1, xb[b], lcfg_q, jnp.bfloat16), np.float32)
             for b in range(4)]
        )
    finally:
        mm.set_backend("xla")
    scale = max(np.abs(per_row_k).max(), 1e-6)
    assert np.abs(got_k - per_row_k).max() / scale < 0.03


def test_phi3_matches_numpy_reference(tmp_path):
    """phi3 (fused qkv, fused gate|up SWIGLU) vs the numpy oracle."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights

    from ref_forward import run_tokens

    cfg = ModelConfig(
        architecture="phi3", model_name="syn-phi3",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=64, rms_norm_eps=1e-5,
        **ARCH_FEATURES["phi3"],
    )
    path = str(tmp_path / "phi3.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=47)

    tokens = [1, 7, 42, 99, 5]
    want = run_tokens(path, tokens)
    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    assert lcfg.architecture == "phi3"
    w = load_weights(gf, lcfg)
    assert "ffn_gate" in w["layers"]  # fused gate|up split at load
    cache = KVCache.create(lcfg, 1, 16)
    logits, _ = forward(w, cache, jnp.asarray([tokens], jnp.int32),
                        jnp.zeros(1, jnp.int32), lcfg)
    np.testing.assert_allclose(np.asarray(logits[0, -1]), want,
                               rtol=2e-4, atol=2e-4)


def test_yarn_rope_scaling_matches_numpy_reference(tmp_path):
    """YaRN rope scaling: load-time divisor synthesis + mscale vs the
    oracle's independent NTK-by-parts implementation. The deep positions
    make an unscaled run diverge, so the test is sensitive."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights

    from ref_forward import run_tokens

    cfg = ModelConfig(
        architecture="llama", model_name="syn-yarn",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=128, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"],
        rope_scaling_type="yarn", rope_scaling_factor=4.0,
        rope_scaling_orig_ctx=32,
    )
    path = str(tmp_path / "yarn.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=53)

    tokens = [1, 7, 42, 99, 5, 12, 63, 8, 3, 44]
    want = run_tokens(path, tokens)
    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    assert lcfg.rope_scaling_type == "yarn"
    assert lcfg.rope_mscale > 1.0
    w = load_weights(gf, lcfg)
    assert w["rope_freqs"] is not None  # synthesized yarn divisors
    cache = KVCache.create(lcfg, 1, 16)
    logits, _ = forward(w, cache, jnp.asarray([tokens], jnp.int32),
                        jnp.zeros(1, jnp.int32), lcfg)
    np.testing.assert_allclose(np.asarray(logits[0, -1]), want,
                               rtol=2e-4, atol=2e-4)

    # sensitivity: without yarn the logits differ materially
    plain = ModelConfig(**{**cfg.__dict__, "rope_scaling_type": "none"})
    path2 = str(tmp_path / "plain.gguf")
    write_synthetic_gguf(path2, plain, GGMLType.F32, seed=53)
    want_plain = run_tokens(path2, tokens)
    assert np.abs(want_plain - want).max() > 1e-3


@pytest.mark.parametrize("kv_dtype", ["f32", "int8"])
def test_gemma2_decode_rides_kernels(tmp_path, kv_dtype):
    """e2e dispatch wiring for gemma2 on the pallas backend: with a
    kernel-eligible head size (hd=128), decode attention runs the Pallas
    DMA kernel WITH softcap + alternating sliding window (VERDICT r2 weak
    #5 — gemma2 used to force the XLA fallback). f32 weights keep matmuls
    on the XLA path on both backends, so any divergence is the attention
    kernel's."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights
    from crabml_tpu.ops import matmul as mm

    cfg = ModelConfig(
        architecture="gemma2", model_name="syn-g2-kernel",
        embedding_dim=256, hidden_dim=256, n_layers=2, n_heads=2,
        n_kv_heads=1, vocab_size=512, seq_len=128, rms_norm_eps=1e-5,
        head_dim_override=128,
        **{**ARCH_FEATURES["gemma2"], "attn_logit_softcap": 5.0,
           "sliding_window": 24},
    )
    assert cfg.head_dim == 128 and cfg.alternating_window
    path = str(tmp_path / "g2k.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=31)
    w = load_weights(GGUFFile(path), cfg)
    dt = jnp.float32 if kv_dtype == "f32" else jnp.int8
    tol = 2e-4 if kv_dtype == "f32" else 2e-2

    def run(backend):
        mm.set_backend(backend)
        try:
            cache = KVCache.create(cfg, 1, 128, dtype=dt)
            toks = jnp.asarray([[1, 7, 42, 99, 5, 3, 8, 2]], jnp.int32)
            _, cache = forward(w, cache, toks, jnp.zeros(1, jnp.int32), cfg)
            outs = []
            # decode past the window so local layers actually clip
            for i in range(30):
                logits, cache = forward(
                    w, cache, jnp.asarray([[(7 * i) % 512]], jnp.int32),
                    jnp.asarray([8 + i], jnp.int32), cfg,
                )
                outs.append(np.asarray(logits[0, -1]))
            return np.stack(outs)
        finally:
            mm.set_backend("xla")

    want = run("xla")
    got = run("pallas")
    scale = np.abs(want).max()
    assert np.abs(want - got).max() / scale < tol


def test_moe_prefill_with_w8_planes(tmp_path):
    """W8 prefill planes use a wider m-tile than the expert slicer's TM
    units — _slice_expert must drop them (like _expert_view does) instead
    of slicing garbage. Pins: mixtral + prefill_w8 forward == plain."""
    import os

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.synthetic import tiny_config, write_synthetic_gguf
    from crabml_tpu.models.weights import augment_w8_weights, load_weights
    from crabml_tpu.ops import matmul as mm

    cfg = tiny_config(
        embedding_dim=256, hidden_dim=256, n_layers=1, n_heads=4,
        n_kv_heads=2, vocab_size=512, seq_len=64,
        n_experts=2, n_experts_used=2,
    )
    path = os.path.join(str(tmp_path), "moe.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.Q8_0, seed=11)
    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    # T >= W8_MIN_ROWS so qmatmul actually routes into the W8 path
    tokens = jnp.asarray([[1, 5, 9, 13, 2, 7, 11, 3] * 32], jnp.int32)  # T=256
    pos = jnp.zeros(1, jnp.int32)

    mm.set_backend("pallas")
    try:
        wk = load_weights(gf, lcfg, layout="kernel")
        cfg = lcfg
        cache = KVCache.create(cfg, 1, 256)
        logits_plain, _ = forward(wk, cache, tokens, pos, cfg, jnp.bfloat16)

        w8 = augment_w8_weights(wk)
        cache = KVCache.create(cfg, 1, 256)
        logits_w8, _ = forward(w8, cache, tokens, pos, cfg, jnp.bfloat16)
    finally:
        mm.set_backend("xla")

    a, b = np.asarray(logits_plain, np.float32), np.asarray(logits_w8, np.float32)
    scale = max(np.abs(a).max(), 1e-6)
    assert np.abs(a - b).max() / scale < 0.05


def test_moe_grouped_prefill_matches_all_experts(tmp_path):
    """Prefill-regime grouped MoE (rows sorted by expert, ragged grouped
    kernel) must match the all-experts fused path and the numpy oracle.
    Uses enough rows to clear _GROUPED_MIN_ROWS so the grouped path
    engages on the kernel layout."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models import forward as fwd
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.forward import KVCache, forward
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import load_weights, repack_weights
    from crabml_tpu.ops import matmul as mm

    from ref_forward import run_tokens

    cfg = ModelConfig(
        architecture="llama", model_name="syn-moe-grouped",
        embedding_dim=256, hidden_dim=256, n_layers=2, n_heads=4,
        n_kv_heads=2, vocab_size=512, seq_len=128, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"], n_experts=4, n_experts_used=2,
    )
    path = str(tmp_path / "moe_grouped.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.Q8_0, seed=43)

    rng = np.random.default_rng(3)
    tokens = [1] + rng.integers(2, 512, 79).tolist()  # 80 rows > min 64
    want = run_tokens(path, tokens)

    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    w = load_weights(gf, lcfg)
    mm.set_backend("pallas")
    try:
        wk = repack_weights(w, lcfg)

        def prefill_logits():
            cache = KVCache.create(lcfg, 1, 128)
            logits, _ = forward(
                wk, cache, jnp.asarray([tokens], jnp.int32),
                jnp.zeros(1, jnp.int32), lcfg, jnp.float32,
            )
            return np.asarray(logits[0, -1])

        got_grouped = prefill_logits()
        # force the all-experts path by raising the engage threshold
        old_min = fwd._GROUPED_MIN_ROWS
        fwd._GROUPED_MIN_ROWS = 10**9
        try:
            got_dense = prefill_logits()
        finally:
            fwd._GROUPED_MIN_ROWS = old_min
    finally:
        mm.set_backend("xla")

    scale = max(np.abs(got_dense).max(), 1e-6)
    # same kernel math batched differently: tight agreement
    assert np.abs(got_grouped - got_dense).max() / scale < 2e-3
    oscale = max(np.abs(want).max(), 1e-6)
    assert np.abs(got_grouped - want).max() / oscale < 0.05


def test_moe_grouped_prefill_w8_planes_engage(tmp_path):
    """With prefill_w8, the grouped MoE prefill rides the W8 kernel when
    the W8 lane tile divides per expert (E=3, HD=256 -> tm8=256, 3 tiles
    per layer plane). Output stays close to the XLA reference path."""
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.ops.pallas import gemm_quant
    from crabml_tpu.runtime.runner import Runner

    cfg = ModelConfig(
        architecture="llama", model_name="syn-moe-w8",
        embedding_dim=256, hidden_dim=256, n_layers=2, n_heads=4,
        n_kv_heads=2, vocab_size=512, seq_len=256, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"], n_experts=3, n_experts_used=2,
    )
    path = str(tmp_path / "moe_w8.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.Q8_0, seed=47)

    prompt = " ".join(["cat dog sun moon"] * 25)  # > _GROUPED_MIN_ROWS rows

    ref = Runner(path, seq_len=256, backend="xla")
    _, _, tok_ref = ref.prefill(prompt)

    calls = []
    orig = gemm_quant._run_grouped_w8
    gemm_quant._run_grouped_w8 = (
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1]
    )
    try:
        r = Runner(path, seq_len=256, backend="pallas", prefill_w8=True)
        _, _, tok = r.prefill(prompt)
    finally:
        gemm_quant._run_grouped_w8 = orig
    assert calls, "grouped W8 kernel did not engage"
    assert tok == tok_ref  # int8-storage noise must not flip the argmax


def test_auto_w8_policy(monkeypatch, stories260k_path):
    """VERDICT r3 #3: the flagless Runner auto-enables W8 prefill planes
    only on TPU with HBM headroom; small files and CPU stay byte-exact."""
    import jax.numpy as jnp

    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import config_from_gguf
    from crabml_tpu.runtime import runner as rmod

    gf = GGUFFile(stories260k_path)
    cfg = config_from_gguf(gf.metadata)
    # off-TPU (these tests run on CPU): never auto-engages
    assert rmod._auto_w8_budget(gf, cfg, 1, 256, jnp.bfloat16) is None
    monkeypatch.setattr(rmod.jax, "default_backend", lambda: "tpu")
    # small file (<1 GiB): stays exact
    assert rmod._auto_w8_budget(gf, cfg, 1, 256, jnp.bfloat16) is None
    # 7B-shaped file on a 16 GiB chip: full augmentation fits
    monkeypatch.setattr(rmod.os.path, "getsize", lambda p: 4 << 30)
    monkeypatch.setattr(rmod, "_device_hbm_bytes", lambda: 16 << 30)
    assert rmod._auto_w8_budget(gf, cfg, 1, 256, jnp.bfloat16) == -1
    # 13B-shaped file: no headroom at all -> off
    monkeypatch.setattr(rmod.os.path, "getsize", lambda p: 15 << 30)
    assert rmod._auto_w8_budget(gf, cfg, 1, 256, jnp.bfloat16) is None


def test_augment_w8_budget_partial():
    """Partial W8: with a byte budget, the LARGEST eligible tensors gain
    planes first and the rest stay un-augmented (the matmul dispatch keys
    on per-tensor plane presence, so mixed sets are fine)."""
    import numpy as np

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.weights import augment_w8_weights, w8_plane_bytes
    from crabml_tpu.ops.pallas.gemm_quant import random_repacked

    rng = np.random.default_rng(0)
    big = random_repacked(GGMLType.Q4_K, (1024, 512), rng)
    small = random_repacked(GGMLType.Q4_K, (256, 512), rng)
    w = {"layers": {"big": big, "small": small}, "output": None}

    full = augment_w8_weights(w)
    assert "w8" in full["layers"]["big"].planes
    assert "w8" in full["layers"]["small"].planes

    budget = w8_plane_bytes(big) + 16  # room for big only
    part = augment_w8_weights(w, budget_bytes=budget)
    assert "w8" in part["layers"]["big"].planes
    assert "w8" not in part["layers"]["small"].planes

    none = augment_w8_weights(w, budget_bytes=8)
    assert "w8" not in none["layers"]["big"].planes
