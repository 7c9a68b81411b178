"""Paged KV pool engine: outputs must match the slot-pool engine (greedy),
pages must recycle, pool exhaustion must queue rather than crash."""

import numpy as np
import pytest

from crabml_tpu.runtime.runner import Runner
from crabml_tpu.serving import Request, ServingEngine
from crabml_tpu.serving.paged import PAGE, PagedServingEngine
from crabml_tpu.tokenizer import Utf8Buf

PROMPTS = ["Lily is a cat", "Once upon a time", "Tom and Jane went"]


@pytest.fixture(scope="module")
def runner(stories260k_path):
    return Runner(stories260k_path, seq_len=256)


def _detok(engine, req):
    buf = Utf8Buf()
    return "".join(engine.tokenizer.decode(t, buf) for t in req.output_tokens)


def test_paged_matches_slot_pool(runner):
    dense = ServingEngine(runner, n_slots=2, seq_len=256)
    want = dense.generate([PROMPTS[0]], max_tokens=12)[0]

    paged = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    got = paged.generate([PROMPTS[0]], max_tokens=12)[0]
    assert got == want


def test_paged_page_recycling(runner):
    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    free0 = eng.pages_free()
    reqs = [eng.submit(Request(prompt=p, max_tokens=10)) for p in PROMPTS]
    eng.drain(max_steps=300)
    assert all(r.done for r in reqs)
    assert eng.pages_free() == free0  # everything returned to the pool


def test_paged_page_boundary_crossing(runner):
    """Generate across a PAGE boundary: on-demand page allocation."""
    eng = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=16)
    # prompt ~6 tokens pads to 1 page (128); generate past offset 128
    req = eng.submit(Request(prompt=PROMPTS[0], max_tokens=PAGE + 20))
    eng.drain(max_steps=400)
    assert req.done
    assert len(req.output_tokens) > PAGE  # crossed into an allocated page

    # same output as the dense engine, across the boundary
    dense = ServingEngine(runner, n_slots=1, seq_len=256)
    want = dense.generate([PROMPTS[0]], max_tokens=PAGE + 20)[0]
    assert _detok(eng, req) == want


def test_paged_pool_exhaustion_queues(runner):
    """With pages for only one request at a time, requests serialize."""
    eng = PagedServingEngine(runner, n_slots=3, seq_len=256, n_pages=3)
    reqs = [eng.submit(Request(prompt=p, max_tokens=6)) for p in PROMPTS]
    eng.drain(max_steps=600)
    assert all(r.done and r.finish_reason != "error" for r in reqs)


def test_freed_pages_never_corrupt_live_requests(runner):
    """Regression (review finding): after a slot finishes, its table row must
    point at the scratch page — otherwise the idle slot keeps scattering
    into freed pages that get reallocated to live requests."""
    # solo reference: long request alone
    solo = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=8)
    want = solo.generate([PROMPTS[1]], max_tokens=40)[0]

    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=8)
    long_req = eng.submit(Request(prompt=PROMPTS[1], max_tokens=40))
    short = eng.submit(Request(prompt=PROMPTS[0], max_tokens=4))
    for _ in range(8):
        eng.step()
    assert short.done  # finished: its pages return to the pool
    # a new request grabs the freed pages while long_req keeps decoding
    eng.submit(Request(prompt=PROMPTS[2], max_tokens=30))
    eng.drain(max_steps=300)
    assert long_req.done
    assert _detok(eng, long_req) == want


def test_impossible_prompt_fails_not_hangs(runner):
    eng = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=2)
    # one usable page = 128 tokens; a 140-token prompt can never fit
    req = eng.submit(Request(prompt="cat ", prompt_tokens=list(range(3, 143)),
                             max_tokens=4))
    eng.drain(max_steps=50)
    assert req.finish_reason == "error"


@pytest.mark.parametrize("arch", ["qwen2", "gemma", "phi2"])
def test_paged_matches_dense_all_archs(arch, tmp_path):
    """paged_decode_step duplicates forward()'s per-arch branches; pin each
    against the dense engine on synthetic models."""
    import jax
    import jax.numpy as jnp

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import fuse_weights, load_weights

    cfg = ModelConfig(
        architecture=arch, model_name=f"syn-{arch}",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=256, rms_norm_eps=1e-5,
        **ARCH_FEATURES[arch],
    )
    path = str(tmp_path / f"{arch}.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=31)
    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    w = jax.tree.map(jax.device_put, fuse_weights(load_weights(gf, lcfg), lcfg))

    toks = [1, 9, 33]
    dense = ServingEngine(weights=w, cfg=lcfg, tokenizer=None, n_slots=1, seq_len=256)
    r1 = dense.submit(Request(prompt="", prompt_tokens=toks, max_tokens=8))
    dense.drain(max_steps=40)

    paged = PagedServingEngine(weights=w, cfg=lcfg, tokenizer=None, n_slots=1,
                               seq_len=256, n_pages=6, kv_dtype=None)
    r2 = paged.submit(Request(prompt="", prompt_tokens=toks, max_tokens=8))
    paged.drain(max_steps=40)
    assert r2.output_tokens == r1.output_tokens


def test_paged_multi_token_ticks(runner):
    """Paged multi-tick output == single-tick, crossing page boundaries."""
    single = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    want = single.generate([PROMPTS[0]], max_tokens=PAGE + 10)[0]

    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    req = eng.submit(Request(prompt=PROMPTS[0], max_tokens=PAGE + 10))
    n = 0
    while any(eng.slots) or not eng.pending.empty():
        eng.step(multi=8)
        n += 1
        assert n < 100
    assert _detok(eng, req) == want


def test_paged_multi_tick_at_seq_len_edge(runner):
    """multi ticks near seq_len: page pre-allocation clamps at the table
    width and the request finishes with reason 'length'."""
    eng = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=8)
    req = eng.submit(Request(prompt=PROMPTS[0], max_tokens=10_000))
    n = 0
    while any(eng.slots) or not eng.pending.empty():
        eng.step(multi=8)
        n += 1
        assert n < 200
    assert req.done and req.finish_reason == "length"


def test_paged_int8_pages_match_dense_int8(runner):
    """int8 page pool (half the KV HBM): outputs must MATCH the dense
    engine's int8 cache (same quantization, different memory layout), and
    stay prefix-close to the float pool."""
    import jax.numpy as jnp

    from crabml_tpu.serving import Request, ServingEngine
    from crabml_tpu.serving.paged import PagedServingEngine

    prompts = ["Lily is a cat", "Once upon a time"]
    dense_q = ServingEngine(runner, n_slots=2, seq_len=96, kv_dtype=jnp.int8)
    want = dense_q.generate(prompts, max_tokens=12)

    e_q = PagedServingEngine(runner, n_slots=2, seq_len=96, n_pages=8,
                             kv_dtype=jnp.int8)
    got = e_q.generate(prompts, max_tokens=12)
    assert got == want

    e_f = PagedServingEngine(runner, n_slots=2, seq_len=96, n_pages=8,
                             kv_dtype=jnp.float32)
    base = e_f.generate(prompts, max_tokens=12)
    for b, g in zip(base, got):
        assert g[:11] == b[:11], f"{g!r} vs float {b!r}"


def test_multi_page_prefill_chunks_match_dense(runner):
    """Direct-to-page prefill with multi-page chunks (the default: 4 pages
    = 512 tokens per dispatch) + a ragged tail chunk: a 300-token prompt
    runs one 2-page chunk then one bucketed 2-page chunk whose padded tail
    writes land on the scratch page — outputs must match the dense engine
    token for token."""
    toks = [1] + (runner.tokenizer.encode("Tom and Jane went to the garden. ",
                                          bos=False) * 40)
    toks = toks[: 2 * PAGE + 44]  # 300 tokens: ragged over page boundaries

    dense = ServingEngine(runner, n_slots=1, seq_len=512)
    r1 = dense.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=10))
    dense.drain()

    paged = PagedServingEngine(runner, n_slots=1, seq_len=512, n_pages=8)
    assert paged.prefill_chunk == 4 * PAGE and paged._direct_prefill
    r2 = paged.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=10))
    paged.drain()
    assert r2.output_tokens == r1.output_tokens


def test_multi_page_prefill_fused_pool_parity(stories260k_path):
    """Fused (pool-out-of-scan) direct-to-page prefill: with a lane-padded
    pool the chunk attends over a bounded ctx-page gather with its own
    k/v spliced in at `filled`, and whole-page writes batch after the
    layer scan (_write_chunk_pages). Forcing one-page chunks makes every
    chunk after the first run at filled>0, so the splice offset and the
    predates-this-chunk ctx read are both load-bearing. Outputs must
    match the unpadded (pool-in-scan) engine token for token, bf16 and
    int8 pools alike."""
    import jax.numpy as jnp

    from crabml_tpu.runtime.runner import Runner

    plain_r = Runner(stories260k_path, seq_len=512)
    pad_r = Runner(stories260k_path, seq_len=512, kv_lane_pad=True)
    toks = [1] + (plain_r.tokenizer.encode(
        "Tom and Jane went to the garden. ", bos=False) * 40)
    toks = toks[: 2 * PAGE + 44]  # 300 tokens: 3 one-page chunks

    for kv_dtype in (None, jnp.int8):
        kw = dict(n_slots=1, seq_len=512, n_pages=8, prefill_chunk=PAGE)
        if kv_dtype is not None:
            kw["kv_dtype"] = kv_dtype
        plain = PagedServingEngine(plain_r, **kw)
        r1 = plain.submit(Request(prompt="", prompt_tokens=list(toks),
                                  max_tokens=10))
        plain.drain()
        fused = PagedServingEngine(pad_r, **kw)
        from crabml_tpu.serving.paged import _fused_pool_ok
        hd = fused.cfg.head_dim
        assert _fused_pool_ok(fused.cache, hd, fused.cache.k.shape[-1] - hd)
        r2 = fused.submit(Request(prompt="", prompt_tokens=list(toks),
                                  max_tokens=10))
        fused.drain()
        assert r2.output_tokens == r1.output_tokens


# feature-arch parity: the paged step wires qwen3 qk-norm, gemma2
# post-norms/softcaps/sliding-window, and llama3.1 rope scaling the same
# as the dense forward (advisor r2 finding: it used to silently omit them)
FEATURE_ARCHS = {
    "qwen3": dict(head_dim_override=24),
    # small caps so an omitted softcap visibly changes the outputs
    "gemma2": dict(attn_logit_softcap=2.0, final_logit_softcap=1.5,
                   sliding_window=48),
    "llama31": dict(rope_scaling_type="rope_freqs"),
}


@pytest.mark.parametrize("variant", list(FEATURE_ARCHS))
def test_paged_matches_dense_on_feature_archs(variant, tmp_path):
    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig
    from crabml_tpu.models.synthetic import write_synthetic_gguf

    arch = {"llama31": "llama"}.get(variant, variant)
    cfg = ModelConfig(
        architecture=arch, model_name=f"syn-{variant}",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=256, rms_norm_eps=1e-5,
        **ARCH_FEATURES[arch], **FEATURE_ARCHS[variant],
    )
    path = str(tmp_path / f"{variant}.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=23)
    r = Runner(path, seq_len=256)

    dense = ServingEngine(r, n_slots=2, seq_len=256)
    want = dense.generate(["tok3 tok5 tok7"], max_tokens=10)[0]
    paged = PagedServingEngine(r, n_slots=2, seq_len=256, n_pages=16)
    got = paged.generate(["tok3 tok5 tok7"], max_tokens=10)[0]
    assert got == want


def test_paged_pool_tp_sharded(stories260k_path):
    """ROADMAP r3: a GSPMD tp mesh shards the page pool over KV heads —
    pool HBM per device divides by tp — and generation matches the
    unsharded paged engine byte-for-byte."""
    import jax

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from crabml_tpu.parallel import make_mesh

    plain = PagedServingEngine(Runner(stories260k_path, seq_len=256),
                               n_slots=2, seq_len=256, n_pages=16)
    want = plain.generate([PROMPTS[0], PROMPTS[1]], max_tokens=12)

    mesh = make_mesh(tp=2, dp=1)
    r = Runner(stories260k_path, seq_len=256, sharding=mesh)
    eng = PagedServingEngine(r, n_slots=2, seq_len=256, n_pages=16)
    KV = r.cfg.n_kv_heads
    shard = next(iter(eng.cache.k.addressable_shards))
    assert shard.data.shape[2] == KV // 2, "pool not sharded over KV heads"
    got = eng.generate([PROMPTS[0], PROMPTS[1]], max_tokens=12)
    assert got == want


def test_paged_sync_admission_mode(runner):
    """prefill_chunk=None (legacy synchronous admission, supported on the
    base engine) must construct and generate, not TypeError at init."""
    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16,
                             prefill_chunk=None)
    want = PagedServingEngine(runner, n_slots=2, seq_len=256,
                              n_pages=16).generate(["Lily is a cat"],
                                                   max_tokens=8)
    got = eng.generate(["Lily is a cat"], max_tokens=8)
    assert got == want


def test_paged_matches_dense_moe(tmp_path):
    """MoE models route through project_ffn in paged_decode_step too —
    pin the paged engine against the dense slot pool on a mixtral-shaped
    synthetic model (decode = gather/cond regimes, prefill chunks large
    enough would take the grouped kernel)."""
    import jax
    import jax.numpy as jnp

    from crabml_tpu.gguf.constants import GGMLType
    from crabml_tpu.gguf.reader import GGUFFile
    from crabml_tpu.models.config import ARCH_FEATURES, ModelConfig, config_from_gguf
    from crabml_tpu.models.synthetic import write_synthetic_gguf
    from crabml_tpu.models.weights import fuse_weights, load_weights

    cfg = ModelConfig(
        architecture="llama", model_name="syn-moe-paged",
        embedding_dim=64, hidden_dim=96, n_layers=2, n_heads=4, n_kv_heads=2,
        vocab_size=512, seq_len=256, rms_norm_eps=1e-5,
        **ARCH_FEATURES["llama"], n_experts=4, n_experts_used=2,
    )
    path = str(tmp_path / "moe.gguf")
    write_synthetic_gguf(path, cfg, GGMLType.F32, seed=53)
    gf = GGUFFile(path)
    lcfg = config_from_gguf(gf.metadata)
    w = jax.tree.map(jax.device_put, fuse_weights(load_weights(gf, lcfg), lcfg))

    toks = [1, 9, 33, 101, 7]
    dense = ServingEngine(weights=w, cfg=lcfg, tokenizer=None, n_slots=2, seq_len=256)
    r1 = dense.submit(Request(prompt="", prompt_tokens=toks, max_tokens=10))
    dense.drain(max_steps=60)

    paged = PagedServingEngine(weights=w, cfg=lcfg, tokenizer=None, n_slots=2,
                               seq_len=256, n_pages=8, kv_dtype=None)
    r2 = paged.submit(Request(prompt="", prompt_tokens=toks, max_tokens=10))
    paged.drain(max_steps=60)
    assert r2.output_tokens == r1.output_tokens
    assert len(r1.output_tokens) == 10


# -- automatic prefix caching -------------------------------------------------


def _long_toks(seed, n):
    import numpy as np

    rng = np.random.default_rng(seed)
    return [1] + rng.integers(2, 500, n - 1).tolist()


def test_prefix_cache_hit_exact_and_accounted(runner):
    """A second identical prompt reuses the first's full pages: output is
    byte-identical to the uncached engine and the hit is accounted."""
    toks = _long_toks(5, 200)  # 1 full page (128) + partial tail

    plain = PagedServingEngine(runner, n_slots=2, seq_len=384, n_pages=16,
                               prefix_cache=False)
    r = plain.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=10))
    plain.drain(max_steps=300)
    want = list(r.output_tokens)

    eng = PagedServingEngine(runner, n_slots=2, seq_len=384, n_pages=16)
    r1 = eng.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=10))
    eng.drain(max_steps=300)
    assert eng.prefix_hits == 0  # nothing registered yet
    r2 = eng.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=10))
    eng.drain(max_steps=300)
    assert r1.output_tokens == want
    assert r2.output_tokens == want
    assert eng.prefix_hits == 1
    assert eng.prefix_tokens_reused == 128


def test_prefix_cache_concurrent_share_and_divergent_tail(runner):
    """Two live requests share prefix pages (refcounted); a third with the
    same first page but different tail must not be corrupted by sharing."""
    base = _long_toks(9, 260)  # 2 full pages + tail
    div = list(base[:150])  # shares page 0 only, diverges inside page 1
    div[140] = 7
    div += _long_toks(11, 40)[1:]

    plain = PagedServingEngine(runner, n_slots=3, seq_len=384, n_pages=24,
                               prefix_cache=False)
    rs = [plain.submit(Request(prompt="", prompt_tokens=list(t), max_tokens=8))
          for t in (base, base, div)]
    plain.drain(max_steps=400)
    want = [list(r.output_tokens) for r in rs]

    eng = PagedServingEngine(runner, n_slots=3, seq_len=384, n_pages=24)
    r1 = eng.submit(Request(prompt="", prompt_tokens=list(base), max_tokens=8))
    eng.drain(max_steps=400)
    rs2 = [eng.submit(Request(prompt="", prompt_tokens=list(t), max_tokens=8))
           for t in (base, div)]
    eng.drain(max_steps=400)
    assert r1.output_tokens == want[0]
    assert rs2[0].output_tokens == want[1]
    assert rs2[1].output_tokens == want[2]
    assert eng.prefix_hits == 2  # base reused 2 pages, div reused page 0
    assert eng.prefix_tokens_reused == 2 * 128 + 128


def test_prefix_cache_eviction_under_pressure(runner):
    """Cached ref-0 pages are reclaimed LRU when the pool runs short; new
    requests still complete correctly afterwards."""
    toks_a = _long_toks(21, 200)
    toks_b = _long_toks(22, 200)

    # pool of 7 usable pages; each request needs 2 (+1 decode slack)
    eng = PagedServingEngine(runner, n_slots=1, seq_len=384, n_pages=8)
    ra = eng.submit(Request(prompt="", prompt_tokens=list(toks_a), max_tokens=6))
    eng.drain(max_steps=300)
    free0 = len(eng._free)
    assert len(eng._evictable) == 1  # page 0 of A retained
    rb = eng.submit(Request(prompt="", prompt_tokens=list(toks_b), max_tokens=6))
    eng.drain(max_steps=300)
    ra2 = eng.submit(Request(prompt="", prompt_tokens=list(toks_a), max_tokens=6))
    eng.drain(max_steps=300)
    assert ra.finish_reason and rb.finish_reason and ra2.finish_reason
    assert ra2.output_tokens == ra.output_tokens
    # pool never leaks: free + evictable is conserved across the churn
    assert len(eng._free) + len(eng._evictable) == free0 + 1
    # observability (VERDICT r3 #7): force real pressure — allocating past
    # the free list must reclaim cached pages AND count the evictions
    assert eng.prefix_evictions == 0 and len(eng._evictable) > 0
    assert eng._alloc(len(eng._free) + 1) is not None
    assert eng.prefix_evictions >= 1


def test_prefix_cache_int8_pool(runner):
    """Prefix reuse over int8 pages (scales shared too) stays identical
    to the uncached int8 engine."""
    import jax.numpy as jnp

    toks = _long_toks(31, 200)
    plain = PagedServingEngine(runner, n_slots=2, seq_len=384, n_pages=16,
                               kv_dtype=jnp.int8, prefix_cache=False)
    r = plain.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=8))
    plain.drain(max_steps=300)

    eng = PagedServingEngine(runner, n_slots=2, seq_len=384, n_pages=16,
                             kv_dtype=jnp.int8)
    r1 = eng.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=8))
    eng.drain(max_steps=300)
    r2 = eng.submit(Request(prompt="", prompt_tokens=list(toks), max_tokens=8))
    eng.drain(max_steps=300)
    assert r1.output_tokens == r.output_tokens
    assert r2.output_tokens == r.output_tokens
    assert eng.prefix_hits == 1


def test_paged_logprobs_match_dense(runner):
    """The paged engine records the same logprobs as the dense slot pool
    (same model, greedy) — pins the paged decode/prefill logprob plumbing."""
    dense = ServingEngine(runner, n_slots=2, seq_len=256)
    d = dense.submit(Request(prompt=PROMPTS[0], max_tokens=8, logprobs=2))
    dense.drain(max_steps=100)

    paged = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    p = paged.submit(Request(prompt=PROMPTS[0], max_tokens=8, logprobs=2))
    paged.drain(max_steps=100)

    assert p.output_tokens == d.output_tokens
    assert len(p.output_logprobs) == len(d.output_logprobs) > 0
    # paged attention gathers page-tiles (different f32 reduction order
    # than the contiguous cache) — tokens are identical, values close
    for a, b in zip(p.output_logprobs, d.output_logprobs):
        assert a == pytest.approx(b, abs=2e-2)
    for ta, tb in zip(p.output_top_logprobs, d.output_top_logprobs):
        assert [i for i, _ in ta] == [i for i, _ in tb]


def test_pool_pressure_preempts_not_errors(runner):
    """Mid-flight pool exhaustion preempts the youngest request
    (recompute-style) instead of killing it: both requests complete with
    outputs byte-identical to a roomy pool's."""
    roomy = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    want = [roomy.generate([p], max_tokens=PAGE + 12)[0] for p in PROMPTS[:2]]

    # 3 usable pages for two requests that each grow to 2 pages
    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=4)
    reqs = [eng.submit(Request(prompt=p, max_tokens=PAGE + 12))
            for p in PROMPTS[:2]]
    eng.drain(max_steps=2000)
    assert eng.preemptions >= 1
    assert [r.finish_reason for r in reqs] == ["length", "length"]
    assert [_detok(eng, r) for r in reqs] == want


def test_preempted_request_reuses_its_prefix_pages(runner):
    """Preemption retains registered prompt pages as evictable prefix
    cache; if pressure hasn't reclaimed them by requeue time, the
    recompute prefill reuses them instead of recomputing the prompt."""
    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=4)
    # the OLDER request is short (never preempted); the YOUNGER one has a
    # full-page prompt whose page registers in the prefix cache, gets
    # preempted under pressure, and must reuse its own page on requeue —
    # this also exercises the pin-before-alloc path (_alloc must not
    # evict-and-reallocate the page being reused)
    b = Request(prompt="", max_tokens=PAGE + 8)
    b.prompt_tokens = [1] + list(range(200, 240))
    eng.submit(b)
    long_prompt = list(range(3, 3 + PAGE))
    a = Request(prompt="", max_tokens=PAGE + 8)
    a.prompt_tokens = list(long_prompt)
    eng.submit(a)
    eng.drain(max_steps=2000)
    assert a.done and b.done
    assert eng.preemptions >= 1
    # the preempted request's requeue admitted through the prefix cache
    assert eng.prefix_hits >= 1
    # and the reused-page path produced the exact solo-run output (the
    # pin-before-alloc fix: without it the reused page could be evicted
    # and re-handed-out as the decode page, corrupting the prompt KV)
    solo = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=8)
    ra = Request(prompt="", max_tokens=PAGE + 8)
    ra.prompt_tokens = list(long_prompt)
    solo.submit(ra)
    solo.drain(max_steps=2000)
    assert a.output_tokens == ra.output_tokens


def test_paged_speculative_exactness(runner):
    """Paged speculative ticks (verify through the page pool) emit exactly
    the plain paged engine's greedy tokens, including across page
    boundaries."""
    plain = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    want = [plain.generate([p], max_tokens=PAGE + 10)[0] for p in PROMPTS[:2]]

    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16,
                             speculative=5)
    reqs = [eng.submit(Request(prompt=p, max_tokens=PAGE + 10))
            for p in PROMPTS[:2]]
    eng.drain(max_steps=2000)
    assert eng.spec_ticks > 0
    assert [_detok(eng, r) for r in reqs] == want


def test_paged_speculative_oracle_accepts_multi(runner, monkeypatch):
    """Perfect drafts through the paged pool: multi-token acceptance per
    tick with pages allocated ahead of the verify writes."""
    import crabml_tpu.serving.engine as eng_mod

    plain = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=8)
    g = plain.submit(Request(prompt=PROMPTS[0], max_tokens=40))
    plain.drain(max_steps=400)
    full = g.prompt_tokens + g.output_tokens

    def oracle(ctx, K):
        d = full[len(ctx): len(ctx) + K]
        return list(d) + [0] * (K - len(d))

    monkeypatch.setattr(eng_mod, "_lookup_draft", oracle)
    eng = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=8,
                             speculative=5)
    r = eng.submit(Request(prompt=PROMPTS[0], max_tokens=40))
    eng.drain(max_steps=200)
    assert r.output_tokens == g.output_tokens
    assert eng.spec_tokens / eng.spec_ticks >= 3


def test_paged_speculative_int8_pool(runner):
    """Speculative verify writes quantized KV through the block table."""
    import jax.numpy as jnp

    plain = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=8,
                               kv_dtype=jnp.int8)
    want = plain.generate([PROMPTS[0]], max_tokens=20)
    eng = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=8,
                             kv_dtype=jnp.int8, speculative=4)
    assert eng.generate([PROMPTS[0]], max_tokens=20) == want


def test_paged_two_model_speculative(stories260k_path):
    """Two-model speculation through the page pool (VERDICT r3 #4: the
    paged engine previously raised). The draft model rides a dense slot
    cache beside the paged target; with draft == target every tick must
    emit K+1 tokens and output matches the plain paged engine exactly."""
    tr = Runner(stories260k_path, seq_len=256)
    plain = PagedServingEngine(tr, n_slots=2, seq_len=256, n_pages=16)
    want = [plain.generate([p], max_tokens=24)[0] for p in PROMPTS[:2]]

    spec_r = Runner(stories260k_path, seq_len=256,
                    draft_model=stories260k_path)
    eng = PagedServingEngine(spec_r, n_slots=2, seq_len=256, n_pages=16,
                             speculative=5)
    assert eng._draft_w is not None
    reqs = [eng.submit(Request(prompt=p, max_tokens=24))
            for p in PROMPTS[:2]]
    eng.drain(max_steps=300)
    assert [_detok(eng, r) for r in reqs] == want
    assert eng.spec_ticks > 0
    assert eng.spec_tokens / eng.spec_ticks >= 4


def test_paged_two_model_with_prefix_reuse(stories260k_path):
    """Prefix-cache page reuse skips the target's prefill chunks but the
    draft has no pages: its cache must still cover the reused prefix
    (teacher-forced at claim), keeping acceptance and output exact."""
    long_prompt = (" ".join(PROMPTS) + " and then ") * 12  # > 1 full PAGE
    spec_r = Runner(stories260k_path, seq_len=512,
                    draft_model=stories260k_path)
    eng = PagedServingEngine(spec_r, n_slots=1, seq_len=512, n_pages=16,
                             speculative=4)
    assert len(eng.tokenizer.encode(long_prompt, bos=True)) > PAGE + 1
    first = eng.generate([long_prompt], max_tokens=16)[0]
    hits0 = eng.prefix_hits
    second = eng.generate([long_prompt], max_tokens=16)[0]
    assert second == first
    assert eng.prefix_hits > hits0  # the reuse path actually ran


# ---------------------------------------------------------------------------
# fused multi-round speculative scan through the page pool (_paged_spec_scan)
# ---------------------------------------------------------------------------


def _drain_fused(eng, multi, max_steps=400):
    n = 0
    while (any(eng.slots) or not eng.pending.empty()) and n < max_steps:
        idle = eng.pending.empty() and not eng._prefilling
        eng.step(multi if idle else 1)
        n += 1


def test_paged_fused_spec_scan_exactness(runner):
    """The paged fused multi-round scan (on-device drafts, R rounds per
    dispatch, verifies writing through the block table) emits exactly the
    plain paged engine's greedy tokens, including across page
    boundaries."""
    plain = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16)
    want = [plain.generate([p], max_tokens=PAGE + 10)[0]
            for p in PROMPTS[:2]]

    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16,
                             speculative=4, tick_tokens=6,
                             spec_fused=True)
    reqs = [eng.submit(Request(prompt=p, max_tokens=PAGE + 10))
            for p in PROMPTS[:2]]
    _drain_fused(eng, 6)
    assert [_detok(eng, r) for r in reqs] == want
    assert eng.spec_ticks > 0


def test_paged_fused_spec_scan_int8_pool(runner):
    """Fused rounds write quantized KV + scales through the table."""
    import jax.numpy as jnp

    plain = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16,
                               kv_dtype=jnp.int8)
    want = [plain.generate([p], max_tokens=24)[0] for p in PROMPTS[:2]]
    eng = PagedServingEngine(runner, n_slots=2, seq_len=256, n_pages=16,
                             kv_dtype=jnp.int8, speculative=4,
                             tick_tokens=6, spec_fused=True)
    reqs = [eng.submit(Request(prompt=p, max_tokens=24))
            for p in PROMPTS[:2]]
    _drain_fused(eng, 6)
    assert [_detok(eng, r) for r in reqs] == want
    assert eng.spec_ticks > 0


def test_paged_fused_spec_scan_two_model(stories260k_path):
    """Two-model fused scan through the pool: draft == target gives full
    acceptance and byte-exact output (the draft chain runs in-scan on its
    dense cache while verifies write paged)."""
    tr = Runner(stories260k_path, seq_len=256)
    plain = PagedServingEngine(tr, n_slots=2, seq_len=256, n_pages=16)
    want = [plain.generate([p], max_tokens=30)[0] for p in PROMPTS[:2]]

    spec_r = Runner(stories260k_path, seq_len=256,
                    draft_model=stories260k_path)
    eng = PagedServingEngine(spec_r, n_slots=2, seq_len=256, n_pages=16,
                             speculative=4, tick_tokens=4, spec_fused=True)
    reqs = [eng.submit(Request(prompt=p, max_tokens=30))
            for p in PROMPTS[:2]]
    _drain_fused(eng, 4)
    assert [_detok(eng, r) for r in reqs] == want
    # anything above K+1=5 proves full-draft rounds for both slots
    assert eng.spec_tokens / eng.spec_ticks > 5


def test_paged_fused_spec_scan_mixed_traffic(stories260k_path):
    """Per-slot eligibility through the paged fused path: a penalized
    deterministic slot matches plain output while greedy slots accept
    multi-token rounds."""
    tr = Runner(stories260k_path, seq_len=256)
    plain = PagedServingEngine(tr, n_slots=3, seq_len=256, n_pages=24)
    want_g = plain.generate([PROMPTS[0]], max_tokens=18)[0]
    plain2 = PagedServingEngine(tr, n_slots=3, seq_len=256, n_pages=24)
    want_p = plain2.generate([PROMPTS[2]], max_tokens=18,
                             repetition_penalty=1.3)[0]

    eng = PagedServingEngine(tr, n_slots=3, seq_len=256, n_pages=24,
                             speculative=4, tick_tokens=4, spec_fused=True)
    rg = eng.submit(Request(prompt=PROMPTS[0], max_tokens=18))
    rs = eng.submit(Request(prompt=PROMPTS[1], max_tokens=8,
                            temperature=0.9))
    rp = eng.submit(Request(prompt=PROMPTS[2], max_tokens=18,
                            repetition_penalty=1.3))
    _drain_fused(eng, 4)
    assert rg.done and rs.done and rp.done
    assert _detok(eng, rg) == want_g
    assert _detok(eng, rp) == want_p


def test_spec_fused_defaults(runner):
    """Measured per-engine defaults (benchmarks/r4/spec_ab_*.json): the
    dense engine fuses speculative rounds by default, the paged engine
    keeps single-dispatch ticks unless opted in."""
    d = ServingEngine(runner, n_slots=1, seq_len=128, speculative=3)
    assert d.spec_fused
    pg = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=8,
                            speculative=3)
    assert not pg.spec_fused
    pg2 = PagedServingEngine(runner, n_slots=1, seq_len=256, n_pages=8,
                             speculative=3, spec_fused=True)
    assert pg2.spec_fused
