"""Continuous-batching engine: batched outputs must equal the single-request
Runner path (greedy), slots must recycle, streaming + HTTP front-end work."""

import json
import threading
import urllib.error
import urllib.request

import pytest

from crabml_tpu.runtime.runner import Runner
from crabml_tpu.serving import Request, ServingEngine
from crabml_tpu.serving.http import make_handler
from crabml_tpu.tokenizer import Utf8Buf

PROMPTS = ["Lily is a cat", "Once upon a time", "Tom and Jane went"]


@pytest.fixture(scope="module")
def runner(stories260k_path):
    return Runner(stories260k_path, seq_len=96)


def _runner_golden(runner, prompt, steps):
    runner.reset()
    return "".join(runner.prefill_and_generate(prompt, steps=steps))


def _detok(engine, req):
    buf = Utf8Buf()
    return "".join(engine.tokenizer.decode(t, buf) for t in req.output_tokens)


def test_continuous_batching_matches_single(runner):
    golden = {p: _runner_golden(runner, p, steps=16) for p in PROMPTS}

    # fewer slots than requests: forces recycling mid-flight
    engine = ServingEngine(runner, n_slots=2, seq_len=96)
    reqs = [engine.submit(Request(prompt=p, max_tokens=16)) for p in PROMPTS]
    engine.drain(max_steps=400)

    for p, r in zip(PROMPTS, reqs):
        assert r.done, f"request {p!r} never finished"
        got = _detok(engine, r)
        # golden includes the first sampled token from prefill, same as engine
        assert got == golden[p], f"{p!r}: {got!r} != {golden[p]!r}"


def test_staggered_admission(runner):
    """A request submitted while others are mid-decode must still match."""
    golden = _runner_golden(runner, PROMPTS[0], steps=12)

    engine = ServingEngine(runner, n_slots=2, seq_len=96)
    engine.submit(Request(prompt=PROMPTS[1], max_tokens=30))
    for _ in range(5):
        engine.step()
    late = engine.submit(Request(prompt=PROMPTS[0], max_tokens=12))
    engine.drain(max_steps=400)
    assert late.done
    assert _detok(engine, late) == golden


def test_streaming_queue(runner):
    engine = ServingEngine(runner, n_slots=1, seq_len=96)
    stream = engine.enqueue_streaming(Request(prompt=PROMPTS[0], max_tokens=8))
    engine.drain(max_steps=100)
    pieces = []
    while True:
        piece = stream.get_nowait()
        if piece is None:
            break
        pieces.append(piece)
    assert "".join(pieces) == _runner_golden(runner, PROMPTS[0], steps=8)


def test_http_server(runner):
    from http.server import ThreadingHTTPServer

    engine = ServingEngine(runner, n_slots=2, seq_len=96)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    loop = threading.Thread(target=engine.run_forever, daemon=True)
    loop.start()
    try:
        body = json.dumps({"prompt": PROMPTS[0], "max_tokens": 8}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["choices"][0]["text"] == _runner_golden(runner, PROMPTS[0], steps=8)
        assert out["usage"]["completion_tokens"] > 0

        with urllib.request.urlopen(f"http://127.0.0.1:{port}/v1/models", timeout=30) as resp:
            models = json.loads(resp.read())
        assert models["data"][0]["object"] == "model"
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/health", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["status"] == "ok"
        assert health["slots_total"] == 2
    finally:
        engine.shutdown()
        server.shutdown()
        server.server_close()


def test_serving_int8_kv(runner):
    """Continuous batching over an int8-quantized KV cache."""
    import jax.numpy as jnp

    engine = ServingEngine(runner, n_slots=2, seq_len=96, kv_dtype=jnp.int8)
    outs = engine.generate([PROMPTS[0]], max_tokens=10)
    want = _runner_golden(runner, PROMPTS[0], steps=10)
    # int8 cache: tokens may legitimately differ from the f32 path on a
    # 260k model, but must be non-empty deterministic text
    assert len(outs[0]) > 0
    engine2 = ServingEngine(runner, n_slots=2, seq_len=96, kv_dtype=jnp.int8)
    assert engine2.generate([PROMPTS[0]], max_tokens=10) == outs


def test_stop_strings(runner):
    """Per-request stop strings end generation mid-stream."""
    base = _runner_golden(runner, PROMPTS[0], steps=16)
    # choose a stop string that actually occurs in the golden continuation
    stop_word = base.strip().split(" ")[2]
    engine = ServingEngine(runner, n_slots=1, seq_len=96)
    req = engine.submit(Request(prompt=PROMPTS[0], max_tokens=16, stop=(stop_word,)))
    engine.drain(max_steps=100)
    assert req.finish_reason == "stop"
    got = _detok(engine, req)
    assert len(got) < len(base)  # ended early, at the stop string


def test_multi_token_ticks_match_single(runner):
    """step(multi=4) produces identical greedy output to single ticks,
    including EOS/max_tokens that land mid-tick."""
    want = {p: _runner_golden(runner, p, steps=11) for p in PROMPTS[:2]}

    engine = ServingEngine(runner, n_slots=2, seq_len=96)
    reqs = [engine.submit(Request(prompt=p, max_tokens=11)) for p in PROMPTS[:2]]
    n = 0
    while any(engine.slots) or not engine.pending.empty():
        engine.step(multi=4)
        n += 1
        assert n < 50
    for p, r in zip(PROMPTS[:2], reqs):
        assert _detok(engine, r) == want[p]


def test_chunked_admission_interleaves_decode(runner):
    """VERDICT r1 #5: while a long prompt admits in chunks, a running
    request keeps receiving tokens — admission must not head-of-line-block
    decode. Also: chunked output == synchronous-admission output."""

    def make(chunk):
        return ServingEngine(runner, n_slots=2, seq_len=96, prefill_chunk=chunk)

    long_prompt = "one two three four five six seven eight nine ten " * 3

    sync = make(None)
    want_short = sync.generate(["hello"], max_tokens=12)[0]
    sync2 = make(None)
    want_long = sync2.generate([long_prompt], max_tokens=6)[0]

    eng = make(8)  # tiny chunks: admission spans many ticks
    r_short = eng.submit(Request(prompt="hello", max_tokens=12))
    for _ in range(3):
        eng.step()
    assert len(r_short.output_tokens) > 0 and not r_short.done

    r_long = eng.submit(Request(prompt=long_prompt, max_tokens=6))
    n_chunks = -(-len(r_long.prompt_tokens) // 8)
    assert n_chunks >= 3  # the admission genuinely spans ticks

    # during admission, ticks must keep delivering tokens to the runner
    interleaved = 0
    for _ in range(n_chunks - 1):
        got = len(r_short.output_tokens)
        eng.step()
        if r_short.done:
            break
        if len(r_short.output_tokens) > got:
            interleaved += 1
    assert interleaved >= 2, "decode stalled during chunked admission"
    eng.drain(max_steps=400)
    assert _detok(eng, r_short) == want_short
    assert _detok(eng, r_long) == want_long


def test_logit_bias_forces_and_bans_tokens(runner):
    """VERDICT r2 #9: logit_bias over the engine (the REST field's backing).
    A +100 bias forces a token every step; the row clears on finish."""
    eng = ServingEngine(runner, n_slots=2, seq_len=96)
    forced = 42
    req = eng.submit(Request(prompt=PROMPTS[0], max_tokens=5,
                             logit_bias=((forced, 100.0),)))
    eng.drain(max_steps=200)
    assert req.done
    assert all(t == forced for t in req.output_tokens)

    # same engine, no bias: the slot's bias row must have been cleared —
    # greedy output matches the bias-free single-request path exactly
    fresh = ServingEngine(runner, n_slots=2, seq_len=96)
    want = fresh.generate([PROMPTS[0]], max_tokens=5)[0]
    req2 = eng.submit(Request(prompt=PROMPTS[0], max_tokens=5))
    eng.drain(max_steps=200)
    assert req2.done
    assert _detok(eng, req2) == want


def test_logit_bias_rest_field(runner):
    """logit_bias arrives over HTTP as a {token_id: bias} map."""
    import http.client

    eng = ServingEngine(runner, n_slots=2, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        port = server.server_address[1]
        body = json.dumps({"prompt": PROMPTS[0], "max_tokens": 4,
                           "logit_bias": {"17": 100.0}}).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["usage"]["completion_tokens"] == 4
        piece = eng.tokenizer.decode_tokens([17] * 4)
        assert out["choices"][0]["text"] == piece
    finally:
        server.shutdown()
        eng.shutdown()


def test_engine_cache_tp_sharded(stories260k_path):
    """A GSPMD tp-sharded Runner propagates its mesh into ServingEngine:
    the slot-pool cache shards over KV heads and outputs match unsharded."""
    import jax
    import pytest

    if len(jax.devices()) < 2:
        pytest.skip("needs 2 devices")
    from crabml_tpu.parallel import make_mesh
    from crabml_tpu.runtime.runner import Runner
    from crabml_tpu.serving import ServingEngine

    plain = ServingEngine(Runner(stories260k_path, seq_len=128),
                          n_slots=2, seq_len=128)
    want = plain.generate(["Lily is a cat"], max_tokens=10)[0]

    mesh = make_mesh(tp=2, dp=1)
    r = Runner(stories260k_path, seq_len=128, sharding=mesh)
    eng = ServingEngine(r, n_slots=2, seq_len=128)
    shard = next(iter(eng.cache.k.addressable_shards))
    assert shard.data.shape[2] == r.cfg.n_kv_heads // 2
    assert eng.generate(["Lily is a cat"], max_tokens=10)[0] == want


def test_http_chat_completions(runner):
    from http.server import ThreadingHTTPServer

    engine = ServingEngine(runner, n_slots=2, seq_len=96)
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    loop = threading.Thread(target=engine.run_forever, daemon=True)
    loop.start()
    try:
        body = json.dumps({
            "messages": [
                {"role": "system", "content": "You tell stories."},
                {"role": "user", "content": "Lily is a cat"},
            ],
            "max_tokens": 8,
        }).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions", data=body,
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert out["object"] == "chat.completion"
        msg = out["choices"][0]["message"]
        assert msg["role"] == "assistant" and isinstance(msg["content"], str)
        assert out["usage"]["completion_tokens"] > 0

        # malformed messages -> 400, not a hung request
        bad = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": "hi"}).encode(),
            headers={"Content-Type": "application/json"},
        )
        try:
            urllib.request.urlopen(bad, timeout=30)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400

        # streaming: chat.completion.chunk deltas, then [DONE]
        sreq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({
                "messages": [{"role": "user", "content": "Once upon a time"}],
                "max_tokens": 6, "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(sreq, timeout=120) as resp:
            raw = resp.read().decode()
        events = [l[6:] for l in raw.split("\n") if l.startswith("data: ")]
        assert events[-1] == "[DONE]"
        parsed = [json.loads(e) for e in events[:-1]]
        assert all(p["object"] == "chat.completion.chunk" for p in parsed)
        deltas = [p["choices"][0]["delta"].get("content", "") for p in parsed]
        assert "".join(deltas)  # some text streamed
        assert parsed[-1]["choices"][0].get("finish_reason") in ("stop", "length")
    finally:
        engine.shutdown()
        server.shutdown()
        server.server_close()


def test_logprobs_match_full_forward(runner):
    """Engine-recorded logprobs == log_softmax of an independent full
    forward over [prompt + outputs] at each generated position (greedy,
    no penalties => processed logits == raw logits). Covers the prefill
    first-token, single-tick, and fused multi-tick paths."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crabml_tpu.models.forward import KVCache, forward

    engine = ServingEngine(runner, n_slots=2, seq_len=96)
    req = engine.submit(Request(prompt=PROMPTS[0], max_tokens=9, logprobs=3))
    while not req.done:
        engine.step(multi=3)  # fused scan path after the prefill tick

    n = len(req.output_tokens)
    assert len(req.output_logprobs) == n
    assert len(req.output_top_logprobs) == n
    for tok, lp, top in zip(req.output_tokens, req.output_logprobs,
                            req.output_top_logprobs):
        assert len(top) == 3
        assert top[0][0] == tok  # greedy: sampled token IS the top-1
        assert top[0][1] == pytest.approx(lp, abs=1e-5)
        assert lp <= 0.0
        assert top[0][1] >= top[1][1] >= top[2][1]

    seq = list(req.prompt_tokens) + list(req.output_tokens)
    cache = KVCache.create(engine.cfg, 1, 128)
    logits, _ = forward(
        engine.weights, cache, jnp.asarray([seq], jnp.int32),
        jnp.zeros(1, jnp.int32), engine.cfg, engine.compute_dtype,
    )
    lsm = np.asarray(jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1))
    p = len(req.prompt_tokens)
    for j, tok in enumerate(req.output_tokens):
        assert req.output_logprobs[j] == pytest.approx(
            float(lsm[p - 1 + j, tok]), abs=2e-3
        ), f"position {j}"


def test_logprobs_rest_field(runner):
    """OpenAI completions `logprobs: N` returns tokens/token_logprobs/
    top_logprobs; requests without it get logprobs: null."""
    eng = ServingEngine(runner, n_slots=2, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        port = server.server_address[1]

        def post(path, body):
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}", data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(rq, timeout=120) as r:
                return json.loads(r.read())

        out = post("/v1/completions",
                   {"prompt": PROMPTS[0], "max_tokens": 5, "logprobs": 2})
        lp = out["choices"][0]["logprobs"]
        n = out["usage"]["completion_tokens"]
        assert len(lp["tokens"]) == n == len(lp["token_logprobs"])
        assert len(lp["top_logprobs"]) == n
        assert all(len(d) == 2 for d in lp["top_logprobs"])
        assert all(isinstance(k, str) and v <= 0.0
                   for d in lp["top_logprobs"] for k, v in d.items())
        # the response text is the concatenation of the logprob tokens
        assert "".join(lp["tokens"]) == out["choices"][0]["text"]

        out2 = post("/v1/completions", {"prompt": PROMPTS[0], "max_tokens": 4})
        assert out2["choices"][0]["logprobs"] is None

        # chat flavor: logprobs: true + top_logprobs
        out3 = post("/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "Hi"}],
                     "max_tokens": 4, "logprobs": True, "top_logprobs": 2})
        content = out3["choices"][0]["logprobs"]["content"]
        assert len(content) == out3["usage"]["completion_tokens"]
        assert all(e["logprob"] <= 0.0 and len(e["top_logprobs"]) == 2
                   for e in content)
    finally:
        server.shutdown()
        eng.shutdown()


def test_metrics_endpoint(runner):
    """GET /metrics exposes Prometheus-format engine counters."""
    eng = ServingEngine(runner, n_slots=2, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        port = server.server_address[1]
        body = json.dumps({"prompt": PROMPTS[0], "max_tokens": 5}).encode()
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        urllib.request.urlopen(rq, timeout=120).read()
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/metrics",
                                    timeout=30) as r:
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        metrics = {
            line.split()[0]: float(line.split()[1])
            for line in text.splitlines() if line and not line.startswith("#")
        }
        assert metrics["crabml_slots_total"] == 2
        assert metrics["crabml_requests_submitted_total"] == 1
        assert metrics["crabml_requests_completed_total"] == 1
        # the first output token comes from prefill logits; the decode-tick
        # counter sees the remaining max_tokens - 1
        assert metrics["crabml_tokens_generated_total"] >= 4
        assert "# TYPE crabml_decode_steps_total counter" in text
        # latency histograms: one request observed end-to-end
        assert "# TYPE crabml_ttft_seconds histogram" in text
        assert metrics["crabml_ttft_seconds_count"] == 1
        assert metrics["crabml_request_duration_seconds_count"] == 1
        assert metrics['crabml_ttft_seconds_bucket{le="+Inf"}'] == 1
        assert (metrics["crabml_request_duration_seconds_sum"]
                >= metrics["crabml_ttft_seconds_sum"])
    finally:
        server.shutdown()
        eng.shutdown()


def test_n_multiple_choices(runner):
    """OpenAI `n`: one request returns n indexed choices (greedy ->
    identical; they decode concurrently in the slot pool)."""
    eng = ServingEngine(runner, n_slots=3, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        port = server.server_address[1]
        body = json.dumps(
            {"prompt": PROMPTS[0], "max_tokens": 6, "n": 3}).encode()
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(rq, timeout=240).read())
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        texts = [c["text"] for c in out["choices"]]
        assert len(set(texts)) == 1 and texts[0]  # greedy: all identical
        assert out["usage"]["completion_tokens"] == 18
        # n beyond the slot pool — and "n": null (TypeError path) — are
        # client errors, not dropped connections
        for bad_n in (99, None):
            bad = json.dumps({"prompt": "x", "n": bad_n}).encode()
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/completions", data=bad,
                headers={"Content-Type": "application/json"})
            try:
                urllib.request.urlopen(rq, timeout=60)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
    finally:
        server.shutdown()
        eng.shutdown()


def test_n_streaming_indexed_chunks(runner):
    eng = ServingEngine(runner, n_slots=2, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    st = threading.Thread(target=server.serve_forever, daemon=True)
    st.start()
    try:
        port = server.server_address[1]
        body = json.dumps({"prompt": PROMPTS[0], "max_tokens": 5, "n": 2,
                           "stream": True}).encode()
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=240) as resp:
            raw = resp.read().decode()
        events = [json.loads(line[6:]) for line in raw.splitlines()
                  if line.startswith("data: ") and line != "data: [DONE]"]
        assert {e["index"] for e in events} == {0, 1}
        by_idx = {}
        for e in events:
            by_idx.setdefault(e["index"], []).append(e["text"])
        assert "".join(by_idx[0]) == "".join(by_idx[1])  # greedy
        assert raw.rstrip().endswith("data: [DONE]")
    finally:
        server.shutdown()
        eng.shutdown()


def test_echo_param(runner):
    eng = ServingEngine(runner, n_slots=1, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]
        body = json.dumps({"prompt": PROMPTS[0], "max_tokens": 4,
                           "echo": True}).encode()
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions", data=body,
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(rq, timeout=120).read())
        assert out["choices"][0]["text"].startswith(PROMPTS[0])
    finally:
        server.shutdown()
        eng.shutdown()


def test_speculative_serving_exactness(runner):
    """Speculative ticks emit exactly the plain engine's greedy tokens —
    acceptance only shortcuts dispatches, never changes output (on short
    story text the n-gram draft rarely hits, so this pins the
    mostly-rejected regime)."""
    plain = ServingEngine(runner, n_slots=2, seq_len=96)
    want = [plain.generate([p], max_tokens=24)[0] for p in PROMPTS[:2]]

    eng = ServingEngine(runner, n_slots=2, seq_len=96, speculative=5)
    reqs = [eng.submit(Request(prompt=p, max_tokens=24)) for p in PROMPTS[:2]]
    eng.drain(max_steps=400)
    assert [_detok(eng, r) for r in reqs] == want
    assert eng.spec_ticks > 0


def test_speculative_oracle_draft_accepts_multi(runner, monkeypatch):
    """With a perfect draft the verify tick must emit K+1 tokens at once
    (the acceptance/pos/delivery bookkeeping, isolated from draft quality):
    draft with an oracle that continues the plain engine's golden output."""
    import crabml_tpu.serving.engine as eng_mod

    plain = ServingEngine(runner, n_slots=1, seq_len=96)
    golden_req = plain.submit(Request(prompt=PROMPTS[0], max_tokens=24))
    plain.drain(max_steps=200)
    full = golden_req.prompt_tokens + golden_req.output_tokens

    def oracle(ctx, K):
        n = len(ctx)
        assert full[:n] == list(ctx)  # exactness invariant mid-flight
        d = full[n: n + K]
        return list(d) + [0] * (K - len(d))

    monkeypatch.setattr(eng_mod, "_lookup_draft", oracle)
    eng = ServingEngine(runner, n_slots=1, seq_len=96, speculative=5)
    r = eng.submit(Request(prompt=PROMPTS[0], max_tokens=24))
    eng.drain(max_steps=100)
    assert r.output_tokens == golden_req.output_tokens
    # 23 post-prefill tokens at up to 6/tick: the draft actually accepted
    assert eng.spec_ticks <= 6
    assert eng.spec_tokens / eng.spec_ticks >= 3


def test_speculative_falls_back_for_sampling_requests(runner):
    """A non-greedy slot in the batch forces plain ticks (exactness needs
    argmax verify); outputs stay correct and generation completes."""
    plain = ServingEngine(runner, n_slots=2, seq_len=96)
    want = plain.generate([PROMPTS[0]], max_tokens=8)[0]

    eng = ServingEngine(runner, n_slots=2, seq_len=96, speculative=5)
    r1 = eng.submit(Request(prompt=PROMPTS[0], max_tokens=8))
    r2 = eng.submit(Request(prompt=PROMPTS[1], max_tokens=8, temperature=0.8))
    eng.drain(max_steps=200)
    assert r1.done and r2.done
    assert _detok(eng, r1) == want  # greedy slot unaffected by the mix


def test_speculative_near_seq_edge_falls_back(runner):
    """Close to seq_len the verify window would cross the edge: the tick
    falls back and the request still finishes by length."""
    eng = ServingEngine(runner, n_slots=1, seq_len=48, speculative=16)
    r = eng.submit(Request(prompt=PROMPTS[0], max_tokens=64))
    eng.drain(max_steps=300)
    assert r.done and r.finish_reason == "length"


def test_cancel_frees_slot_and_mid_prefill(runner):
    eng = ServingEngine(runner, n_slots=1, seq_len=96, prefill_chunk=8)
    # 1) cancel mid-decode
    r = eng.submit(Request(prompt=PROMPTS[0], max_tokens=50))
    for _ in range(5):
        eng.step()
    assert not r.done
    eng.cancel(r)
    eng.step()
    assert r.finish_reason == "cancelled"
    assert eng.slots[0] is None  # slot freed for the next request
    # 2) cancel while still queued
    blocker = eng.submit(Request(prompt=PROMPTS[1], max_tokens=30))
    queued = eng.submit(Request(prompt=PROMPTS[2], max_tokens=30))
    eng.cancel(queued)
    eng.drain(max_steps=200)
    assert blocker.done and blocker.finish_reason == "length"
    assert queued.finish_reason == "cancelled" and not queued.output_tokens
    # 3) cancel mid-admission (chunked prefill in flight)
    long_req = eng.submit(Request(
        prompt="one two three four five six seven eight nine ten " * 2,
        max_tokens=30))
    eng.step()
    assert eng._prefilling  # genuinely mid-prefill
    eng.cancel(long_req)
    eng.step()
    assert long_req.finish_reason == "cancelled"
    assert not eng._prefilling and eng.slots[0] is None


def test_http_disconnect_cancels_stream(runner):
    """Closing the client socket mid-stream cancels the engine request
    instead of decoding to max_tokens for nobody."""
    import socket

    eng = ServingEngine(runner, n_slots=1, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]
        body = json.dumps({"prompt": PROMPTS[0], "max_tokens": 60,
                           "stream": True}).encode()
        s = socket.create_connection(("127.0.0.1", port), timeout=60)
        s.sendall(
            b"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
            b"Content-Type: application/json\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n" + body)
        got = s.recv(4096)  # wait for the first streamed bytes
        assert b"data:" in got or b"200" in got
        s.close()  # client walks away mid-generation
        import time as _t

        deadline = _t.monotonic() + 60
        while _t.monotonic() < deadline:
            if eng.slots[0] is None and eng.requests_completed >= 1:
                break
            _t.sleep(0.2)
        assert eng.slots[0] is None, "slot never freed after disconnect"
        # well before max_tokens: the engine stopped decoding for nobody
        assert eng.tokens_generated < 55
    finally:
        server.shutdown()
        eng.shutdown()


def test_tokenize_detokenize_and_stream_usage(runner):
    eng = ServingEngine(runner, n_slots=1, seq_len=96)
    t = threading.Thread(target=eng.run_forever, daemon=True)
    t.start()
    from http.server import ThreadingHTTPServer

    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(eng))
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        port = server.server_address[1]

        def post(path, obj, expect=200):
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}{path}",
                data=json.dumps(obj).encode(),
                headers={"Content-Type": "application/json"})
            return json.loads(urllib.request.urlopen(rq, timeout=120).read())

        toks = post("/tokenize", {"content": PROMPTS[0], "add_special": True})
        assert toks["tokens"][0] == eng.tokenizer.bos_token
        rt = post("/detokenize", {"tokens": toks["tokens"][1:]})
        assert rt["content"].strip() == PROMPTS[0]

        # stream_options.include_usage: final event before [DONE] carries it
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": PROMPTS[0], "max_tokens": 5,
                             "stream": True,
                             "stream_options": {"include_usage": True}}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(rq, timeout=120) as resp:
            raw = resp.read().decode()
        events = [json.loads(l[6:]) for l in raw.splitlines()
                  if l.startswith("data: ") and l != "data: [DONE]"]
        assert events[-1]["usage"]["completion_tokens"] == 5

        # OpenAI error envelope
        rq = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps({"prompt": "x", "n": 99}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(rq, timeout=60)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            err = json.loads(e.read())["error"]
            assert err["type"] == "invalid_request_error" and "n must" in err["message"]
    finally:
        server.shutdown()
        eng.shutdown()


def test_two_model_speculative_serving(stories260k_path):
    """Two-model speculative serving: the draft model's greedy chain
    drafts, the target verifies in one batched dispatch. With draft ==
    target the chain is always right, so every tick must emit K+1 tokens
    — and output is byte-identical to the plain engine."""
    tr = Runner(stories260k_path, seq_len=96)
    plain = ServingEngine(tr, n_slots=2, seq_len=96)
    want = [plain.generate([p], max_tokens=24)[0] for p in PROMPTS[:2]]

    spec_r = Runner(stories260k_path, seq_len=96,
                    draft_model=stories260k_path)
    eng = ServingEngine(spec_r, n_slots=2, seq_len=96, speculative=5)
    assert eng._draft_w is not None  # inherited from the runner
    reqs = [eng.submit(Request(prompt=p, max_tokens=24)) for p in PROMPTS[:2]]
    eng.drain(max_steps=200)
    assert [_detok(eng, r) for r in reqs] == want
    # draft == target: full acceptance, ~K+1 tokens per slot-tick
    assert eng.spec_ticks > 0
    assert eng.spec_tokens / eng.spec_ticks >= 4


def test_two_model_spec_serving_staggered_admission(stories260k_path):
    """A request admitted mid-flight gets its draft cache prefilled too
    (the chunked admission path); outputs stay exact."""
    tr = Runner(stories260k_path, seq_len=96)
    plain = ServingEngine(tr, n_slots=2, seq_len=96)
    want = plain.generate([PROMPTS[0]], max_tokens=12)[0]

    spec_r = Runner(stories260k_path, seq_len=96,
                    draft_model=stories260k_path)
    eng = ServingEngine(spec_r, n_slots=2, seq_len=96, speculative=4,
                        prefill_chunk=8)
    eng.submit(Request(prompt=PROMPTS[1], max_tokens=30))
    for _ in range(4):
        eng.step()
    late = eng.submit(Request(prompt=PROMPTS[0], max_tokens=12))
    eng.drain(max_steps=200)
    assert _detok(eng, late) == want


def test_two_model_spec_acceptance_survives_plain_ticks(stories260k_path):
    """Review regression: plain-tick fallbacks (a sampling request in the
    batch) teacher-force the emitted tokens into the draft cache, so
    post-fallback speculative ticks keep full acceptance (draft == target
    -> every draft must verify)."""
    spec_r = Runner(stories260k_path, seq_len=96,
                    draft_model=stories260k_path)
    eng = ServingEngine(spec_r, n_slots=2, seq_len=96, speculative=5)
    a = eng.submit(Request(prompt=PROMPTS[0], max_tokens=40))
    for _ in range(2):
        eng.step()  # a few spec ticks alone
    ticks0, toks0 = eng.spec_ticks, eng.spec_tokens
    b = eng.submit(Request(prompt=PROMPTS[1], max_tokens=6, temperature=0.8))
    eng.drain(max_steps=300)
    assert a.done and b.done
    # spec ticks after the mixed phase: still ~K+1 tokens per tick
    late_ticks = eng.spec_ticks - ticks0
    late_tokens = eng.spec_tokens - toks0
    assert late_ticks > 0
    assert late_tokens / late_ticks >= 4, (late_tokens, late_ticks)


def test_per_slot_speculation_mixed_traffic(stories260k_path):
    """VERDICT r3 #4 done-criterion: greedy slots keep emitting >1
    token/tick while sampled and penalized slots in the SAME batch stream
    correctly. Uses draft == target so the greedy slot's acceptance is
    guaranteed; the penalized slot (temp 0 + repetition penalty — spec-
    ineligible but deterministic) must match its plain-engine output
    byte-exactly via the verify tick's position-0 sampled token."""
    tr = Runner(stories260k_path, seq_len=96)
    plain = ServingEngine(tr, n_slots=3, seq_len=96)
    want_greedy = plain.generate([PROMPTS[0]], max_tokens=20)[0]
    plain2 = ServingEngine(tr, n_slots=3, seq_len=96)
    want_pen = plain2.generate([PROMPTS[2]], max_tokens=20,
                               repetition_penalty=1.3)[0]

    spec_r = Runner(stories260k_path, seq_len=96,
                    draft_model=stories260k_path)
    eng = ServingEngine(spec_r, n_slots=3, seq_len=96, speculative=5)
    rg = eng.submit(Request(prompt=PROMPTS[0], max_tokens=20))
    rs = eng.submit(Request(prompt=PROMPTS[1], max_tokens=10,
                            temperature=0.9))
    rp = eng.submit(Request(prompt=PROMPTS[2], max_tokens=20,
                            repetition_penalty=1.3))
    eng.drain(max_steps=300)
    assert rg.done and rs.done and rp.done
    assert _detok(eng, rg) == want_greedy
    assert _detok(eng, rp) == want_pen
    assert rs.finish_reason in ("length", "stop")
    # the greedy slot accepted multi-token ticks DESPITE the mixed batch
    assert eng.spec_ticks > 0
    assert eng.spec_tokens / eng.spec_ticks >= 4


def test_per_slot_speculation_sampled_logprobs(runner):
    """A logprobs-requesting sampled slot rides the verify tick's pos-0
    sample: its logprob record stays aligned with its tokens."""
    eng = ServingEngine(runner, n_slots=2, seq_len=96, speculative=4)
    rg = eng.submit(Request(prompt=PROMPTS[0], max_tokens=12))
    rl = eng.submit(Request(prompt=PROMPTS[1], max_tokens=8,
                            temperature=0.7, logprobs=2))
    eng.drain(max_steps=300)
    assert rg.done and rl.done
    assert len(rl.output_logprobs) == len(rl.output_tokens)
    assert all(len(t) == 2 for t in rl.output_top_logprobs)


def test_all_sampled_batch_takes_plain_ticks(runner):
    """When NO active slot is spec-eligible the engine skips the verify
    dispatch entirely (a plain tick is strictly cheaper)."""
    eng = ServingEngine(runner, n_slots=2, seq_len=96, speculative=4)
    r1 = eng.submit(Request(prompt=PROMPTS[0], max_tokens=8, temperature=0.8))
    r2 = eng.submit(Request(prompt=PROMPTS[1], max_tokens=8, temperature=0.8))
    eng.drain(max_steps=200)
    assert r1.done and r2.done
    assert eng.spec_ticks == 0


def test_speculative_stop_string_mid_tick(stories260k_path):
    """VERDICT r3 #10: a stop string matched MID-tick (inside a multi-token
    accepted draft) must finish the request at the match — output_text
    trimmed at the stop, the tick's remaining accepted tokens dropped —
    byte-identical to the plain engine with the same stop."""
    tr = Runner(stories260k_path, seq_len=96)
    plain = ServingEngine(tr, n_slots=1, seq_len=96)
    full = plain.generate([PROMPTS[0]], max_tokens=24)[0]
    # pick a stop string that lands mid-stream (inside the continuation)
    stop = full[8:13]
    assert stop and stop in full

    plain2 = ServingEngine(tr, n_slots=1, seq_len=96)
    r_plain = plain2.submit(Request(prompt=PROMPTS[0], max_tokens=24,
                                    stop=(stop,)))
    plain2.drain(max_steps=200)

    spec_r = Runner(stories260k_path, seq_len=96,
                    draft_model=stories260k_path)  # full acceptance
    eng = ServingEngine(spec_r, n_slots=1, seq_len=96, speculative=6)
    r_spec = eng.submit(Request(prompt=PROMPTS[0], max_tokens=24,
                                stop=(stop,)))
    eng.drain(max_steps=200)

    assert eng.spec_ticks > 0  # the stop really hit inside spec ticks
    assert r_spec.finish_reason == "stop" == r_plain.finish_reason
    assert r_spec.output_text == r_plain.output_text  # trimmed AT the stop
    assert r_spec.output_tokens == r_plain.output_tokens


def _drain_fused(eng, multi, max_steps=200):
    n = 0
    while (any(eng.slots) or not eng.pending.empty()) and n < max_steps:
        idle = eng.pending.empty() and not eng._prefilling
        eng.step(multi if idle else 1)
        n += 1


def test_fused_spec_scan_exactness(runner):
    """The fused multi-round speculative scan (on-device n-gram drafts,
    R rounds per dispatch) emits exactly the plain engine's greedy
    tokens, like the single-tick path."""
    plain = ServingEngine(runner, n_slots=2, seq_len=96)
    want = [plain.generate([p], max_tokens=20)[0] for p in PROMPTS[:2]]

    eng = ServingEngine(runner, n_slots=2, seq_len=96, speculative=4,
                        tick_tokens=6)
    reqs = [eng.submit(Request(prompt=p, max_tokens=20))
            for p in PROMPTS[:2]]
    _drain_fused(eng, 6)
    assert [_detok(eng, r) for r in reqs] == want
    assert eng.spec_ticks > 0


def test_fused_spec_scan_two_model(stories260k_path):
    """Two-model fused scan: draft == target gives full acceptance
    (every round emits K+1 per slot) and byte-exact output."""
    tr = Runner(stories260k_path, seq_len=128)
    plain = ServingEngine(tr, n_slots=2, seq_len=128)
    want = [plain.generate([p], max_tokens=30)[0] for p in PROMPTS[:2]]

    spec_r = Runner(stories260k_path, seq_len=128,
                    draft_model=stories260k_path)
    eng = ServingEngine(spec_r, n_slots=2, seq_len=128, speculative=4,
                        tick_tokens=4)
    reqs = [eng.submit(Request(prompt=p, max_tokens=30))
            for p in PROMPTS[:2]]
    _drain_fused(eng, 4)
    assert [_detok(eng, r) for r in reqs] == want
    # full acceptance: K+1 per slot per round. The 2-slot ideal is 10;
    # observed is diluted by the staggered-admission phase (single-
    # active single ticks) and tail rounds after a slot hits max_tokens
    # mid-scan — anything above K+1=5 already proves rounds where BOTH
    # slots accepted their full drafts.
    assert eng.spec_tokens / eng.spec_ticks > 5


def test_fused_spec_scan_mixed_traffic(stories260k_path):
    """Per-slot eligibility through the FUSED path: the penalized
    deterministic slot matches plain output while the greedy slot
    accepts multi-token rounds."""
    tr = Runner(stories260k_path, seq_len=128)
    plain = ServingEngine(tr, n_slots=3, seq_len=128)
    want_g = plain.generate([PROMPTS[0]], max_tokens=18)[0]
    plain2 = ServingEngine(tr, n_slots=3, seq_len=128)
    want_p = plain2.generate([PROMPTS[2]], max_tokens=18,
                             repetition_penalty=1.3)[0]

    spec_r = Runner(stories260k_path, seq_len=128,
                    draft_model=stories260k_path)
    eng = ServingEngine(spec_r, n_slots=3, seq_len=128, speculative=4,
                        tick_tokens=4)
    rg = eng.submit(Request(prompt=PROMPTS[0], max_tokens=18))
    rs = eng.submit(Request(prompt=PROMPTS[1], max_tokens=8,
                            temperature=0.9))
    rp = eng.submit(Request(prompt=PROMPTS[2], max_tokens=18,
                            repetition_penalty=1.3))
    _drain_fused(eng, 4)
    assert rg.done and rs.done and rp.done
    assert _detok(eng, rg) == want_g
    assert _detok(eng, rp) == want_p
