"""Long-context serving tier (serving.sp_engine): requests whose prompt
exceeds the primary engine's per-slot cache stream through a sequence-
parallel mesh — VERDICT r3 #5's done criterion: a >seq_len/chip prompt
streams through the public HTTP API on the virtual 8-device mesh."""

import json
import threading
import urllib.request

import pytest

from crabml_tpu.parallel.sp import SequenceParallelRunner
from crabml_tpu.runtime.runner import Runner
from crabml_tpu.serving import Request, ServingEngine
from crabml_tpu.serving.http import make_handler
from crabml_tpu.serving.sp_engine import SpServingEngine
from crabml_tpu.tokenizer import Utf8Buf

# long enough to overflow a 64-token primary cache
LONG_PROMPT = ("Once upon a time there was a little girl who liked to "
               "play in the garden with her friends. ") * 4
SHORT_PROMPT = "Lily is a cat"


@pytest.fixture(scope="module")
def sp_engine(stories260k_path):
    r = SequenceParallelRunner(stories260k_path, sp=4, seq_len=256)
    return SpServingEngine(r)


def _golden(path, prompt, steps, seq_len=256):
    r = Runner(path, seq_len=seq_len)
    return "".join(r.prefill_and_generate(prompt, steps=steps))


def test_sp_engine_matches_dense_runner(stories260k_path, sp_engine):
    """Greedy output through the sp tier == the dense Runner at the same
    context budget (the sp forward's parity, driven via the engine)."""
    want = _golden(stories260k_path, LONG_PROMPT, steps=12)
    got = sp_engine.generate([LONG_PROMPT], max_tokens=12)[0]
    assert got == want
    assert sp_engine.requests_completed >= 1


def test_sp_engine_slot_reuse_and_sampling(stories260k_path, sp_engine):
    """Back-to-back requests reuse the single sp cache without cross-talk;
    a sampled request produces valid non-empty output."""
    want = _golden(stories260k_path, SHORT_PROMPT, steps=8)
    a = sp_engine.generate([SHORT_PROMPT], max_tokens=8)[0]
    b = sp_engine.generate([SHORT_PROMPT], max_tokens=8)[0]
    assert a == b == want
    s = sp_engine.generate([SHORT_PROMPT], max_tokens=6, temperature=0.9)[0]
    assert isinstance(s, str) and len(s) > 0


def test_longctx_routing_through_http(stories260k_path, sp_engine):
    """The daemon routes by prompt length: a >primary-cache prompt streams
    through the sp tier, short prompts stay on the slot engine — both
    through the public HTTP API, outputs exact."""
    from http.server import ThreadingHTTPServer

    primary = ServingEngine(Runner(stories260k_path, seq_len=64),
                            n_slots=2, seq_len=64)
    server = ThreadingHTTPServer(("127.0.0.1", 0),
                                 make_handler(primary, longctx=sp_engine))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    threading.Thread(target=primary.run_forever, daemon=True).start()
    threading.Thread(target=sp_engine.run_forever, daemon=True).start()

    def post(body):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/completions",
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        return urllib.request.urlopen(req, timeout=300)

    try:
        done0 = sp_engine.requests_completed
        # long prompt (> 64 tokens): must ride the sp tier, NOT be trimmed
        want = _golden(stories260k_path, LONG_PROMPT, steps=10)
        with post({"prompt": LONG_PROMPT, "max_tokens": 10,
                   "stream": True}) as resp:
            pieces = []
            for line in resp:
                line = line.strip()
                if line.startswith(b"data: ") and line != b"data: [DONE]":
                    ev = json.loads(line[6:])
                    if "text" in ev:
                        pieces.append(ev["text"])
        assert "".join(pieces) == want
        assert sp_engine.requests_completed == done0 + 1

        # short prompt: stays on the primary engine
        with post({"prompt": SHORT_PROMPT, "max_tokens": 6}) as resp:
            out = json.loads(resp.read())
        assert len(out["choices"][0]["text"]) > 0
        assert sp_engine.requests_completed == done0 + 1  # untouched
        assert primary.requests_completed >= 1

        # the sp tier's load signal is visible on /metrics: queue depth,
        # queue-wait histogram, and its own TTFT/e2e (VERDICT r4 #7)
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/metrics", timeout=60) as resp:
            metrics = resp.read().decode()
        assert "crabml_sp_queue_depth" in metrics
        assert "crabml_sp_queue_wait_seconds" in metrics
        assert "crabml_sp_requests_completed_total" in metrics
        assert "crabml_sp_ttft_seconds" in metrics
    finally:
        primary.shutdown()
        sp_engine.shutdown()
        server.shutdown()
        server.server_close()
